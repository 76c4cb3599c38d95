"""Pool-build (Jaccard annotation) benchmark: device matmul engine vs the
reference's pure-Python O(N²) pair loop (retrieval_data_annotation.py:36-41).

Builds the dominant train_out x train_out matrix for a prepared corpus at
reference scale and times both paths; verifies bit-equality. Run on the
TPU (default platform) or CPU (--cpu).

    python benchmarks/pool_build.py --resources runs/wikiv2/resources \
        --timestep 15 [--cpu] [--skip-reference]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resources", required=True)
    ap.add_argument("--timestep", type=int, required=True)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rag4dyg_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    import numpy as np
    from rag4dyg_tpu.data.serialize import read_corpus_lines
    from rag4dyg_tpu.data.vocab import Tokenizer
    from rag4dyg_tpu.pool.jaccard import (DEFAULT_VOCAB_CHUNK, _host_onehot,
                                          _intersection_scan, jaccard_matrix,
                                          parse_inout_sets,
                                          reference_pairs_matrix)

    train = read_corpus_lines(
        os.path.join(args.resources, "train.link_prediction"))
    tok = Tokenizer.from_vocab_file(os.path.join(args.resources, "vocab.json"),
                                    timestep=args.timestep)
    _, out_sets = parse_inout_sets(train, train)

    # warm at the REAL shapes (a first run compiles every row-block shape)
    # but with DIFFERENT content (rows rotated by one): the remote relay
    # memoizes repeated identical dispatches, so the timed call must never
    # repeat the warmup's payload (CLAUDE.md measurement rules)
    warm_sets = out_sets[1:] + out_sets[:1]
    jaccard_matrix(warm_sets, out_sets, tok.token_to_id, len(tok))
    t0 = time.perf_counter()
    ours = jaccard_matrix(out_sets, out_sets, tok.token_to_id, len(tok))
    t_ours = time.perf_counter() - t0

    # device-compute-only (no [N, N] device->host transfer): through the
    # remote relay the result download dominates; on a directly-attached
    # TPU host it is ~free, so report both. All reps run inside ONE jitted
    # scan whose input is re-rolled every iteration and whose carry
    # accumulates a host-verifiable value (bench.py pattern), so neither
    # the relay's dispatch memoization nor XLA DCE can fake the timing.
    import functools

    import jax.numpy as jnp

    ids = [[tok.token_to_id(t) for t in s] for s in out_sets]
    chunks = -(-len(tok) // DEFAULT_VOCAB_CHUNK)
    oh_host = _host_onehot(ids, chunks * DEFAULT_VOCAB_CHUNK)
    oh = jax.device_put(oh_host)
    jax.block_until_ready(oh)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(a, b, reps):
        def body(carry, r):
            inter = _intersection_scan(jnp.roll(a, r, axis=0), b,
                                       chunks, DEFAULT_VOCAB_CHUNK)
            return carry + inter[0, 0].astype(jnp.float32), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return carry

    sets_np = [set(s) for s in ids]
    N = len(sets_np)

    def expected(reps: int) -> float:
        return float(sum(len(sets_np[(N - r) % N] & sets_np[0])
                         for r in range(reps)))

    oh_warm = jax.device_put(np.roll(oh_host, 1, axis=1))  # distinct payload
    jax.block_until_ready(oh_warm)

    def timed(reps: int) -> float:
        jax.block_until_ready(run(oh_warm, oh_warm, reps))  # compile+warm
        t0 = time.perf_counter()
        v = float(run(oh, oh, reps))
        dt = time.perf_counter() - t0
        assert v == expected(reps), (
            f"scan result {v} != expected {expected(reps)}")
        return dt

    t1, t2 = timed(4), timed(8)
    t_compute = max((t2 - t1) / 4.0, 1e-9)  # per-matrix steady state

    result = {"metric": "pool_build_seconds", "N": len(out_sets),
              "platform": jax.devices()[0].platform,
              "value": round(t_ours, 2), "unit": "s",
              "device_compute_seconds": round(t_compute, 2)}
    if not args.skip_reference:
        t0 = time.perf_counter()
        ref = reference_pairs_matrix(out_sets, out_sets)
        t_ref = time.perf_counter() - t0
        assert np.array_equal(ours, ref), "MISMATCH vs reference loop"
        result["reference_seconds"] = round(t_ref, 2)
        result["vs_baseline"] = round(t_ref / t_ours, 1)
        result["bit_equal"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    main()
