"""Pool-axis scale evidence: fused score+top-k and the Jaccard build at
the largest real pool (reddit) and at a synthetic north-star pool
(1e5+ sequences — BASELINE.json configs[4]'s million-edge regime), on a
single chip and mesh-sharded.

Usage:
    # real chip (single-device paths + timings)
    python benchmarks/scale_pool.py --mode chip
    # virtual 8-device CPU mesh (sharded correctness + timings)
    python benchmarks/scale_pool.py --mode mesh

Measurement rules (CLAUDE.md): every timed device computation runs inside
one jitted ``lax.scan`` whose input varies per iteration and whose carry
is value-verified on the host — the remote relay memoizes repeated
identical dispatches and loose timings cannot be trusted.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REDDIT_RESOURCES = "runs/reddit/resources"
TOPK = 10
DIM = 512


def _setup(mode: str):
    import jax

    if mode == "mesh":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    from rag4dyg_tpu.cli import _enable_compile_cache

    _enable_compile_cache()
    return jax


def bench_topk(jax, pool_rows: int, mesh=None, reps: int = 50,
               queries: int = 1024, use_pallas: bool = None):
    """Queries/sec through DenseIndex.topk_device at [pool_rows, DIM]."""
    import jax.numpy as jnp
    import numpy as np

    from rag4dyg_tpu.pool.index import DenseIndex

    rng = np.random.RandomState(0)
    pool = rng.randn(pool_rows, DIM).astype(np.float32)
    q = rng.randn(queries, DIM).astype(np.float32)
    idx = DenseIndex(pool, mesh=mesh,
                     use_pallas=(mesh is None) if use_pallas is None
                     else use_pallas)
    del pool

    # The pool MUST be a jit ARGUMENT, not a closure capture: a captured
    # device array is baked into the lowering as a constant (2 GB of
    # MLIR at the 1M-row shape — observed to stall the remote compile
    # service; jax warns at 2.05GB captured). bench.py's runner has the
    # same structure for the same reason.
    use_pallas = idx.mesh is None and idx.use_pallas
    if use_pallas:
        from rag4dyg_tpu.ops.topk_pallas import fused_score_topk

        # eager call builds + pads idx._pallas_pool without any capture
        jax.block_until_ready(idx.topk_device(jax.device_put(q), TOPK))
        pool_dev = idx._pallas_pool
    else:
        pool_dev = idx.pool

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(qx, p, reps):
        def body(carry, _):
            qi = qx + carry * 1e-6
            if use_pallas:
                s, _ = fused_score_topk(qi, p, k=TOPK, n_valid=idx.n,
                                        tile_n=512, normalize=True)
            elif idx.mesh is None:
                from rag4dyg_tpu.pool.index import _topk_dense
                s, _ = _topk_dense(qi, p, TOPK)
            else:
                from rag4dyg_tpu.pool.index import _topk_sharded
                s, _ = _topk_sharded(qi, p, TOPK, idx.mesh,
                                     idx.shard_axis, idx.n)
            return carry + s[0, 0], None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return carry

    qd = jax.device_put(q)
    jax.block_until_ready(run(qd, pool_dev, reps))       # compile + warm
    jax.block_until_ready(run(qd, pool_dev, 2 * reps))   # compile + warm

    def timed(r):
        q2 = jax.device_put(rng.randn(queries, DIM).astype(np.float32))
        jax.block_until_ready(q2)
        t0 = time.perf_counter()
        v = float(run(q2, pool_dev, r))
        dt = time.perf_counter() - t0
        assert v > 0.0, "scan carry did not accumulate"
        return dt

    # (2r - r) delta cancels the per-dispatch relay overhead (~30 ms
    # healthy, ~1 s on a degraded tunnel — single-dispatch timing
    # under-reported the 16k fused kernel 18x during the round-5
    # crossover run); fall back to the long-run absolute number if the
    # delta drowns in jitter
    t1, t2 = timed(reps), timed(2 * reps)
    delta = t2 - t1
    if delta > 0.3 * t1:
        return reps * queries / delta
    return 2 * reps * queries / t2


def bench_jaccard(jax, n_queries: int, n_rows: int, vocab: int, mesh=None,
                  avg_set: int = 24):
    """Seconds for one n_queries x n_rows Jaccard matrix (the val/test x
    train annotation shape), end-to-end incl. host one-hot build and
    result download; bit-verified on a corner vs the reference oracle."""
    import numpy as np

    from rag4dyg_tpu.pool.jaccard import jaccard_matrix, reference_pairs_matrix

    rng = np.random.RandomState(1)
    if n_rows <= 100_000:
        sets = [set(rng.choice(vocab, size=max(1, rng.poisson(avg_set)),
                               replace=False).tolist()) for _ in range(n_rows)]
    else:
        # vectorized generation for the 1M-row north-star shape: one
        # [N, avg_set] randint draw; set() dedups within-row collisions
        # (sizes land a touch under avg_set — fine for a throughput shape)
        mat = rng.randint(0, vocab, size=(n_rows, avg_set))
        sets = [set(row) for row in mat.tolist()]
    qsets = sets[:n_queries]
    t0 = time.perf_counter()
    out = jaccard_matrix(qsets, sets, token_to_id=int, vocab_size=vocab,
                         mesh=mesh)
    dt = time.perf_counter() - t0
    # spot bit-verification on a 64-row corner against the reference oracle
    ref = reference_pairs_matrix(qsets[:64], sets[:64])
    assert np.array_equal(out[:64, :64], ref), "Jaccard != reference oracle"
    return dt


def bench_gen_rank(jax, pool_rows: int, queries: int = 512, mesh=None):
    """Seconds for the full `.gen` eval ranking at [queries, pool_rows]:
    on-device stable descending rank (DenseIndex.rank_full) + int32
    index download — the path that replaced the host argsort over a
    downloaded [Q, N] f32 score matrix (VERDICT r2 #4; at 100k rows the
    f32 download alone was ~2.4 GB through the 3-6 MB/s relay).
    Corner-verified against the canonical stable descending tie order
    (np.argsort(-scores, kind='stable') — what topk_reference uses)."""
    import numpy as np

    from rag4dyg_tpu.pool.index import DenseIndex

    rng = np.random.RandomState(2)
    pool = rng.randn(pool_rows, DIM).astype(np.float32)
    q = rng.randn(queries, DIM).astype(np.float32)
    idx = DenseIndex(pool, mesh=mesh, use_pallas=(mesh is None))
    qd = jax.device_put(q)
    jax.block_until_ready(qd)
    t0 = time.perf_counter()
    ranks = np.asarray(idx.rank_full(qd))           # [Q, N] int32 download
    dt = time.perf_counter() - t0
    # canonical-tie-order corner check vs the reference scorer semantics
    s_corner = np.asarray(idx.score(qd[:8]))
    ref_idx = np.argsort(-s_corner, axis=1, kind="stable")[:, :64]
    assert np.array_equal(ranks[:8, :ref_idx.shape[1]], ref_idx), \
        "rank_full corner != stable descending tie order"
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["chip", "mesh"], required=True)
    ap.add_argument("--synthetic-rows", type=int, default=None)
    ap.add_argument("--synthetic-queries", type=int, default=None)
    ap.add_argument("--synthetic-vocab", type=int, default=None)
    ap.add_argument("--skip-jaccard-synthetic", action="store_true")
    ap.add_argument("--skip-gen-rank", action="store_true")
    ap.add_argument("--skip-reddit", action="store_true")
    # 1M-row runs on the 1-core virtual mesh must bound the matmul FLOPs
    # (2*Q*D*N per rep); defaults keep the historical shapes
    ap.add_argument("--topk-queries", type=int, default=1024)
    ap.add_argument("--topk-reps", type=int, default=50)
    ap.add_argument("--no-pallas", action="store_true",
                    help="chip mode: score via XLA matmul + lax.top_k "
                         "instead of the fused Pallas kernel — at very "
                         "large tile counts (1M rows / 512-tile = 1954 "
                         "grid steps) the fused kernel is per-tile-"
                         "overhead-bound and XLA wins")
    args = ap.parse_args()
    # mesh mode runs on 8 virtual CPU devices of ONE core: shapes shrink
    # to prove the sharded path (correctness + execution), not to race it
    if args.synthetic_rows is None:
        args.synthetic_rows = 100_000 if args.mode == "chip" else 4096
    if args.synthetic_queries is None:
        # 2048 x 100k u16 result ≈ 400 MB download through the ~3-6 MB/s
        # relay (~2 min); 8192 queries made the download alone ~4x the
        # whole benchmark budget
        args.synthetic_queries = 2048 if args.mode == "chip" else 256
    if args.synthetic_vocab is None:
        args.synthetic_vocab = 65_536 if args.mode == "chip" else 4096

    jax = _setup(args.mode)
    mesh = None
    if args.mode == "mesh":
        from rag4dyg_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=8, n_model=1)

    results = {"mode": args.mode,
               "platform": jax.devices()[0].platform,
               "n_devices": len(jax.devices())}

    def progress(key, value):
        # stream each sub-result as it lands so a timeout preserves
        # everything measured so far
        results[key] = value
        print(json.dumps({key: value}), flush=True)

    # real reddit pool shape
    if os.path.exists(REDDIT_RESOURCES) and not args.skip_reddit:
        from rag4dyg_tpu.data.serialize import read_corpus_lines
        from rag4dyg_tpu.data.vocab import Tokenizer
        from rag4dyg_tpu.pool.jaccard import parse_inout_sets

        train = read_corpus_lines(
            os.path.join(REDDIT_RESOURCES, "train.link_prediction"))
        tok = Tokenizer.from_vocab_file(
            os.path.join(REDDIT_RESOURCES, "vocab.json"), timestep=11)
        progress("reddit_pool_rows", len(train))
        progress("reddit_topk_qps", round(
            bench_topk(jax, len(train), mesh=mesh), 1))
        _, out_sets = parse_inout_sets(train, train)
        from rag4dyg_tpu.pool.jaccard import jaccard_matrix, \
            reference_pairs_matrix
        import numpy as np
        t0 = time.perf_counter()
        mat = jaccard_matrix(out_sets, out_sets, tok.token_to_id, len(tok),
                             mesh=mesh)
        progress("reddit_jaccard_seconds",
                 round(time.perf_counter() - t0, 2))
        ref = reference_pairs_matrix(out_sets[:64], out_sets[:64])
        assert np.array_equal(mat[:64, :64], ref)

    # synthetic north-star pool
    progress("synth_rows", args.synthetic_rows)
    progress("synth_topk_qps", round(
        bench_topk(jax, args.synthetic_rows, mesh=mesh,
                   reps=args.topk_reps, queries=args.topk_queries,
                   use_pallas=False if args.no_pallas else None), 1))
    progress("synth_topk_queries", args.topk_queries)
    if args.no_pallas:
        progress("synth_topk_impl", "xla_dense")
    if not args.skip_gen_rank and mesh is None:
        # single-device only: rank_full of a mesh-sharded pool is
        # intentionally unsupported (emit a top-k .gen instead)
        q_rank = 512 if args.mode == "chip" else 64
        progress("synth_gen_rank_queries", q_rank)
        progress("synth_gen_rank_seconds", round(
            bench_gen_rank(jax, args.synthetic_rows, queries=q_rank), 2))
    if not args.skip_jaccard_synthetic:
        progress("synth_jaccard_queries", args.synthetic_queries)
        progress("synth_jaccard_seconds", round(
            bench_jaccard(jax, args.synthetic_queries, args.synthetic_rows,
                          args.synthetic_vocab, mesh=mesh), 2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
