"""Headline benchmark: dense retrieval query throughput (queries/sec/chip).

Compares the TPU path — device-resident normalized pool, fused
matmul + top-k inside jit (rag4dyg_tpu.pool.index.DenseIndex) — against a
faithful re-creation of the reference's scorer: torch CPU normalized
matmul plus a full numpy argsort per query batch
(reference: train/train_retriever.py:425-443 and the host argsort at
:357-368). Prints one JSON line; ``vs_baseline`` is the speedup.
"""

import json
import time

import numpy as np

POOL, DIM, QUERIES, BATCH, TOPK = 16384, 512, 2048, 256, 10


def bench_tpu(pool: np.ndarray, queries: np.ndarray) -> float:
    import jax
    from rag4dyg_tpu.pool.index import DenseIndex

    index = DenseIndex(pool)
    q = [jax.device_put(queries[s:s + BATCH])
         for s in range(0, QUERIES, BATCH)]
    index.topk(q[0], TOPK)  # compile
    jax.block_until_ready(index.pool)

    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        for qb in q:
            index.topk(qb, TOPK)  # returns host arrays — each call syncs
    dt = time.perf_counter() - t0
    return reps * QUERIES / dt


def bench_reference(pool: np.ndarray, queries: np.ndarray) -> float:
    """The reference scorer: torch CPU cosine matmul + full numpy argsort."""
    import torch

    H = torch.from_numpy(pool)
    H = H / H.norm(dim=1, keepdim=True)
    t0 = time.perf_counter()
    for s in range(0, QUERIES, BATCH):
        qb = torch.from_numpy(queries[s:s + BATCH])
        qb = qb / qb.norm(dim=1, keepdim=True)
        scores = ((qb @ H.T + 1) / 2).numpy()
        np.argsort(-scores, axis=1)  # full ranking, as the reference writes
    dt = time.perf_counter() - t0
    return QUERIES / dt


def main():
    rng = np.random.RandomState(0)
    pool = rng.randn(POOL, DIM).astype(np.float32)
    queries = rng.randn(QUERIES, DIM).astype(np.float32)

    ours = bench_tpu(pool, queries)
    base = bench_reference(pool, queries)
    print(json.dumps({
        "metric": "retrieval_query_throughput",
        "value": round(ours, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(ours / base, 2),
    }))


if __name__ == "__main__":
    main()
