"""Annotation-stage benchmark + six-dataset bit-equality for device-side
mining (pool/mine.py) — VERDICT r4 item #1.

Two modes:

  # real dataset: timed device mining vs the reference's host algorithm
  # (transliterated oracle: two O(N²) pure-Python Jaccard matrices +
  # host mining, retrieval_data_annotation.py:36-103), plus bit-equality
  # of pairs/scores/gt vs the canonical stable host miner
  python benchmarks/annotate_bench.py --dataset wikiv2 \
      --resources runs/wikiv2/resources [--skip-reference] [--with-r4-path]

  # synthetic north-star pool: FULL annotation pass wall-clock at 100k+
  # rows (host matrices would be 80 GB f64 — the host path cannot run),
  # verified against a 64-row exact-prefix oracle
  python benchmarks/annotate_bench.py --synthetic 100000 --vocab 65536

Timing protocol (CLAUDE.md): the stage is multi-second and
multi-dispatch with per-block distinct payloads, and every timed run's
OUTPUT is verified against a host oracle (full bit-equality for real
datasets, 64-row exact prefix for synthetic), so the remote relay's
dispatch memoization cannot fake it. The warm-up run uses row-rotated
content — same shapes (hits the same compile), different payload.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def load_real(resources: str, timestep: int):
    from rag4dyg_tpu.data.serialize import read_corpus_lines
    from rag4dyg_tpu.data.vocab import Tokenizer
    from rag4dyg_tpu.pool.jaccard import parse_inout_sets

    train = read_corpus_lines(os.path.join(resources,
                                           "train.link_prediction"))
    tok = Tokenizer.from_vocab_file(os.path.join(resources, "vocab.json"),
                                    timestep=timestep)
    in_sets, out_sets = parse_inout_sets(train, train)
    ids = lambda ss: [[tok.token_to_id(t) for t in s] for s in ss]  # noqa: E731
    return ids(out_sets), ids(in_sets), len(tok)


def synth_ids(n: int, vocab: int, avg: int, seed: int):
    """Cluster-structured synthetic pool: rows draw from ~n/5 template
    sets (exact copies + one-element perturbations), so threshold-0.8
    positives, exact-tie groups, and hard-negative structure all exist
    at scale — iid random sets never overlap 80%, which made the first
    100k run mine zero pairs (an empty demo of the mining path)."""
    rng = np.random.RandomState(seed)
    n_templates = max(1, n // 5)
    templates = [np.unique(rng.randint(0, vocab,
                                       size=max(2, rng.poisson(avg))))
                 for _ in range(min(n_templates, n))]

    def mk_clustered():
        out = []
        for _ in range(n):
            t = templates[rng.randint(len(templates))]
            r = rng.rand()
            if r < 0.5:
                out.append(t.tolist())                     # exact tie
            elif r < 0.8:
                extra = rng.randint(0, vocab)              # |t|/(|t|+1)
                out.append(np.union1d(t, [extra]).tolist())
            else:
                out.append(np.unique(rng.randint(
                    0, vocab, size=max(1, rng.poisson(avg)))).tolist())
        return out

    return mk_clustered(), mk_clustered()


def run_device(out_ids, in_ids, vocab, spec, seed, engine):
    from rag4dyg_tpu.pool.mine import mine_pool_device

    def once(o, i):
        t0 = time.perf_counter()
        m = mine_pool_device(
            o, i, vocab, threshold=spec["threshold"],
            neg_num=spec["neg_num"], gt_topk=spec["gt_topk"],
            max_positives=spec["max_positives"],
            rng=np.random.RandomState(seed), engine=engine)
        return time.perf_counter() - t0, m

    t_cold, _ = once(out_ids[1:] + out_ids[:1], in_ids[1:] + in_ids[:1])
    t_warm, mined = once(out_ids, in_ids)
    return t_cold, t_warm, mined


def host_matrices(out_ids, in_ids):
    from rag4dyg_tpu.pool.jaccard import reference_pairs_matrix
    o = [set(s) for s in out_ids]
    i = [set(s) for s in in_ids]
    m_out = reference_pairs_matrix(o, o)
    m_in = reference_pairs_matrix(i, i)
    np.fill_diagonal(m_out, 0.0)
    np.fill_diagonal(m_in, 0.0)
    return m_out, m_in


def host_mine(m_out, m_in, spec, seed, stable):
    from rag4dyg_tpu.pool.annotate import mine_train_pairs
    pairs, scores = mine_train_pairs(
        m_out, m_in, threshold=spec["threshold"], neg_num=spec["neg_num"],
        max_positives=spec["max_positives"],
        rng=np.random.RandomState(seed), stable=stable)
    k = min(spec["gt_topk"], m_out.shape[0])
    kind = "stable" if stable else None
    gt_idx = np.argsort(-m_out, axis=1, kind=kind)[:, :k]
    gt_score = np.take_along_axis(m_out, gt_idx, axis=1)
    return pairs, scores, gt_idx, gt_score


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=None)
    ap.add_argument("--resources", default=None)
    ap.add_argument("--synthetic", type=int, default=None)
    ap.add_argument("--vocab", type=int, default=65536)
    ap.add_argument("--avg-set", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--skip-reference", action="store_true",
                    help="skip the O(N²) pure-Python reference stage "
                         "timing (bit-equality still verified)")
    ap.add_argument("--with-r4-path", action="store_true",
                    help="also time the round-4 host path: device "
                         "Jaccard matrices downloaded in full + host "
                         "mining (the transfer-bound path device "
                         "mining replaces)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from rag4dyg_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    result = {"platform": jax.devices()[0].platform}

    if args.synthetic:
        spec = {"threshold": 0.8, "neg_num": 5, "gt_topk": 10,
                "max_positives": None}
        out_ids, in_ids = synth_ids(args.synthetic, args.vocab,
                                    args.avg_set, args.seed + 1)
        vocab = args.vocab
        result.update(mode="synthetic", n_pool=args.synthetic,
                      vocab=vocab)
    else:
        from rag4dyg_tpu.config import DATASETS
        ds = DATASETS[args.dataset]
        spec = {"threshold": ds.jaccard_threshold, "neg_num": ds.neg_num,
                "gt_topk": ds.gt_topk, "max_positives": ds.max_positives}
        out_ids, in_ids, vocab = load_real(args.resources, ds.timestep)
        result.update(mode="real", dataset=args.dataset,
                      n_pool=len(out_ids), vocab=vocab)

    t_cold, t_warm, mined = run_device(out_ids, in_ids, vocab, spec,
                                       args.seed, args.engine)
    result.update(
        device_cold_seconds=round(t_cold, 2),
        device_warm_seconds=round(t_warm, 2),
        pairs=int(len(mined.train_pairs)),
        fallback_rows=mined.stats.fallback_rows,
        fallback_reasons={k: v for k, v in
                          mined.stats.fallback_reasons.items() if v},
        engines=list(mined.stats.engines),
        collision_free=bool(mined.stats.collision_free))
    print(json.dumps({k: result[k] for k in
                      ("device_cold_seconds", "device_warm_seconds",
                       "pairs", "engines")}), flush=True)

    if args.synthetic:
        # 64-row exact prefix oracle: full-width host rows, same RNG
        # stream prefix (mining consumes draws in pool-row order)
        from rag4dyg_tpu.pool.jaccard import reference_pairs_matrix
        o = [set(s) for s in out_ids]
        i = [set(s) for s in in_ids]
        m_out = reference_pairs_matrix(o[:64], o)
        m_in = reference_pairs_matrix(i[:64], i)
        for r in range(64):
            m_out[r, r] = 0.0
            m_in[r, r] = 0.0
        pairs, scores, gt_idx, gt_score = host_mine(m_out, m_in, spec,
                                                    args.seed, stable=True)
        got = mined.train_pairs[mined.train_pairs[:, 0] < 64]
        gs = mined.train_pair_scores[mined.train_pairs[:, 0] < 64]
        assert np.array_equal(got, pairs), "pair prefix mismatch"
        assert np.array_equal(gs, scores), "pair score prefix mismatch"
        assert np.array_equal(mined.gt_topk_index[:64], gt_idx)
        assert np.array_equal(mined.gt_topk_score[:64], gt_score)
        result["prefix_oracle_rows"] = 64
        result["bit_equal_prefix"] = True
    else:
        t0 = time.perf_counter()
        m_out, m_in = host_matrices(out_ids, in_ids)
        t_mat = time.perf_counter() - t0
        if not args.skip_reference:
            t0 = time.perf_counter()
            host_mine(m_out, m_in, spec, args.seed, stable=False)
            t_mine = time.perf_counter() - t0
            result["reference_stage_seconds"] = round(t_mat + t_mine, 2)
            result["vs_reference"] = round(
                (t_mat + t_mine) / t_warm, 1)
        pairs, scores, gt_idx, gt_score = host_mine(m_out, m_in, spec,
                                                    args.seed, stable=True)
        assert np.array_equal(mined.train_pairs, pairs), "pairs mismatch"
        assert np.array_equal(mined.train_pair_scores, scores)
        assert np.array_equal(mined.gt_topk_index, gt_idx)
        assert np.array_equal(mined.gt_topk_score, gt_score)
        result["bit_equal_stable_host"] = True

    if args.with_r4_path and not args.synthetic:
        # round-4 shipped path: device matmul Jaccard, FULL [N, N] u16
        # download, host mining (annotate_pool device_mining=False core)
        from rag4dyg_tpu.pool.jaccard import jaccard_matrix
        o = [set(s) for s in out_ids]
        i = [set(s) for s in in_ids]
        t0 = time.perf_counter()
        m_o = jaccard_matrix(o, o, int, vocab)
        m_i = jaccard_matrix(i, i, int, vocab)
        np.fill_diagonal(m_o, 0.0)
        np.fill_diagonal(m_i, 0.0)
        host_mine(m_o, m_i, spec, args.seed, stable=False)
        result["r4_download_path_seconds"] = round(
            time.perf_counter() - t0, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
