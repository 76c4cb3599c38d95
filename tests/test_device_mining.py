"""Device-side annotation mining (pool/mine.py) must be bit-equal to the
stable host miner — same pairs, same sampled negatives (identical RNG
stream), same f64 scores, same gt top-k — with exact-host fallbacks
firing only where the f32 device decision is provably ambiguous.

The stable host miner (mine_train_pairs(stable=True) + stable gt argsort)
is the canonical-tie-order form of the reference algorithm
(retrieval_data_annotation.py:43-103); the unstable-order original stays
pinned by tests/test_pool_annotation.py."""

import numpy as np
import pytest

from rag4dyg_tpu.data.serialize import read_corpus_lines
from rag4dyg_tpu.data.vocab import Tokenizer
from rag4dyg_tpu.pool.annotate import mine_train_pairs
from rag4dyg_tpu.pool.jaccard import jaccard_matrix, parse_inout_sets
from rag4dyg_tpu.pool.mine import mine_pool_device


def _host_stable(out_ids, in_ids, vocab, *, threshold=0.8, neg_num=5,
                 gt_topk=10, max_positives=None, seed=7):
    """The canonical host path: full f64 matrices, stable tie order."""
    out_sets = [set(s) for s in out_ids]
    in_sets = [set(s) for s in in_ids]
    m_out = jaccard_matrix(out_sets, out_sets, int, vocab)
    m_in = jaccard_matrix(in_sets, in_sets, int, vocab)
    np.fill_diagonal(m_out, 0.0)
    np.fill_diagonal(m_in, 0.0)
    rng = np.random.RandomState(seed)
    pairs, scores = mine_train_pairs(m_out, m_in, threshold=threshold,
                                     neg_num=neg_num,
                                     max_positives=max_positives, rng=rng,
                                     stable=True)
    k = min(gt_topk, len(out_ids))
    gt_idx = np.argsort(-m_out, axis=1, kind="stable")[:, :k]
    gt_score = np.take_along_axis(m_out, gt_idx, axis=1)
    return pairs, scores, gt_idx, gt_score


def _device(out_ids, in_ids, vocab, **kw):
    rng = np.random.RandomState(kw.pop("seed", 7))
    return mine_pool_device(out_ids, in_ids, vocab,
                            threshold=kw.pop("threshold", 0.8),
                            neg_num=kw.pop("neg_num", 5),
                            gt_topk=kw.pop("gt_topk", 10),
                            max_positives=kw.pop("max_positives", None),
                            rng=rng, **kw)


def _assert_equal(mined, host):
    pairs, scores, gt_idx, gt_score = host
    np.testing.assert_array_equal(mined.train_pairs, pairs)
    np.testing.assert_array_equal(mined.train_pair_scores, scores)
    np.testing.assert_array_equal(mined.gt_topk_index, gt_idx)
    np.testing.assert_array_equal(mined.gt_topk_score, gt_score)


@pytest.fixture(scope="module")
def uci_ids(reference_path):
    train = read_corpus_lines(
        str(reference_path / "resources/UCI_13/12/train.link_prediction"))[:400]
    tok = Tokenizer.from_vocab_file(
        str(reference_path / "vocabs/UCI_13/12/vocab.json"), timestep=12)
    in_sets, out_sets = parse_inout_sets(train, train)
    to_ids = lambda ss: [[tok.token_to_id(t) for t in s] for s in ss]  # noqa: E731
    return to_ids(out_sets), to_ids(in_sets), len(tok)


def test_device_mining_bitwise_uci(uci_ids):
    out_ids, in_ids, vocab = uci_ids
    mined = _device(out_ids, in_ids, vocab, row_block=128)
    _assert_equal(mined, _host_stable(out_ids, in_ids, vocab))
    assert len(mined.train_pairs) > 0
    assert mined.stats.collision_free
    # no threshold-band ambiguity on UCI; boundary-tie fallbacks are
    # expected (exact ties straddling the download boundary must go to
    # the host — TPU division noise breaks top_k's index tie rule) but
    # must stay a small minority
    assert mined.stats.fallback_reasons["ambiguous_threshold"] == 0
    assert mined.stats.fallback_rows < 0.05 * mined.stats.n_pool


def test_device_mining_synthetic_ties_and_blocks():
    """Adversarial synthetic pool: heavy ties (shared sets), zero rows,
    zero-sim backfill, non-divisible row blocks."""
    rng = np.random.RandomState(0)
    vocab = 97  # forces multi-chunk? no — single chunk; small is fine
    out_ids, in_ids = [], []
    base = list(range(10))
    for i in range(67):
        if i % 7 == 0:
            out_ids.append(list(base))            # many identical sets
        elif i % 7 == 1:
            out_ids.append([])                    # empty output set
        else:
            out_ids.append(rng.choice(vocab, size=rng.randint(1, 12),
                                      replace=False).tolist())
        in_ids.append(rng.choice(vocab, size=rng.randint(1, 20),
                                 replace=False).tolist()
                      if i % 5 else list(base))   # tied history sets
    mined = _device(out_ids, in_ids, vocab, row_block=16)
    _assert_equal(mined, _host_stable(out_ids, in_ids, vocab))


def test_device_mining_exact_threshold_falls_back():
    """A pair at exactly Jaccard 0.8 sits inside the f32 ambiguity band:
    the row must fall back to exact host mining and still be bit-equal."""
    out_ids = [[1, 2, 3, 4, 5], [1, 2, 3, 4], [2, 3, 4, 5, 6],
               [1, 2, 3, 4, 5, 6, 7], [10, 11], [1, 2, 3, 4, 5]]
    in_ids = [[1, 2], [1, 3], [9, 4], [2, 7], [5, 6], [8]]
    # rows 0/1: inter 4, union 5 -> exactly 0.8 (not > 0.8 on host)
    mined = _device(out_ids, in_ids, 16)
    _assert_equal(mined, _host_stable(out_ids, in_ids, 16))
    assert mined.stats.fallback_reasons["ambiguous_threshold"] >= 2


def test_device_mining_positive_overflow_falls_back():
    """More positives than k_pos in one row -> exact host fallback."""
    shared = list(range(8))
    out_ids = [shared[:] for _ in range(12)]      # everyone identical
    in_ids = [[i, i + 20] for i in range(12)]
    mined = _device(out_ids, in_ids, 40, k_pos=4)
    _assert_equal(mined, _host_stable(out_ids, in_ids, 40))
    assert mined.stats.fallback_reasons["positives_overflow"] == 12


def test_device_mining_max_positives_cap():
    """dialog's cap (max_positives=4) without fallback: the capped
    positive list is the first 4 ascending indices, device k_pos == 4."""
    shared = list(range(8))
    out_ids = [shared[:] for _ in range(12)]
    in_ids = [[i, i + 20] for i in range(12)]
    mined = _device(out_ids, in_ids, 40, max_positives=4)
    _assert_equal(mined, _host_stable(out_ids, in_ids, 40,
                                      max_positives=4))
    assert mined.stats.fallback_rows == 0
    anchors, counts = np.unique(mined.train_pairs[:, 0], return_counts=True)
    assert counts.max() <= 4


def test_device_mining_multi_vocab_chunks():
    """Vocabulary wider than one chunk exercises the fused two-matrix
    scan accumulation."""
    rng = np.random.RandomState(3)
    vocab = 1000
    out_ids = [rng.choice(vocab, size=rng.randint(1, 30),
                          replace=False).tolist() for _ in range(40)]
    in_ids = [rng.choice(vocab, size=rng.randint(1, 50),
                         replace=False).tolist() for _ in range(40)]
    mined = _device(out_ids, in_ids, vocab, vocab_chunk=256, row_block=32)
    _assert_equal(mined, _host_stable(out_ids, in_ids, vocab))


def test_compare_engine_bitwise(uci_ids):
    """The id-compare intersection engine (VPU all-pairs equality) must
    give identical mining to the one-hot matmul engine and the host."""
    out_ids, in_ids, vocab = uci_ids
    out_ids, in_ids = out_ids[:150], in_ids[:150]
    host = _host_stable(out_ids, in_ids, vocab)
    forced = _device(out_ids, in_ids, vocab, engine="compare", row_block=64)
    _assert_equal(forced, host)
    assert forced.stats.engines == ("compare", "compare")
    auto = _device(out_ids, in_ids, vocab, row_block=64)
    _assert_equal(auto, host)


def test_annotate_pool_device_mode(tmp_path, reference_path):
    """annotate_pool(device_mining=True) end-to-end on the committed UCI
    resources subset: same artifacts as the stable host algorithm."""
    import shutil

    src = reference_path / "resources/UCI_13/12"
    res = tmp_path / "res"
    res.mkdir()
    train = read_corpus_lines(str(src / "train.link_prediction"))[:200]
    (res / "train.link_prediction").write_text("\n".join(train) + "\n")
    for f in ("test.link_prediction", "test_gt.link_prediction",
              "val.link_prediction", "val_gt.link_prediction"):
        shutil.copy(src / f, res / f)
    tok = Tokenizer.from_vocab_file(
        str(reference_path / "vocabs/UCI_13/12/vocab.json"), timestep=12)

    from rag4dyg_tpu.pool.annotate import annotate_pool
    dev = annotate_pool(str(res), tok, seed=3, device_mining=True)
    host = annotate_pool(str(res), tok, seed=3, device_mining=False)

    assert dev.train_out_scores is None and dev.n_pool == 200
    # pairs: device == stable host mining; the committed host path keeps
    # numpy's unstable tie order, so compare against an explicit stable
    # re-run rather than `host.train_pairs`
    in_sets, out_sets = parse_inout_sets(train, train)
    ids = lambda ss: [[tok.token_to_id(t) for t in s] for s in ss]  # noqa: E731
    _assert_equal(
        type("M", (), {"train_pairs": dev.train_pairs,
                       "train_pair_scores": dev.train_pair_scores,
                       "gt_topk_index": dev.gt_topk_index,
                       "gt_topk_score": dev.gt_topk_score})(),
        _host_stable(ids(out_sets), ids(in_sets), len(tok), seed=3))
    # eval matrices are mining-independent and stay bit-equal
    np.testing.assert_array_equal(dev.test_scores, host.test_scores)
    np.testing.assert_array_equal(dev.val_scores, host.val_scores)
    # gt top-k SCORES match the host path even where tie order differs
    np.testing.assert_array_equal(dev.gt_topk_score, host.gt_topk_score)
