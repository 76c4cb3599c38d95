"""Annotation-engine parity: the device Jaccard matrices and pair mining
must match a direct transliteration of the reference's pure-Python pass
(reference: retrieval_data_annotation.py) bit-for-bit."""

import numpy as np
import pytest

from rag4dyg_tpu.data.serialize import read_corpus_lines
from rag4dyg_tpu.data.vocab import Tokenizer
from rag4dyg_tpu.pool.annotate import mine_train_pairs
from rag4dyg_tpu.pool.jaccard import (jaccard_matrix, parse_inout_sets,
                                      reference_pairs_matrix)

_reference_matrix = reference_pairs_matrix  # shared transliteration oracle


@pytest.fixture(scope="module")
def uci(reference_path):
    train = read_corpus_lines(
        str(reference_path / "resources/UCI_13/12/train.link_prediction"))[:400]
    tok = Tokenizer.from_vocab_file(
        str(reference_path / "vocabs/UCI_13/12/vocab.json"), timestep=12)
    return train, tok


def test_jaccard_matrix_bitwise(uci):
    train, tok = uci
    in_sets, out_sets = parse_inout_sets(train, train)
    ours = jaccard_matrix(out_sets, out_sets, tok.token_to_id, len(tok),
                          vocab_chunk=512)
    ref = _reference_matrix(out_sets, out_sets)
    np.testing.assert_array_equal(ours, ref)

    ours_in = jaccard_matrix(in_sets, in_sets, tok.token_to_id, len(tok))
    ref_in = _reference_matrix(in_sets, in_sets)
    np.testing.assert_array_equal(ours_in, ref_in)


def test_jaccard_matrix_sharded_bitwise(uci):
    """Mesh-sharded pool axis (8 virtual devices, non-divisible M) must be
    bit-equal to the single-device path."""
    from rag4dyg_tpu.parallel import make_mesh
    train, tok = uci
    _, out_sets = parse_inout_sets(train[:101], train[:101])
    mesh = make_mesh(n_data=8, n_model=1)
    ours = jaccard_matrix(out_sets, out_sets, tok.token_to_id, len(tok),
                          vocab_chunk=512, mesh=mesh)
    ref = jaccard_matrix(out_sets, out_sets, tok.token_to_id, len(tok),
                         vocab_chunk=512)
    np.testing.assert_array_equal(ours, ref)


def test_jaccard_row_blocking_bitwise(uci):
    """Query-axis row blocks must not change the result."""
    from rag4dyg_tpu.pool.jaccard import intersection_counts
    train, tok = uci
    _, out_sets = parse_inout_sets(train[:90], train[:90])
    ids = [[tok.token_to_id(t) for t in s] for s in out_sets]
    a = intersection_counts(ids, ids, len(tok), row_block=32)
    b = intersection_counts(ids, ids, len(tok), row_block=8192)
    np.testing.assert_array_equal(a, b)


def test_jaccard_empty_sets(uci):
    _, tok = uci
    sets = [set(), {"1", "2"}, {"2"}]
    m = jaccard_matrix(sets, sets, tok.token_to_id, len(tok))
    assert m[0, 1] == 0.0 and m[0, 0] == 0.0
    assert m[1, 2] == 0.5
    assert m[1, 1] == 1.0


def test_mine_train_pairs_matches_reference(uci):
    """Pair mining with a fixed RNG replays the reference algorithm."""
    train, tok = uci
    in_sets, out_sets = parse_inout_sets(train, train)
    m_out = jaccard_matrix(out_sets, out_sets, tok.token_to_id, len(tok))
    m_in = jaccard_matrix(in_sets, in_sets, tok.token_to_id, len(tok))
    np.fill_diagonal(m_out, 0.0)
    np.fill_diagonal(m_in, 0.0)

    rng = np.random.RandomState(7)
    pairs, scores = mine_train_pairs(m_out, m_in, threshold=0.8, neg_num=5,
                                     max_positives=None, rng=rng)

    # reference transliteration (retrieval_data_annotation.py:43-85)
    rng2 = np.random.RandomState(7)
    exp_pairs, exp_scores = [], []
    for i in range(m_out.shape[0]):
        pos_indices = np.where(m_out[i] > 0.8)[0].tolist()
        if not pos_indices:
            continue
        sorted_in = np.argsort(-m_in[i])
        negs, count = [], 0
        for idx in sorted_in:
            if idx not in pos_indices and m_out[i, idx] > 0:
                negs.append(idx)
                count += 1
            if count == 5:
                break
        if len(negs) < 5:
            for idx in sorted_in:
                if idx not in pos_indices and m_out[i, idx] == 0:
                    negs.append(idx)
                    count += 1
                if count == 5:
                    break
        for p in pos_indices:
            n = rng2.choice(negs)
            exp_pairs.append((i, p, n))
            exp_scores.append((m_out[i, p], m_out[i, n]))

    assert pairs.tolist() == [list(p) for p in exp_pairs]
    np.testing.assert_array_equal(scores, np.asarray(exp_scores))
    assert len(pairs) > 0  # the subset must actually exercise mining


def test_max_positives_cap(uci):
    train, tok = uci
    _, out_sets = parse_inout_sets(train, train)
    m = jaccard_matrix(out_sets, out_sets, tok.token_to_id, len(tok))
    np.fill_diagonal(m, 0.0)
    rng = np.random.RandomState(0)
    pairs, _ = mine_train_pairs(m, m, threshold=0.8, neg_num=5,
                                max_positives=4, rng=rng)
    anchors, counts = np.unique(pairs[:, 0], return_counts=True)
    assert counts.max() <= 4
