"""CBOW word2vec (data/word2vec.py) — behavioral tests.

gensim is absent from the image, so there is no oracle; these tests pin
the reference-documented semantics (train_word2vec.py:15-44) that ARE
checkable: .abs corpus parsing, gensim's subsampling formula, vocab
ordering, and the embedding-quality property that distributionally
similar words end up close while unrelated words do not.
"""

import numpy as np
import pytest

from rag4dyg_tpu.data.word2vec import (Word2VecParams, _keep_probs,
                                       abs_corpus_features,
                                       build_epoch_examples, build_vocab,
                                       document_features, read_abs_files,
                                       tokenize, train_cbow)

ABS_TEMPLATE = """\
------------------------------------------------------------------------------
\\\\
Paper: hep-th/{pid}
From: someone
Date: Mon, 1 Jan 1996
Title: a title
\\\\
{abstract}
\\\\
"""


def _write_abs(tmp_path, pid, abstract):
    sub = tmp_path / "1996"
    sub.mkdir(exist_ok=True)
    (sub / f"{pid}.abs").write_text(
        ABS_TEMPLATE.format(pid=pid, abstract=abstract))


def test_read_abs_files_parses_reference_layout(tmp_path):
    _write_abs(tmp_path, "9601001", "gauge theory of strings")
    _write_abs(tmp_path, "9601002", "black hole entropy")
    docs, pids = read_abs_files(str(tmp_path))
    assert pids == ["9601001", "9601002"]
    assert "gauge theory of strings" in docs[0]
    assert "black hole entropy" in docs[1]


def test_tokenize_lowercases_and_splits_punct():
    assert tokenize("Black-Hole entropy, N=2.") == [
        "black", "-", "hole", "entropy", ",", "n", "=", "2", "."]


def test_vocab_sorted_by_descending_count_min_count():
    docs = [["a", "b", "a", "c"], ["a", "b"]]
    words, freq, w2i = build_vocab(docs, min_count=2)
    assert words == ["a", "b"]
    assert freq.tolist() == [3, 2]
    assert w2i == {"a": 0, "b": 1}


def test_keep_probs_gensim_formula():
    freq = np.array([900, 90, 10])
    p = _keep_probs(freq, sample=1e-2)
    frac = freq / freq.sum()
    expect = np.minimum((np.sqrt(frac / 1e-2) + 1) * 1e-2 / frac, 1.0)
    np.testing.assert_allclose(p, expect)
    assert p[0] < 1.0 and p[2] == 1.0
    np.testing.assert_array_equal(_keep_probs(freq, 0.0), np.ones(3))


def test_epoch_examples_windows_and_padding():
    params = Word2VecParams(window=2, sample=0.0)
    rng = np.random.default_rng(0)
    ids = [np.arange(5, dtype=np.int32)]
    ctx, cen = build_epoch_examples(ids, np.full(5, 10), params, rng)
    assert ctx.shape[1] == 4 and len(cen) == len(ctx)
    for row, c in zip(ctx, cen):
        valid = row[row >= 0]
        assert c not in valid          # center excluded from its context
        assert len(valid) >= 1
        assert np.all(np.abs(valid - c) <= 2)   # within max window


def test_cbow_learns_distributional_similarity():
    # Two interchangeable word families: fruit tokens share contexts,
    # tool tokens share contexts; cross-family similarity must be lower.
    rng = np.random.default_rng(3)
    fruits, tools = ["apple", "pear", "plum"], ["saw", "drill", "clamp"]
    docs = []
    for _ in range(300):
        f = fruits[rng.integers(3)]
        t = tools[rng.integers(3)]
        docs.append(["eat", "ripe", f, "juice", "sweet"])
        docs.append(["grip", "steel", t, "torque", "bench"])
    params = Word2VecParams(dim=24, window=2, epochs=8, sample=0.0,
                            batch=256, seed=0)
    vecs, w2i = train_cbow(docs, params)

    def cos(a, b):
        va, vb = vecs[w2i[a]], vecs[w2i[b]]
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))

    within = np.mean([cos("apple", "pear"), cos("apple", "plum"),
                      cos("saw", "drill"), cos("saw", "clamp")])
    across = np.mean([cos("apple", "saw"), cos("pear", "drill"),
                      cos("plum", "clamp")])
    assert within > across + 0.2, (within, across)


def test_train_cbow_deterministic():
    docs = [["a", "b", "c", "d", "e"]] * 20
    params = Word2VecParams(dim=8, window=2, epochs=2, batch=32, seed=7)
    v1, _ = train_cbow(docs, params)
    v2, _ = train_cbow(docs, params)
    np.testing.assert_array_equal(v1, v2)


def test_document_features_mean_and_oov():
    vecs = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    w2i = {"a": 0, "b": 1}
    feats = document_features([["a", "b"], ["zzz"]], vecs, w2i)
    np.testing.assert_allclose(feats[0], [0.5, 0.5])
    np.testing.assert_array_equal(feats[1], [0.0, 0.0])


def test_abs_corpus_features_end_to_end(tmp_path):
    for i in range(4):
        _write_abs(tmp_path, f"960100{i}",
                   "gauge theory strings duality " * 3)
    params = Word2VecParams(dim=8, window=2, epochs=1, batch=32, sample=0.0)
    feats = abs_corpus_features(str(tmp_path), params)
    assert set(feats) == {f"960100{i}" for i in range(4)}
    assert all(v.shape == (8,) for v in feats.values())


def test_train_cbow_empty_corpus_raises():
    with pytest.raises(ValueError):
        train_cbow([], Word2VecParams())


def test_cli_word2vec_node_ids_emits_loadable_npy(tmp_path):
    """--node-ids produces a plain .npy in node-row order consumable by
    --node-features (missing ids -> zero rows)."""
    from rag4dyg_tpu.cli import main
    for i in range(3):
        _write_abs(tmp_path, f"960100{i}", "gauge theory strings " * 4)
    order = tmp_path / "node_order.txt"
    order.write_text("9601001\nMISSING\n9601000\n")
    out = tmp_path / "node_features.npy"
    main(["word2vec", "--abs-dir", str(tmp_path), "--out", str(out),
          "--node-ids", str(order), "--dim", "8", "--w2v-epochs", "1",
          "--sample", "0"])
    feats = np.load(out)
    assert feats.shape == (3, 8)
    assert np.all(feats[1] == 0) and not np.all(feats[0] == 0)
