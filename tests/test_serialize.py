"""Golden-file parity for the sequence corpus builder.

The committed reference artifacts (resources/{UCI_13,dialog,hepth}) were
produced by numpy quicksort whose tie order among equal-timestamp edges is
version-dependent, so comparison canonicalizes each line into
(ego, per-time-token neighbor multiset) before comparing. Everything else —
line count, line order, ego ids, time structure, neighbor multisets,
vocab — must match exactly.
"""

import collections
import json
import os
import re
import tempfile

import pytest

from rag4dyg_tpu.data.serialize import prepare_dataset, read_corpus_lines

CASES = [
    # name, csv relpath, resources relpath, timestep, dialog_split, hepth_style
    ("UCI_13", "all_data/uci/12/ml_uci.csv", "resources/UCI_13/12", 12, False, False),
    ("dialog", "all_data/dialog/15/ml_dialog.csv", "resources/dialog/15", 15, True, False),
    ("hepth", "all_data/hepth/11/ml_hepth.csv", "resources/hepth/11", 11, False, True),
]

TIME_RE = re.compile(r"<\|time\d+\|>")


def canonicalize(line):
    """(tokens-before-first-group, [(group_token, neighbor multiset), ...])"""
    toks = line.split()
    head = []
    groups = []
    cur = None
    for t in toks:
        if TIME_RE.fullmatch(t) or t.startswith("<|") or t == "[PAD]":
            groups.append((t, collections.Counter()))
            cur = groups[-1][1]
        elif cur is None:
            head.append(t)
        else:
            cur[t] += 1
    time_groups = [g for g, _ in groups if TIME_RE.fullmatch(g)]
    his_end = next((k for k, (g, _) in enumerate(groups)
                    if g == "<|endofhistory|>"), None)
    n_history_times = sum(1 for g, _ in groups[:his_end or 0]
                          if TIME_RE.fullmatch(g))
    if his_end is not None and n_history_times == 1:
        # Single-timestep ego: the reference assigns the tie-order-dependent
        # "last" edge as the target, so only the union multiset is canonical.
        union = collections.Counter()
        for _, c in groups:
            union.update(c)
        return tuple(head), tuple(time_groups), tuple(sorted(union.items()))
    return tuple(head), tuple((g, tuple(sorted(c.items()))) for g, c in groups)


@pytest.mark.parametrize("name,csv,res,t,dia,hep", CASES,
                         ids=[c[0] for c in CASES])
def test_corpus_parity(reference_path, name, csv, res, t, dia, hep):
    with tempfile.TemporaryDirectory() as td:
        prepare_dataset(str(reference_path / csv), td, t, dia, hep)
        for fname in ["train.link_prediction", "val.link_prediction",
                      "val_gt.link_prediction", "test.link_prediction",
                      "test_gt.link_prediction"]:
            ours = read_corpus_lines(os.path.join(td, fname))
            ref = read_corpus_lines(str(reference_path / res / fname))
            assert len(ours) == len(ref), fname
            for i, (a, b) in enumerate(zip(ours, ref)):
                assert canonicalize(a) == canonicalize(b), f"{fname}:{i}"

        ours_vocab = json.load(open(os.path.join(td, "vocab.json")))
        ref_vocab = json.load(
            open(reference_path / "vocabs" / name / str(t) / "vocab.json"))
        assert ours_vocab == ref_vocab


def test_tokenizer_layout(reference_path):
    """Token-id layout must match the committed reference tokenizer."""
    from rag4dyg_tpu.data.vocab import Tokenizer

    tok = Tokenizer.from_vocab_file(
        str(reference_path / "vocabs/UCI_13/12/vocab.json"), timestep=12,
        with_mask_token=False)
    ref = json.load(open(reference_path / "tokenizers/UCI_13/12/tokenizer.json"))
    # node vocab ids
    for t, i in ref["model"]["vocab"].items():
        assert tok.token_to_id(t) == i
    # special/added token ids
    for added in ref["added_tokens"]:
        assert tok.token_to_id(added["content"]) == added["id"], added["content"]
    assert tok.vocab_size == 1781
    assert len(tok) == 1800  # 1781 nodes + eot + 4 structural + 13 time + PAD


def test_tokenizer_roundtrip(reference_path):
    from rag4dyg_tpu.data.vocab import Tokenizer

    tok = Tokenizer.from_vocab_file(
        str(reference_path / "vocabs/UCI_13/12/vocab.json"), timestep=12)
    line = read_corpus_lines(
        str(reference_path / "resources/UCI_13/12/train.link_prediction"))[0]
    ids = tok.encode(line)
    assert tok.decode(ids) == line
    # left truncation keeps the tail
    assert tok.encode(line, max_len=5) == ids[-5:]


def test_pad_batch():
    import numpy as np

    from rag4dyg_tpu.data.vocab import pad_batch

    out = pad_batch([[1, 2, 3], [4]], pad_id=9, multiple_of=4)
    assert out.shape == (2, 4)
    assert out.tolist() == [[1, 2, 3, 9], [4, 9, 9, 9]]
    assert out.dtype == np.int32
