"""Temporal-sequence corpus builder.

Converts a dynamic-graph edge table ``ml_<name>.csv`` (columns
``u,i,ts,label,timestamp,idx``) into the text corpus consumed by the model:

  * ``train.link_prediction``      — one serialized ego-history+target line
                                     per training ego node
  * ``val/test.link_prediction``   — history-only query lines
  * ``val/test_gt.link_prediction``— ground-truth target blocks
  * ``vocab.json``                 — node-id -> contiguous-index map

Output is semantically identical to the reference generator
(reference: csv2resources.py — verified by canonicalized golden-file tests
against the committed resources/{UCI_13,dialog,hepth} artifacts). The one
deliberate delta: we sort the edge table with a *stable* sort, while the
reference relies on numpy quicksort whose tie order among equal-``ts`` rows
varies across numpy versions — so neighbor order *within* a timestep block
can differ from the committed artifacts. All downstream supervision and
metrics are set-based per timestep, so this carries no semantic content;
stable sort makes our output reproducible across library versions. A line
looks like::

  <|endoftext|> <|history|> 0 <|time0|> 1 108 <|time1|> 670 ... \
  <|endofhistory|> <|pre|> <|time8|> 71 <|endofpre|> <|endoftext|>

Serialization is host-side text work (runs once per dataset); the hot path
downstream is tokenized, padded id arrays.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Tuple

import pandas as pd

from rag4dyg_tpu.data.vocab import (
    SPECIAL_BOS,
    SPECIAL_EHIS,
    SPECIAL_EPRE,
    SPECIAL_HIS,
    SPECIAL_PRE,
    build_vocab,
    time_tokens,
)


@dataclass
class CorpusSplits:
    train_lines: List[str]
    val_lines: List[str]
    val_gt_lines: List[str]
    test_lines: List[str]
    test_gt_lines: List[str]
    vocab: Dict[str, int]


def _reverse_edges(df: pd.DataFrame) -> pd.DataFrame:
    rev = df.copy()
    rev["u"] = df["i"]
    rev["i"] = df["u"]
    return rev


def split_edge_table(data: pd.DataFrame, timestep: int, dialog_split: bool
                     ) -> Tuple[pd.DataFrame, ...]:
    """Temporal split into (train, val, val_inputs, test, test_inputs, full).

    Standard datasets: train ts<=T-2, val ts==T-1, test ts==T; training edges
    are symmetrized (u<->i). Dialog uses wider gaps (train<=T-4, val==T-2)
    and unsorted history concatenation (reference: csv2resources.py:69-113).
    """
    max_t = int(data["timestamp"].max())
    assert max_t == timestep, f"csv max timestamp {max_t} != configured {timestep}"

    if dialog_split:
        data_train = data[data["timestamp"] <= max_t - 4]
        data_val_input = data[data["timestamp"] < max_t - 2]
        data_val = data[data["timestamp"] == max_t - 2]
        data_test_input = data[data["timestamp"] < max_t]
        data_test = data[data["timestamp"] == max_t]
        data_reverse = _reverse_edges(data_train)
        new_train = pd.concat([data_train, data_reverse], ignore_index=True)
        new_train = new_train.sort_values(by=["ts"], kind="stable")
        val_inputs = pd.concat([data_val_input, data_reverse], ignore_index=True)
        test_inputs = pd.concat([data_test_input, data_reverse], ignore_index=True)
        full_data = pd.concat([test_inputs, data_test], ignore_index=True)
    else:
        data_train = data[data["timestamp"] <= max_t - 2]
        data_val = data[data["timestamp"] == max_t - 1]
        data_test = data[data["timestamp"] == max_t]
        data_reverse = _reverse_edges(data_train)
        new_train = pd.concat([data_train, data_reverse], ignore_index=True)
        new_train = new_train.sort_values(by=["ts"], kind="stable")
        train_val = pd.concat([new_train, data_val], ignore_index=True)
        full_data = pd.concat([train_val, data_test], ignore_index=True)
        val_inputs = new_train
        test_inputs = train_val

    return new_train, data_val, val_inputs, data_test, test_inputs, full_data


def _serialize_train_user(user_id: int, user_data: pd.DataFrame,
                          times: List[str]) -> str | None:
    """One training line: full history by timestep, last active timestep as
    the prediction target (reference: csv2resources.py:117-164). Egos active
    at a single timestep==0 are dropped; single-timestep egos at t>0 use
    their last interaction as the target."""
    uniq_t = user_data["timestamp"].unique()
    min_t = int(user_data["timestamp"].min())
    max_t = int(user_data["timestamp"].max())

    parts = [SPECIAL_BOS, SPECIAL_HIS, str(int(user_id))]
    out_parts = [SPECIAL_PRE]

    if len(uniq_t) < 2:
        if max_t <= 0:
            return None
        items = [str(int(i)) for i in user_data["i"].tolist()]
        parts.append(times[max_t - 1])
        parts.extend(items[:-1])
        out_parts.extend([times[max_t], items[-1], SPECIAL_EPRE, SPECIAL_BOS])
    else:
        inputs_data = user_data[user_data["timestamp"] < max_t]
        outputs_data = user_data[user_data["timestamp"] == max_t]
        for t in range(min_t, max_t):
            parts.append(times[t])
            step = inputs_data[inputs_data["timestamp"] == t]
            parts.extend(str(int(v)) for v in step["i"].tolist())
        out_parts.append(times[max_t])
        out_parts.extend(str(int(v)) for v in outputs_data["i"].tolist())
        out_parts.extend([SPECIAL_EPRE, SPECIAL_BOS])

    return " ".join(parts) + " " + SPECIAL_EHIS + " " + " ".join(out_parts)


def _serialize_eval_split(data: pd.DataFrame, history: pd.DataFrame,
                          times: List[str], hepth_style: bool
                          ) -> Tuple[List[str], List[str]]:
    """Query/gt lines for val or test (reference: csv2resources.py:167-206).

    hepth-style queries carry only the previous time token (its val/test
    egos may lack any training history)."""
    lines, gt_lines = [], []
    for user_id, user_data in data.groupby("u"):
        parts = [SPECIAL_BOS, SPECIAL_HIS, str(int(user_id))]
        user_time = int(user_data["timestamp"].unique().tolist()[0])
        hist = None if hepth_style else history[history["u"] == user_id]
        if hepth_style or len(hist) == 0:
            # hepth always; others degrade to the time-only query for the
            # rare ego with no prior history (reddit has a handful — the
            # reference would crash there: int(NaN) at
            # csv2resources.py:186-187, and its committed launcher never
            # ran reddit/enron/wikiv2)
            parts.append(times[user_time - 1])
        else:
            min_t = int(hist["timestamp"].min())
            max_t = int(hist["timestamp"].max())
            for t in range(min_t, max_t + 1):
                parts.append(times[t])
                step = hist[hist["timestamp"] == t]
                parts.extend(str(int(v)) for v in step["i"].tolist())
        out_parts = [SPECIAL_PRE, times[user_time]]
        out_parts.extend(str(int(v)) for v in user_data["i"].tolist())
        out_parts.extend([SPECIAL_EPRE, SPECIAL_BOS])
        lines.append(" ".join(parts) + " " + SPECIAL_EHIS)
        gt_lines.append(" ".join(out_parts))
    return lines, gt_lines


def serialize_corpus(data: pd.DataFrame, timestep: int,
                     dialog_split: bool = False,
                     hepth_style: bool = False) -> CorpusSplits:
    """Full corpus build from a sorted-by-ts edge table."""
    data = data.sort_values(by=["ts"], kind="stable")
    times = time_tokens(timestep)

    new_train, data_val, val_inputs, data_test, test_inputs, full_data = \
        split_edge_table(data, timestep, dialog_split)

    train_lines = []
    for user_id, user_data in new_train.groupby("u"):
        line = _serialize_train_user(user_id, user_data, times)
        if line is not None:
            train_lines.append(line)

    val_lines, val_gt = _serialize_eval_split(data_val, val_inputs, times, hepth_style)
    test_lines, test_gt = _serialize_eval_split(data_test, test_inputs, times, hepth_style)

    vocab = build_vocab(list(full_data["u"]) + list(full_data["i"]))
    return CorpusSplits(train_lines, val_lines, val_gt, test_lines, test_gt, vocab)


def prepare_dataset(csv_path: str, out_dir: str, timestep: int,
                    dialog_split: bool = False, hepth_style: bool = False,
                    vocab_dir: str | None = None) -> CorpusSplits:
    """Read ``ml_*.csv``, serialize all splits, write artifacts to disk."""
    data = pd.read_csv(csv_path, index_col=0)
    splits = serialize_corpus(data, timestep, dialog_split, hepth_style)

    os.makedirs(out_dir, exist_ok=True)
    name_to_lines = {
        "train.link_prediction": splits.train_lines,
        "val.link_prediction": splits.val_lines,
        "val_gt.link_prediction": splits.val_gt_lines,
        "test.link_prediction": splits.test_lines,
        "test_gt.link_prediction": splits.test_gt_lines,
    }
    for fname, lines in name_to_lines.items():
        with open(os.path.join(out_dir, fname), "w") as f:
            for ln in lines:
                f.write(ln + "\n")

    vocab_dir = vocab_dir or out_dir
    os.makedirs(vocab_dir, exist_ok=True)
    with open(os.path.join(vocab_dir, "vocab.json"), "w") as f:
        json.dump(splits.vocab, f, indent=4)
    return splits


def read_corpus_lines(path: str) -> List[str]:
    """Non-empty lines of a corpus file (reference line-filter semantics)."""
    with open(path, encoding="utf-8") as f:
        return [ln for ln in f.read().splitlines() if len(ln) > 0 and not ln.isspace()]
