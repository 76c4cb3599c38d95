"""Raw-data preprocessing: event streams -> time-sliced edge tables.

Re-implements the shared idiom of the reference's per-dataset one-off
scripts (reference: all_data/*/pre/preprocess.py and
all_data/*/data_trans.py — the DySAT-style slicing plus the
train-node-set filtering) as two reusable passes:

  1. ``slice_events`` — assign each raw event a snapshot id
     (``timestamp``) by slicing the time axis into fixed-width windows
     between a start offset and an end trim, deduplicating unordered node
     pairs within a slice (the reference accumulates a ``nx.MultiGraph``
     per slice then collapses it through ``nx.Graph``, keeping the LAST
     edge's date — reference: all_data/uci/pre/UCI_13/preprocess.py:59-103,
     157-168).
  2. ``make_timestep_table`` — the ``data_trans`` pass: restrict to
     events with ``timestamp <= T``, optionally drop rows whose endpoints
     are unseen in the training window (reference:
     all_data/uci/data_trans.py:37-55; hepth and reddit skip the filter),
     re-zero ``ts``, and append the 1-based ``idx`` column of the
     ``ml_*.csv`` format.

Per-dataset slicing parameters (slice width, start/end offsets, filter
mode, val gap) are tabulated in ``PREPROCESS_PARAMS``; raw downloads are
not bundled, so these run on user-supplied event files.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import numpy as np
import pandas as pd


@dataclasses.dataclass(frozen=True)
class PreprocessParams:
    """Slicing + split knobs for one dataset (reference script values)."""

    slice_len: float              # window width (seconds or native units)
    start_offset: float = 0.0     # skipped from the start of the stream
    end_trim: float = 0.0         # trimmed from the end of the stream
    filter_to_train_nodes: bool = True   # data_trans isin() filter
    val_gap: int = 1              # train window ends at T - 1 - (val_gap - 1)
    undirected_dedup: bool = True  # collapse (u,i)/(i,u) within a slice
    # UCI/dialog/hepth data_trans re-zero ts to the stream start
    # (``data['ts'] = data['ori_time'] - min(...)``); wikiv2/reddit/enron
    # ship that line COMMENTED OUT and keep the raw time
    # (all_data/wikiv2/data_trans.py:45-46, reddit:44-46, enron readme +
    # script). Absolute shift cancels in the min-max-normalized query
    # times, but the emitted ml_*.csv ts column must match byte-for-byte.
    rezero_ts: bool = True


DAY = 86400.0

PREPROCESS_PARAMS: Dict[str, PreprocessParams] = {
    # reference: all_data/uci/pre/UCI_13/preprocess.py:59-62 (10-day slices,
    # start +5d, end -60d), data_trans filter on, val at T-1
    "UCI_13": PreprocessParams(slice_len=10 * DAY, start_offset=5 * DAY,
                               end_trim=60 * DAY),
    # reference: all_data/dialog/data_trans.py:41 (train < T-2, no slicing —
    # dialog turns come pre-sliced), filter on
    "dialog": PreprocessParams(slice_len=1.0, val_gap=2,
                               undirected_dedup=False),
    # reference: all_data/hepth/pre/preprocess.py:106 (60-day slices,
    # 1993-05..1995-05 window), data_trans filter OFF
    "hepth": PreprocessParams(slice_len=60 * DAY,
                              filter_to_train_nodes=False),
    # reference: all_data/wikiv2/pre/preprocess.py:74 (2-day slices);
    # data_trans keeps raw ts (wikiv2/data_trans.py:45-46)
    "wikiv2": PreprocessParams(slice_len=2 * DAY, rezero_ts=False),
    # reference: all_data/enron/pre/preprocess.py:88 (45-unit slices);
    # data_trans keeps raw ts ("ts is the original time", enron readme)
    "enron": PreprocessParams(slice_len=45.0, rezero_ts=False),
    # reference: all_data/reddit/pre/preprocess.py:148 (30-day slices),
    # data_trans filter OFF, raw ts (reddit/data_trans.py:44-46)
    "reddit": PreprocessParams(slice_len=30 * DAY,
                               filter_to_train_nodes=False,
                               rezero_ts=False),
}


def window_events(events: pd.DataFrame, params: PreprocessParams
                  ) -> pd.DataFrame:
    """Time-sorted events restricted to [start_offset past stream start,
    end_trim before stream end] (reference: START_DATE/END_DATE window,
    all_data/uci/pre/UCI_13/preprocess.py:59-78). Ties keep input order
    (the reference's stable ``links.sort`` over the file order)."""
    ev = events.sort_values("time", kind="stable").reset_index(drop=True)
    t0, t1 = ev["time"].min(), ev["time"].max()
    start = t0 + params.start_offset
    end = t1 - params.end_trim
    ev = ev[(ev["time"] >= start) & (ev["time"] <= end)].copy()
    ev["_start"] = start
    return ev.reset_index(drop=True)


def first_seen_remap(events: pd.DataFrame) -> pd.DataFrame:
    """Remap node ids to first-appearance rank over the (windowed,
    time-sorted) stream, u before i within one event.

    This reproduces the composition of the reference's two remaps (raw
    id -> file-order rank at read time, then the slice-graph ``remap()``
    over carried-forward node insertion order —
    all_data/uci/pre/UCI_13/preprocess.py:30-39,105-135): the final id is
    exactly the node's first-appearance rank in the sorted in-window
    stream.
    """
    ids: Dict = {}
    for a, b in zip(events["u"].to_numpy(), events["i"].to_numpy()):
        if a not in ids:
            ids[a] = len(ids)
        if b not in ids:
            ids[b] = len(ids)
    out = events.copy()
    out["u"] = out["u"].map(ids)
    out["i"] = out["i"].map(ids)
    return out


def slice_events(events: pd.DataFrame, params: PreprocessParams,
                 remap: bool = False) -> pd.DataFrame:
    """Events (columns u, i, time) -> snapshot table (u, i, ts, timestamp).

    ``remap=True`` renumbers nodes to first-appearance rank over the
    windowed stream (the reference's id space for datasets whose raw ids
    are arbitrary — see ``first_seen_remap``).

    ``time`` is the raw event time in the units ``params`` is expressed
    in. Events before ``start_offset`` past the stream start are dropped;
    the first event past ``end_trim`` before the stream end closes the
    stream (the reference ``break``s there, keeping nothing after).
    Within a slice, unordered duplicate pairs collapse to the LAST
    occurrence (nx.MultiGraph -> nx.Graph attribute semantics).
    """
    ev = window_events(events, params)
    start = ev["_start"].iloc[0] if len(ev) else 0.0
    ev = ev.drop(columns=["_start"])
    if remap:
        ev = first_seen_remap(ev)
    ev["timestamp"] = ((ev["time"] - start) // params.slice_len).astype(int)

    if params.undirected_dedup:
        lo = np.minimum(ev["u"], ev["i"])
        hi = np.maximum(ev["u"], ev["i"])
        ev["_pair_lo"], ev["_pair_hi"] = lo, hi
        ev = ev.drop_duplicates(subset=["timestamp", "_pair_lo", "_pair_hi"],
                                keep="last")
        ev = ev.drop(columns=["_pair_lo", "_pair_hi"])

    out = ev.rename(columns={"time": "ts"})[["u", "i", "ts", "timestamp"]]
    return out.reset_index(drop=True)


def make_timestep_table(data: pd.DataFrame, timestep: int,
                        params: PreprocessParams) -> pd.DataFrame:
    """The data_trans pass: emit the ``ml_*.csv`` table for one timestep.

    ``data`` columns: u, i, ts, timestamp (label optional, defaults 0).
    """
    data = data.copy()
    if "label" not in data:
        data["label"] = 0
    if params.rezero_ts:
        data["ts"] = data["ts"] - data["ts"].min()
    data = data.sort_values(by="ts", kind="stable")
    data = data[["u", "i", "ts", "label", "timestamp"]]

    cur = data[data["timestamp"] <= timestep]
    if params.filter_to_train_nodes:
        train = cur[cur["timestamp"] < timestep - (params.val_gap - 1) - 1]
        train_nodes = set(train["u"]).union(train["i"])
        cur = cur[cur["u"].isin(train_nodes) & cur["i"].isin(train_nodes)]
    cur = cur.copy()
    cur["idx"] = range(1, len(cur) + 1)
    cur.index = range(len(cur))
    return cur


def write_timestep_artifacts(table: pd.DataFrame, out_dir: str, name: str,
                             feat_dim: int = 172,
                             node_features: Optional[np.ndarray] = None
                             ) -> None:
    """ml_<name>.csv + zero node/edge feature arrays (reference emits
    zeros when the dataset has no real features)."""
    os.makedirs(out_dir, exist_ok=True)
    table.to_csv(os.path.join(out_dir, f"ml_{name}.csv"), index=True)
    nodes = set(table["u"]).union(table["i"])
    if node_features is None:
        node_features = np.zeros((len(nodes), feat_dim))
    np.save(os.path.join(out_dir, f"ml_{name}_node.npy"), node_features)
    np.save(os.path.join(out_dir, f"ml_{name}.npy"),
            np.zeros((len(table), feat_dim)))


def preprocess_events(events: pd.DataFrame, dataset: str, timestep: int,
                      out_dir: Optional[str] = None) -> pd.DataFrame:
    """events (u, i, time) -> sliced, split ml table for ``dataset``."""
    params = PREPROCESS_PARAMS[dataset]
    sliced = slice_events(events, params)
    table = make_timestep_table(sliced, timestep, params)
    if out_dir is not None:
        write_timestep_artifacts(table, out_dir,
                                 dataset.split("_")[0].lower())
    return table
