"""Per-pool-sequence query timestamps for the time-decay contrastive loss.

For each training ego, the query time is the timestamp of its latest
interaction *before* its final history timestep (≤ T-2); egos active at a
single timestep fall back to that timestep's latest interaction
(reference: get_train_query_time.py:17-25). The reference loops per ego
with repeated dataframe filters; here it's two vectorized groupby passes.

Times are divided by the dataset's ``time_scale`` (seconds/day etc.,
reference: get_train_query_time.py:47-54) and returned in training-line
order.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd


def ego_of_line(line: str) -> int:
    """Ego node id of a serialized sequence line
    (reference: get_train_query_time.py:35)."""
    return int(line.split("<|history|>")[1].split(" ")[1])


def compute_query_times(edge_table: pd.DataFrame, train_lines: Sequence[str],
                        timestep: int, time_scale: float) -> np.ndarray:
    """Query time per training line, scaled. ``edge_table`` is the raw
    ``ml_*.csv`` table (columns u,i,ts,timestamp)."""
    rev = edge_table.copy()
    rev["u"] = edge_table["i"]
    rev["i"] = edge_table["u"]
    ml = pd.concat([edge_table, rev], ignore_index=True)

    df = ml[ml["timestamp"] <= timestep - 2][["u", "ts", "timestamp"]]
    maxt = df.groupby("u")["timestamp"].transform("max")
    before = df[df["timestamp"] < maxt].groupby("u")["ts"].max()
    at = df[df["timestamp"] == maxt].groupby("u")["ts"].max()
    qt = before.reindex(at.index)
    qt = qt.fillna(at)

    egos = [ego_of_line(ln) for ln in train_lines]
    out = qt.reindex(egos).to_numpy(np.float64) / float(time_scale)
    if np.isnan(out).any():
        missing = [e for e in egos if e not in qt.index]
        raise ValueError(f"egos with no train-window edges: {missing[:5]}...")
    return out.astype(np.float32)


def compute_query_times_csv(csv_path: str, train_lines: Sequence[str],
                            timestep: int, time_scale: float) -> np.ndarray:
    return compute_query_times(pd.read_csv(csv_path), train_lines,
                               timestep, time_scale)
