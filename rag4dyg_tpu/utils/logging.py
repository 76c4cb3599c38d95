"""Run logging & result sinks.

The reference's observability is wandb (with a committed API key — not
reproduced), tensorboardX, per-run Python log files, and CSV result sinks
keyed by a concatenated hyperparameter run-name (reference:
main_SimpleDyG.py:400-431, utils/Evaluation_SimpleDyG.py:183-206,
train/train_retriever.py:486-520). Here the same surface is local-first:

  * ``RunLogger`` — per-run directory with a python-logging file handler,
    a ``scalars.jsonl`` stream (one JSON object per logged step — the
    wandb/tensorboard replacement, trivially plottable), and ``meta.json``
    capturing the full config.
  * ``append_result_row`` — append-a-row CSV sinks for cross-run result
    aggregation (seed sweeps), with stable header union handling.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict, Mapping, Optional


def run_name(prefix: str, hparams: Mapping[str, Any]) -> str:
    """Concatenated name:value run identity (reference style, but kept
    filesystem-safe)."""
    parts = [f"{k}-{v}" for k, v in sorted(hparams.items())]
    return prefix + "_" + "_".join(parts)[:180]


class RunLogger:
    def __init__(self, out_dir: str, name: str = "run",
                 config: Optional[Any] = None):
        self.dir = os.path.join(out_dir, "logs")
        os.makedirs(self.dir, exist_ok=True)
        self.name = name
        self._scalars_path = os.path.join(self.dir, "scalars.jsonl")
        self._scalars = open(self._scalars_path, "a", buffering=1)

        self.logger = logging.getLogger(f"rag4dyg_tpu.run.{name}")
        self.logger.setLevel(logging.INFO)
        handler = logging.FileHandler(os.path.join(self.dir, f"{name}.log"))
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"))
        self.logger.addHandler(handler)
        self._handler = handler

        if config is not None:
            cfg = (dataclasses.asdict(config)
                   if dataclasses.is_dataclass(config) else dict(config))
            with open(os.path.join(self.dir, "meta.json"), "w") as f:
                json.dump({"name": name, "config": cfg,
                           "started": time.time()}, f, indent=2, default=str)

    def log_scalars(self, step: int, values: Mapping[str, float]) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in values.items()})
        self._scalars.write(json.dumps(rec) + "\n")

    def info(self, msg: str, *a) -> None:
        self.logger.info(msg, *a)

    def close(self) -> None:
        self._scalars.close()
        self.logger.removeHandler(self._handler)
        self._handler.close()


def append_result_row(csv_path: str, row: Mapping[str, Any]) -> None:
    """Append a result row; grows the header union if new keys appear
    (rewrites in place only in that case)."""
    os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
    rows = []
    header: list = []
    if os.path.exists(csv_path):
        with open(csv_path, newline="") as f:
            reader = csv.DictReader(f)
            header = list(reader.fieldnames or [])
            rows = list(reader)
    new_keys = [k for k in row if k not in header]
    if new_keys:
        header = header + new_keys
        with open(csv_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=header)
            w.writeheader()
            for r in rows:
                w.writerow(r)
            w.writerow({k: row.get(k, "") for k in header})
    else:
        with open(csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=header)
            if not rows and os.path.getsize(csv_path) == 0:
                w.writeheader()
            w.writerow({k: row.get(k, "") for k in header})


def aggregate_seed_results(csv_path: str, metric_cols) -> Dict[str, float]:
    """Mean/std over a seed-sweep result CSV (reference seed aggregation,
    utils/Evaluation_generator.py:250-263)."""
    import statistics
    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    out: Dict[str, float] = {"n": float(len(rows))}
    for c in metric_cols:
        vals = [float(r[c]) for r in rows if r.get(c) not in (None, "")]
        if vals:
            out[f"{c}_mean"] = statistics.fmean(vals)
            out[f"{c}_std"] = (statistics.pstdev(vals) if len(vals) > 1
                               else 0.0)
    return out
