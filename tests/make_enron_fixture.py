"""Synthesize an enron-shaped event stream and emit its ml_enron.csv.

The reference ships enron preprocessing code (all_data/enron/pre/
preprocess.py, 45-unit slices) and a dataset config (timestep 16,
README.md:85-95) but does NOT commit the edge table, so the enron path
cannot be validated against real data. This script builds a synthetic
DyTAG-style stream — a few hundred actors with power-law activity over
~18 x 45-unit windows — runs it through the real preprocessing pass
(rag4dyg_tpu.data.preprocess), and writes ml_enron.csv for the pipeline
smoke:

    python tests/make_enron_fixture.py /tmp/enron_fixture
    python -m rag4dyg_tpu.cli pipeline --dataset enron \
        --csv /tmp/enron_fixture/ml_enron.csv --out $(mktemp -d) \
        --epochs 1 --smoke
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rag4dyg_tpu.data.preprocess import preprocess_events


def synth_events(n_nodes: int = 240, n_events: int = 9000,
                 n_windows: int = 18, slice_len: float = 45.0,
                 seed: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # power-law actor popularity, mild community structure via blocks
    pop = 1.0 / (1.0 + np.arange(n_nodes)) ** 0.8
    pop /= pop.sum()
    u = rng.choice(n_nodes, size=n_events, p=pop)
    block = (u // 40) * 40
    i = (block + rng.integers(0, 40, n_events)) % n_nodes
    i = np.where(i == u, (i + 1) % n_nodes, i)
    t = rng.uniform(0, n_windows * slice_len, n_events)
    return pd.DataFrame({"u": u, "i": i, "time": np.sort(t)})


def main(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    table = preprocess_events(synth_events(), "enron", timestep=16,
                              out_dir=out_dir)
    print(f"{len(table)} edges, timesteps 0..{table['timestamp'].max()}, "
          f"{len(set(table['u']) | set(table['i']))} nodes -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/enron_fixture")
