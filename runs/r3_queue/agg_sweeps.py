"""Aggregate generator sweep CSVs into the RESULTS.md headline numbers.

For every runs/*/sweep_generator*/sweep_results.csv: per-dataset
mean +/- std of test_NDCG across seeds, n, min/max, and how many seeds
beat the corresponding backbone test NDCG (latest backbone*/results.csv
row for that dataset).

Usage: python runs/r3_queue/agg_sweeps.py
"""

import glob
import os

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def backbone_test_ndcg(ds_dir):
    rows = []
    for f in sorted(glob.glob(os.path.join(ds_dir, "backbone*", "results.csv"))):
        df = pd.read_csv(f)
        df = df[df["stage"] == "backbone"]
        if len(df):
            rows.append((f, float(df.iloc[-1]["test_NDCG"])))
    return rows[-1] if rows else (None, None)


def main():
    for csv in sorted(glob.glob(os.path.join(REPO, "runs", "*", "sweep_generator*",
                                             "sweep_results.csv"))):
        df = pd.read_csv(csv).drop_duplicates(subset=["dataset", "seed"], keep="last")
        ds_dir = os.path.dirname(os.path.dirname(csv))
        bb_file, bb = backbone_test_ndcg(ds_dir)
        for ds, g in df.groupby("dataset"):
            t = g["test_NDCG"]
            beat = f", {int((t > bb).sum())}/{len(t)} beat backbone {bb:.4f} ({os.path.relpath(bb_file, REPO)})" if bb is not None else ""
            print(f"{os.path.relpath(csv, REPO)} [{ds}] n={len(t)} "
                  f"test NDCG {t.mean():.4f} +/- {t.std(ddof=1):.4f} "
                  f"(min {t.min():.4f}, max {t.max():.4f}){beat} "
                  f"seeds={sorted(g['seed'].tolist())}")


if __name__ == "__main__":
    main()
