"""L0 preprocessing golden parity: the dialog data_trans path is fully
reproducible from committed inputs (all_data/dialog/dialog.csv ->
all_data/dialog/15/ml_dialog.csv)."""

import os

import numpy as np
import pandas as pd
import pytest

from rag4dyg_tpu.data.preprocess import (
    PREPROCESS_PARAMS,
    PreprocessParams,
    make_timestep_table,
    slice_events,
)


def test_dialog_data_trans_golden(reference_path):
    """Row-for-row parity up to equal-ts tie order: the reference sorted
    with numpy quicksort whose tie permutation varies across numpy
    versions (same documented delta as serialize.py), so compare the
    canonically-sorted tables."""
    raw = pd.read_csv(reference_path / "all_data/dialog/dialog.csv")
    raw = raw.rename(columns={"user_id": "u", "item_id": "i",
                              "ori_time": "ts"})
    table = make_timestep_table(raw[["u", "i", "ts", "timestamp"]], 15,
                                PREPROCESS_PARAMS["dialog"])

    ref = pd.read_csv(reference_path / "all_data/dialog/15/ml_dialog.csv",
                      index_col=0)
    assert len(table) == len(ref)
    key = ["ts", "timestamp", "u", "i"]
    ours = table.sort_values(key, kind="stable").reset_index(drop=True)
    gold = ref.sort_values(key, kind="stable").reset_index(drop=True)
    for col in ("u", "i", "ts", "label", "timestamp"):
        np.testing.assert_array_equal(ours[col].to_numpy(),
                                      gold[col].to_numpy(), err_msg=col)
    # idx is 1..N in emission order; check the contract, not the tie order
    assert sorted(table["idx"]) == list(range(1, len(table) + 1))


def test_slice_events_windows_and_dedup():
    params = PreprocessParams(slice_len=10.0, start_offset=2.0, end_trim=3.0)
    events = pd.DataFrame({
        "u": [1, 2, 3, 2, 1, 4, 9],
        "i": [2, 1, 4, 1, 5, 3, 9],
        #      before-start, s0, s0, s0-dup(rev), s1, s1, after-end
        "time": [1.0, 5.0, 8.0, 9.0, 14.0, 17.0, 98.0],
    })
    out = slice_events(events, params)
    # start = 3.0, end = 95.0; event at 1.0 dropped, 98.0 dropped
    assert out["timestamp"].tolist() == [0, 0, 1, 1]
    # (2,1)@9 collapsed the (1,2)@5 pair, keeping the LAST occurrence
    # (drop_duplicates preserves kept-row positions: (3,4)@8 stays first)
    assert out.iloc[1][["u", "i"]].tolist() == [2, 1]
    assert out.iloc[1]["ts"] == 9.0
    assert [1, 2] not in out[["u", "i"]].values.tolist()


def test_train_node_filter():
    params = PreprocessParams(slice_len=1.0)  # val_gap=1 -> train < T-1
    data = pd.DataFrame({
        "u": [1, 2, 1, 7],
        "i": [2, 3, 3, 1],
        "ts": [0.0, 1.0, 2.0, 3.0],
        "timestamp": [0, 0, 1, 2],
    })
    out = make_timestep_table(data, 2, params)
    # node 7 unseen in train window (timestamp < 1) -> its row dropped
    assert 7 not in set(out["u"]).union(out["i"])
    assert out["idx"].tolist() == list(range(1, len(out) + 1))


def test_uci_golden_ml_csv_from_raw():
    """L0 golden parity for UCI: the committed raw download
    (out.opsahl-ucsocial) through window -> first-seen remap -> 10-day
    slicing -> data_trans must reproduce the committed ml_uci.csv
    (reference: all_data/uci/pre/UCI_13/preprocess.py +
    all_data/uci/data_trans.py). The reference's final sort is pandas'
    unstable quicksort and its edge orientation follows networkx
    adjacency iteration, so rows compare canonically: as a multiset
    keyed by (timestamp, unordered pair, ts)."""
    import collections

    raw = "/root/reference/all_data/uci/pre/UCI_13/out.opsahl-ucsocial"
    gold = "/root/reference/all_data/uci/12/ml_uci.csv"
    if not os.path.exists(raw):
        pytest.skip("reference raw UCI download not present")

    rows = []
    with open(raw) as f:
        for ln in f.read().splitlines():
            if not ln or ln[0] == "%":
                continue
            x, y, _e, t = map(int, ln.split())
            rows.append((x, y, t))
    events = pd.DataFrame(rows, columns=["u", "i", "time"])

    params = PREPROCESS_PARAMS["UCI_13"]
    sliced = slice_events(events, params, remap=True)
    table = make_timestep_table(sliced, 12, params)

    golden = pd.read_csv(gold, index_col=0)

    assert len(table) == len(golden)
    # idx column is 1..N in both
    assert list(table["idx"]) == list(range(1, len(table) + 1))
    assert list(golden["idx"]) == list(range(1, len(golden) + 1))

    def canon(df):
        c = collections.Counter()
        for u, i, ts, lab, t in zip(df["u"], df["i"], df["ts"],
                                    df["label"], df["timestamp"]):
            c[(int(t), min(int(u), int(i)), max(int(u), int(i)),
               int(round(ts)), int(lab))] += 1
        return c

    assert canon(table) == canon(golden)
    # both tables are globally sorted by ts
    assert (np.diff(table["ts"].to_numpy()) >= 0).all()
    assert (np.diff(golden["ts"].to_numpy()) >= 0).all()


def test_enron_fixture_data_trans_golden(tmp_path):
    """The reference commits NO enron data (all_data/enron/ holds only
    readme.md + scripts; readme.md:1-12 documents just the DyTAG tuple
    format), so enron L0 can only be pinned against a transliteration
    oracle of its committed data_trans.py run on the synthetic fixture
    (VERDICT r2 missing #4/#7).

    Oracle = all_data/enron/data_trans.py semantics: the undirected
    export repeats every link, so keep odd lines (iloc[::2], line 33);
    ts stays the RAW original time (the re-zero line 44 is commented
    out); sort by ts; at the final snapshot T keep edges with both
    endpoints in the train-node set (timestamp < T-1); idx = 1..N; zero
    node/edge features at dim 172 (lines 55-92)."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_enron_fixture import synth_events

    from rag4dyg_tpu.data.preprocess import write_timestep_artifacts

    events = synth_events(n_nodes=60, n_events=800, n_windows=8, seed=3)
    params = PREPROCESS_PARAMS["enron"]
    sliced = slice_events(events, params)
    T = int(sliced["timestamp"].max())

    # --- transliteration oracle (data_trans.py) over the undirected
    # export: each sliced link appears twice (u,i) then (i,u)
    dup = pd.DataFrame({
        "user_id": np.repeat(sliced["u"].to_numpy(), 2),
        "item_id": np.repeat(sliced["i"].to_numpy(), 2),
        "ori_time": np.repeat(sliced["ts"].to_numpy(), 2),
        "timestamp": np.repeat(sliced["timestamp"].to_numpy(), 2),
    })
    dup.iloc[1::2, [0, 1]] = dup.iloc[1::2, [1, 0]].to_numpy()
    data = dup.iloc[::2, :].copy()                      # line 33
    data["label"] = 0
    data["ts"] = data["ori_time"]                       # line 46: raw ts
    data = data.sort_values(by="ts")
    data = data[["user_id", "item_id", "ts", "label", "timestamp"]]
    data.columns = ["u", "i", "ts", "label", "timestamp"]
    cur = data[data["timestamp"] <= T]
    train = cur[cur["timestamp"] < T - 1]
    train_nodes = set(train["u"]).union(train["i"])
    oracle = cur[cur["u"].isin(train_nodes) & cur["i"].isin(train_nodes)]
    oracle = oracle.copy()
    oracle["idx"] = range(1, len(oracle) + 1)
    oracle.index = range(len(oracle))

    table = make_timestep_table(sliced, T, params)
    assert len(table) == len(oracle) > 0
    for col in ("u", "i", "ts", "label", "timestamp", "idx"):
        np.testing.assert_array_equal(table[col].to_numpy(),
                                      oracle[col].to_numpy(), err_msg=col)
    # raw-ts quirk really held (fixture times don't start at 0)
    assert table["ts"].min() > 0

    # artifact contract (data_trans.py:84-92): zero features at dim 172
    write_timestep_artifacts(table, str(tmp_path), "enron")
    node_feat = np.load(tmp_path / "ml_enron_node.npy")
    edge_feat = np.load(tmp_path / "ml_enron.npy")
    n_nodes = len(set(table["u"]).union(table["i"]))
    assert node_feat.shape == (n_nodes, 172) and not node_feat.any()
    assert edge_feat.shape == (len(table), 172) and not edge_feat.any()
    roundtrip = pd.read_csv(tmp_path / "ml_enron.csv", index_col=0)
    np.testing.assert_array_equal(roundtrip["idx"], table["idx"])
