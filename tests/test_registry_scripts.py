"""Registry-vs-scripts protocol diff test.

The reference's per-dataset hyperparameters live only in its committed
shell launchers (reference: scripts/SimpleDyG/train_*.sh,
scripts/train_retriever/train_retriever_*.sh,
scripts/train_generator/train_rag_graphpooling_*_seed.sh). This test
parses those scripts directly and asserts our typed registry
(rag4dyg_tpu/config.py) matches flag-for-flag, so a protocol divergence
(like the round-2 patience gap flagged in VERDICT.md) cannot recur
silently.
"""

import pathlib
import re

import pytest

from rag4dyg_tpu.config import DATASETS

SCRIPTS = pathlib.Path("/root/reference/scripts")

# registry name -> reference script-name fragments
BACKBONE = {
    "UCI_13": "train_UCI_13.sh",
    "dialog": "train_dialog.sh",
    "hepth": "train_hepth.sh",
    "wikiv2": "train_wikiv2.sh",
    "enron": "train_enron.sh",
    "reddit": "train_reddit.sh",
}
RETRIEVER = {
    "UCI_13": "train_retriever_UCI_13.sh",
    "dialog": "train_retriever_dialog.sh",
    "hepth": "train_retriever_hepth.sh",
    "wikiv2": "train_retriever_wikiv2.sh",
    "enron": "train_retriever_enron.sh",
    "reddit": "train_retriever_reddit.sh",
}
GENERATOR = {
    "UCI_13": "train_rag_graphpooling_UCI_seed.sh",
    "dialog": "train_rag_graphpooling_dialog_seed.sh",
    "hepth": "train_rag_graphpooling_hepth_seed.sh",
    "wikiv2": "train_rag_graphpooling_wikiv2_seed.sh",
    "enron": "train_rag_graphpooling_enron_seed.sh",
    "reddit": "train_rag_graphpooling_reddit_seed.sh",
}


def _strip_comments(text: str) -> str:
    # drop everything after an unquoted '#' on each line (shell comments);
    # keep shebang handling simple — flags never contain '#'.
    return "\n".join(line.split("#", 1)[0] for line in text.splitlines())


def parse_script(path: pathlib.Path) -> dict:
    """Extract var assignments and --flag values from a launcher script.

    Handles both `--flag value` / `--flag=value` forms and resolves one
    level of $VAR / {$VAR} substitution from top-of-script assignments.
    """
    text = _strip_comments(path.read_text())
    # NB spaces around '=' appear in scripts/SimpleDyG/train_reddit.sh
    # (`n_layer = 2`) — that is broken bash in the reference (the committed
    # script cannot actually run); we parse the evident intent.
    assigns = dict(re.findall(r"^\s*(?:export\s+)?(\w+)\s*=\s*([^\s]+)\s*$", text, re.M))
    # loop variables (`for seed in 42 0 1 ...`) resolve to their FIRST value
    # — the committed chains' primary seed.
    for var, vals in re.findall(r"for (\w+) in ([\d ]+)", text):
        assigns.setdefault(var, vals.split()[0])

    def resolve(v: str) -> str:
        m = re.fullmatch(r"\$\{?(\w+)\}?", v)
        if m and m.group(1) in assigns:
            v = assigns[m.group(1)]
        v = v.strip("'\"")
        # bash brace range `{11..11}` (scripts/SimpleDyG/train_hepth.sh) —
        # single-element ranges resolve to that element
        m = re.fullmatch(r"\{(\d+)\.\.(\d+)\}", v)
        if m and m.group(1) == m.group(2):
            v = m.group(1)
        return v

    flags = {}
    for name, val in re.findall(r"--([\w-]+)[= ]((?:[^\s\\]+))", text):
        flags[name] = resolve(val)
    # bare boolean flags (e.g. --should_continue, --freeze, --run_seed)
    for name in re.findall(r"--([\w-]+)(?=\s*\\?$|\s+--)", text, re.M):
        flags.setdefault(name, True)
    return {"assigns": assigns, "flags": flags, "text": text}


def fnum(x) -> float:
    return float(str(x))


@pytest.mark.parametrize("ds", sorted(DATASETS))
def test_backbone_script_parity(ds):
    spec = DATASETS[ds]
    s = parse_script(SCRIPTS / "SimpleDyG" / BACKBONE[ds])
    f = s["flags"]
    assert int(f["n_layer"]) == spec.n_layer
    assert int(f["n_head"]) == spec.n_head
    assert int(f["n_embed"]) == spec.n_embd
    assert fnum(f["learning_rate"]) == spec.learning_rate
    assert int(f["per_gpu_train_batch_size"]) == spec.batch_size
    assert int(f["num_train_epochs"]) == spec.epochs
    assert int(f["patience"]) == spec.patience, (
        f"{ds} backbone patience: script {f['patience']} vs registry {spec.patience}")
    assert int(f["block_size"]) == spec.block_size
    assert int(f["seed"]) == spec.seed
    assert int(f["timestamp"]) == spec.timestep


@pytest.mark.parametrize("ds", sorted(DATASETS))
def test_retriever_script_parity(ds):
    spec = DATASETS[ds]
    r = spec.retriever
    s = parse_script(SCRIPTS / "train_retriever" / RETRIEVER[ds])
    f = s["flags"]
    assert fnum(f["alpha"]) == r.alpha
    assert fnum(f["eta"]) == r.eta
    assert fnum(f["gamma"]) == r.gamma
    assert fnum(f["lambda_decay"]) == r.lambda_decay
    assert fnum(f["temperature"]) == r.temperature
    assert int(f["per_gpu_train_batch_size"]) == r.batch_size
    assert int(f["n_layer"]) == r.n_layer
    assert int(f["n_head"]) == r.n_head
    assert int(f["n_embed"]) == r.n_embd
    assert fnum(f["learning_rate"]) == r.learning_rate
    assert int(f["num_train_epochs"]) == r.epochs
    assert int(f["patience"]) == r.patience, (
        f"{ds} retriever patience: script {f['patience']} vs registry {r.patience}")
    assert int(f["warmup_steps"]) == r.warmup_epochs
    assert int(f["seed"]) == r.seed, (
        f"{ds} retriever seed: script {f['seed']} vs registry {r.seed}")
    # --should_continue (init encoder from the SimpleDyG backbone) is present
    # in every retriever script except UCI's
    # (reference: scripts/train_retriever/train_retriever_UCI_13.sh).
    assert ("should_continue" in f) == r.init_from_backbone


@pytest.mark.parametrize("ds", sorted(DATASETS))
def test_generator_script_parity(ds):
    spec = DATASETS[ds]
    g = spec.generator
    s = parse_script(SCRIPTS / "train_generator" / GENERATOR[ds])
    f = s["flags"]
    assert f["fusion"] == "graphpooling"
    assert int(s["assigns"].get("GNN_layer", f.get("gnn_layer"))) == g.gnn_layers
    assert int(f["m"]) == g.m
    # TOPK is either a plain assignment (UCI) or a `for TOPK in 7` loop
    assert int(f["topK"]) == g.top_k
    assert fnum(f["learning_rate"]) == g.learning_rate
    assert int(f["per_gpu_train_batch_size"]) == g.batch_size
    assert int(f["num_train_epochs"]) == g.epochs
    assert int(f["patience"]) == g.patience, (
        f"{ds} generator patience: script {f['patience']} vs registry {g.patience}")
    assert ("freeze" in f) == g.freeze_backbone
    assert int(f["seed"]) == g.seed, (
        f"{ds} generator seed: script {f['seed']} vs registry {g.seed}")
    # generator arch must match the dataset's backbone arch
    assert int(f["n_layer"]) == spec.n_layer
    assert int(f["n_head"]) == spec.n_head
    assert int(f["n_embed"]) == spec.n_embd


def test_generator_seed_protocols():
    """Pin the committed seed sweeps: 10 seeds (42,0..8) for
    UCI/dialog/hepth/wikiv2; reddit's committed loop has only 42,0,1 live
    (the rest commented out); enron's only 1,2,3
    (reference: scripts/train_generator/train_rag_graphpooling_*_seed.sh)."""
    expected = {
        "UCI_13": [42, 0, 1, 2, 3, 4, 5, 6, 7, 8],
        "dialog": [42, 0, 1, 2, 3, 4, 5, 6, 7, 8],
        "hepth": [42, 0, 1, 2, 3, 4, 5, 6, 7, 8],
        "wikiv2": [42, 0, 1, 2, 3, 4, 5, 6, 7, 8],
        "reddit": [42, 0, 1],
        "enron": [1, 2, 3],
    }
    for ds, want in expected.items():
        text = _strip_comments(
            (SCRIPTS / "train_generator" / GENERATOR[ds]).read_text())
        m = re.search(r"for seed in ([\d ]+)", text)
        assert m, ds
        assert [int(x) for x in m.group(1).split()] == want, ds
