"""Backbone resume: a run interrupted after epoch k and resumed must
replay the remaining epochs identically (params bit-equal at the end)."""

import json
import os

import numpy as np
import pytest

from rag4dyg_tpu.config import DatasetSpec
from rag4dyg_tpu.train.backbone import train_backbone
from rag4dyg_tpu.utils.checkpoint import load_params


@pytest.fixture()
def tiny_resources(tmp_path):
    d = tmp_path / "res"
    d.mkdir()
    lines = []
    for ego in range(8):
        a, b, c = ego, (ego + 1) % 10, (ego + 2) % 10
        lines.append(
            f"<|endoftext|> <|history|> {a} <|time0|> {b} {c} "
            f"<|endofhistory|> <|pre|> <|time1|> {c} <|endofpre|> "
            f"<|endoftext|>")
    (d / "train.link_prediction").write_text("\n".join(lines) + "\n")
    ev = [f"<|endoftext|> <|history|> {e} <|time0|> {(e+1)%10} "
          f"<|endofhistory|>" for e in range(4)]
    gt = [f"<|pre|> <|time1|> {(e+2)%10} <|endofpre|> <|endoftext|>"
          for e in range(4)]
    for split in ("val", "test"):
        (d / f"{split}.link_prediction").write_text("\n".join(ev) + "\n")
        (d / f"{split}_gt.link_prediction").write_text("\n".join(gt) + "\n")
    (d / "vocab.json").write_text(json.dumps({str(i): i for i in range(10)}))
    return str(d)


SPEC = DatasetSpec(name="tiny", timestep=1, csv_name="tiny", time_scale=1.0,
                   n_layer=1, n_head=2, n_embd=16, batch_size=4, epochs=4,
                   patience=100)


def _leaves(params):
    import jax
    return jax.tree_util.tree_leaves(params)


def test_resume_replays_identically(tiny_resources, tmp_path):
    full_dir, part_dir = str(tmp_path / "full"), str(tmp_path / "part")

    train_backbone(SPEC, tiny_resources, full_dir, epochs=4, seed=3)

    # same 4-epoch schedule, interrupted after epoch 1
    train_backbone(SPEC, tiny_resources, part_dir, epochs=4, seed=3,
                   save_every=1, stop_after_epoch=1)
    assert os.path.isdir(os.path.join(part_dir, "checkpoint-step1"))
    train_backbone(SPEC, tiny_resources, part_dir, epochs=4, seed=3,
                   save_every=1, resume=True)

    p_full = load_params(os.path.join(full_dir, "checkpoint-last"))
    p_part = load_params(os.path.join(part_dir, "checkpoint-last"))
    for a, b in zip(_leaves(p_full), _leaves(p_part)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
