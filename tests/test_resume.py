"""Trainer resume: a run interrupted after epoch k and resumed must
replay the remaining epochs identically (params bit-equal at the end,
same best epoch / result row). The backbone re-derives its per-epoch RNG
streams from the epoch index; the retriever/generator advance sequential
chains, so their step checkpoints carry the raw RNG + early-stop state
(utils/checkpoint.py rng_state_meta)."""

import csv
import json
import os

import numpy as np
import pytest

from rag4dyg_tpu.config import DatasetSpec, GeneratorConfig, RetrieverConfig
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


def _assert_same_last_and_result(full_dir, part_dir):
    p_full = load_params(os.path.join(full_dir, "checkpoint-last"))
    p_part = load_params(os.path.join(part_dir, "checkpoint-last"))
    for a, b in zip(_leaves(p_full), _leaves(p_part)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rows = []
    for d in (full_dir, part_dir):
        with open(os.path.join(d, "results.csv"), newline="") as f:
            rows.append(list(csv.DictReader(f))[-1])
    full_row, part_row = rows
    for k, v in full_row.items():
        if k == "hours":
            continue
        assert part_row[k] == v, (k, v, part_row[k])


@pytest.fixture()
def rag_resources(tiny_resources):
    """tiny_resources + the annotate/retrieval outputs the retriever and
    generator trainers read (8-item pool, 4 eval queries)."""
    d = tiny_resources
    tr = os.path.join(d, "train_retrieval")
    os.makedirs(tr)
    with open(os.path.join(tr, "train_index.retrieval"), "w") as f:
        for i in range(8):
            f.write(f"{i} {(i + 1) % 8} {(i + 3) % 8}\n")
    rng = np.random.RandomState(0)
    for split in ("val", "test"):
        gt = rng.rand(4, 8)
        with open(os.path.join(tr, f"{split}_score.retrieval"), "w") as f:
            for row in gt:
                f.write(" ".join(f"{x:.4f}" for x in row) + "\n")
    np.save(os.path.join(d, "train_query_time.npy"),
            np.arange(8, dtype=np.float64))
    gen = os.path.join(d, "train_generator")
    os.makedirs(gen)
    with open(os.path.join(gen, "train_index.gen"), "w") as f:
        for i in range(8):
            f.write(" ".join(str((i + j) % 8) for j in range(8)) + "\n")
    rr = os.path.join(d, "retrieval_result")
    os.makedirs(rr)
    for split in ("val", "test"):
        with open(os.path.join(rr, f"{split}_index.gen"), "w") as f:
            for i in range(4):
                f.write(" ".join(str((i + j) % 8) for j in range(8)) + "\n")
    return d


RET_SPEC = DatasetSpec(
    name="tiny", timestep=1, csv_name="tiny", time_scale=1.0,
    n_layer=1, n_head=2, n_embd=16, batch_size=4, epochs=4, patience=100,
    retriever=RetrieverConfig(batch_size=4, n_layer=1, n_head=2, n_embd=16,
                              epochs=4, patience=100,
                              init_from_backbone=False))


def test_retriever_resume_replays_identically(rag_resources, tmp_path):
    from rag4dyg_tpu.train.retriever import train_retriever

    full_dir, part_dir = str(tmp_path / "full"), str(tmp_path / "part")
    train_retriever(RET_SPEC, rag_resources, full_dir, epochs=4, seed=3)

    train_retriever(RET_SPEC, rag_resources, part_dir, epochs=4, seed=3,
                    save_every=1, stop_after_epoch=1)
    assert os.path.isdir(os.path.join(part_dir, "checkpoint-step1"))
    train_retriever(RET_SPEC, rag_resources, part_dir, epochs=4, seed=3,
                    save_every=1, resume=True)
    _assert_same_last_and_result(full_dir, part_dir)


def test_retriever_chunk_ladder_bit_identical(rag_resources, tmp_path):
    """--chunk-ladder changes only how each bucket group's steps are cut
    into compiled dispatch shapes (power-of-two tail ladder vs one
    padded chunk); masked padding steps are exact no-ops, so params and
    the result row must be BIT-identical. 80 pairs / batch 4 = a
    20-step group: the flat plan pads to one 32-chunk, the ladder cuts
    [16, 8] — different chunking, different padding, same numerics."""
    from rag4dyg_tpu.train.retriever import train_retriever

    with open(os.path.join(rag_resources, "train_retrieval",
                           "train_index.retrieval"), "w") as f:
        for i in range(80):
            f.write(f"{i % 8} {(i + 1) % 8} {(i + 3) % 8}\n")
    spec = RET_SPEC
    flat_dir, lad_dir = str(tmp_path / "flat"), str(tmp_path / "ladder")
    train_retriever(spec, rag_resources, flat_dir, epochs=2, seed=3)
    train_retriever(spec, rag_resources, lad_dir, epochs=2, seed=3,
                    chunk_ladder=True)
    _assert_same_last_and_result(flat_dir, lad_dir)


GEN_SPEC = DatasetSpec(
    name="tiny", timestep=1, csv_name="tiny", time_scale=1.0,
    n_layer=1, n_head=2, n_embd=16, batch_size=4, epochs=4, patience=100,
    generator=GeneratorConfig(batch_size=4, top_k=2, epochs=4,
                              patience=100))


def test_generator_resume_replays_identically(rag_resources, tmp_path):
    from rag4dyg_tpu.train.generator import train_generator

    full_dir, part_dir = str(tmp_path / "full"), str(tmp_path / "part")
    train_generator(GEN_SPEC, rag_resources, full_dir, epochs=4, seed=3)

    train_generator(GEN_SPEC, rag_resources, part_dir, epochs=4, seed=3,
                    save_every=1, stop_after_epoch=1)
    assert os.path.isdir(os.path.join(part_dir, "checkpoint-step1"))
    train_generator(GEN_SPEC, rag_resources, part_dir, epochs=4, seed=3,
                    save_every=1, resume=True)
    _assert_same_last_and_result(full_dir, part_dir)
