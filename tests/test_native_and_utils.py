"""C++ bulk encoder parity + logging/checkpoint utility behavior."""

import os

import numpy as np
import pytest

from rag4dyg_tpu.data.serialize import read_corpus_lines
from rag4dyg_tpu.data.vocab import Tokenizer
from rag4dyg_tpu.utils.checkpoint import (
    latest_checkpoint,
    rotate_checkpoints,
    sorted_checkpoints,
)
from rag4dyg_tpu.utils.logging import (
    RunLogger,
    aggregate_seed_results,
    append_result_row,
)


def test_native_encoder_matches_python(reference_path):
    from rag4dyg_tpu.utils import native
    if not native.available():
        pytest.skip("no g++ / native build failed")
    tok = Tokenizer.from_vocab_file(
        str(reference_path / "vocabs/UCI_13/12/vocab.json"), timestep=12)
    lines = read_corpus_lines(
        str(reference_path / "resources/UCI_13/12/train.link_prediction"))
    enc = native.NativeEncoder(tok._id2tok)
    for max_len in (None, 512, 16):
        ours = enc.encode_batch(lines, max_len)
        ref = [tok.encode(ln, max_len) for ln in lines]
        assert ours == ref


def test_native_encoder_unknown_token_raises():
    from rag4dyg_tpu.utils import native
    if not native.available():
        pytest.skip("no g++ / native build failed")
    enc = native.NativeEncoder(["a", "b"])
    assert enc.encode_batch(["a b a"]) == [[0, 1, 0]]
    with pytest.raises(KeyError):
        enc.encode_batch(["a c"])


def test_checkpoint_rotation(tmp_path):
    d = str(tmp_path)
    for step in (10, 2, 300, 40):
        os.makedirs(os.path.join(d, f"checkpoint-step{step}"))
    os.makedirs(os.path.join(d, "checkpoint-best"))  # not rotated
    assert [os.path.basename(p) for p in sorted_checkpoints(d)] == [
        "checkpoint-step2", "checkpoint-step10", "checkpoint-step40",
        "checkpoint-step300"]
    assert latest_checkpoint(d).endswith("checkpoint-step300")
    rotate_checkpoints(d, limit=2)
    assert [os.path.basename(p) for p in sorted_checkpoints(d)] == [
        "checkpoint-step40", "checkpoint-step300"]
    assert os.path.isdir(os.path.join(d, "checkpoint-best"))


def test_result_csv_and_aggregation(tmp_path):
    csv_path = str(tmp_path / "results.csv")
    append_result_row(csv_path, {"seed": 1, "test_ndcg": 0.5})
    append_result_row(csv_path, {"seed": 2, "test_ndcg": 0.7})
    append_result_row(csv_path, {"seed": 3, "test_ndcg": 0.6,
                                 "extra": "x"})  # header union grows
    agg = aggregate_seed_results(csv_path, ["test_ndcg"])
    assert agg["n"] == 3
    np.testing.assert_allclose(agg["test_ndcg_mean"], 0.6)
    assert agg["test_ndcg_std"] > 0


def test_run_logger(tmp_path):
    rl = RunLogger(str(tmp_path), "stage")
    rl.info("hello %d", 42)
    rl.log_scalars(0, {"loss": 1.5})
    rl.log_scalars(1, {"loss": 1.25})
    rl.close()
    import json
    lines = open(tmp_path / "logs/scalars.jsonl").read().splitlines()
    assert json.loads(lines[1])["loss"] == 1.25
    assert "hello 42" in open(tmp_path / "logs/stage.log").read()
