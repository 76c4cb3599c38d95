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


def test_generator_config_round_trips_through_checkpoint_meta(tmp_path):
    """Generator checkpoints persist their fusion hyperparameters in
    meta.json (cmd_eval prefers them over the registry so a checkpoint
    trained with e.g. --top-k 3 is never evaluated with 10 demos)."""
    import dataclasses

    from rag4dyg_tpu.config import GeneratorConfig
    from rag4dyg_tpu.utils.checkpoint import load_meta, save_checkpoint

    gcfg = GeneratorConfig(fusion="mlp", top_k=3, m=2, mlp_layers=2,
                           gnn_dropout=0.1)
    d = str(tmp_path / "checkpoint-best")
    save_checkpoint(d, {"w": np.zeros(2, np.float32)},
                    meta={"stage": "generator",
                          "generator_config": dataclasses.asdict(gcfg)})
    saved = load_meta(d).get("generator_config")
    assert saved is not None
    assert GeneratorConfig(**saved) == gcfg  # cmd_eval's reconstruction


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


def test_gradient_accumulation_matches_large_batch():
    """k accumulated micro-batches == one k-times-larger batch (per-token
    CE means agree exactly when micro-batches have equal valid counts;
    reference: main_SimpleDyG.py:173-191 loss/accum + step gating)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rag4dyg_tpu.config import ModelConfig
    from rag4dyg_tpu.models import GPT2LMModel, init_params
    from rag4dyg_tpu.train.backbone import make_lm_train_step
    from rag4dyg_tpu.train.state import (
        linear_warmup_linear_decay,
        make_optimizer,
    )

    cfg = ModelConfig(vocab_size=37, n_layer=1, n_head=2, n_embd=16,
                      n_positions=32, embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    model = GPT2LMModel(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    sched = linear_warmup_linear_decay(1e-2, 0, 100)

    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.randint(0, 37, (4, 8)), jnp.int32)  # no pads

    opt_full = make_optimizer(params, sched)
    step_full = make_lm_train_step(model, opt_full)
    p_full, _, _ = step_full(params, opt_full.init(params), big,
                             jax.random.PRNGKey(1))

    opt_acc = make_optimizer(params, sched, accumulate_steps=2)
    step_acc = make_lm_train_step(model, opt_acc)
    p_acc, state = params, opt_acc.init(params)
    for half in (big[:2], big[2:]):
        p_acc, state, _ = step_acc(p_acc, state, half, jax.random.PRNGKey(1))

    flat_a = jax.tree.leaves(p_acc)
    flat_f = jax.tree.leaves(p_full)
    for a, f in zip(flat_a, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f),
                                   atol=1e-6, rtol=1e-5)
    # and the accumulated params actually CHANGED (the step fired)
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(flat_a, jax.tree.leaves(params)))
    assert moved


def test_profiling_flops_and_timer():
    from rag4dyg_tpu.utils.profiling import (
        StepTimer,
        lm_flops_per_token,
        lm_train_flops,
        mfu,
    )

    # hand-computed: L=2, D=4, S=8, V=10
    per_tok = 24 * 2 * 16 + 4 * 2 * 8 * 4 + 2 * 4 * 10
    assert lm_flops_per_token(2, 4, 8, 10) == per_tok
    assert lm_train_flops(2, 4, 100, 8, vocab_size=10) == 3 * 100 * per_tok
    assert lm_train_flops(2, 4, 100, 8, vocab_size=10,
                          remat=True) == 4 * 100 * per_tok
    assert abs(mfu(197e12, 2.0) - 0.5) < 1e-9
    assert mfu(1.0, 0.0) == 0.0

    t = StepTimer()
    for _ in range(3):
        with t.step():
            pass
    s = t.summary()
    assert s["steps"] == 3 and s["p50_ms"] >= 0.0 and s["total_s"] >= 0.0


def test_retry_transient_kwargs_and_filtering():
    """retry_transient must pass **kwargs through to fn (the final-eval
    call sites pass write_best=...), retry only transient-marked errors,
    and re-raise genuine ones immediately."""
    from rag4dyg_tpu.utils.retry import retry_transient

    calls = []

    def flaky(a, *, write_best=False):
        calls.append((a, write_best))
        if len(calls) < 3:
            raise RuntimeError("UNAVAILABLE: relay hiccup")
        return a + (1 if write_best else 0)

    out = retry_transient(flaky, 41, write_best=True,
                          attempts=4, backoff_s=0.0)
    assert out == 42
    assert calls == [(41, True)] * 3

    def broken():
        raise ValueError("shape mismatch")

    try:
        retry_transient(broken, attempts=4, backoff_s=0.0)
    except ValueError:
        pass
    else:
        raise AssertionError("non-transient error must re-raise")
