"""Retriever train-step unit coverage: the jitted triple step (device
pool gather, five logits-free encoder passes, CLtime + α·info-NCE) must
run, return finite losses, and update only via valid steps in the epoch
scan (reference hot loop: train/train_retriever.py:162-225)."""

import jax
import jax.numpy as jnp
import numpy as np

from rag4dyg_tpu.config import ModelConfig
from rag4dyg_tpu.models import GPT2LMModel, init_params
from rag4dyg_tpu.train.retriever import (make_retriever_epoch_fn,
                                         make_retriever_train_step,
                                         mean_pool)
from rag4dyg_tpu.train.state import linear_warmup_linear_decay, make_optimizer

V, L, N, B = 64, 16, 20, 4


def _setup(pool_mode="masked"):
    cfg = ModelConfig(vocab_size=V, n_layer=2, n_head=2, n_embd=32,
                      n_positions=64)
    model = GPT2LMModel(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(params, linear_warmup_linear_decay(1e-4, 0, 100))
    rng = np.random.RandomState(0)
    pool = jnp.asarray(rng.randint(1, V - 2, (N, L)), jnp.int32)
    idx = jnp.asarray(rng.randint(0, N, (B, 3)), jnp.int32)
    times = jnp.asarray(rng.rand(B, 3), jnp.float32)
    return cfg, model, params, opt, pool, idx, times


def test_train_step_finite_and_updates():
    _, model, params, opt, pool, idx, times = _setup()
    step = make_retriever_train_step(
        model, opt, alpha=1.0, temperature=0.1, lambda_decay=0.1,
        eta=0.8, gamma=0.4, mask_token=V - 1, pad_id=0)
    opt_state = opt.init(params)
    new_p, _, loss, cl, aug = step(params, opt_state, pool, idx,
                                   times[:, 0], times[:, 1], times[:, 2],
                                   jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(cl) + float(aug),
                               rtol=1e-5)
    # parameters actually moved
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), params, new_p))
    assert delta > 0


def test_epoch_scan_masks_invalid_steps():
    """A padded no-op step (valid=False) must leave params bit-identical."""
    _, model, params, opt, pool, idx, times = _setup()
    epoch_fn, _ = make_retriever_epoch_fn(
        model, opt, alpha=0.5, temperature=0.1, lambda_decay=0.1,
        eta=0.8, gamma=0.4, mask_token=V - 1, pad_id=0)
    opt_state = opt.init(params)
    rngs = jnp.asarray(jax.random.split(jax.random.PRNGKey(2), 2))
    xs = (jnp.stack([idx, idx]), jnp.stack([times[:, 0]] * 2),
          jnp.stack([times[:, 1]] * 2), jnp.stack([times[:, 2]] * 2), rngs)
    p_all_invalid, _, loss0 = epoch_fn(params, opt_state, pool, *xs,
                                       jnp.asarray([False, False]))
    same = jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), params, p_all_invalid))
    assert same and float(loss0) == 0.0
    p_one_valid, _, loss1 = epoch_fn(params, opt_state, pool, *xs,
                                     jnp.asarray([True, False]))
    assert float(loss1) != 0.0
    moved = not jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), params, p_one_valid))
    assert moved


def test_mean_pool_modes():
    """masked averages real tokens; padded averages the whole row
    (reference torch.mean quirk, train_retriever.py:183-185)."""
    h = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
    ids = jnp.asarray([[5, 7, 0, 0]], jnp.int32)  # pad_id = 0
    masked = mean_pool(h, ids, 0, "masked")
    padded = mean_pool(h, ids, 0, "padded")
    np.testing.assert_allclose(np.asarray(masked)[0], h[0, :2].mean(0))
    np.testing.assert_allclose(np.asarray(padded)[0], h[0].mean(0))


def test_remat_modes_numerically_identical():
    """full / dots / none remat must produce the same loss and the same
    updated params (saved values are stored originals; recomputed ops are
    deterministic, incl. threefry dropout re-draws from the same keys)."""
    _, model, params, opt, pool, idx, times = _setup()
    opt_state = opt.init(params)
    outs = {}
    for mode in ("full", "dots", "none"):
        step = make_retriever_train_step(
            model, opt, alpha=1.0, temperature=0.1, lambda_decay=0.1,
            eta=0.8, gamma=0.4, mask_token=V - 1, pad_id=0, remat=mode)
        new_p, _, loss, _, _ = step(params, opt_state, pool, idx,
                                    times[:, 0], times[:, 1], times[:, 2],
                                    jax.random.PRNGKey(3))
        outs[mode] = (float(loss), new_p)
    for mode in ("dots", "none"):
        np.testing.assert_allclose(outs[mode][0], outs["full"][0],
                                   rtol=1e-6)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
            outs[mode][1], outs["full"][1])


def test_split_neg_layout_matches_joint():
    """Per-role padding (pool_ids_neg at its own length) must match the
    joint 5-pass layout: with dropout off, masked mean pooling and causal
    attention make trailing pads inert, so encoding negatives at a longer
    padded length changes nothing but the op shapes."""
    cfg = ModelConfig(vocab_size=V, n_layer=2, n_head=2, n_embd=32,
                      n_positions=64, embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    model = GPT2LMModel(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(params, linear_warmup_linear_decay(1e-4, 0, 100))
    rng = np.random.RandomState(1)
    pool_short = np.full((N, L), 0, np.int32)          # pad_id = 0
    lens = rng.randint(2, L - 4, N)
    for i, ln in enumerate(lens):
        pool_short[i, :ln] = rng.randint(1, V - 2, ln)
    pool_long = np.concatenate(
        [pool_short, np.zeros((N, L), np.int32)], axis=1)  # same rows @ 2L
    idx = jnp.asarray(rng.randint(0, N, (B, 3)), jnp.int32)
    times = jnp.asarray(rng.rand(B, 3), jnp.float32)
    step = make_retriever_train_step(
        model, opt, alpha=1.0, temperature=0.1, lambda_decay=0.1,
        eta=0.8, gamma=0.4, mask_token=V - 1, pad_id=0)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(7)
    _, _, loss_joint, cl_j, aug_j = step(
        params, opt_state, jnp.asarray(pool_short), idx,
        times[:, 0], times[:, 1], times[:, 2], key)
    new_p, _, loss_split, cl_s, aug_s = step(
        params, opt_state, jnp.asarray(pool_short), idx,
        times[:, 0], times[:, 1], times[:, 2], key,
        pool_ids_neg=jnp.asarray(pool_long))
    np.testing.assert_allclose(float(loss_split), float(loss_joint),
                               rtol=2e-6)
    np.testing.assert_allclose(float(cl_s), float(cl_j), rtol=2e-6)
    np.testing.assert_allclose(float(aug_s), float(aug_j), rtol=2e-6)
    assert np.isfinite(float(loss_split))
    moved = not jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), params, new_p))
    assert moved


def test_neg_pass_scan_bit_identical():
    """neg_pass_scan wraps the lone split-layout negative pass in a
    length-1 lax.scan (an XLA-scheduling isolation measure for the
    (ba=128, bn=512) wikiv2 group — see RESULTS.md per-bucket MFU).
    A scan of length 1 is numerically the body itself: loss and updated
    params must be BIT-identical."""
    cfg = ModelConfig(vocab_size=V, n_layer=2, n_head=2, n_embd=32,
                      n_positions=64)
    model = GPT2LMModel(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    opt = make_optimizer(params, linear_warmup_linear_decay(1e-4, 0, 100))
    rng = np.random.RandomState(2)
    pool = np.full((N, L), 0, np.int32)
    lens = rng.randint(2, L - 4, N)
    for i, ln in enumerate(lens):
        pool[i, :ln] = rng.randint(1, V - 2, ln)
    pool_long = np.concatenate([pool, np.zeros((N, L), np.int32)], axis=1)
    idx = jnp.asarray(rng.randint(0, N, (B, 3)), jnp.int32)
    times = jnp.asarray(rng.rand(B, 3), jnp.float32)
    key = jax.random.PRNGKey(9)
    outs = []
    for flag in (False, True):
        step = make_retriever_train_step(
            model, opt, alpha=1.0, temperature=0.1, lambda_decay=0.1,
            eta=0.8, gamma=0.4, mask_token=V - 1, pad_id=0,
            neg_pass_scan=flag)
        outs.append(step(params, opt.init(params), jnp.asarray(pool), idx,
                         times[:, 0], times[:, 1], times[:, 2], key,
                         pool_ids_neg=jnp.asarray(pool_long)))
    (p0, _, l0, cl0, au0), (p1, _, l1, cl1, au1) = outs
    assert float(l0) == float(l1) and float(cl0) == float(cl1)
    assert float(au0) == float(au1)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), p0, p1))


def test_epoch_scan_accepts_neg_view():
    """The whole-epoch scan threads pool_ids_neg through to the step and
    still masks invalid steps bit-exactly."""
    _, model, params, opt, pool, idx, times = _setup()
    epoch_fn, _ = make_retriever_epoch_fn(
        model, opt, alpha=0.5, temperature=0.1, lambda_decay=0.1,
        eta=0.8, gamma=0.4, mask_token=V - 1, pad_id=0)
    opt_state = opt.init(params)
    pool_long = jnp.concatenate(
        [pool, jnp.zeros((N, L), jnp.int32)], axis=1)
    rngs = jnp.asarray(jax.random.split(jax.random.PRNGKey(2), 2))
    xs = (jnp.stack([idx, idx]), jnp.stack([times[:, 0]] * 2),
          jnp.stack([times[:, 1]] * 2), jnp.stack([times[:, 2]] * 2), rngs)
    p_inv, _, loss0 = epoch_fn(params, opt_state, pool, *xs,
                               jnp.asarray([False, False]),
                               pool_ids_neg=pool_long)
    assert float(loss0) == 0.0
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), params, p_inv))
    p_one, _, loss1 = epoch_fn(params, opt_state, pool, *xs,
                               jnp.asarray([True, False]),
                               pool_ids_neg=pool_long)
    assert float(loss1) != 0.0
    assert not jax.tree.all(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b)), params, p_one))


def test_remat_mode_rejects_unknown():
    import pytest
    _, model, _, opt, *_ = _setup()
    with pytest.raises(ValueError, match="remat"):
        make_retriever_train_step(
            model, opt, alpha=1.0, temperature=0.1, lambda_decay=0.1,
            eta=0.8, gamma=0.4, mask_token=V - 1, pad_id=0, remat="bogus")


def test_remat_dots_budget_guard():
    """--remat dots fails fast at the known-compiler-crashing wikiv2
    shape (5 passes' saved dots live at once — VERDICT r2 missing #6)
    and stays silent at small shapes / other modes."""
    import pytest
    from rag4dyg_tpu.train.retriever import _check_remat_dots_budget

    wikiv2 = dict(batch=128, seq_len=512, n_layer=12, n_embd=768,
                  n_head=12)
    for impl in ("xla", "flash"):
        with pytest.raises(ValueError, match="remat dots"):
            _check_remat_dots_budget("dots", dtype="bfloat16",
                                     attention_impl=impl, **wikiv2)
    # "full" (the committed runs' mode) never trips, whatever the shape
    _check_remat_dots_budget("full", dtype="float32",
                             attention_impl="xla", **wikiv2)
    # dots at a small/smoke shape is fine
    _check_remat_dots_budget("dots", batch=8, seq_len=128, n_layer=2,
                             n_embd=64, n_head=2, dtype="float32",
                             attention_impl="xla")
