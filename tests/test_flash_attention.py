"""Flash-attention Pallas kernel vs the XLA oracle (interpret mode on CPU;
the same kernel compiles for TPU).

The dropout tests replicate the kernel's counter-based lowbias32 hash in
numpy, so the dropped-entry pattern — and therefore the forward output and
the custom-VJP gradients — are pinned exactly, not just statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag4dyg_tpu.config import ModelConfig
from rag4dyg_tpu.models.gpt2 import GPT2LMModel, init_params
from rag4dyg_tpu.ops.flash_attention import (MAX_FLASH_LEN,
                                             attention_reference,
                                             flash_attention)


def _rand(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def _qkv(seed, B, H, L, Dh):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(_rand(rng, B, H, L, Dh)) for _ in range(3))


@pytest.mark.parametrize("B,H,L,Dh", [(2, 3, 128, 128), (1, 2, 100, 96),
                                      (2, 1, 257, 64)])
def test_fwd_matches_reference(B, H, L, Dh):
    q, k, v = _qkv(0, B, H, L, Dh)
    out = flash_attention(q, k, v)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("B,H,L,Dh", [(2, 2, 128, 128), (1, 2, 70, 96)])
def test_grads_match_reference(B, H, L, Dh):
    q, k, v = _qkv(1, B, H, L, Dh)

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.tanh(fn(q, k, v)))

    gf = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(attention_reference), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


# --- exact replica of ops/flash_attention._keep_mask ----------------------

def _keep_mask_oracle(seed, pid, shape, rate):
    h0 = (np.uint64(np.uint32(seed)) ^
          ((np.uint64(pid + 1) * np.uint64(0x9E3779B9)) & np.uint64(0xFFFFFFFF)))
    idx = np.arange(shape[0] * shape[1], dtype=np.uint64).reshape(shape)
    row, col = np.divmod(idx, np.uint64(shape[1]))
    x = (row * np.uint64(shape[1]) + col + h0) & np.uint64(0xFFFFFFFF)
    for mult, shift in ((0x7FEB352D, 16), (0x846CA68B, 15)):
        x ^= x >> np.uint64(shift)
        x = (x * np.uint64(mult)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(16)
    cutoff = min(int(rate * 4294967296.0), 4294967295)
    return x >= np.uint64(cutoff)


def _oracle_dropout_attention(q, k, v, seed, rate):
    B, H, L, Dh = q.shape
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(Dh)
    mask = jnp.tril(jnp.ones((L, L), bool))[None, None]
    att = jax.nn.softmax(jnp.where(mask, att, -1e9), axis=-1)
    keep = np.stack([_keep_mask_oracle(seed, b * H + h, (L, L), rate)
                     for b in range(B) for h in range(H)]).reshape(B, H, L, L)
    att = jnp.where(jnp.asarray(keep), att, 0.0) / (1.0 - rate)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


def test_dropout_matches_hash_oracle_exactly():
    B, H, L, Dh = 2, 3, 128, 128  # unpadded: oracle indices line up 1:1
    q, k, v = _qkv(2, B, H, L, Dh)
    rate, seed = 0.3, 1234
    out = flash_attention(q, k, v, dropout_rate=rate, dropout_seed=seed)
    ref = _oracle_dropout_attention(q, k, v, seed, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    # the hash's drop fraction is plausible for Bernoulli(rate)
    keep = np.stack([_keep_mask_oracle(seed, p, (L, L), rate)
                     for p in range(B * H)])
    assert 0.28 < 1.0 - keep.mean() < 0.32


def test_dropout_grads_match_hash_oracle():
    B, H, L, Dh = 1, 2, 128, 128
    q, k, v = _qkv(3, B, H, L, Dh)
    rate, seed = 0.25, 77

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.tanh(fn(q, k, v)))

    gf = jax.grad(loss(lambda q, k, v: flash_attention(
        q, k, v, dropout_rate=rate, dropout_seed=seed)),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss(lambda q, k, v: _oracle_dropout_attention(
        q, k, v, seed, rate)), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_dropout_deterministic_per_seed():
    q, k, v = _qkv(4, 1, 2, 128, 64)
    a = flash_attention(q, k, v, dropout_rate=0.2, dropout_seed=9)
    b = flash_attention(q, k, v, dropout_rate=0.2, dropout_seed=9)
    c = flash_attention(q, k, v, dropout_rate=0.2, dropout_seed=10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.any(np.asarray(a) != np.asarray(c))


def test_wrapper_guards():
    q = jnp.zeros((1, 1, MAX_FLASH_LEN + 1, 64))
    with pytest.raises(ValueError, match="VMEM"):
        flash_attention(q, q, q)
    q = jnp.zeros((1, 1, 8, 8))
    with pytest.raises(ValueError, match="seed"):
        flash_attention(q, q, q, dropout_rate=0.1)


# --- model integration ----------------------------------------------------

def _tiny_config(impl):
    return ModelConfig(vocab_size=50, n_layer=2, n_head=2, n_embd=32,
                       n_positions=64, attention_impl=impl)


def test_model_flash_matches_xla_deterministic():
    ids = jnp.asarray(np.random.RandomState(5).randint(0, 50, (3, 40)),
                      jnp.int32)
    params = init_params(_tiny_config("xla"), jax.random.PRNGKey(0),
                         example_len=8)
    logits_x, hid_x, _ = GPT2LMModel(_tiny_config("xla")).apply(
        {"params": params}, ids)
    logits_f, hid_f, _ = GPT2LMModel(_tiny_config("flash")).apply(
        {"params": params}, ids)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_x),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hid_f), np.asarray(hid_x),
                               atol=2e-5, rtol=1e-4)


def test_model_flash_training_mode_runs_and_differs():
    """Non-deterministic (dropout) flash pass: exercises the in-kernel
    dropout seed derivation from the flax rng stream."""
    cfg = _tiny_config("flash")
    ids = jnp.asarray(np.random.RandomState(6).randint(0, 50, (2, 16)),
                      jnp.int32)
    params = init_params(cfg, jax.random.PRNGKey(1), example_len=8)
    model = GPT2LMModel(cfg)
    l1, _, _ = model.apply({"params": params}, ids, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    l2, _, _ = model.apply({"params": params}, ids, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(3)})
    l_det, _, _ = model.apply({"params": params}, ids)
    assert np.any(np.asarray(l1) != np.asarray(l2))
    assert np.all(np.isfinite(np.asarray(l1)))
    assert np.any(np.asarray(l1) != np.asarray(l_det))


# --- GSPMD partitioning ---------------------------------------------------

def _mesh8():
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()).reshape(-1), ("data",))


def test_sharded_fwd_no_collectives():
    """Batch-sharded flash must match the replicated result and lower
    without any all-gather (custom_partitioning batch rule)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = _mesh8()
    B, H, L, Dh = 16, 2, 128, 64
    q, k, v = _qkv(7, B, H, L, Dh)
    sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v),
                in_shardings=(sh, sh, sh), out_shardings=sh)
    args = tuple(jax.device_put(x, sh) for x in (q, k, v))
    out = f(*args)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
    txt = f.lower(*args).compile().as_text()
    assert "all-gather" not in txt and "all-reduce" not in txt


def test_sharded_grads_match_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = _mesh8()
    B, H, L, Dh = 8, 2, 128, 64
    q, k, v = _qkv(8, B, H, L, Dh)
    sh = NamedSharding(mesh, P("data"))

    def loss(q, k, v):
        return jnp.sum(jnp.tanh(flash_attention(q, k, v)))

    g_sharded = jax.jit(jax.grad(loss, argnums=(0, 1, 2)),
                        in_shardings=(sh, sh, sh))(
        *[jax.device_put(x, sh) for x in (q, k, v)])
    g_single = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_sharded, g_single):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


def test_sharded_dropout_partitioning_invariant():
    """The dropout mask is a pure function of (seed, global cell id,
    position) — the cell ids ship as a dim-0-sharded operand, so the
    sharded result must be IDENTICAL to the single-device one (and to
    the numpy hash oracle), and gradients must agree even when the
    output sharding differs from the inputs' (asymmetric fwd/bwd
    partitioning — the case a program-id-based stream would corrupt)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = _mesh8()
    B, H, L, Dh = 8, 1, 128, 64  # one (b, h) cell per device
    q, k, v = _qkv(9, B, H, L, Dh)
    rate, seed = 0.4, 11
    sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    args = tuple(jax.device_put(x, sh) for x in (q, k, v))

    f = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, dropout_rate=rate, dropout_seed=seed),
        in_shardings=(sh, sh, sh), out_shardings=sh)
    out = np.asarray(f(*args))
    single = np.asarray(flash_attention(q, k, v, dropout_rate=rate,
                                        dropout_seed=seed))
    np.testing.assert_array_equal(out, single)
    ref = _oracle_dropout_attention(q, k, v, seed, rate)
    np.testing.assert_allclose(out, np.asarray(ref), atol=2e-5, rtol=1e-5)

    # asymmetric partitioning: sharded inputs, REPLICATED grad output —
    # propagation may resolve the bwd call's shardings differently from
    # the fwd; the mask must not change
    def loss(q, k, v):
        return jnp.sum(jnp.tanh(flash_attention(
            q, k, v, dropout_rate=rate, dropout_seed=seed)))

    g_asym = jax.jit(jax.grad(loss, argnums=0),
                     in_shardings=(sh, sh, sh),
                     out_shardings=repl)(*args)
    g_single = jax.grad(loss, argnums=0)(q, k, v)
    np.testing.assert_allclose(np.asarray(g_asym), np.asarray(g_single),
                               atol=5e-5, rtol=1e-4)


def _masked_reference(q, k, v, skip, *, scale=None):
    """Oracle: causal + left-pad-prefix key mask, XLA attention math."""
    from rag4dyg_tpu.ops.flash_attention import NEG_INF
    Dh = q.shape[-1]
    scale = float(scale if scale is not None else 1.0 / np.sqrt(Dh))
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * scale
    L = q.shape[2]
    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
    keymask = (jnp.arange(L)[None, :] >= skip[:, None])[:, None, None, :]
    att = jnp.where(jnp.logical_and(causal, keymask), att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att,
                      v.astype(jnp.float32)).astype(q.dtype)


def test_key_skip_matches_masked_reference():
    """key_skip (left-pad prefix masking, the decode-prefill shape) must
    match the XLA-math oracle at real query rows, fwd AND grad."""
    B, H, L, Dh = 3, 2, 64, 32
    q, k, v = _qkv(11, B, H, L, Dh)
    skip = jnp.asarray([0, 5, 63], jnp.int32)
    out = flash_attention(q, k, v, key_skip=skip)
    ref = _masked_reference(q, k, v, skip)
    # compare only real query rows (pad-query rows are documented garbage
    # on both paths, with different uniform conventions)
    real = (jnp.arange(L)[None, :] >= skip[:, None])[:, None, :, None]
    np.testing.assert_allclose(np.asarray(out * real),
                               np.asarray(ref * real), atol=2e-5, rtol=1e-5)

    def loss_flash(q, k, v):
        return jnp.sum((flash_attention(q, k, v, key_skip=skip) * real) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((_masked_reference(q, k, v, skip) * real) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=1e-4)


def test_key_skip_zero_is_pure_causal():
    """skip=0 everywhere must be bit-identical to the no-mask call —
    the certified retriever path is unchanged by the meta extension."""
    B, H, L, Dh = 2, 2, 128, 64
    q, k, v = _qkv(13, B, H, L, Dh)
    base = flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=9)
    skip0 = flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=9,
                            key_skip=jnp.zeros(B, jnp.int32))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(skip0))
