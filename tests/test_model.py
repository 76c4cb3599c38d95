"""GPT-2 backbone: shapes, causality, cache correctness, decode equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag4dyg_tpu.config import ModelConfig
from rag4dyg_tpu.models import GPT2LMModel, init_cache, init_params
from rag4dyg_tpu.models.gpt2 import load_node_feature_embeddings
from rag4dyg_tpu.ops.decode import greedy_decode, left_pad_batch

CFG = ModelConfig(vocab_size=64, n_layer=2, n_head=2, n_embd=32,
                  n_positions=128)


@pytest.fixture(scope="module")
def model_and_params():
    model = GPT2LMModel(CFG)
    params = init_params(CFG, jax.random.PRNGKey(0))
    return model, params


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    ids = jnp.arange(12, dtype=jnp.int32).reshape(2, 6)
    logits, hidden, cache = model.apply({"params": params}, ids)
    assert logits.shape == (2, 6, 64)
    assert hidden.shape == (2, 6, 32)
    assert cache is None
    assert logits.dtype == jnp.float32


def test_causality(model_and_params):
    """Changing a future token must not change past logits."""
    model, params = model_and_params
    ids = jnp.arange(10, dtype=jnp.int32)[None]
    logits1, _, _ = model.apply({"params": params}, ids)
    ids2 = ids.at[0, 7].set(63)
    logits2, _, _ = model.apply({"params": params}, ids2)
    np.testing.assert_allclose(logits1[0, :7], logits2[0, :7], atol=1e-5)
    assert not np.allclose(logits1[0, 7:], logits2[0, 7:], atol=1e-5)


def test_kv_cache_matches_full_forward(model_and_params):
    """Incremental cached decode logits == full re-forward logits."""
    model, params = model_and_params
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 64)

    full_logits, _, _ = model.apply({"params": params}, ids)

    cache = init_cache(CFG, 2, 16)
    # prefill first 5 tokens, then feed one token at a time
    logits, _, cache = model.apply({"params": params}, ids[:, :5], cache=cache)
    step_logits = [logits[:, i] for i in range(5)]
    for t in range(5, 9):
        logits, _, cache = model.apply({"params": params}, ids[:, t:t + 1],
                                       cache=cache)
        step_logits.append(logits[:, 0])
    inc = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full_logits), np.asarray(inc),
                               atol=1e-4)


def test_left_padded_equals_unpadded(model_and_params):
    """Left-padded forward with pad_mask + position ids == unpadded forward."""
    model, params = model_and_params
    seq = list(range(1, 8))
    ids, mask, pos = left_pad_batch([seq, seq[:4]], pad_id=0, multiple_of=4)
    cache = init_cache(CFG, 2, 12)
    logits, _, _ = model.apply({"params": params}, jnp.asarray(ids),
                               pad_mask=jnp.asarray(mask),
                               position_ids=jnp.asarray(pos), cache=cache)
    ref_logits, _, _ = model.apply({"params": params},
                                   jnp.asarray([seq], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits[0, -len(seq):]),
                               np.asarray(ref_logits[0]), atol=1e-4)
    ref2, _, _ = model.apply({"params": params},
                             jnp.asarray([seq[:4]], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits[1, -4:]),
                               np.asarray(ref2[0]), atol=1e-4)


def _reference_greedy(model, params, seq, eos_id, cap):
    """The reference decode loop: full re-forward per token, no cache
    (reference: utils/Evaluation_SimpleDyG.py:126-145)."""
    toks = list(seq)
    out = []
    while True:
        logits, _, _ = model.apply({"params": params},
                                   jnp.asarray([toks], jnp.int32))
        nxt = int(jnp.argmax(logits[0, -1]))
        toks.append(nxt)
        out.append(nxt)
        if nxt == eos_id or len(out) >= cap:
            break
    return out


def test_batched_greedy_matches_reference_loop(model_and_params):
    model, params = model_and_params
    rng = np.random.RandomState(0)
    seqs = [list(rng.randint(0, 64, size=n)) for n in (5, 9, 3)]
    eos_id = 63
    caps = [6, 6, 6]
    tokens, lengths = greedy_decode(model, params, seqs, eos_id=eos_id,
                                    pad_id=0, caps=caps, max_steps=6,
                                    bucket=4)
    for i, seq in enumerate(seqs):
        ref = _reference_greedy(model, params, seq, eos_id, caps[i])
        got = [int(t) for t in tokens[i, :lengths[i]]]
        assert got == ref, f"row {i}: {got} vs {ref}"


def test_node_feature_embedding_init(model_and_params):
    _, params = model_and_params
    feats = np.ones((10, 8), np.float32)
    new = load_node_feature_embeddings(params, feats, num_nodes=10)
    wte = np.asarray(new["wte"])
    assert wte.shape == (64, 32)
    np.testing.assert_array_equal(wte[:10, :8], 1.0)
    np.testing.assert_array_equal(wte[:10, 8:], 0.0)
    np.testing.assert_array_equal(wte[10:], np.asarray(params["wte"])[10:])


def test_dropout_active_in_training(model_and_params):
    model, params = model_and_params
    ids = jnp.arange(12, dtype=jnp.int32).reshape(2, 6)
    l1, _, _ = model.apply({"params": params}, ids, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
    l2, _, _ = model.apply({"params": params}, ids, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_flash_prefill_matches_xla_cache_path():
    """attention_impl=flash routes the L>1 cache PREFILL through the
    pallas kernel with cache_valid's left-pad prefix as a key-skip
    count; logits at real positions and the updated cache must match the
    XLA cache path (interpret-mode kernel on CPU)."""
    import dataclasses

    cfg_flash = dataclasses.replace(CFG, attention_impl="flash")
    model_x = GPT2LMModel(CFG)
    model_f = GPT2LMModel(cfg_flash)
    params = init_params(CFG, jax.random.PRNGKey(1))

    seqs = [list(range(1, 10)), list(range(3, 7))]
    ids, mask, pos = left_pad_batch(seqs, pad_id=0, multiple_of=4)
    args = (jnp.asarray(ids),)
    kw = dict(pad_mask=jnp.asarray(mask), position_ids=jnp.asarray(pos))

    lx, _, cx = model_x.apply({"params": params}, *args,
                              cache=init_cache(CFG, 2, 16), **kw)
    lf, _, cf = model_f.apply({"params": params}, *args,
                              cache=init_cache(cfg_flash, 2, 16), **kw)
    # logits at REAL positions (pad rows are garbage on both paths)
    for b, seq in enumerate(seqs):
        np.testing.assert_allclose(np.asarray(lf[b, -len(seq):]),
                                   np.asarray(lx[b, -len(seq):]),
                                   atol=2e-4)
    # the flash branch must still have produced the identical kv cache at
    # VALID slots (invalid-slot k/v at layers >= 2 are path-dependent
    # garbage — pad-position hidden states differ between the two paths'
    # fully-masked softmax conventions — and stay masked by cache_valid)
    np.testing.assert_allclose(np.asarray(cf["valid"]),
                               np.asarray(cx["valid"]))
    vmask = np.asarray(cx["valid"])[None, :, None, :, None]  # [1,B,1,T,1]
    np.testing.assert_allclose(np.asarray(cf["k"]) * vmask,
                               np.asarray(cx["k"]) * vmask, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf["v"]) * vmask,
                               np.asarray(cx["v"]) * vmask, atol=1e-5)

    # end-to-end: greedy decode streams must agree token-for-token
    tok_x, len_x = greedy_decode(model_x, params, seqs, eos_id=63,
                                 pad_id=0, caps=[6, 6], max_steps=6)
    tok_f, len_f = greedy_decode(model_f, params, seqs, eos_id=63,
                                 pad_id=0, caps=[6, 6], max_steps=6)
    np.testing.assert_array_equal(len_x, len_f)
    for a, b in zip(tok_x, tok_f):
        np.testing.assert_array_equal(a, b)
