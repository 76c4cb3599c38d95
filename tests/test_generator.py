"""Stage-4 generator: prefill splicing, demo store, and a train-step smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from rag4dyg_tpu.config import ModelConfig
from rag4dyg_tpu.models import GPT2LMModel, init_params
from rag4dyg_tpu.train.generator import (
    DemoStore,
    fused_embedding,
    init_fusion_params,
    make_generator_train_step,
    splice_prefill,
)
from rag4dyg_tpu.train.state import linear_warmup_linear_decay, make_optimizer


def test_splice_prefill_ragged_rows():
    """Fused token must land after the 2nd real token of each left-padded
    row, with pads staying left and positions re-derived."""
    V, D, m = 11, 4, 1
    rng = np.random.RandomState(0)
    wte = jnp.asarray(rng.randn(V, D).astype(np.float32))
    # rows with 5 and 3 real tokens, left-padded to L=6 with pad id 10
    ids = np.array([[10, 1, 2, 3, 4, 5],
                    [10, 10, 10, 6, 7, 8]], np.int32)
    pad_mask = ids != 10
    fused = jnp.asarray(rng.randn(2, m, D).astype(np.float32))

    embeds, out_mask, pos = splice_prefill(wte, jnp.asarray(ids),
                                           jnp.asarray(pad_mask), fused)
    assert embeds.shape == (2, 7, D)
    w = np.asarray(wte)
    e = np.asarray(embeds)
    # row 0: [pad, 1, 2, fused, 3, 4, 5]
    np.testing.assert_allclose(e[0, 1], w[1])
    np.testing.assert_allclose(e[0, 2], w[2])
    np.testing.assert_allclose(e[0, 3], np.asarray(fused)[0, 0])
    np.testing.assert_allclose(e[0, 4:], w[[3, 4, 5]])
    # row 1: [pad, pad, pad, 6, 7, fused, 8]
    np.testing.assert_allclose(e[1, 3], w[6])
    np.testing.assert_allclose(e[1, 4], w[7])
    np.testing.assert_allclose(e[1, 5], np.asarray(fused)[1, 0])
    np.testing.assert_allclose(e[1, 6], w[8])

    np.testing.assert_array_equal(np.asarray(out_mask),
                                  [[False, True, True, True, True, True, True],
                                   [False, False, False, True, True, True, True]])
    np.testing.assert_array_equal(np.asarray(pos[0, 1:]), np.arange(6))
    np.testing.assert_array_equal(np.asarray(pos[1, 3:]), np.arange(4))


def test_demo_store_gather_and_concat():
    pool = [[1, 2, 3], [4, 5], [6, 7, 8, 9]]
    store = DemoStore(pool, pad_id=0, top_k=2, bucket=4)
    ids, valid = store.gather(np.array([[2, 0], [1, 2]]))
    assert ids.shape == (2, 2, 4)
    np.testing.assert_array_equal(np.asarray(ids[0, 0]), [6, 7, 8, 9])
    np.testing.assert_array_equal(np.asarray(valid[0, 1]),
                                  [True, True, True, False])
    cat = store.concat_for_mlp(np.array([[2, 0]]), pad_len=6)
    np.testing.assert_array_equal(cat[0], [6, 7, 8, 9, 1, 2])


def test_generator_train_step_updates_only_fusion():
    """With the backbone frozen, one step must change fusion params and
    nothing else, and the loss must be finite."""
    cfg = ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                      n_positions=64)
    model = GPT2LMModel(cfg)
    params = dict(init_params(cfg, jax.random.PRNGKey(0)))
    params["fusion"] = init_fusion_params(jax.random.PRNGKey(1), cfg,
                                          "graphpooling", m=1)
    frozen_labels = {
        k: jax.tree.map(
            lambda _: "trainable" if k == "fusion" else "frozen", v)
        for k, v in params.items()}
    optimizer = make_optimizer(params,
                               linear_warmup_linear_decay(1e-2, 0, 10),
                               frozen_labels=frozen_labels)
    opt_state = optimizer.init(params)
    step = make_generator_train_step(model, optimizer, fusion="graphpooling",
                                     m=1)

    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randint(0, 32, (2, 8)), jnp.int32)
    demo_ids = jnp.asarray(rng.randint(0, 32, (2, 3, 5)), jnp.int32)
    demo_valid = jnp.ones((2, 3, 5), bool)

    new_params, _, loss = step(params, opt_state, batch, demo_ids,
                               demo_valid, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(new_params["fusion"]["kernel"]),
                           np.asarray(params["fusion"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(new_params["wte"]),
                                  np.asarray(params["wte"]))


def test_fused_embedding_mlp_shape():
    cfg = ModelConfig(vocab_size=16, n_layer=1, n_head=1, n_embd=4)
    params = {"fusion": init_fusion_params(jax.random.PRNGKey(0), cfg, "mlp",
                                           m=2, fusion_pad_len=8)}
    wte = jnp.asarray(np.random.RandomState(0).randn(16, 4), jnp.float32)
    toks = jnp.asarray(np.random.RandomState(1).randint(0, 16, (3, 8)))
    out = fused_embedding(params, "mlp", wte, toks, m=2)
    assert out.shape == (3, 2, 4)


def test_generator_train_step_multilayer_gnn():
    """gnn_layers=2 produces a layered fusion tree whose every layer
    trains (the knob changes behavior; VERDICT r1 missing #3)."""
    cfg = ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                      n_positions=64)
    model = GPT2LMModel(cfg)
    params = dict(init_params(cfg, jax.random.PRNGKey(0)))
    params["fusion"] = init_fusion_params(jax.random.PRNGKey(1), cfg,
                                          "graphpooling", m=1, n_layers=2)
    assert set(params["fusion"]) == {"kernel_0", "bias_0",
                                     "kernel_1", "bias_1"}
    assert params["fusion"]["kernel_0"].shape == (8, 4)   # in -> hidden
    assert params["fusion"]["kernel_1"].shape == (4, 8)   # hidden -> out
    frozen_labels = {
        k: jax.tree.map(
            lambda _: "trainable" if k == "fusion" else "frozen", v)
        for k, v in params.items()}
    optimizer = make_optimizer(params,
                               linear_warmup_linear_decay(1e-2, 0, 10),
                               frozen_labels=frozen_labels)
    opt_state = optimizer.init(params)
    step = make_generator_train_step(model, optimizer, fusion="graphpooling",
                                     m=1, gnn_dropout=0.2)

    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randint(0, 32, (2, 8)), jnp.int32)
    demo_ids = jnp.asarray(rng.randint(0, 32, (2, 3, 5)), jnp.int32)
    demo_valid = jnp.ones((2, 3, 5), bool)

    new_params, _, loss = step(params, opt_state, batch, demo_ids,
                               demo_valid, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    for i in range(2):
        assert not np.allclose(
            np.asarray(new_params["fusion"][f"kernel_{i}"]),
            np.asarray(params["fusion"][f"kernel_{i}"])), i
    np.testing.assert_array_equal(np.asarray(new_params["wte"]),
                                  np.asarray(params["wte"]))


def test_fused_embedding_multilayer_mlp():
    from rag4dyg_tpu.train.generator import fused_embedding

    cfg = ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                      n_positions=64)
    params = {"fusion": init_fusion_params(
        jax.random.PRNGKey(3), cfg, "mlp", m=2, fusion_pad_len=16,
        n_layers=3)}
    assert params["fusion"]["kernel_0"].shape == (16, 8)
    wte = jnp.asarray(np.random.RandomState(0).randn(32, 8), jnp.float32)
    toks = jnp.asarray(np.random.RandomState(1).randint(0, 32, (2, 16)))
    out = fused_embedding(params, "mlp", wte, toks, m=2)
    assert out.shape == (2, 2, 8)


def test_generator_eval_loss_matches_manual():
    """The scanned val-loss dispatch equals a direct per-batch computation
    (reference evaluate(): mean over batches of mean CE with m ignore
    slots, train/train_generator.py:269-313)."""
    from rag4dyg_tpu.models.fusion import splice_labels
    from rag4dyg_tpu.train.generator import (
        fused_embedding,
        make_generator_eval_loss,
    )
    from rag4dyg_tpu.train.losses import shift_ce_loss

    cfg = ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                      n_positions=64, embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    model = GPT2LMModel(cfg)
    params = dict(init_params(cfg, jax.random.PRNGKey(0)))
    params["fusion"] = init_fusion_params(jax.random.PRNGKey(1), cfg,
                                          "graphpooling", m=1)
    rng = np.random.RandomState(0)
    S, B, L = 2, 3, 8
    batches = jnp.asarray(rng.randint(0, 32, (S, B, L)), jnp.int32)
    d_ids = jnp.asarray(rng.randint(0, 32, (S, B, 2, 5)), jnp.int32)
    d_valid = jnp.ones((S, B, 2, 5), bool)

    loss = float(make_generator_eval_loss(model, fusion="graphpooling",
                                          m=1)(params, batches, d_ids,
                                               d_valid))

    manual = []
    for s in range(S):
        fused = fused_embedding(params, "graphpooling", params["wte"],
                                d_ids[s], d_valid[s], m=1)
        embeds = jnp.take(params["wte"], batches[s], axis=0)
        embeds = jnp.concatenate([embeds[:, :2], fused, embeds[:, 2:]],
                                 axis=1)
        logits, _, _ = model.apply(
            {"params": {k: v for k, v in params.items() if k != "fusion"}},
            inputs_embeds=embeds, deterministic=True)
        manual.append(float(shift_ce_loss(logits,
                                          splice_labels(batches[s], 1))))
    assert abs(loss - np.mean(manual)) < 1e-5


def test_generator_eval_loss_all_ignored_is_finite():
    """VERDICT r2 #7: a val batch whose batch-window mask leaves ZERO
    counted positions (all-pad rows at smoke scale) must yield a finite
    loss, not a 0/0 nan (train/generator.py val-loss path;
    shift_ce_loss divides by max(count, 1))."""
    from rag4dyg_tpu.train.generator import make_generator_eval_loss

    cfg = ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                      n_positions=64, embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    model = GPT2LMModel(cfg)
    params = dict(init_params(cfg, jax.random.PRNGKey(0)))
    params["fusion"] = init_fusion_params(jax.random.PRNGKey(1), cfg,
                                          "graphpooling", m=1)
    pad_id = 31
    S, B, L = 1, 2, 8
    batches = jnp.full((S, B, L), pad_id, jnp.int32)  # all-pad rows
    d_ids = jnp.zeros((S, B, 2, 5), jnp.int32)
    d_valid = jnp.ones((S, B, 2, 5), bool)
    loss = float(make_generator_eval_loss(
        model, fusion="graphpooling", m=1, pad_id=pad_id)(
            params, batches, d_ids, d_valid))
    assert np.isfinite(loss), loss


def test_generator_freeze_stop_gradient_equivalent():
    """freeze=True (stop_gradient on the backbone) produces the SAME
    fusion update as freeze=False under the multi_transform freeze —
    only cheaper."""
    cfg = ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                      n_positions=64, embd_pdrop=0.0, attn_pdrop=0.0,
                      resid_pdrop=0.0)
    model = GPT2LMModel(cfg)
    params = dict(init_params(cfg, jax.random.PRNGKey(0)))
    params["fusion"] = init_fusion_params(jax.random.PRNGKey(1), cfg,
                                          "graphpooling", m=1)
    frozen_labels = {
        k: jax.tree.map(
            lambda _: "trainable" if k == "fusion" else "frozen", v)
        for k, v in params.items()}
    optimizer = make_optimizer(params,
                               linear_warmup_linear_decay(1e-2, 0, 10),
                               frozen_labels=frozen_labels)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randint(0, 32, (2, 8)), jnp.int32)
    demo_ids = jnp.asarray(rng.randint(0, 32, (2, 3, 5)), jnp.int32)
    demo_valid = jnp.ones((2, 3, 5), bool)

    outs = {}
    for freeze in (False, True):
        step = make_generator_train_step(model, optimizer,
                                         fusion="graphpooling", m=1,
                                         freeze=freeze)
        p, _, loss = step(params, optimizer.init(params), batch,
                          demo_ids, demo_valid, jax.random.PRNGKey(2))
        outs[freeze] = (float(loss), np.asarray(p["fusion"]["kernel"]))
    assert abs(outs[False][0] - outs[True][0]) < 1e-6
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               atol=1e-6, rtol=1e-6)


def test_generator_untied_lm_head_trains():
    """The reference's broken-weight-tying quirk (utils/model.py:71-78
    replaces model.transformer, leaving lm_head.weight an unfrozen random
    tensor): with untied_lm_head, one frozen-backbone step must train BOTH
    lm_head and fusion, leave wte untouched, and start from a
    random-head loss near ln(V)."""
    import math

    cfg = ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                      n_positions=64, untied_lm_head=True)
    model = GPT2LMModel(cfg)
    params = dict(init_params(cfg, jax.random.PRNGKey(0)))
    assert params["lm_head"].shape == (32, 8)
    params["fusion"] = init_fusion_params(jax.random.PRNGKey(1), cfg,
                                          "graphpooling", m=1)
    trainable = {"fusion", "lm_head"}
    frozen_labels = {
        k: jax.tree.map(
            lambda _, k=k: "trainable" if k in trainable else "frozen", v)
        for k, v in params.items()}
    optimizer = make_optimizer(params,
                               linear_warmup_linear_decay(1e-2, 0, 10),
                               frozen_labels=frozen_labels)
    opt_state = optimizer.init(params)
    step = make_generator_train_step(model, optimizer, fusion="graphpooling",
                                     m=1, freeze=True)
    rng = np.random.RandomState(0)
    batch = jnp.asarray(rng.randint(0, 32, (2, 8)), jnp.int32)
    demo_ids = jnp.asarray(rng.randint(0, 32, (2, 3, 5)), jnp.int32)
    demo_valid = jnp.ones((2, 3, 5), bool)

    new_params, _, loss = step(params, opt_state, batch, demo_ids,
                               demo_valid, jax.random.PRNGKey(2))
    # random untied head -> near-uniform predictions
    assert abs(float(loss) - math.log(32)) < 0.2
    assert not np.allclose(np.asarray(new_params["lm_head"]),
                           np.asarray(params["lm_head"]))
    assert not np.allclose(np.asarray(new_params["fusion"]["kernel"]),
                           np.asarray(params["fusion"]["kernel"]))
    np.testing.assert_array_equal(np.asarray(new_params["wte"]),
                                  np.asarray(params["wte"]))
    # tied config has no lm_head param and identical wte init
    tied = init_params(
        ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                    n_positions=64), jax.random.PRNGKey(0))
    assert "lm_head" not in tied
    np.testing.assert_array_equal(np.asarray(tied["wte"]),
                                  np.asarray(params["wte"]))


def test_batch_window_labels_matches_reference_loss():
    """Our batches are statically padded to the pool width; the reference
    pads per batch (dataloader/generator.py:118-119) and counts every
    position of that window in mean CE, pad labels included
    (train/train_generator.py:79,100-102). batch_window_labels must make
    our counted-position set bit-identical: same loss as a torch
    transliteration computing CE on the pad_sequence-width batch."""
    import torch

    from rag4dyg_tpu.models.fusion import batch_window_labels, splice_labels
    from rag4dyg_tpu.train.losses import shift_ce_loss

    V, PAD, m, L = 23, 3, 2, 40
    rng = np.random.RandomState(0)
    lens = [7, 19, 11]
    batch = np.full((len(lens), L), PAD, np.int32)
    for i, n in enumerate(lens):
        row = rng.randint(0, V, n)
        row[row == PAD] = PAD + 1  # pad only in the tail
        batch[i, :n] = row
    logits = rng.randn(len(lens), L + m, V).astype(np.float32)

    ours = splice_labels(jnp.asarray(batch), m)
    ours = batch_window_labels(ours, jnp.asarray(batch), PAD, m)
    loss = float(shift_ce_loss(jnp.asarray(logits), ours))

    # reference: rows padded to max(lens); m ignore slots after position 2;
    # CrossEntropyLoss (default mean over non-ignored) on the shift
    Lmax = max(lens)
    ref_labels = np.full((len(lens), Lmax), PAD, np.int64)
    for i, n in enumerate(lens):
        ref_labels[i, :n] = batch[i, :n]
    ref_labels = np.concatenate(
        [ref_labels[:, :2], np.full((len(lens), m), -100, np.int64),
         ref_labels[:, 2:]], axis=1)
    ref_logits = torch.from_numpy(logits[:, : Lmax + m])
    sl = ref_logits[:, :-1].reshape(-1, V)
    st = torch.from_numpy(ref_labels)[:, 1:].reshape(-1)
    ref = float(torch.nn.CrossEntropyLoss()(sl, st))
    assert abs(loss - ref) < 1e-6

    # and without the window, the statically padded loss differs (dilution)
    undiluted = float(shift_ce_loss(jnp.asarray(logits),
                                    splice_labels(jnp.asarray(batch), m)))
    assert abs(undiluted - ref) > 1e-3


def test_mlp_epoch_scan_matches_per_step():
    """The MLP-fusion epoch scan (device cat_table gather) must produce
    the same params/loss as per-step calls with host-side
    concat_for_mlp d_ids — the layout the round-2 trainer used."""
    from rag4dyg_tpu.train.generator import make_generator_epoch_fn

    cfg = ModelConfig(vocab_size=32, n_layer=1, n_head=2, n_embd=8,
                      n_positions=96)
    model = GPT2LMModel(cfg)
    params = dict(init_params(cfg, jax.random.PRNGKey(0)))
    params["fusion"] = init_fusion_params(jax.random.PRNGKey(1), cfg,
                                          "mlp", m=2, fusion_pad_len=16)
    optimizer = make_optimizer(params,
                               linear_warmup_linear_decay(1e-2, 0, 10))
    opt_state = optimizer.init(params)

    rng = np.random.RandomState(3)
    pool = [list(rng.randint(1, 31, size=rng.randint(3, 7)))
            for _ in range(6)]
    store = DemoStore(pool, pad_id=0, top_k=2, bucket=8)
    topk_table = np.asarray([[1, 2], [0, 3], [4, 5], [2, 0], [5, 1],
                             [3, 4]], np.int32)
    cat_table = jnp.asarray(store.concat_for_mlp(topk_table, pad_len=16))

    epoch_fn, step = make_generator_epoch_fn(model, optimizer, m=2,
                                             pad_id=0, fusion="mlp")
    rows_all = np.asarray([[0, 2], [5, 1]], np.int32)         # 2 steps, B=2
    rngs = jax.random.split(jax.random.PRNGKey(7), 2)
    valids = jnp.ones(2, bool)
    p_scan, _, loss_scan = epoch_fn(
        params, opt_state, store.ids, store.valid,
        jnp.asarray(rows_all), jnp.zeros((2, 2, 2), jnp.int32),
        rngs, valids, cat_table)

    p_ref, o_ref, total = params, opt_state, 0.0
    for s in range(2):
        batch = jnp.take(store.ids, jnp.asarray(rows_all[s]), axis=0)
        d_ids = jnp.asarray(store.concat_for_mlp(topk_table[rows_all[s]],
                                                 pad_len=16))
        d_valid = jnp.zeros((2, 1), bool)
        p_ref, o_ref, loss = step(p_ref, o_ref, batch, d_ids, d_valid,
                                  rngs[s])
        total += float(loss)

    np.testing.assert_allclose(float(loss_scan), total, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), p_scan, p_ref)
