"""Mesh sharding: the 2-D (data, model) sharded train step must compile,
run, and agree with the single-device step on the same inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag4dyg_tpu.config import ModelConfig
from rag4dyg_tpu.models import GPT2LMModel, init_params
from rag4dyg_tpu.parallel import (
    make_mesh,
    make_sharded_lm_train_step,
    param_partition_specs,
)
from rag4dyg_tpu.parallel.mesh import shard_batch
from rag4dyg_tpu.train.backbone import make_lm_train_step
from rag4dyg_tpu.train.state import linear_warmup_linear_decay, make_optimizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _setup():
    cfg = ModelConfig(vocab_size=64, n_layer=2, n_head=4, n_embd=16,
                      n_positions=32)
    model = GPT2LMModel(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    optimizer = make_optimizer(params,
                               linear_warmup_linear_decay(1e-3, 0, 100))
    batch = np.random.RandomState(0).randint(0, 64, (8, 12))
    return cfg, model, params, optimizer, batch


def test_partition_specs_cover_tree():
    cfg, model, params, _, _ = _setup()
    specs = param_partition_specs(params)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(specs, is_leaf=lambda x: x is None or
                                       hasattr(x, "index"))
    assert len(flat_p) == len(flat_s)


def test_sharded_step_matches_single_device():
    cfg, model, params, optimizer, batch = _setup()
    mesh = make_mesh(n_data=4, n_model=2)
    rng = jax.random.PRNGKey(7)

    # single-device step first: the sharded step donates its buffers, and
    # replicated device_put may alias the originals on CPU
    single_step = make_lm_train_step(model, optimizer)
    opt_state = optimizer.init(params)
    _, _, loss_single = single_step(params, opt_state, jnp.asarray(batch),
                                    rng)

    sharded_step, sh_params, sh_opt = make_sharded_lm_train_step(
        model, optimizer, mesh, params)
    new_p, new_o, loss_sharded = sharded_step(sh_params, sh_opt,
                                              shard_batch(batch, mesh), rng)

    # dropout rng folding is identical (same key, same shapes), so losses
    # must agree to float tolerance across shardings
    np.testing.assert_allclose(float(loss_sharded), float(loss_single),
                               rtol=2e-4)


def test_data_parallel_mesh_runs():
    cfg, model, params, optimizer, batch = _setup()
    mesh = make_mesh(n_data=8, n_model=1)
    step, sh_params, sh_opt = make_sharded_lm_train_step(
        model, optimizer, mesh, params)
    _, _, loss = step(sh_params, sh_opt, shard_batch(batch, mesh),
                      jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_train_backbone_on_mesh(tmp_path):
    """End-to-end sharded training: train_backbone(mesh=...) must run and
    produce a usable best checkpoint."""
    import json
    import os

    from rag4dyg_tpu.config import DatasetSpec
    from rag4dyg_tpu.train.backbone import train_backbone

    d = tmp_path / "res"
    d.mkdir()
    lines = [f"<|endoftext|> <|history|> {e} <|time0|> {(e+1)%10} {(e+2)%10} "
             f"<|endofhistory|> <|pre|> <|time1|> {(e+3)%10} <|endofpre|> "
             f"<|endoftext|>" for e in range(8)]
    (d / "train.link_prediction").write_text("\n".join(lines) + "\n")
    ev = [f"<|endoftext|> <|history|> {e} <|time0|> {(e+1)%10} "
          f"<|endofhistory|>" for e in range(4)]
    gt = [f"<|pre|> <|time1|> {(e+2)%10} <|endofpre|> <|endoftext|>"
          for e in range(4)]
    for split in ("val", "test"):
        (d / f"{split}.link_prediction").write_text("\n".join(ev) + "\n")
        (d / f"{split}_gt.link_prediction").write_text("\n".join(gt) + "\n")
    (d / "vocab.json").write_text(json.dumps({str(i): i for i in range(10)}))

    spec = DatasetSpec(name="tiny", timestep=1, csv_name="t", time_scale=1.0,
                       n_layer=1, n_head=2, n_embd=16, batch_size=4,
                       epochs=2, patience=100)
    mesh = make_mesh(n_data=4, n_model=2)
    res = train_backbone(spec, str(d), str(tmp_path / "out"), epochs=2,
                         seed=0, mesh=mesh)
    assert os.path.isdir(res.checkpoint_dir)
    assert res.val_metrics["num_scored"] == 4


def test_sharded_retriever_step_matches_single_device():
    """The mesh-sharded contrastive step (global in-batch negatives via
    XLA collectives) must agree with the single-device step: same loss,
    same updated params."""
    from rag4dyg_tpu.parallel.mesh import make_sharded_retriever_step
    from rag4dyg_tpu.train.retriever import make_retriever_train_step

    cfg = ModelConfig(vocab_size=64, n_layer=2, n_head=4, n_embd=16,
                      n_positions=32)
    model = GPT2LMModel(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    optimizer = make_optimizer(params,
                               linear_warmup_linear_decay(1e-3, 0, 100))
    hyper = dict(alpha=0.5, temperature=0.1, lambda_decay=0.01, eta=0.8,
                 gamma=0.4, mask_token=63, pad_id=62)

    rng_np = np.random.RandomState(1)
    pool = jnp.asarray(rng_np.randint(0, 60, (32, 12)), jnp.int32)
    idx = jnp.asarray(rng_np.randint(0, 32, (8, 3)), jnp.int32)
    times = rng_np.rand(3, 8).astype(np.float32)
    rng = jax.random.PRNGKey(3)

    single = make_retriever_train_step(model, optimizer, **hyper)
    opt_state = optimizer.init(params)
    sp, _, loss_s, _, _ = single(params, opt_state, pool, idx,
                                 jnp.asarray(times[0]), jnp.asarray(times[1]),
                                 jnp.asarray(times[2]), rng)

    mesh = make_mesh(n_data=4, n_model=2)
    step, sh_params, sh_opt = make_sharded_retriever_step(
        model, optimizer, mesh, params, **hyper)
    mp, _, loss_m = step(sh_params, sh_opt, pool, idx,
                         jnp.asarray(times[0]), jnp.asarray(times[1]),
                         jnp.asarray(times[2]), rng)
    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=2e-4)
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(sp), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(mp), key=key)):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4,
                                   err_msg=jax.tree_util.keystr(ka))


def test_sharded_retriever_step_flash_matches_single_device():
    """Same as above but with the Pallas flash-attention kernel in the
    encoder: custom_partitioning shards the kernel over the batch without
    collectives, so the sharded step must still reproduce the
    single-device step. attn_pdrop=0 isolates partitioning (the kernel's
    in-kernel dropout stream is deliberately shard-offset — covered by
    tests/test_flash_attention.py); the threefry embd/resid dropouts stay
    on and are position-invariant under GSPMD."""
    from rag4dyg_tpu.parallel.mesh import make_sharded_retriever_step
    from rag4dyg_tpu.train.retriever import make_retriever_train_step

    cfg = ModelConfig(vocab_size=64, n_layer=2, n_head=4, n_embd=16,
                      n_positions=32, attention_impl="flash",
                      attn_pdrop=0.0)
    model = GPT2LMModel(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    optimizer = make_optimizer(params,
                               linear_warmup_linear_decay(1e-3, 0, 100))
    hyper = dict(alpha=0.5, temperature=0.1, lambda_decay=0.01, eta=0.8,
                 gamma=0.4, mask_token=63, pad_id=62)

    rng_np = np.random.RandomState(2)
    pool = jnp.asarray(rng_np.randint(0, 60, (32, 12)), jnp.int32)
    idx = jnp.asarray(rng_np.randint(0, 32, (8, 3)), jnp.int32)
    times = rng_np.rand(3, 8).astype(np.float32)
    rng = jax.random.PRNGKey(5)

    single = make_retriever_train_step(model, optimizer, **hyper)
    opt_state = optimizer.init(params)
    sp, _, loss_s, _, _ = single(params, opt_state, pool, idx,
                                 jnp.asarray(times[0]), jnp.asarray(times[1]),
                                 jnp.asarray(times[2]), rng)

    mesh = make_mesh(n_data=4, n_model=2)
    step, sh_params, sh_opt = make_sharded_retriever_step(
        model, optimizer, mesh, params, **hyper)
    mp, _, loss_m = step(sh_params, sh_opt, pool, idx,
                         jnp.asarray(times[0]), jnp.asarray(times[1]),
                         jnp.asarray(times[2]), rng)
    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=2e-4)
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(sp), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(mp), key=key)):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4,
                                   err_msg=jax.tree_util.keystr(ka))
