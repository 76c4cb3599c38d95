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
