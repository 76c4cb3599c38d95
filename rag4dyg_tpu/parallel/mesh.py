"""Device-mesh parallelism: data + tensor sharding for the GPT-2 stack.

The reference's distributed surface is dead DataParallel/DDP-over-NCCL
scaffolding that its launch scripts never exercise (reference:
main_SimpleDyG.py:242-249,393-397 — every script pins one GPU). The
TPU-native replacement is single-program SPMD: one ``jax.sharding.Mesh``
over the slice, parameters and batches annotated with ``NamedSharding``,
and XLA inserting the collectives (gradient ``psum`` replaces DDP
all-reduce; tensor-parallel matmul reduce-scatters ride the ICI).

Axes:
  * ``data``  — batch axis; gradients are all-reduced across it (the DDP
    equivalent).
  * ``model`` — Megatron-style tensor parallelism: attention QKV/output
    projections and MLP kernels are sharded on their feature axes, so the
    two matmuls of each pair need only one collective.

The models here are small enough that pipeline/expert parallelism would be
pure overhead; the scaling pressure is on the *pool* axis instead, which
``pool/index.py`` shards over ``data`` with a shard_map top-k merge.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag4dyg_tpu.train.losses import shift_ce_loss


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """2-D ``(data, model)`` mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    assert n_data * n_model == devices.size, (
        f"{devices.size} devices != {n_data} x {n_model}")
    return Mesh(devices.reshape(n_data, n_model), ("data", "model"))


def param_partition_specs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for a GPT2LMModel param tree.

    Feature-axis sharding on the big matmuls (Megatron pairing: c_attn /
    c_fc column-sharded, the following c_proj row-sharded); embeddings,
    LayerNorms, and biases of row-sharded layers replicated.
    """
    def spec(path, leaf) -> P:
        keys = [p.key if hasattr(p, "key") else str(p) for p in path]
        name = "/".join(keys)
        if leaf.ndim == 2:
            if "attn/c_attn" in name or "mlp/c_fc" in name:
                return P(None, "model")   # column parallel
            if "attn/c_proj" in name or "mlp/c_proj" in name:
                return P("model", None)   # row parallel
        if leaf.ndim == 1 and ("attn/c_attn" in name or "mlp/c_fc" in name) \
                and keys[-1] == "bias":
            return P("model")
        return P()  # replicated
    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params: Dict[str, Any], mesh: Mesh,
                 specs: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    specs = specs if specs is not None else param_partition_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def _opt_state_shardings(optimizer, params, specs, mesh: Mesh):
    """Sharding tree for the optimizer state: optax moment trees (``mu`` /
    ``nu``) mirror the param tree and inherit its specs; everything else
    (step counts, empty states) replicates. ``init`` only consumes input
    *shapes*, so GSPMD cannot propagate input shardings to it — the layout
    must be requested explicitly."""
    flat_specs = {
        jax.tree_util.keystr(path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(specs)[0]}
    shape_tree = jax.eval_shape(optimizer.init, params)

    def pick(path, _leaf):
        ks = jax.tree_util.keystr(path)
        for moment in (".mu", ".nu"):
            if moment in ks:
                sub = ks.split(moment, 1)[1]
                if sub in flat_specs:
                    return NamedSharding(mesh, flat_specs[sub])
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(pick, shape_tree)


def make_sharded_lm_train_step(model, optimizer, mesh: Mesh,
                               params: Dict[str, Any]):
    """jit-compiled LM train step with explicit input/param shardings.

    Batch is sharded over ``data``; params follow
    ``param_partition_specs``; XLA inserts the gradient all-reduce across
    ``data`` and the tensor-parallel collectives across ``model``.
    Returns (step_fn, sharded_params, opt_state).
    """
    specs = param_partition_specs(params)
    params = shard_params(params, mesh, specs)
    param_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    opt_shardings = _opt_state_shardings(optimizer, params, specs, mesh)
    opt_state = jax.jit(optimizer.init, in_shardings=(param_shardings,),
                        out_shardings=opt_shardings)(params)

    batch_sharding = NamedSharding(mesh, P("data", None))
    rng_sharding = NamedSharding(mesh, P())

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits, _, _ = model.apply({"params": p}, batch,
                                       deterministic=False,
                                       rngs={"dropout": rng})
            return shift_ce_loss(logits, batch)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step_with_shardings = jax.jit(
        step,
        in_shardings=(param_shardings, opt_shardings, batch_sharding,
                      rng_sharding),
        donate_argnums=(0, 1))
    return step_with_shardings, params, opt_state


def make_sharded_retriever_step(model, optimizer, mesh: Mesh,
                                params: Dict[str, Any], *, alpha: float,
                                temperature: float, lambda_decay: float,
                                eta: float, gamma: float, mask_token: int,
                                pad_id: int, pool_mode: str = "masked",
                                remat: str = "full"):
    """Sharded twin of train.retriever.make_retriever_train_step.

    The triple batch is sharded over ``data``; the CLtime loss's
    [B, 3B] in-batch-negative cosine matrix spans the whole global batch,
    so XLA inserts the embedding all-gather across ``data`` — the math is
    EXACTLY the single-device loss (contrast SimCLR-style local-negatives
    approximations). Gradients all-reduce over ``data``; tensor-parallel
    kernels shard over ``model`` as in the LM step.

    Returns (step_fn, sharded_params, opt_state).
    """
    from rag4dyg_tpu.train.retriever import make_contrastive_loss_fn

    specs = param_partition_specs(params)
    params = shard_params(params, mesh, specs)
    param_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    opt_shardings = _opt_state_shardings(optimizer, params, specs, mesh)
    opt_state = jax.jit(optimizer.init, in_shardings=(param_shardings,),
                        out_shardings=opt_shardings)(params)
    repl = NamedSharding(mesh, P())
    row_spec = NamedSharding(mesh, P("data"))
    batch_cs = P(None, "data", None)  # stacked [5, B, L] passes

    loss_body = make_contrastive_loss_fn(
        model, alpha=alpha, temperature=temperature,
        lambda_decay=lambda_decay, eta=eta, gamma=gamma,
        mask_token=mask_token, pad_id=pad_id, pool_mode=pool_mode,
        remat=remat,
        constrain=lambda stacked: jax.lax.with_sharding_constraint(
            stacked, NamedSharding(mesh, batch_cs)))

    def step(params, opt_state, pool_ids, idx, a_t, p_t, n_t, rng):
        anchor = jnp.take(pool_ids, idx[:, 0], axis=0)
        pos = jnp.take(pool_ids, idx[:, 1], axis=0)
        neg = jnp.take(pool_ids, idx[:, 2], axis=0)

        def loss_fn(p):
            loss, _aux = loss_body(p, anchor, pos, neg, a_t, p_t, n_t, rng)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step_jit = jax.jit(
        step,
        in_shardings=(param_shardings, opt_shardings, repl,
                      NamedSharding(mesh, P("data", None)), row_spec,
                      row_spec, row_spec, repl))
    return step_jit, params, opt_state


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(jnp.asarray(batch),
                          NamedSharding(mesh, P("data", None)))


def make_sharded_lm_epoch_fn(model, optimizer, mesh: Mesh,
                             params: Dict[str, Any]):
    """Sharded twin of train.backbone.make_lm_epoch_fn: one scan dispatch
    per epoch, params/opt-state laid out per ``param_partition_specs``,
    each step's gathered batch constrained onto the ``data`` axis so XLA
    data-parallelizes the forward/backward and all-reduces gradients.

    Returns (epoch_fn, sharded_params, opt_state).
    """
    specs = param_partition_specs(params)
    params = shard_params(params, mesh, specs)
    param_shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)
    opt_shardings = _opt_state_shardings(optimizer, params, specs, mesh)
    opt_state = jax.jit(optimizer.init, in_shardings=(param_shardings,),
                        out_shardings=opt_shardings)(params)
    repl = NamedSharding(mesh, P())
    batch_spec = NamedSharding(mesh, P("data", None))

    def epoch(params, opt_state, corpus_ids, rows_all, rngs, valids):
        # valids marks fixed-shape padding steps; updates discarded
        def body(carry, xs):
            params, opt_state = carry
            rows, rng, valid = xs
            batch = jax.lax.with_sharding_constraint(
                jnp.take(corpus_ids, rows, axis=0), batch_spec)

            def loss_fn(p):
                logits, _, _ = model.apply({"params": p}, batch,
                                           deterministic=False,
                                           rngs={"dropout": rng})
                return shift_ce_loss(logits, batch)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_o = optimizer.update(grads, opt_state, params)
            new_p = optax.apply_updates(params, updates)
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(valid, a, b), new, old)
            return ((keep(new_p, params), keep(new_o, opt_state)),
                    jnp.where(valid, loss, 0.0))
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (rows_all, rngs, valids))
        return params, opt_state, losses.sum()

    # NO buffer donation here: the trainers wrap epoch calls in
    # retry_transient, and a retry after an execution-time RPC failure
    # must be able to re-present the same (undeleted) inputs
    epoch_jit = jax.jit(
        epoch,
        in_shardings=(param_shardings, opt_shardings, repl, repl, repl,
                      repl))
    return epoch_jit, params, opt_state
