"""Optimizer / train-state plumbing shared by all three training stages.

Matches the reference's optimization semantics
(reference: utils/model.py:80-102 and the per-stage LR handling):

  * AdamW (betas 0.9/0.999, eps 1e-8) with weight decay applied to every
    parameter except biases and LayerNorm weights.
  * linear warmup + linear decay schedule (HF
    ``get_linear_schedule_with_warmup``) for the backbone; the retriever and
    generator optionally use the reference's per-step cosine schedule with
    epoch-granular warmup (reference: train/train_retriever.py:120-130).
  * global-norm gradient clipping at 1.0.
  * optional parameter freezing (cross-stage transfer trains only fusion
    heads / lm_head; reference: utils/model.py:71-78) via optax.multi_transform.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def _no_decay_mask(params) -> Any:
    """True where weight decay applies: everything except biases and
    LayerNorm scales (reference no_decay = ['bias', 'LayerNorm.weight'])."""
    def decide(path, _):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return leaf not in ("bias", "scale")
    return jax.tree_util.tree_map_with_path(decide, params)


def linear_warmup_linear_decay(base_lr: float, warmup_steps: int,
                               total_steps: int) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)
    return schedule


def epoch_cosine_schedule(base_lr: float, warmup_epochs: int,
                          total_epochs: int,
                          steps_per_epoch: int) -> optax.Schedule:
    """The reference's adjust_learning_rate: linear epoch warmup then
    cosine over (total_epochs - warmup_epochs) epochs, evaluated per step."""
    warmup_iters = warmup_epochs * steps_per_epoch
    total_iters = (total_epochs - warmup_epochs) * steps_per_epoch

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(1.0, warmup_iters)
        t = step - warmup_iters
        cos = 0.5 * base_lr * (1.0 + jnp.cos(t / jnp.maximum(1.0, total_iters)
                                             * math.pi))
        return jnp.where(step < warmup_iters, warm, cos)
    return schedule


def make_optimizer(params, schedule: optax.Schedule, *,
                   weight_decay: float = 0.0, adam_epsilon: float = 1e-8,
                   max_grad_norm: float = 1.0,
                   frozen_labels: Optional[Any] = None,
                   accumulate_steps: int = 1
                   ) -> optax.GradientTransformation:
    """AdamW stack; ``accumulate_steps > 1`` wraps it in optax.MultiSteps
    (the reference's gradient_accumulation_steps loss-scaling + step
    gating, reference: main_SimpleDyG.py:173-191)."""
    adamw = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(learning_rate=schedule, b1=0.9, b2=0.999,
                    eps=adam_epsilon, weight_decay=weight_decay,
                    mask=_no_decay_mask(params)),
    )
    opt = adamw
    if frozen_labels is not None:
        opt = optax.multi_transform(
            {"trainable": adamw, "frozen": optax.set_to_zero()},
            frozen_labels)
    if accumulate_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accumulate_steps)
    return opt
