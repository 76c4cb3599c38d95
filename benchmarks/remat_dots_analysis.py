"""Root-cause analysis for the `--remat dots` crash at the wikiv2 shape
(VERDICT r4 #7) — names the mechanism, with numbers, at trace level
(jaxpr inspection only; nothing is compiled or executed, so this runs on
the CPU host in seconds).

Mechanism: the five contrastive encoder passes run through ONE
``lax.scan`` (make_contrastive_loss_fn) — required at wikiv2 scale
because checkpointing alone lets XLA overlap the five backwards
(measured 16.7 GiB > 15.75 GiB HBM). Reverse-mode through a scan stacks
the body's residuals across iterations BY CONSTRUCTION: every saved
value becomes a `[n_iter, ...]` scan output that is fully materialized
before the backward sweep starts. Under `policy=save dots` the residual
set per pass is every MXU output (qkv/attn-proj/fc/proj per layer), so
the stacked residuals are ~5× one pass's dots — this script measures
those stacked-output bytes per remat mode straight from the jaxpr. The
remote compile service crashes (HTTP 500) attempting to materialize
that program; it is not a compiler bug to work around but the scan
contract itself. Selective per-pass policies can't help inside a scan
(one body = one policy), and unrolling the passes to mix policies
reintroduces the overlapped-backward memory blowup the scan exists to
prevent — so remat=full stays the only viable mode at 5-pass scale.

    python benchmarks/remat_dots_analysis.py [--b 128 --l 512]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_stacked_residual_bytes(jaxpr, n_iter: int) -> int:
    """Sum bytes of scan outputs whose leading dim == n_iter (the
    stacked per-iteration residuals + stacked primal outputs), walking
    nested jaxprs."""
    total = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "scan":
            for v in eqn.outvars:
                shape = getattr(v.aval, "shape", ())
                if shape and shape[0] == n_iter:
                    total += int(np.prod(shape)) * v.aval.dtype.itemsize
        for param in eqn.params.values():
            inner = getattr(param, "jaxpr", None)
            if inner is not None:
                total += scan_stacked_residual_bytes(inner, n_iter)
    return total


def measure(remat: str, b: int, l: int):  # noqa: E741
    from rag4dyg_tpu.config import ModelConfig
    from rag4dyg_tpu.models import GPT2LMModel, init_params
    from rag4dyg_tpu.train.retriever import make_contrastive_loss_fn

    config = ModelConfig(vocab_size=8791, n_layer=2, n_head=6, n_embd=768,
                         dtype="bfloat16", attention_impl="flash",
                         eta=0.6, gamma=0.8)
    model = GPT2LMModel(config)
    params = init_params(config, jax.random.PRNGKey(0))
    loss = make_contrastive_loss_fn(
        model, alpha=0.2, temperature=0.1, lambda_decay=1.0, eta=0.6,
        gamma=0.8, mask_token=8790, pad_id=1, pool_mode="masked",
        remat=remat)

    ids = jnp.ones((b, l), jnp.int32)
    t = jnp.ones((b,), jnp.float32)

    def grad_fn(p):
        return jax.grad(lambda q: loss(q, ids, ids, ids, t, t, t,
                                       jax.random.PRNGKey(1))[0])(p)

    jaxpr = jax.make_jaxpr(grad_fn)(params).jaxpr
    return scan_stacked_residual_bytes(jaxpr, 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--l", type=int, default=512)
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")

    out = {"shape": {"B": args.b, "L": args.l, "layers": 2, "d": 768,
                     "dtype": "bfloat16", "attention": "flash"}}
    for remat in ("full", "dots"):
        gib = measure(remat, args.b, args.l) / (1 << 30)
        out[f"stacked_scan_residual_gib_{remat}"] = round(gib, 2)
    out["hbm_gib"] = 15.75
    out["mechanism"] = (
        "reverse-mode through the 5-pass lax.scan stacks every "
        "checkpoint-saved value as a [5, ...] scan output, fully live "
        "at backward start; save-dots marks all MXU outputs saved")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
