"""End-to-end retriever TRAIN-STEP benchmark across the four
(dtype x attention_impl) configurations at the wikiv2 reference shape
(B=128, L=512, 2-layer d=768 encoder, five rematerialized passes/step).

This is the FLOP-bound cost center of the whole pipeline (~27-45 min/epoch
f32, ~15 min bf16 — RESULTS.md); the flash kernel targets the part bf16
does not accelerate: the [B, H, L, L] score round-trips through HBM and
the threefry attention-dropout draw inside each of the five passes.

Uses the real `make_retriever_epoch_fn` scan (train/retriever.py), so the
numbers are the production step, not a proxy. Per-step time is the
(8-step) - (4-step) epoch-dispatch delta — both are single dispatches of a
value-verified lax.scan with a threaded (params, opt_state) carry, which
the relay cannot memoize or overlap. Prints one JSON line per config.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rag4dyg_tpu.config import ModelConfig
from rag4dyg_tpu.models import GPT2LMModel, init_params
from rag4dyg_tpu.train.retriever import (make_retriever_epoch_fn,
                                          _check_remat_dots_budget)
from rag4dyg_tpu.train.state import make_optimizer
from rag4dyg_tpu.utils.profiling import TPU_PEAK_FLOPS, lm_train_flops

VOCAB, N_LAYER, N_HEAD, N_EMBD = 8791, 2, 6, 768
B, L = 128, 512
PAD_ID, MASK_TOKEN = 1, VOCAB - 1
POOL = 4096


def _shrink_for_smoke():
    global VOCAB, N_EMBD, N_HEAD, B, L, POOL, MASK_TOKEN
    VOCAB, N_EMBD, N_HEAD, B, L, POOL = 200, 64, 2, 4, 128, 64
    MASK_TOKEN = VOCAB - 1


def bench(dtype: str, impl: str, s_small: int, s_big: int,
          remat: str = "full"):
    # same fail-fast as the trainer: --remat dots at this 5-pass shape
    # crashes the remote compiler once the saved dots exceed HBM
    _check_remat_dots_budget(remat, batch=B, seq_len=L, n_layer=N_LAYER,
                             n_embd=N_EMBD, n_head=N_HEAD, dtype=dtype,
                             attention_impl=impl)
    config = ModelConfig(vocab_size=VOCAB, n_layer=N_LAYER, n_head=N_HEAD,
                         n_embd=N_EMBD, dtype=dtype, attention_impl=impl,
                         eta=0.6, gamma=0.8)
    model = GPT2LMModel(config)
    params = init_params(config, jax.random.PRNGKey(0))
    optimizer = make_optimizer(params, optax.constant_schedule(1e-6))
    opt_state = optimizer.init(params)

    epoch_fn, _ = make_retriever_epoch_fn(
        model, optimizer, alpha=0.2, temperature=0.1, lambda_decay=1.0,
        eta=0.6, gamma=0.8, mask_token=MASK_TOKEN, pad_id=PAD_ID,
        remat=remat)

    rng = np.random.RandomState(0)
    lens = rng.randint(L // 4, L, POOL)
    pool = np.full((POOL, L), PAD_ID, np.int32)
    for i, n in enumerate(lens):
        pool[i, :n] = rng.randint(2, VOCAB - 1, n)
    pool_dev = jax.device_put(pool)

    def run(params, opt_state, steps: int):
        idx = jnp.asarray(rng.randint(0, POOL, (steps, B, 3)), jnp.int32)
        ts = jnp.asarray(rng.rand(3, steps, B), jnp.float32)
        rngs = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(7), i))(jnp.arange(steps))
        valids = jnp.ones(steps, bool)
        return epoch_fn(params, opt_state, pool_dev, idx, ts[0], ts[1],
                        ts[2], rngs, valids)

    def timed(steps):
        out = run(params, opt_state, steps)          # compile + warm
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        p2, o2, loss = run(params, opt_state, steps)
        jax.block_until_ready(p2)
        dt = time.perf_counter() - t0
        loss = float(loss)
        assert np.isfinite(loss) and loss != 0.0, f"bad loss {loss}"
        return dt

    t_small, t_big = timed(s_small), timed(s_big)
    per_step = (t_big - t_small) / (s_big - s_small)
    # 5 encoder passes (anchor/pos/neg + 2 augment views); the full-remat
    # mode pays one extra forward, dots/none recompute ~no matmuls
    flops = lm_train_flops(N_LAYER, N_EMBD, 5 * B * L, L,
                           remat=(remat == "full"))
    return {"dtype": dtype, "attention_impl": impl, "remat": remat,
            "shape": {"B": B, "L": L, "layers": N_LAYER, "d": N_EMBD},
            "s_per_step": round(per_step, 4),
            "tflops": round(flops / per_step / 1e12, 1),
            "mfu_pct": round(100.0 * flops / per_step / TPU_PEAK_FLOPS, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4,
                    help="small scan length; big is 2x")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes / CPU correctness check")
    args = ap.parse_args()
    if args.smoke:
        _shrink_for_smoke()
        args.steps = 2
        jax.config.update("jax_platforms", "cpu")  # before backend init
    from rag4dyg_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    results = []
    configs = [("float32", "xla", "full"), ("float32", "flash", "full"),
               ("bfloat16", "xla", "full"), ("bfloat16", "flash", "full"),
               # remat=dots: save MXU outputs, skip the remat forward
               # (viable once flash removes the [L, L] buffers from HBM)
               ("bfloat16", "flash", "dots"),
               ("float32", "flash", "dots")]
    for dtype, impl, remat in configs:
        try:
            r = bench(dtype, impl, args.steps, 2 * args.steps, remat=remat)
        except Exception as e:  # e.g. OOM for a non-remat config at scale
            r = {"dtype": dtype, "attention_impl": impl, "remat": remat,
                 "error": f"{type(e).__name__}: {str(e)[:200]}"}
        results.append(r)
        print(json.dumps(r), flush=True)
    by = {(r["dtype"], r["attention_impl"], r["remat"]): r["s_per_step"]
          for r in results if "s_per_step" in r}

    def ratio(a, b):
        return round(by[a] / by[b], 2) if a in by and b in by else None
    print(json.dumps({
        "summary": "retriever train step (wikiv2 shape)",
        "flash_speedup_f32": ratio(("float32", "xla", "full"),
                                   ("float32", "flash", "full")),
        "flash_speedup_bf16": ratio(("bfloat16", "xla", "full"),
                                    ("bfloat16", "flash", "full")),
        "dots_speedup_bf16_flash": ratio(("bfloat16", "flash", "full"),
                                         ("bfloat16", "flash", "dots")),
        "total_vs_round1": ratio(("float32", "xla", "full"),
                                 ("bfloat16", "flash", "dots")),
    }), flush=True)


if __name__ == "__main__":
    main()
