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


def bench_bucket(ba: int, bn: int, s_small: int, s_big: int,
                 dtype: str = "bfloat16", impl: str = "flash",
                 neg_pass_scan: bool = False):
    """One (anchor-bucket, negative-bucket) group at the production
    config: s/step, TFLOPS, MFU (VERDICT r4 #6 — the epoch-MFU
    accounting attributes the last ~10 points to short-anchor bucket
    mix; this measures each group instead of asserting it)."""
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
        remat="full", neg_pass_scan=neg_pass_scan)

    rng = np.random.RandomState(0)

    def mk_pool(width):
        lens = rng.randint(max(2, width - 127), width + 1, POOL)
        p = np.full((POOL, width), PAD_ID, np.int32)
        for i, n in enumerate(lens):
            p[i, :n] = rng.randint(2, VOCAB - 1, n)
        return jax.device_put(p)

    pool_a = mk_pool(ba)
    pool_n = mk_pool(bn) if bn != ba else None

    def run(steps: int):
        idx = jnp.asarray(rng.randint(0, POOL, (steps, B, 3)), jnp.int32)
        ts = jnp.asarray(rng.rand(3, steps, B), jnp.float32)
        rngs = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(7), i))(jnp.arange(steps))
        valids = jnp.ones(steps, bool)
        return epoch_fn(params, opt_state, pool_a, idx, ts[0], ts[1],
                        ts[2], rngs, valids, pool_n)

    def timed(steps):
        jax.block_until_ready(run(steps))
        t0 = time.perf_counter()
        p2, _, loss = run(steps)
        jax.block_until_ready(p2)
        dt = time.perf_counter() - t0
        assert np.isfinite(float(loss)) and float(loss) != 0.0
        return dt

    t_small, t_big = timed(s_small), timed(s_big)
    per_step = (t_big - t_small) / (s_big - s_small)
    flops = (lm_train_flops(N_LAYER, N_EMBD, 4 * B * ba, ba, remat=True)
             + lm_train_flops(N_LAYER, N_EMBD, B * bn, bn, remat=True))
    return {"ba": ba, "bn": bn, "s_per_step": round(per_step, 4),
            "step_tflop": round(flops / 1e12, 3),
            "tflops": round(flops / per_step / 1e12, 1),
            "mfu_pct": round(100.0 * flops / per_step / TPU_PEAK_FLOPS, 1)}


def wikiv2_group_weights(resources: str):
    """FLOP-weighted (ba, bn) group mix of a simulated wikiv2 epoch,
    using the trainer's EXACT bucketing inputs: history-only lines,
    tokenizer-encoded, block-size-truncated (train/retriever.py:555,
    619-626) — bucketing on raw full-line token counts put 86% of the
    FLOP weight at ba=128 where the real run is ~63% ba=512 steps."""
    from rag4dyg_tpu.data.serialize import read_corpus_lines
    from rag4dyg_tpu.data.vocab import Tokenizer
    from rag4dyg_tpu.train.retriever import history_lines, load_pairs

    pairs = load_pairs(os.path.join(resources,
                                    "train_retrieval/train_index.retrieval"))
    lines = read_corpus_lines(os.path.join(resources,
                                           "train.link_prediction"))
    tok = Tokenizer.from_vocab_file(os.path.join(resources, "vocab.json"),
                                    timestep=15)
    pool = tok.encode_batch(history_lines(lines), max_len=L)
    pool_len = min(L, -(-max(len(s) for s in pool) // 64) * 64)
    lens = np.minimum(np.array([max(1, len(s)) for s in pool]), pool_len)
    lb = np.minimum(-(-lens // 128) * 128, pool_len)
    sim = np.random.RandomState(0x5EED)
    order = sim.permutation(len(pairs))
    n_full = len(pairs) // B
    idx = pairs[order[: n_full * B]].astype(np.int32).reshape(n_full, B, 3)
    b_ap = lb[idx[:, :, :2]].max(axis=(1, 2))
    b_ng = lb[idx[:, :, 2]].max(axis=1)
    weights = {}
    for ba, bn in zip(b_ap.tolist(), b_ng.tolist()):
        cost = (lm_train_flops(N_LAYER, N_EMBD, 4 * B * ba, ba, remat=True)
                + lm_train_flops(N_LAYER, N_EMBD, B * bn, bn, remat=True))
        key = (int(ba), int(bn))
        weights[key] = weights.get(key, 0.0) + cost
    tot = sum(weights.values())
    return {k: v / tot for k, v in weights.items()}, n_full


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4,
                    help="small scan length; big is 2x")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes / CPU correctness check")
    ap.add_argument("--per-bucket", action="store_true",
                    help="per-(ba,bn)-bucket-group s/step + MFU at the "
                         "production config over the real wikiv2 mix")
    ap.add_argument("--resources", default="runs/wikiv2/resources")
    ap.add_argument("--top-groups", type=int, default=6)
    args = ap.parse_args()
    if args.smoke:
        _shrink_for_smoke()
        args.steps = 2
        jax.config.update("jax_platforms", "cpu")  # before backend init
    from rag4dyg_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    if args.per_bucket:
        weights, n_steps = wikiv2_group_weights(args.resources)
        ranked = sorted(weights.items(), key=lambda kv: -kv[1])
        print(json.dumps({"epoch_steps": n_steps,
                          "flop_weights": {f"{k[0]}x{k[1]}": round(v, 4)
                                           for k, v in ranked}}),
              flush=True)
        rows, covered, weighted_mfu = [], 0.0, 0.0
        for (ba, bn), w in ranked[: args.top_groups]:
            if args.smoke:
                ba, bn = min(ba, L), min(bn, L)
            r = bench_bucket(ba, bn, args.steps, 2 * args.steps)
            r["flop_weight"] = round(w, 4)
            rows.append(r)
            covered += w
            weighted_mfu += w * r["mfu_pct"]
            print(json.dumps(r), flush=True)
        print(json.dumps({
            "summary": "per-bucket MFU (bf16+flash, wikiv2 mix)",
            "covered_flop_weight": round(covered, 4),
            "weighted_mfu_pct_over_covered":
                round(weighted_mfu / max(covered, 1e-9), 1)}), flush=True)
        return

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
