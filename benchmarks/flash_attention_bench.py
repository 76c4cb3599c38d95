"""Op-level benchmark: fused Pallas flash attention vs the XLA attention
path at the wikiv2 retriever training shape (B=128, H=6, L=512, Dh=128).

Both implementations include attention dropout in train mode — the XLA
path draws its mask with threefry (as flax nn.Dropout does), the flash
kernel with its in-kernel counter hash — because mask generation and the
[B, H, L, L] HBM round-trips are exactly the traffic the kernel removes.

Measurement follows the repo rule (CLAUDE.md): all reps inside ONE jitted
lax.scan whose carry accumulates a value derived from each iteration's
output (and perturbs the next iteration's input), so the remote relay
cannot overlap, reorder, or memoize the work; per-pass time comes from the
(2R reps) - (R reps) delta to cancel dispatch overhead.

Prints one JSON line per (impl, mode, dtype).
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rag4dyg_tpu.ops.flash_attention import flash_attention

B, H, L, DH = 128, 6, 512, 128
SCALE = 1.0 / np.sqrt(DH)
RATE = 0.1


def _shrink_for_smoke():
    global B, H, L, DH, SCALE
    B, H, L, DH = 2, 2, 128, 128
    SCALE = 1.0 / np.sqrt(DH)


def xla_attention(q, k, v, key, rate):
    """The model's XLA path (models/gpt2.py): f32 scores, causal mask,
    f32 softmax cast back to the compute dtype, threefry dropout."""
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * SCALE
    mask = jnp.tril(jnp.ones((L, L), bool))[None, None]
    att = jnp.where(mask, att, -1e9)
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    if rate > 0.0:
        keep = jax.random.bernoulli(key, 1.0 - rate, att.shape)
        att = jnp.where(keep, att / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v)


def build_run(impl: str, mode: str):
    """reps-scanned runner; returns (jitted fn, carry validator)."""
    rate = RATE if mode == "train" else 0.0
    base_key = jax.random.PRNGKey(0)

    def one_pass(q, k, v, i):
        if impl == "flash":
            out = flash_attention(q, k, v, scale=SCALE, dropout_rate=rate,
                                  dropout_seed=i if rate else None)
        else:
            out = xla_attention(q, k, v, jax.random.fold_in(base_key, i),
                                rate)
        return out

    if mode == "train":
        def value(q, k, v, i):
            def loss(q):
                return jnp.sum(one_pass(q, k, v, i).astype(jnp.float32)
                               * 1e-3)
            return jax.grad(loss)(q).astype(jnp.float32)[0, 0, 0, 0]
    else:
        def value(q, k, v, i):
            return one_pass(q, k, v, i).astype(jnp.float32)[0, 0, 0, 0]

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(q, k, v, reps):
        def body(carry, i):
            qq = q + (carry * 1e-6).astype(q.dtype)
            return carry + value(qq, k, v, i), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(reps, dtype=jnp.int32))
        return carry
    return run


def bench(impl: str, mode: str, dtype_name: str, reps: int):
    dtype = jnp.dtype(dtype_name)
    rng = np.random.RandomState(0)
    q, k, v = (jax.device_put(
        (rng.randn(B, H, L, DH) * 0.3).astype(np.float32).astype(dtype))
        for _ in range(3))
    run = build_run(impl, mode)

    def timed(r):
        jax.block_until_ready(run(q, k, v, r))  # compile + warm
        t0 = time.perf_counter()
        val = float(run(q, k, v, r))
        dt = time.perf_counter() - t0
        assert np.isfinite(val), f"carry diverged: {val}"
        return dt

    t1, t2 = timed(reps), timed(2 * reps)
    per_pass = (t2 - t1) / reps if (t2 - t1) > 0.25 * t1 else t2 / (2 * reps)
    flops = (10.0 if mode == "train" else 4.0) * B * H * L * L * DH
    return {"impl": impl, "mode": mode, "dtype": dtype_name,
            "shape": [B, H, L, DH],
            "ms_per_pass": round(per_pass * 1e3, 3),
            "tflops": round(flops / per_pass / 1e12, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes / CPU correctness check")
    args = ap.parse_args()
    if args.smoke:
        _shrink_for_smoke()
        args.reps = min(args.reps, 4)
        jax.config.update("jax_platforms", "cpu")  # before backend init
    from rag4dyg_tpu.cli import _enable_compile_cache
    _enable_compile_cache()

    # correctness gate before timing: first compile of the Mosaic kernel
    # on this backend — fwd and grads vs the XLA oracle (no dropout).
    # Exact-parity pinning lives in tests/test_flash_attention.py (CPU
    # interpret mode); on TPU the MXU's default single-bf16 pass rounds
    # the Pallas dot and the XLA einsum slightly differently (observed
    # max |delta| ~3e-5), so the chip gate uses an MXU-real tolerance.
    from rag4dyg_tpu.ops.flash_attention import attention_reference
    on_tpu = jax.default_backend() != "cpu"
    tol = dict(atol=5e-4, rtol=1e-2) if on_tpu else dict(atol=2e-5,
                                                         rtol=1e-4)
    gtol = dict(atol=1e-3, rtol=1e-2) if on_tpu else dict(atol=5e-5,
                                                          rtol=1e-3)
    rng = np.random.RandomState(42)
    qv, kv, vv = (jnp.asarray((rng.randn(2, 2, 256, DH) * 0.3)
                              .astype(np.float32)) for _ in range(3))
    np.testing.assert_allclose(
        np.asarray(flash_attention(qv, kv, vv)),
        np.asarray(attention_reference(qv, kv, vv)), **tol)
    g_f = jax.grad(lambda q: jnp.sum(jnp.tanh(flash_attention(q, kv, vv))))(qv)
    g_r = jax.grad(lambda q: jnp.sum(jnp.tanh(attention_reference(q, kv, vv))))(qv)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r), **gtol)
    print(json.dumps({"validated": jax.default_backend()}), flush=True)

    results = []
    for dtype in ("float32", "bfloat16"):
        for mode in ("fwd", "train"):
            for impl in ("xla", "flash"):
                r = bench(impl, mode, dtype, args.reps)
                results.append(r)
                print(json.dumps(r), flush=True)
    # headline: train-mode speedup at the training dtype
    by = {(r["impl"], r["mode"], r["dtype"]): r for r in results}
    for d in ("float32", "bfloat16"):
        x = by[("xla", "train", d)]["ms_per_pass"]
        f = by[("flash", "train", d)]["ms_per_pass"]
        print(json.dumps({"summary": f"train {d}", "xla_ms": x,
                          "flash_ms": f,
                          "speedup": round(x / f, 2)}), flush=True)


if __name__ == "__main__":
    main()
