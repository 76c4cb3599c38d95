"""On-chip Pallas lowering canary — run after ANY pallas spec change.

CPU interpret mode accepts block specs the real Mosaic lowering rejects
(round-2 lesson: a (1, 1) SMEM block over [N, 1] lowers on CPU but
crashes on the chip), so interpret-only tests CANNOT certify a kernel
change. This script compiles + executes every pallas kernel in the
package on the REAL backend at tiny shapes (seconds of chip time):

  1. flash attention fwd+grad, with dropout (SMEM meta array, VMEM tiles)
  2. flash attention with key_skip (the masked-prefill shape)
  3. fused score+top-k (ops/topk_pallas.py)

Values are checked against the XLA oracles at MXU-real tolerances.
Exit 0 = all kernels lower and agree; any Mosaic rejection raises.

Usage:  python benchmarks/chip_canary.py          # real chip
        python benchmarks/chip_canary.py --interpret  # CPU dry run
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="force CPU interpret mode (dry run of the script "
                         "itself; does NOT certify chip lowering)")
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from rag4dyg_tpu.ops.flash_attention import (attention_reference,
                                                 flash_attention)

    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    if platform == "cpu" and not args.interpret:
        raise SystemExit("refusing to 'certify' on CPU — pass --interpret "
                         "for a dry run")
    tol = 3e-5  # MXU-real tolerance vs the f32 oracle (RESULTS.md r2)

    rng = np.random.RandomState(0)
    B, H, L, Dh = 2, 6, 128, 64
    q, k, v = (jnp.asarray(rng.randn(B, H, L, Dh), jnp.float32)
               for _ in range(3))

    # 1. fwd+grad with dropout (exercises the SMEM meta array + VJP)
    def loss(x):
        return flash_attention(x, k, v, dropout_rate=0.1,
                               dropout_seed=7).sum()
    val, g = jax.jit(jax.value_and_grad(loss))(q)
    assert np.isfinite(float(val)) and np.isfinite(float(g.sum()))
    print(f"flash fwd+grad+dropout OK  loss={float(val):.4f}")

    # 2. key_skip masked-prefill shape, checked vs the XLA oracle at
    # real query rows
    skip = jnp.asarray([0, 37], jnp.int32)
    out = jax.jit(lambda a, b, c: flash_attention(a, b, c, key_skip=skip)
                  )(q, k, v)
    NEG = -1e9
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) / np.sqrt(Dh)
    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
    keym = (jnp.arange(L)[None, :] >= skip[:, None])[:, None, None, :]
    att = jnp.where(jnp.logical_and(causal, keym), att, NEG)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(att, axis=-1), v)
    real = (jnp.arange(L)[None, :] >= skip[:, None])[:, None, :, None]
    np.testing.assert_allclose(np.asarray(out * real),
                               np.asarray(ref * real), atol=tol, rtol=1e-4)
    print("flash key_skip vs oracle OK")

    # 3. no-mask path vs oracle (the certified retriever shape)
    out0 = jax.jit(flash_attention)(q, k, v)
    ref0 = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               atol=tol, rtol=1e-4)
    print("flash causal vs oracle OK")

    # 4. fused score+top-k kernel
    from rag4dyg_tpu.ops.topk_pallas import fused_score_topk

    pool = rng.randn(2048, 256).astype(np.float32)
    pooln = pool / np.linalg.norm(pool, axis=1, keepdims=True)
    qs = rng.randn(64, 256).astype(np.float32)
    qsn = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    s, i = jax.jit(lambda a, b: fused_score_topk(
        a, b, k=10, n_valid=2048,
        interpret=args.interpret))(jnp.asarray(qsn), jnp.asarray(pooln))
    scores = (qsn @ pooln.T + 1.0) * 0.5
    ref_i = np.argsort(-scores, axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    print("fused score+topk vs oracle OK")
    print("CHIP CANARY PASS")


if __name__ == "__main__":
    main()
