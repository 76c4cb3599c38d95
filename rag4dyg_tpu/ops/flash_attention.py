"""Pallas TPU kernel: fused causal attention (flash-style) with in-kernel
dropout from the hardware PRNG.

The XLA attention path (models/gpt2.py:CausalSelfAttention) materializes the
[B, H, L, L] score matrix in HBM three times per layer pass (f32 scores,
masked scores, bf16 probabilities) and draws the attention-dropout mask with
the threefry generator — at the retriever's training shape (B=128, H=6,
L=512) that is ~800 MB of f32 HBM traffic per layer pass plus ~200M threefry
values, both VPU/HBM-bound work that bfloat16 does not accelerate
(reference cost center: models/modeling_gpt2.py attention + torch dropout).

This kernel keeps the whole [L, L] tile of one (batch, head) in VMEM:

  grid = (B*H,); each cell loads q, k, v tiles [L, Dh], computes the scores
  on the MXU, applies the causal mask + safe softmax in f32 registers/VMEM,
  draws the dropout mask from a counter-based lowbias32 hash (seeded per
  (call, cell) so the backward pass regenerates the identical mask — and
  pure-jnp, so the mask is bit-identical under CPU interpret mode), and
  multiplies by v — only the [L, Dh] output ever returns to HBM.

The backward kernel recomputes softmax from (q, k) in VMEM (flash-style
rematerialization — nothing is saved but the inputs), regenerates the same
dropout bits, and emits dq, dk, dv via the standard softmax VJP.

Sizing: L and Dh are padded to multiples of 128 by the wrapper (zero-pad is
exact: padded keys are causally masked out for real queries, padded head
dims contribute zero to every dot product). VMEM high-water at L=1024 is
~12 MB (scores + vjp temporaries), within the 16 MB budget; the wrapper
refuses longer sequences.

Dropout semantics match `softmax -> dropout -> @ v` exactly: the mask is
i.i.d. Bernoulli(1-rate) per score entry, kept entries scaled by
1/(1-rate). The random stream is a counter-based hash, not threefry, so a
training run with flash attention is a different (equally valid) draw than
the XLA path — certified by metric parity, not bitwise replay (RESULTS.md).

CPU fallback/testing runs the same kernels under ``interpret=True``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # matches models/gpt2.py masking (finite: no NaN rows)

# hard VMEM guard: [L, L] f32 scores + temporaries must fit on-chip
MAX_FLASH_LEN = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _keep_mask(seed, cell, shape, rate: float):
    """Bernoulli(1-rate) keep mask from a counter-based hash.

    Pure-jnp VPU integer ops (runs identically under interpret mode on CPU
    — the pallas interpreter stubs ``pltpu.prng_random_bits`` to zeros, and
    cross-backend reproducibility is what makes the dropout path testable).
    Per element: lowbias32 (splitmix-style 32-bit finalizer, the standard
    counter-input hash) over ``element_index ^ mix(seed, cell)`` —
    ~7 integer ops/element in VMEM vs threefry's ~100+ through HBM.

    ``cell`` is the GLOBAL (batch, head) cell id. The kernels read it as
    ``meta_ref[pl.program_id(0), 0]`` — the program id is only ever used
    to index the globally-numbered ``meta`` array, which is co-sharded
    with q/k/v, so each shard's grid steps still see their own global
    ids. (Bare program ids restart at 0 on every device under GSPMD
    partitioning, so a pid-based stream itself would repeat the same
    mask on every shard.) The mask therefore stays a pure function of
    (seed, global cell, position), bit-identical however the call is
    partitioned.
    """
    h0 = (seed.astype(jnp.uint32) ^
          ((cell + 1).astype(jnp.uint32) * jnp.uint32(0x9E3779B9)))
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = row * jnp.uint32(shape[1]) + col + h0
    # lowbias32 finalizer (32-bit avalanche; uint32 mults wrap by spec)
    x ^= x >> 16
    x *= jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= jnp.uint32(0x846CA68B)
    x ^= x >> 16
    # P(x >= cutoff) = 1 - rate  (cutoff = rate * 2^32, exact at f64)
    cutoff = np.uint32(min(int(rate * 4294967296.0), 4294967295))
    return x >= cutoff


def _softmax_fwd(q, k, scale: float, L: int, skip):
    """Masked safe-softmax scores for one (b, h) tile. Returns f32 [L, L].

    ``skip``: scalar int32 — keys with column < skip are masked out in
    addition to the causal mask. Left-pad decode batching (ops/decode.py
    ``left_pad_batch``, generator ``splice_prefill``) always produces
    prefix-form padding, so one count per row replaces the XLA path's
    full [B, L] boolean pad mask. skip=0 == the pure-causal shape.
    All-masked rows (row < skip, i.e. pad queries) come out uniform —
    finite garbage, same as the XLA path's all-NEG_INF rows; callers
    ignore pad positions."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(jnp.logical_and(col <= row, col >= skip), s, NEG_INF)
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _flash_fwd_kernel(seed_ref, meta_ref, q_ref, k_ref, v_ref, o_ref, *,
                      scale: float, rate: float, L: int):
    # meta_ref holds the whole [BH, 2] (global cell id, key skip) array
    # (Mosaic rejects sub-(8,128) SMEM blocks unless block dims == array
    # dims); pick this grid step's row dynamically
    p = _softmax_fwd(q_ref[:], k_ref[:], scale, L,
                     meta_ref[pl.program_id(0), 1])
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0, 0], meta_ref[pl.program_id(0), 0],
                          p.shape, rate)
        p = jnp.where(keep, p, 0.0) / (1.0 - rate)
    # probabilities are cast to the input dtype for the @v MXU pass —
    # identical numerics to the XLA path (softmax f32 -> astype(x.dtype)
    # -> einsum); identity for f32 inputs
    o_ref[:] = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _flash_bwd_kernel(seed_ref, meta_ref, q_ref, k_ref, v_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *,
                      scale: float, rate: float, L: int):
    q, k, v, do = q_ref[:], k_ref[:], v_ref[:], do_ref[:]
    p = _softmax_fwd(q, k, scale, L,
                     meta_ref[pl.program_id(0), 1])       # [L, L] f32
    if rate > 0.0:
        # identical hash inputs as forward -> identical mask
        keep = _keep_mask(seed_ref[0, 0], meta_ref[pl.program_id(0), 0],
                          p.shape, rate)
        inv = 1.0 / (1.0 - rate)
        pd = jnp.where(keep, p, 0.0) * inv
    else:
        pd = p
    # dv = pd^T @ do  (pd cast to the input dtype: one bf16 MXU pass in
    # the bf16 path, identity for f32 — consistent with the fwd @v pass)
    dv_ref[:] = jax.lax.dot_general(
        pd.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dpd = do @ v^T ; back through dropout
    dpd = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if rate > 0.0:
        dp = jnp.where(keep, dpd, 0.0) * inv
    else:
        dp = dpd
    # softmax VJP: ds = p * (dp - sum_k(p * dp)), computed in f32
    ds = (p * (dp - jnp.sum(p * dp, axis=1, keepdims=True))).astype(k.dtype)
    dq_ref[:] = (jax.lax.dot_general(
        ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[:] = (jax.lax.dot_general(
        ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _tile_specs(n: int, L: int, D: int):
    return [pl.BlockSpec((None, L, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(n)]


_SEED_SPEC = pl.BlockSpec((1, 1), lambda i: (0, 0),
                          memory_space=pltpu.SMEM)


def _meta_spec(bh: int):
    """Per-cell (global (b, h) id, key-skip count) array, whole-array
    SMEM block. Mosaic's TPU lowering requires block dims divisible by
    (8, 128) or EQUAL to the array dims — a per-step (1, 1) block over
    [BH, 1] is rejected on real hardware (though CPU interpret mode
    accepts it), so every grid step maps the full [BH, 2] array and
    indexes it by pl.program_id."""
    return pl.BlockSpec((bh, 2), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)


def _fwd_call(seed, meta, q3, k3, v3, *, scale: float, rate: float,
              interpret: bool):
    BH, L, D = q3.shape
    kernel = functools.partial(_flash_fwd_kernel, scale=scale, rate=rate,
                               L=L)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[_SEED_SPEC, _meta_spec(BH)] + _tile_specs(3, L, D),
        out_specs=pl.BlockSpec((None, L, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, L, D), q3.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * L * L * D, transcendentals=BH * L * L,
            bytes_accessed=q3.dtype.itemsize * 4 * BH * L * D),
        interpret=interpret,
    )(seed, meta, q3, k3, v3)


def _bwd_call(seed, meta, q3, k3, v3, do3, *, scale: float, rate: float,
              interpret: bool):
    BH, L, D = q3.shape
    kernel = functools.partial(_flash_bwd_kernel, scale=scale, rate=rate,
                               L=L)
    shp = jax.ShapeDtypeStruct((BH, L, D), q3.dtype)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=[_SEED_SPEC, _meta_spec(BH)] + _tile_specs(4, L, D),
        out_specs=_tile_specs(3, L, D),
        out_shape=[shp, shp, shp],
        cost_estimate=pl.CostEstimate(
            flops=10 * BH * L * L * D, transcendentals=BH * L * L,
            bytes_accessed=q3.dtype.itemsize * 7 * BH * L * D),
        interpret=interpret,
    )(seed, meta, q3, k3, v3, do3)


# --- GSPMD partitioning -----------------------------------------------------
#
# A pallas_call is an opaque custom call to the SPMD partitioner: under a
# jax.sharding mesh, GSPMD would all-gather q/k/v and run the FULL batch
# on every device (verified on an 8-device mesh — replicated compute, no
# scaling). The kernel is embarrassingly parallel over its grid dim 0
# (one (batch, head) cell per grid step), so custom_partitioning declares
# dim 0 batchable and L/Dh replicated; each device then runs the kernel
# on its local shard with NO collectives (pinned by
# tests/test_flash_attention.py and tests/test_parallel.py).
#
# The dropout mask is a pure function of (seed, global cell id, position)
# — the cell-id array shards along dim 0 with q/k/v, so fwd and bwd
# regenerate identical masks under ANY partitioning (even asymmetric
# fwd/bwd shardings), and the sharded result is bit-identical to the
# single-device one.


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(scale: float, rate: float, interpret: bool):
    @custom_partitioning
    def f(seed, cells, q3, k3, v3):
        return _fwd_call(seed, cells, q3, k3, v3, scale=scale, rate=rate,
                         interpret=interpret)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(seed, cells, q3, k3, v3):
            return _fwd_call(seed, cells, q3, k3, v3, scale=scale,
                             rate=rate, interpret=interpret)
        return (mesh, lower_fn, result_shape.sharding,
                jax.tree.map(lambda x: x.sharding, tuple(arg_shapes)))

    def infer(mesh, arg_shapes, shape):
        return arg_shapes[2].sharding

    f.def_partition(partition, infer_sharding_from_operands=infer,
                    sharding_rule="s t, b u, b l d, b l d, b l d -> "
                                  "b l d",
                    need_replication_factors=("s", "t", "u", "l", "d"))
    return f


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(scale: float, rate: float, interpret: bool):
    @custom_partitioning
    def f(seed, cells, q3, k3, v3, do3):
        return _bwd_call(seed, cells, q3, k3, v3, do3, scale=scale,
                         rate=rate, interpret=interpret)

    def partition(mesh, arg_shapes, result_shape):
        def lower_fn(seed, cells, q3, k3, v3, do3):
            return _bwd_call(seed, cells, q3, k3, v3, do3, scale=scale,
                             rate=rate, interpret=interpret)
        return (mesh, lower_fn,
                jax.tree.map(lambda x: x.sharding, tuple(result_shape)),
                jax.tree.map(lambda x: x.sharding, tuple(arg_shapes)))

    def infer(mesh, arg_shapes, shape):
        return (arg_shapes[2].sharding,) * 3

    f.def_partition(partition, infer_sharding_from_operands=infer,
                    sharding_rule="s t, b u, b l d, b l d, b l d, b l d "
                                  "-> b l d, b l d, b l d",
                    need_replication_factors=("s", "t", "u", "l", "d"))
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_core(q3, k3, v3, seed, cells, scale: float, rate: float,
                interpret: bool):
    return _partitioned_fwd(scale, rate, interpret)(seed, cells, q3, k3,
                                                    v3)


def _flash_core_fwd(q3, k3, v3, seed, cells, scale, rate, interpret):
    out = _partitioned_fwd(scale, rate, interpret)(seed, cells, q3, k3,
                                                   v3)
    return out, (q3, k3, v3, seed, cells)


def _flash_core_bwd(scale, rate, interpret, res, g):
    q3, k3, v3, seed, cells = res
    dq, dk, dv = _partitioned_bwd(scale, rate, interpret)(
        seed, cells, q3, k3, v3, g.astype(q3.dtype))
    # int32 seed/cells cotangent type is float0
    return (dq, dk, dv, np.zeros(seed.shape, dtype=jax.dtypes.float0),
            np.zeros(cells.shape, dtype=jax.dtypes.float0))


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    scale: Optional[float] = None,
                    dropout_rate: float = 0.0,
                    dropout_seed: Optional[jnp.ndarray] = None,
                    key_skip: Optional[jnp.ndarray] = None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Causal attention over [B, H, L, Dh] with optional attention-matrix
    dropout. Differentiable (custom flash VJP). Pads L and Dh to 128
    multiples internally (exact — see module docstring).

    ``dropout_seed``: int32 scalar (array or python int) that decorrelates
    calls; required when ``dropout_rate > 0``.

    ``key_skip``: optional [B] int32 — per row, the number of LEADING
    (left-pad) positions masked out as keys, on top of the causal mask.
    This is the prefix form every left-padded batch in this codebase has
    (ops/decode.py left_pad_batch, train/generator.py splice_prefill);
    outputs at pad-query rows are finite garbage callers must ignore,
    exactly like the XLA path's fully-masked rows.
    """
    B, H, L, Dh = q.shape
    if L > MAX_FLASH_LEN:
        raise ValueError(f"flash_attention holds the full [L, L] tile in "
                         f"VMEM; L={L} > {MAX_FLASH_LEN}")
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    scale = float(scale if scale is not None else 1.0 / np.sqrt(Dh))

    Lp, Dp = _round_up(L, 128), _round_up(Dh, 128)

    def pad(x):
        if Lp == L and Dp == Dh:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, Dp - Dh)))

    q3 = pad(q).reshape(B * H, Lp, Dp)
    k3 = pad(k).reshape(B * H, Lp, Dp)
    v3 = pad(v).reshape(B * H, Lp, Dp)
    seed = jnp.asarray(
        0 if dropout_seed is None else dropout_seed, jnp.int32
    ).reshape(1, 1)
    cell_ids = jnp.arange(B * H, dtype=jnp.int32)
    skips = (jnp.zeros(B, jnp.int32) if key_skip is None
             else jnp.asarray(key_skip, jnp.int32))
    # broadcast (not jnp.repeat: its cumsum lowering drags a collective
    # into otherwise batch-sharded callers) per-row skip over heads
    skips_bh = jnp.broadcast_to(skips[:, None], (B, H)).reshape(B * H)
    meta = jnp.stack([cell_ids, skips_bh], axis=1)           # [BH, 2]
    out = _flash_core(q3, k3, v3, seed, meta, scale,
                      float(dropout_rate), interpret)
    out = out.reshape(B, H, Lp, Dp)
    if Lp != L or Dp != Dh:
        out = out[:, :, :L, :Dh]
    return out


def attention_reference(q, k, v, *, scale=None) -> jnp.ndarray:
    """Dropout-free oracle mirroring models/gpt2.py's XLA attention math
    (f32 scores, NEG_INF causal mask, f32 softmax)."""
    Dh = q.shape[-1]
    scale = float(scale if scale is not None else 1.0 / np.sqrt(Dh))
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * scale
    L = q.shape[2]
    mask = jnp.tril(jnp.ones((L, L), bool))[None, None]
    att = jnp.where(mask, att, NEG_INF)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att,
                      v.astype(jnp.float32)).astype(q.dtype)
