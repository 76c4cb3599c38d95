"""Device-side annotation mining: positives, hard negatives, and the
generator's gt top-k — computed as vectorized masked top-k over the
Jaccard matrices while they are still device-resident.

The host miner (``annotate.mine_train_pairs`` — itself a parity oracle of
reference retrieval_data_annotation.py:43-103) iterates pool rows in
Python over four fully materialized host matrices; at wikiv2 scale the
[N, N] u16 matrix download (~150 MB through the relay) dominates the
whole annotation stage, and at 100k+ rows the host f64 matrices cannot
exist at all. Here each row-block's intersection counts are computed on
the MXU (bf16 one-hot matmul, f32 accumulation — exact for counts
< 2^24), masked candidate top-k runs on device, and only O(N·k)
candidate indices + integer intersection counts ever reach the host.

Exactness contract (the tests pin bit-equality vs the *stable* host
miner on every dataset):

  * All device score comparisons happen in f32 on quotients of small
    integers. A threshold band of ±1e-6 around ``threshold`` is wider
    than the worst-case f32 quotient error (~6e-8) and narrower than
    the smallest possible exact gap to a rational threshold like 4/5
    (1/(5·union) ≥ 1.5e-6 for union < 2^17), so the loose/tight masks
    bracket the exact f64 decision; rows where they disagree fall back
    to exact host mining (counted in ``MineStats.fallback_rows``).
  * Candidate SELECTION on device orders by an exact 24-bit fixed-point
    quotient key (``q24``: three 8-bit integer long-division steps, all
    int32) — NOT the f32 quotient: TPU f32 division is approximate
    (fl(2/12) != fl(3/18) observed on chip), which silently split exact
    ties and broke ``lax.top_k``'s lowest-index tie rule. With the
    integer key, key ties are exact Jaccard ties whenever unions stay
    below 4096 (every reference dataset), so top_k's tie rule is
    trustworthy again. Candidate ORDER is still re-derived on host in
    f64 from the downloaded integer intersection counts (exact for
    these rationals), sorted by (score desc, POOL INDEX asc); a
    truncated list is accepted only when its kept tail's integer key
    strictly beats the smallest downloaded key — or ties it on a
    key-ties-exact pool — else the row falls back to exact host mining.
  * Tie order everywhere is descending score, ascending pool index —
    matching ``mine_train_pairs(stable=True)`` / stable ``np.argsort``.
    The reference's unstable introsort tie order is canonicalized, as
    PARITY.md documents for the eval rankings.

Negative sampling stays host-side with the caller's RNG, consumed in
pool-row order — identical draws to the host miner when the candidate
lists match (they must: that is the test).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rag4dyg_tpu.pool.jaccard import DEFAULT_VOCAB_CHUNK


@dataclasses.dataclass
class MineStats:
    n_pool: int
    fallback_rows: int          # rows re-mined exactly on host
    fallback_reasons: dict      # reason -> count
    collision_free: bool        # f32 order provably exact for this pool
    engines: tuple = ()         # (out-matrix engine, in-matrix engine)


@dataclasses.dataclass
class MinedPool:
    train_pairs: np.ndarray        # [P, 3] (anchor, positive, negative)
    train_pair_scores: np.ndarray  # [P, 2] f64 (pos score, neg score)
    gt_topk_index: np.ndarray      # [N, K]
    gt_topk_score: np.ndarray      # [N, K] f64
    stats: MineStats


def _host_packed(id_sets: Sequence[Sequence[int]], v_pad: int,
                 n_pad: int) -> np.ndarray:
    """Bit-packed membership matrix [n_pad, v_pad/8] uint8, built packed
    directly (no [N, V] byte intermediate — at 100k rows × 64k vocab the
    unpacked matrix is 6.5 GB; packed it is 820 MB, and the relay upload
    shrinks 8×). MSB-first bit order, matching ``np.packbits``."""
    n = len(id_sets)
    packed = np.zeros((n_pad, v_pad // 8), np.uint8)
    lens = np.fromiter((len(s) for s in id_sets), np.int64, n)
    if lens.sum():
        rows = np.repeat(np.arange(n), lens)
        cols = np.fromiter((t for s in id_sets for t in s), np.int64,
                           lens.sum())
        np.bitwise_or.at(packed, (rows, cols >> 3),
                         np.uint8(128) >> (cols & 7).astype(np.uint8))
    return packed


def _unpack_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """[rows, W/8] uint8 -> [rows, W] bf16 of exact 0/1 (VPU shifts; a
    TPU scatter-built one-hot would serialize — CLAUDE.md)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB-first
    bits = (packed[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(packed.shape[0], -1).astype(jnp.bfloat16)


@functools.partial(jax.jit,
                   static_argnames=("n_chunks", "width", "block"))
def _inter_block_matmul(oh, row0, *, n_chunks: int, width: int,
                        block: int) -> jnp.ndarray:
    """Exact intersection counts [block, N_pad] f32 of one query
    row-block vs all pool rows, MXU engine: vocab-chunked bf16 one-hot
    matmul with f32 accumulation (cost ∝ N²·V — right when sets are
    large relative to the vocabulary)."""
    wb = width // 8
    a = jax.lax.dynamic_slice_in_dim(oh, row0, block, 0)

    def body(acc, c):
        sl = lambda m: _unpack_bits(jax.lax.dynamic_slice_in_dim(  # noqa: E731
            m, c * wb, wb, 1))
        # 0/1 values are exact in bf16; MXU accumulates f32 — counts are
        # exact integers below 2^24 (set sizes < 2^16)
        return acc + jnp.dot(sl(a), sl(oh).T,
                             preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((block, oh.shape[0]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))
    return acc


@functools.partial(jax.jit, static_argnames=("block",))
def _inter_block_compare(ids, row0, *, block: int) -> jnp.ndarray:
    """Exact intersection counts [block, N_pad] f32, VPU engine:
    all-pairs id equality over padded id lists [N_pad, L] (pad = -1),
    scanned over the query slot axis (cost ∝ N²·L² — for a 100k-row
    pool of ~24-token sets over a 64k vocab this is ~60× less work
    than the dense one-hot matmul, the difference between minutes and
    hours on one chip). Set elements are unique, so each equal pair
    contributes exactly once; -1 padding never equals a valid id."""
    q = jax.lax.dynamic_slice_in_dim(ids, row0, block, 0)

    def body(acc, a):
        qa = q[:, a]
        hits = jnp.sum(ids[None, :, :] == qa[:, None, None], -1,
                       dtype=jnp.int32)
        return acc + jnp.where((qa >= 0)[:, None], hits, 0), None

    acc0 = jnp.zeros((block, ids.shape[0]), jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(q.shape[1]))
    return acc.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("block", "k_pos", "neg_k", "gt_k"))
def _mine_block(inter_o, inter_i, sz_out, sz_in, row0, n_valid, t_lo,
                t_hi, *, block: int, k_pos: int, neg_k: int, gt_k: int):
    """Mine one query row-block [block] of the pool from its
    device-resident intersection-count rows (either engine above).
    Returns per-row candidate indices + exact integer intersection
    counts, never a full matrix."""
    n_pad = inter_o.shape[1]
    rows = row0 + jnp.arange(block)
    col = jnp.arange(n_pad)
    valid = col[None, :] < n_valid
    diag = col[None, :] == rows[:, None]

    def quotient(inter, sz):
        sz_rows = jax.lax.dynamic_slice_in_dim(sz, row0, block, 0)
        union = sz_rows[:, None] + sz[None, :] - inter
        q = inter / jnp.maximum(union, 1.0)
        # host semantics: the Jaccard matrix diagonal is zero-filled
        # BEFORE mining (reference retrieval_data_annotation.py:171-173)
        # — the diagonal stays a live candidate with value 0
        return jnp.where(diag, 0.0, q)

    def q24(inter, sz):
        """floor(inter·2^24 / union): an EXACT 24-bit fixed-point
        quotient via three 8-bit integer long-division steps (all
        intermediates < 2^26, int32). Candidate ordering uses this key
        instead of the f32 quotient because TPU f32 division is
        approximate — it splits exact ties and broke lax.top_k's
        index tie rule (observed on chip). The key is monotone in the
        exact quotient; key ties with unions < 4096 ARE exact ties, so
        top_k's lowest-index rule gives the canonical order and no
        host fallback is needed at tie boundaries. Exactly
        representable in f32 (≤ 2^24) for top_k."""
        sz_rows = jax.lax.dynamic_slice_in_dim(sz, row0, block, 0)
        i = inter.astype(jnp.int32)
        u = jnp.maximum((sz_rows[:, None] + sz[None, :]).astype(jnp.int32)
                        - i, 1)
        d1 = (i << 8) // u
        r1 = (i << 8) - d1 * u
        d2 = (r1 << 8) // u
        r2 = (r1 << 8) - d2 * u
        d3 = (r2 << 8) // u
        key = (d1 << 16) + (d2 << 8) + d3
        return jnp.where(diag, 0, key).astype(jnp.float32)

    q_out = quotient(inter_o, sz_out)
    k_out = q24(inter_o, sz_out)
    k_in = q24(inter_i, sz_in)

    pos_loose = (q_out > t_lo) & valid
    pos_tight = (q_out > t_hi) & valid
    ambig_cnt = jnp.sum(pos_loose & ~pos_tight, 1)
    pos_cnt = jnp.sum(pos_loose, 1)
    # top_k over the mask: all-equal 1.0 hits tie-break to LOWEST index
    # -> the first k_pos positives in ascending pool order (the host
    # miner's np.where order)
    _, pos_idx = jax.lax.top_k(jnp.where(pos_loose, 1.0, 0.0), k_pos)
    pos_int = jnp.take_along_axis(inter_o, pos_idx, 1)

    # out-similarity > 0 is an exact integer predicate; the zero-filled
    # diagonal fails it (host: out_row[i] == 0 after fill_diagonal)
    out_nonzero = (inter_o > 0.5) & ~diag
    neg1 = ~pos_loose & out_nonzero & valid
    neg2 = ~pos_loose & ~out_nonzero & valid
    c1_val, c1_idx = jax.lax.top_k(jnp.where(neg1, k_in, -1.0), neg_k)
    c2_val, c2_idx = jax.lax.top_k(jnp.where(neg2, k_in, -1.0), neg_k)
    n1_cnt = jnp.sum(neg1, 1)
    n2_cnt = jnp.sum(neg2, 1)
    c1_int_in = jnp.take_along_axis(inter_i, c1_idx, 1)
    c1_int_out = jnp.take_along_axis(inter_o, c1_idx, 1)
    c2_int_in = jnp.take_along_axis(inter_i, c2_idx, 1)

    g_val, g_idx = jax.lax.top_k(jnp.where(valid, k_out, -1.0), gt_k)
    g_int = jnp.take_along_axis(inter_o, g_idx, 1)

    return dict(pos_cnt=pos_cnt, ambig_cnt=ambig_cnt, pos_idx=pos_idx,
                pos_int=pos_int, c1_val=c1_val, c1_idx=c1_idx,
                c1_int_in=c1_int_in, c1_int_out=c1_int_out, n1_cnt=n1_cnt,
                c2_val=c2_val, c2_idx=c2_idx, c2_int_in=c2_int_in,
                n2_cnt=n2_cnt, g_val=g_val, g_idx=g_idx, g_int=g_int)


def _exact_q(inter: np.ndarray, sz_a, sz_b) -> np.ndarray:
    """f64 Jaccard from integer parts — bit-equal to the reference's
    len(a & b) / len(a | b) (f64 is exact for these rationals)."""
    inter = np.asarray(inter, np.int64)
    union = np.asarray(sz_a, np.int64) + np.asarray(sz_b, np.int64) - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0)


def _exact_candidates(idx_row, int_in_row, int_out_row, val_row, i,
                      sz_in, sz_out, n_take: int, truncated: bool,
                      key_ties_exact: bool):
    """Re-derive the exact candidate order on host: f64 score desc,
    pool-index asc (stable). Returns (ordered [(idx, q_out_f64)],
    safe) where safe=False means the truncation boundary cannot be
    proven exact and the row needs a host fallback.

    ``val_row`` holds the device's exact 24-bit fixed-point quotient
    keys (q24 in _mine_block), so the truncation boundary is an integer
    comparison: the kept tail is provably complete when its key beats
    the smallest downloaded key, or ties it on a pool whose unions are
    < 4096 (``key_ties_exact`` — there a key tie IS an exact tie, and
    the noise-free key restores top_k's lowest-index tie rule, so the
    lowest-index tied members are exactly the ones downloaded)."""
    real = val_row >= 0.0
    idx = idx_row[real]
    if idx.size == 0:
        return [], True
    q_in = _exact_q(int_in_row[real], sz_in[i], sz_in[idx])
    # the diagonal can be a legitimate zero-backfill candidate; its host
    # matrix value is 0 (fill_diagonal), not |set|/|set|
    q_in = np.where(idx == i, 0.0, q_in)
    # canonical order: exact score desc, POOL INDEX asc (the device's
    # download order ties by index only per equal KEY; the exact resort
    # also fixes sub-key-resolution order on large-union pools)
    kept = np.lexsort((idx, -q_in))[:n_take]
    safe = True
    if truncated and kept.size == n_take:
        boundary_key = int(val_row[real][-1]) if real.all() else -1
        j = kept[-1]
        if idx[j] == i:
            kept_key = 0
        else:
            inter = int(int_in_row[real][j])
            union = int(sz_in[i]) + int(sz_in[idx[j]]) - inter
            kept_key = (inter << 24) // union if union > 0 else 0
        if kept_key < boundary_key:  # exact resort can reorder keys
            safe = False             # only within ties; anything else
        elif kept_key == boundary_key:  # means a hidden better tail
            safe = key_ties_exact
    q_out = _exact_q(int_out_row[real], sz_out[i], sz_out[idx])
    q_out = np.where(idx == i, 0.0, q_out)
    return [(int(idx[j]), float(q_out[j])) for j in kept], safe


def _fallback_row(i: int, out_sets: Sequence[set], in_sets: Sequence[set]):
    """Exact host row: the per-pair Jaccard the reference computes
    (retrieval_data_annotation.py:5-15), diagonal zeroed."""
    def row(sets):
        s_i = sets[i]
        r = np.zeros(len(sets))
        for j, s_j in enumerate(sets):
            if j == i or not s_i or not s_j:
                continue
            r[j] = len(s_i & s_j) / len(s_i | s_j)
        return r
    return row(out_sets), row(in_sets)


def mine_pool_device(
        out_ids: Sequence[Sequence[int]], in_ids: Sequence[Sequence[int]],
        vocab_size: int, *, threshold: float, neg_num: int, gt_topk: int,
        max_positives: Optional[int], rng: np.random.RandomState,
        row_block: int = 1024, vocab_chunk: int = DEFAULT_VOCAB_CHUNK,
        k_pos: int = 64, margin: int = 26, engine: str = "auto",
        out_sets: Optional[List[set]] = None,
        in_sets: Optional[List[set]] = None) -> MinedPool:
    """Mine (anchor, positive, negative) triples + gt top-k on device.

    ``out_ids``/``in_ids``: token-id lists per pool row (the prediction
    and history spans). ``out_sets``/``in_sets``: optional raw Python
    sets for the exact host fallback (rebuilt from ids if omitted —
    Jaccard only needs set identity, so ids are equivalent).
    ``engine``: intersection engine per matrix — "matmul" (one-hot MXU),
    "compare" (padded-id equality, VPU), or "auto" by the L²-vs-V/16
    cost rule. ``margin``: extra top-k slots downloaded per candidate
    list — a download boundary landing inside a group of exact-tied
    scores forces the exact host fallback (TPU division noise breaks
    tie order), so a generous margin trades a few tiny gathers for far
    fewer O(N) fallback rows on tie-heavy pools.
    """
    n = len(out_ids)
    assert len(in_ids) == n
    if out_sets is None:
        out_sets = [set(s) for s in out_ids]
    if in_sets is None:
        in_sets = [set(s) for s in in_ids]

    vocab_chunk = max(8, vocab_chunk - vocab_chunk % 8)  # bit-pack unit
    n_chunks = max(1, -(-vocab_size // vocab_chunk))
    v_pad = n_chunks * vocab_chunk
    block = min(row_block, max(8, n))
    n_pad = -(-n // block) * block

    def prep(ids):
        """Per-matrix engine choice + device upload. The compare engine
        does N²·L² VPU work vs the matmul engine's N²·V MXU MACs; with
        the MXU ~16× denser, compare wins when L² ≲ V/16 (small sets
        over a big vocabulary — the 100k-row regime)."""
        lmax = max((len(s) for s in ids), default=1)
        if engine == "compare" or (engine == "auto"
                                   and lmax * lmax <= v_pad // 16):
            lmax = max(1, lmax)
            arr = np.full((n_pad, lmax), -1, np.int32)
            for r, s in enumerate(ids):
                arr[r, :len(s)] = sorted(s)
            dev = jnp.asarray(arr)
            return "compare", lambda r0: _inter_block_compare(
                dev, jnp.int32(r0), block=block)
        dev = jnp.asarray(_host_packed(ids, v_pad, n_pad))
        return "matmul", lambda r0: _inter_block_matmul(
            dev, jnp.int32(r0), n_chunks=n_chunks, width=vocab_chunk,
            block=block)

    eng_out, inter_out_fn = prep(out_ids)
    eng_in, inter_in_fn = prep(in_ids)
    sz_out_h = np.array([len(s) for s in out_sets], np.int64)
    sz_in_h = np.array([len(s) for s in in_sets], np.int64)
    pad = np.zeros(n_pad - n, np.float32)
    sz_out = jnp.asarray(np.concatenate([sz_out_h.astype(np.float32), pad]))
    sz_in = jnp.asarray(np.concatenate([sz_in_h.astype(np.float32), pad]))

    max_u = 2 * int(max(sz_out_h.max(initial=0), sz_in_h.max(initial=0)))
    # distinct rationals p1/u1 != p2/u2 differ by >= 1/(u1·u2); they
    # provably keep distinct, correctly-ordered device-f32 values only
    # when that gap beats BOTH f32 rounding and the TPU's approximate
    # division (~few ulp — observed on chip): gap > 2^-21 is safe with
    # ~4-ulp margin. Beyond that, truncation boundaries fall back.
    # key-tie exactness: the device orders candidates by an exact
    # 24-bit fixed-point quotient key; a key tie is an exact Jaccard
    # tie iff distinct rationals can't collide at 2^-24 resolution,
    # i.e. 1/(u1·u2) >= 2^-24  <=>  max union < 4096 (true for every
    # reference dataset). collision_free (reported in stats) keeps the
    # f32-era meaning for observability.
    key_ties_exact = max_u < 4096
    collision_free = max_u * max_u < 2 ** 21

    k_pos_eff = min(n, max_positives if max_positives is not None else k_pos)
    neg_k = min(n, neg_num + margin)
    gt_topk = min(gt_topk, n)  # tiny pools: the host argsort yields n cols
    gt_k = min(n, gt_topk + margin)
    t_lo = np.float32(threshold - 1e-6)
    t_hi = np.float32(threshold + 1e-6)

    blocks = []
    for r0 in range(0, n, block):
        out = _mine_block(inter_out_fn(r0), inter_in_fn(r0), sz_out, sz_in,
                          jnp.int32(r0), jnp.int32(n), t_lo, t_hi,
                          block=block, k_pos=k_pos_eff, neg_k=neg_k,
                          gt_k=gt_k)
        blocks.append({k: np.asarray(v) for k, v in out.items()})
    cand = {k: np.concatenate([b[k] for b in blocks])[:n]
            for k in blocks[0]}

    from rag4dyg_tpu.pool.annotate import _row_negatives

    pairs, pair_scores = [], []
    gt_idx = np.zeros((n, gt_topk), np.int64)
    gt_score = np.zeros((n, gt_topk), np.float64)
    reasons = {"ambiguous_threshold": 0, "positives_overflow": 0,
               "neg_boundary": 0, "gt_boundary": 0}
    fallback_rows = 0

    for i in range(n):
        need_fallback = None
        if cand["ambig_cnt"][i] > 0:
            need_fallback = "ambiguous_threshold"
        elif max_positives is None and cand["pos_cnt"][i] > k_pos_eff:
            need_fallback = "positives_overflow"

        pos: List[Tuple[int, float]] = []
        negs: List[Tuple[int, float]] = []
        if need_fallback is None:
            cnt = int(cand["pos_cnt"][i])
            take = min(cnt, k_pos_eff)
            p_idx = cand["pos_idx"][i, :take]
            p_q = _exact_q(cand["pos_int"][i, :take], sz_out_h[i],
                           sz_out_h[p_idx])
            pos = list(zip(p_idx.tolist(), p_q.tolist()))
            if cnt > 0:
                c1, safe1 = _exact_candidates(
                    cand["c1_idx"][i], cand["c1_int_in"][i],
                    cand["c1_int_out"][i], cand["c1_val"][i], i,
                    sz_in_h, sz_out_h, neg_num,
                    truncated=int(cand["n1_cnt"][i]) > neg_k,
                    key_ties_exact=key_ties_exact)
                need2 = neg_num - len(c1)
                c2, safe2 = ([], True) if need2 <= 0 else _exact_candidates(
                    cand["c2_idx"][i], cand["c2_int_in"][i],
                    np.zeros_like(cand["c2_int_in"][i]),  # out-sim == 0
                    cand["c2_val"][i], i, sz_in_h, sz_out_h, need2,
                    truncated=int(cand["n2_cnt"][i]) > neg_k,
                    key_ties_exact=key_ties_exact)
                if not (safe1 and safe2):
                    need_fallback = "neg_boundary"
                negs = c1 + c2

        if need_fallback is None:
            # ordering and values are BOTH the out-similarity for gt, so
            # the same ints/sizes feed the order and the value columns
            g, safe_g = _exact_candidates(
                cand["g_idx"][i], cand["g_int"][i], cand["g_int"][i],
                cand["g_val"][i], i, sz_out_h, sz_out_h, gt_topk,
                truncated=n > gt_k, key_ties_exact=key_ties_exact)
            if not safe_g:
                need_fallback = "gt_boundary"
            else:
                gt_idx[i] = [x[0] for x in g]
                gt_score[i] = [x[1] for x in g]

        if need_fallback is not None:
            reasons[need_fallback] += 1
            fallback_rows += 1
            out_row, in_row = _fallback_row(i, out_sets, in_sets)
            p_idx = np.where(out_row > threshold)[0]
            pos = [(int(p), float(out_row[p])) for p in p_idx]
            if pos:
                n_list = _row_negatives(out_row, in_row,
                                        set(int(p) for p in p_idx),
                                        neg_num, stable=True)
                negs = [(int(x), float(out_row[x])) for x in n_list]
            order = np.argsort(-out_row, kind="stable")[:gt_topk]
            gt_idx[i] = order
            gt_score[i] = out_row[order]

        if pos and max_positives is not None:
            pos = pos[:max_positives]
        for p, sp in pos:
            j = rng.choice([x[0] for x in negs])
            sn = dict(negs)[int(j)]
            pairs.append((i, int(p), int(j)))
            pair_scores.append((sp, sn))

    stats = MineStats(n_pool=n, fallback_rows=fallback_rows,
                      fallback_reasons=reasons,
                      collision_free=collision_free,
                      engines=(eng_out, eng_in))
    return MinedPool(np.asarray(pairs, np.int64).reshape(-1, 3),
                     np.asarray(pair_scores, np.float64).reshape(-1, 2),
                     gt_idx, gt_score, stats)
