"""Fused multi-head attention Pallas TPU kernel (query-blocked).

Replaces the reference's composite attention graph (qk matmul -> mask add
-> softmax -> dropout -> pv matmul, func.py:222-254) with a fused kernel:
the [Lq, Lk] score matrix lives only in VMEM, one query block at a time,
so the L^2 intermediate never touches HBM. At MT sequence lengths
(<=256) XLA's batched attention is as fast or faster (measured on v5e;
see below) -- the kernel pays off at long-sequence inputs (speech
encoders, 1k-4k frames) where XLA materialises multi-MB score tensors.

Design:
  * grid (B*H/G, Lq/BQ): G rows of the flattened [B*H] axis are
    processed per grid step through row-batched dots, so short
    sequences don't degenerate into thousands of tiny grid steps -- at
    MT shapes (B=256 H=8 L=128) the r3 kernel ran a (2048, 1) grid
    whose per-step overhead lost badly to XLA. G can span whole batch
    rows (G % H == 0), in which case the mask block carries one row per
    covered batch row. G is capped by GROUP_SCORE_BUDGET, so
    long-sequence shapes keep G=1 and behave exactly as before.
  * keys/values for the whole sequence stay resident per head, queries
    stream in BQ-row blocks
  * padding mask [B, Lk] broadcast per head via the index map; causal
    masking via 2D iota against the block's absolute row offset
  * matmuls run in the INPUT dtype with fp32 accumulation
    (preferred_element_type): bf16 activations hit the MXU's native
    path instead of the multi-pass fp32x fp32 mode the r3 kernel paid
    for by up-casting q/k/v before the dots. Softmax statistics stay
    fp32 (this is at least as precise as the XLA composite, whose bf16
    einsum rounds the logits BEFORE the fp32 cast). The backward
    recomputes the softmax directly (whole key rows are block-resident)
    rather than reconstructing from a logsumexp residual, which is
    bit-identical to the forward and immune to the fully-masked-row
    cancellation (_softmax_weights)
  * attention dropout with the in-kernel PRNG, seeded per (head-group,
    q-block) so the backward kernel regenerates the identical mask
  * custom VJP: dq is computed per q-block; dk/dv accumulate across the
    q-block grid axis into a revisited output block (zero-initialised at
    the first block) -- standard softmax-backward algebra, all matmuls on
    the MXU with fp32 accumulation

Measured status (TPU v5e, 2026-08): the r4 head-grouping + native-dtype
dots lift the long-sequence win (fwd+bwd 1.29x @ L1024, 1.80x @ L4096,
1.27x causal @ L1024 vs XLA dense) but XLA still wins INSIDE the
compiled MT train step (base B=256 L=128: 231.0k tok/s XLA vs 205.7k
kernel — XLA fuses the small per-head matmuls into the surrounding
graph in ways a standalone kernel cannot). use_flash_attention stays
default-False for text and on in the speech preset; see docs/kernels.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# per-block score elements kept in VMEM (fp32): BQ * Lk
MAX_BLOCK_SCORE_ELEMS = 1024 * 1024
MAX_LK = 8192
# tests monkeypatch this to run the REAL kernels through the Pallas
# interpreter on CPU (ADVICE r4: the CPU suite previously validated only
# the XLA fallback, so kernel regressions surfaced only on the chip)
INTERPRET = False


def _pick_block(lq: int, lk: int) -> Optional[int]:
    """Largest q-block size that divides lq and fits the VMEM budget."""
    for bq in (512, 256, 128, 64, 32, 16, 8):
        if lq % bq == 0 and bq * lk <= MAX_BLOCK_SCORE_ELEMS:
            return bq
    if lq * lk <= MAX_BLOCK_SCORE_ELEMS:
        return lq
    return None


# rows-per-step score budget. Scores/weights are fp32 [G, BQ, Lk] plus
# dropout masks and dot outputs, all live in VMEM at once, so the
# grouping budget is tighter than the single-row block budget above.
# 256k is the largest the BACKWARD compiles at (g=32 at MT shapes blew
# VMEM, v5e 2026-08); larger groups also measured speed-neutral (the
# per-step overhead stops mattering past g=8 — the residual MT-shape
# cost is the dh=64 lane geometry, not grid overhead).
GROUP_SCORE_BUDGET = 256 * 1024
# experiments only. Read ONCE, at fused_attention() trace time, and
# threaded to both kernels as a nondiff argument -- the forward and the
# custom-VJP backward must use the SAME group or the dropout streams and
# block layouts desync (ADVICE r4: the old module-global was read
# independently by each side).
_GROUP_OVERRIDE: Optional[int] = None


def _pick_group(h: int, bq: int, lk: int, bh: int,
                budget: int = GROUP_SCORE_BUDGET) -> int:
    """Rows of the flattened [B*H] axis processed per grid step: the
    largest candidate whose stacked score block fits the group budget.
    Below h the group is a divisor of one batch row's heads; above h it
    spans whole batch rows (g % h == 0), so the per-row pad masks stay
    recoverable from the block index. Long sequences resolve to 1."""
    g = 1
    for cand in (2, 4, 8, 16, 32, 64, 128):
        if cand * bq * lk > budget:
            break
        if cand <= h:
            ok = h % cand == 0
        else:
            ok = cand % h == 0 and bh % cand == 0
        if ok:
            g = cand
    return g


def supported(lq: int, lk: int) -> bool:
    return lk <= MAX_LK and _pick_block(lq, lk) is not None


def rpr_supported(lq: int, lk: int, max_rel: int) -> bool:
    """Eligibility of the RPR-folded variant: the lane-roll skew needs
    the clipped band (2m+1 buckets) to fit the key length with room for
    wrap-around artifacts to land outside the band (lk > 2m)."""
    return supported(lq, lk) and lk > 2 * max_rel


def _causal_keep(bq: int, lk: int, row_offset):
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, lk), 0) + row_offset
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, lk), 1)
    return rows >= cols


def _dropout_keep(shape, rate: float):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(int((1.0 - rate) * 4294967295.0))
    return bits < threshold


def _bdot(a, b, ca: int, cb: int):
    """Row-batched dot: contract a's dim ca with b's dim cb, batch dim 0,
    fp32 accumulation in the input dtype's MXU path. A G=1 batch lowers
    measurably worse than the plain 2D dot (L1024 fwd+bwd 9.98 vs
    6.97 ms, v5e), so single-row blocks drop the batch dim."""
    if a.shape[0] == 1:
        o = jax.lax.dot_general(a[0], b[0], (((ca - 1,), (cb - 1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return o[None]
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _scores(q_ref, k_ref, mask_ref, scale, causal, bq, g, bias=None):
    """Stacked masked scores [G, BQ, Lk] fp32 (dots in input dtype) and
    the combined keep mask ([G, 1, Lk] or [G, BQ, Lk], pad AND causal).

    mask_ref block is [M, 1, Lk]: M = 1 when the group is within one
    batch row (every row shares the mask), M = G/H when the group spans
    whole batch rows (H consecutive rows share each mask row).
    bias: optional [G, BQ, Lk] fp32 additive logits (RPR), applied
    before masking like the XLA one-hot form (ops/attention.py)."""
    lk = k_ref.shape[1]
    s = _bdot(q_ref[...], k_ref[...], 2, 2) * scale   # [G, BQ, Lk]
    if bias is not None:
        s = s + bias
    m = mask_ref.shape[0]
    if m == 1:
        keep = jnp.broadcast_to(mask_ref[0, 0, :][None, None, :] > 0,
                                (g, 1, lk))
    else:
        rows_per_mask = g // m
        keep = jnp.concatenate(
            [jnp.broadcast_to(mask_ref[mi, 0, :][None, None, :] > 0,
                              (rows_per_mask, 1, lk)) for mi in range(m)],
            axis=0)
    if causal:
        row_offset = pl.program_id(1) * bq
        keep = keep & _causal_keep(bq, lk, row_offset)[None]
    s = jnp.where(keep, s, NEG_INF)
    return s, keep


def _block_seed(seed_ref):
    return seed_ref[0] + pl.program_id(0) * pl.num_programs(1) \
        + pl.program_id(1)


def _softmax_weights(s):
    # direct max-sub softmax; the backward recomputes this IDENTICALLY
    # instead of reconstructing from a logsumexp residual -- the lse form
    # exp(s - lse) catastrophically cancels on fully-masked rows (all-pad
    # batch rows are legal everywhere): lse = NEG_INF + log(lk) rounds to
    # NEG_INF in fp32 and every weight reconstructs as 1.0 instead of 1/lk
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Shaw-RPR fold (VERDICT r4 #3). The relative-position bias
#     bias[i, j] = (q_i . T_k[c]) * scale,   c = clip(i - j, -m, m) + m
# is computed in-kernel from the skinny [BQ, 2m+1] table contraction and
# expanded onto the [BQ, Lk] score block by a LANE-ROLL SKEW: row i needs
# its bucket row shifted by (i_g - m) columns, and the per-row variable
# shift decomposes into log2(Lk) conditional whole-block rolls (bit b set
# -> roll by 2^b), each one VPU lane-rotation pass. This avoids both the
# Music-Transformer pad/reshape skew (measured 18.7% MFU in context,
# docs/rpr_performance.md) and a 2m+1-pass select/FMA expansion. The
# kernel works in FLIPPED bucket space (c' = 2m - c = clip(j - i + m)) so
# the shift is a forward roll; callers pass tables reversed along the
# bucket axis (fused_attention flips them outside the kernel, where the
# flip is free and autodiff un-flips the table gradients).
#
# Value side: out_i += sum_c W_b[i, c] T_v[c] with W_b the per-bucket
# sums of the (dropped) attention weights. Interior buckets have exactly
# one key each, so W_b is the INVERSE roll (unskew) of the weight block;
# the two clipped edge buckets are masked row reductions.
# ---------------------------------------------------------------------------


def _shift_bits(lk: int) -> int:
    return max(1, (lk - 1).bit_length())


def _skew_expand(rel, r0, m: int, lk: int):
    """[G, BQ, R] buckets -> [G, BQ, Lk]: out[g,i,j] = rel[g,i,c'] with
    c' = clip(j - (r0+i) + m, 0, R-1) (flipped-bucket clip semantics)."""
    g, bq, r = rel.shape
    pad = jnp.concatenate(
        [rel, jnp.zeros((g, bq, lk - r), rel.dtype)], axis=2)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, lk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, lk), 1)
    t = jnp.remainder(rows[:, :1] + (r0 - m), lk)          # [BQ, 1]
    for b in range(_shift_bits(lk)):
        bit = ((t >> b) & 1) > 0
        pad = jnp.where(bit[None], pltpu.roll(pad, 1 << b, axis=2), pad)
    d = cols - rows - r0                                   # j - i_g
    return jnp.where(((d >= -m) & (d <= m))[None], pad,
                     jnp.where((d > m)[None], rel[:, :, r - 1:r],
                               rel[:, :, 0:1]))


def _bucket_sums(w, r0, m: int, lk: int, r: int):
    """[G, BQ, Lk] -> [G, BQ, R] per-bucket sums under the same flipped
    clip semantics: interior buckets (one key each) via the inverse roll,
    edge buckets 0 / R-1 as masked row reductions over the clip regions."""
    g, bq, _ = w.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, lk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, lk), 1)
    d = cols - rows - r0
    e0 = jnp.sum(w * (d <= -m)[None].astype(w.dtype), axis=2)   # [G, BQ]
    e1 = jnp.sum(w * (d >= m)[None].astype(w.dtype), axis=2)
    t2 = jnp.remainder(-(rows[:, :1] + (r0 - m)), lk)
    u = w
    for b in range(_shift_bits(lk)):
        bit = ((t2 >> b) & 1) > 0
        u = jnp.where(bit[None], pltpu.roll(u, 1 << b, axis=2), u)
    u = u[:, :, :r]
    # interior bucket c's unique key j = i_g + c - m must be in range;
    # wrapped lanes otherwise carry other-side weights
    ridx = jax.lax.broadcasted_iota(jnp.int32, (bq, r), 1)
    jv = ridx + rows[:, :1] + (r0 - m)
    u = jnp.where(((jv >= 0) & (jv < lk))[None], u, 0.0)
    c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, r), 2)
    return jnp.where(c == 0, e0[..., None],
                     jnp.where(c == r - 1, e1[..., None], u))


def _rel_scores(q_ref, tk_ref, scale, r0, m, lk):
    """Scaled bucket logits [G, BQ, R] and their [G, BQ, Lk] expansion."""
    rel = jax.lax.dot_general(
        q_ref[...], tk_ref[...], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    return _skew_expand(rel, r0, m, lk)


def _fwd_kernel_rpr(seed_ref, q_ref, k_ref, v_ref, mask_ref, tk_ref,
                    tv_ref, o_ref, *, scale: float, causal: bool,
                    dropout_rate: float, bq: int, g: int, m: int):
    lk = k_ref.shape[1]
    r = tk_ref.shape[0]
    r0 = pl.program_id(1) * bq
    bias = _rel_scores(q_ref, tk_ref, scale, r0, m, lk)
    s, _ = _scores(q_ref, k_ref, mask_ref, scale, causal, bq, g, bias=bias)
    w = _softmax_weights(s)

    if dropout_rate > 0.0:
        pltpu.prng_seed(_block_seed(seed_ref))
        dmask = _dropout_keep(s.shape, dropout_rate)
        w = jnp.where(dmask, w / (1.0 - dropout_rate), 0.0)

    o = _bdot(w.astype(v_ref.dtype), v_ref[...], 2, 1)     # [G, BQ, Dh]
    wb = _bucket_sums(w, r0, m, lk, r).astype(v_ref.dtype)
    o = o + jax.lax.dot_general(
        wb, tv_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel_rpr(seed_ref, q_ref, k_ref, v_ref, mask_ref, tk_ref,
                    tv_ref, do_ref, dq_ref, dk_ref, dv_ref, dtk_ref,
                    dtv_ref, *, scale: float, causal: bool,
                    dropout_rate: float, bq: int, g: int, m: int):
    lk = k_ref.shape[1]
    r = tk_ref.shape[0]
    r0 = pl.program_id(1) * bq
    bias = _rel_scores(q_ref, tk_ref, scale, r0, m, lk)
    s, keep = _scores(q_ref, k_ref, mask_ref, scale, causal, bq, g,
                      bias=bias)
    w = _softmax_weights(s)

    if dropout_rate > 0.0:
        pltpu.prng_seed(_block_seed(seed_ref))
        dmask = _dropout_keep(s.shape, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        w_d = jnp.where(dmask, w * inv, 0.0)
    else:
        w_d = w

    in_dtype = q_ref.dtype
    w_d_c = w_d.astype(in_dtype)
    do = do_ref[...]
    # value-path: out += W_b @ T_v with W_b = bucket_sums(w_d)
    wb = _bucket_sums(w_d, r0, m, lk, r)
    dwb = jax.lax.dot_general(
        do, tv_ref[...], (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [G, BQ, R]
    dw_d = _bdot(do, v_ref[...], 2, 2) + _skew_expand(dwb, r0, m, lk)
    if dropout_rate > 0.0:
        dw = jnp.where(dmask, dw_d * inv, 0.0)
    else:
        dw = dw_d
    row = jnp.sum(dw * w, axis=-1, keepdims=True)
    ds = w * (dw - row)
    ds = jnp.where(keep, ds, 0.0)
    ds_c = ds.astype(in_dtype)
    ds_b = _bucket_sums(ds, r0, m, lk, r).astype(in_dtype)  # [G, BQ, R]

    dq = (_bdot(ds_c, k_ref[...], 2, 1)
          + jax.lax.dot_general(
              ds_b, tk_ref[...], (((2,), (0,)), ((), ())),
              preferred_element_type=jnp.float32)) * scale
    dk = _bdot(ds_c, q_ref[...], 1, 1) * scale
    dv = _bdot(w_d_c, do, 1, 1)
    # table grads: sum over every (group row, query) in the whole grid.
    # Mosaic's tpu.matmul rejects multiple contracting dims, so collapse
    # (G, BQ) into one major contraction first.
    n = g * bq
    dh = q_ref.shape[-1]
    dtk = jax.lax.dot_general(
        ds_b.reshape(n, r), q_ref[...].reshape(n, dh),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale         # [R, Dh]
    dtv = jax.lax.dot_general(
        wb.astype(in_dtype).reshape(n, r), do.reshape(n, dh),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dq_ref[...] = dq.astype(dq_ref.dtype)
    @pl.when(pl.program_id(1) == 0)
    def _init_kv():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)
    dk_ref[...] += dk.astype(dk_ref.dtype)
    dv_ref[...] += dv.astype(dv_ref.dtype)
    # table-grad blocks are revisited by EVERY grid step
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init_tables():
        dtk_ref[...] = jnp.zeros(dtk_ref.shape, dtk_ref.dtype)
        dtv_ref[...] = jnp.zeros(dtv_ref.shape, dtv_ref.dtype)
    dtk_ref[...] += dtk
    dtv_ref[...] += dtv


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale: float, causal: bool, dropout_rate: float, bq: int,
                g: int):
    s, _ = _scores(q_ref, k_ref, mask_ref, scale, causal, bq, g)
    w = _softmax_weights(s)

    if dropout_rate > 0.0:
        pltpu.prng_seed(_block_seed(seed_ref))
        dmask = _dropout_keep(s.shape, dropout_rate)
        w = jnp.where(dmask, w / (1.0 - dropout_rate), 0.0)

    o = _bdot(w.astype(v_ref.dtype), v_ref[...], 2, 1)   # [G, BQ, Dh]
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, causal: bool,
                dropout_rate: float, bq: int, g: int):
    s, keep = _scores(q_ref, k_ref, mask_ref, scale, causal, bq, g)
    w = _softmax_weights(s)                      # softmax weights [G,BQ,Lk]

    if dropout_rate > 0.0:
        pltpu.prng_seed(_block_seed(seed_ref))
        dmask = _dropout_keep(s.shape, dropout_rate)
        inv = 1.0 / (1.0 - dropout_rate)
        w_d = jnp.where(dmask, w * inv, 0.0)
    else:
        w_d = w

    in_dtype = q_ref.dtype
    w_d_c = w_d.astype(in_dtype)
    # dv += w_d^T @ do ; dw_d = do @ v^T
    dw_d = _bdot(do_ref[...], v_ref[...], 2, 2)          # [G, BQ, Lk]
    if dropout_rate > 0.0:
        dw = jnp.where(dmask, dw_d * inv, 0.0)
    else:
        dw = dw_d
    row = jnp.sum(dw * w, axis=-1, keepdims=True)
    ds = w * (dw - row)
    # zero ds at masked entries: a no-op for partially-masked rows (w is
    # exactly 0 there) but required for FULLY-masked rows (all-pad batch
    # rows), where w is uniform and XLA's where-VJP kills the gradient
    ds = jnp.where(keep, ds, 0.0)
    ds_c = ds.astype(in_dtype)

    dq = _bdot(ds_c, k_ref[...], 2, 1) * scale           # [G, BQ, Dh]
    dk = _bdot(ds_c, q_ref[...], 1, 1) * scale           # [G, Lk, Dh]
    dv = _bdot(w_d_c, do_ref[...], 1, 1)                 # [G, Lk, Dh]

    dq_ref[...] = dq.astype(dq_ref.dtype)
    # dk/dv blocks are revisited across the q-block grid axis: accumulate
    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
        dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)
    dk_ref[...] += dk.astype(dk_ref.dtype)
    dv_ref[...] += dv.astype(dv_ref.dtype)


def _specs(heads, bq, lk, dh, g):
    # with PrefetchScalarGridSpec, index maps also receive the scalar refs
    def q_map(i, j, *_):
        return (i, j, 0)

    def kv_map(i, j, *_):
        return (i, 0, 0)

    if g <= heads:
        groups_per_batch = heads // g
        mask_block = (1, 1, lk)

        def mask_map(i, j, *_):
            return (i // groups_per_batch, 0, 0)
    else:
        # group spans g // heads whole batch rows; block i covers exactly
        # the mask rows of those batch rows
        mask_block = (g // heads, 1, lk)

        def mask_map(i, j, *_):
            return (i, 0, 0)

    q_spec = pl.BlockSpec((g, bq, dh), q_map, memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((g, lk, dh), kv_map, memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(mask_block, mask_map, memory_space=pltpu.VMEM)
    return q_spec, kv_spec, mask_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused_attention(q, k, v, pad_mask, seed, causal, dropout_rate, group):
    return _fused_forward(q, k, v, pad_mask, causal, dropout_rate, seed,
                          group)


def _fused_forward(q, k, v, pad_mask, causal, dropout_rate, seed, g):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = dh ** -0.5
    bh = b * h
    bq = _pick_block(lq, lk)
    nq = lq // bq

    q3 = q.reshape(bh, lq, dh)
    k3 = k.reshape(bh, lk, dh)
    v3 = v.reshape(bh, lk, dh)

    q_spec, kv_spec, mask_spec = _specs(h, bq, lk, dh, g)
    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               dropout_rate=dropout_rate, bq=bq, g=g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // g, nq),
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
        out_specs=q_spec,
    )
    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, lq, dh), q.dtype),
        interpret=INTERPRET,
    )(seed, q3, k3, v3, pad_mask[:, None, :])
    return o.reshape(b, h, lq, dh)


def _fused_fwd_rule(q, k, v, pad_mask, seed, causal, dropout_rate, group):
    o = _fused_forward(q, k, v, pad_mask, causal, dropout_rate, seed, group)
    return o, (q, k, v, pad_mask, seed)


def _fused_bwd_rule(causal, dropout_rate, grp, residuals, dout):
    q, k, v, pad_mask, seed = residuals
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = dh ** -0.5
    bh = b * h
    bq = _pick_block(lq, lk)
    nq = lq // bq

    q3 = q.reshape(bh, lq, dh)
    k3 = k.reshape(bh, lk, dh)
    v3 = v.reshape(bh, lk, dh)
    do3 = dout.reshape(bh, lq, dh)

    q_spec, kv_spec, mask_spec = _specs(h, bq, lk, dh, grp)
    kernel = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                               dropout_rate=dropout_rate, bq=bq, g=grp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // grp, nq),
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec, q_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, lq, dh), q.dtype),
                   jax.ShapeDtypeStruct((bh, lk, dh), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lk, dh), jnp.float32)],
        interpret=INTERPRET,
    )(seed, q3, k3, v3, pad_mask[:, None, :], do3)
    return (dq.reshape(b, h, lq, dh),
            dk.reshape(b, h, lk, dh).astype(k.dtype),
            dv.reshape(b, h, lk, dh).astype(v.dtype),
            jnp.zeros_like(pad_mask), None)


_fused_attention.defvjp(_fused_fwd_rule, _fused_bwd_rule)


# --- RPR-folded variant ----------------------------------------------------

def _table_spec(r, dh):
    return pl.BlockSpec((r, dh), lambda i, j, *_: (0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_attention_rpr(q, k, v, pad_mask, tk, tv, seed, causal,
                         dropout_rate, group, max_rel):
    return _fused_forward_rpr(q, k, v, pad_mask, tk, tv, seed, causal,
                              dropout_rate, group, max_rel)


def _fused_forward_rpr(q, k, v, pad_mask, tk, tv, seed, causal,
                       dropout_rate, g, m):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    r = tk.shape[0]
    scale = dh ** -0.5
    bh = b * h
    bq = _pick_block(lq, lk)
    nq = lq // bq

    q3 = q.reshape(bh, lq, dh)
    k3 = k.reshape(bh, lk, dh)
    v3 = v.reshape(bh, lk, dh)

    q_spec, kv_spec, mask_spec = _specs(h, bq, lk, dh, g)
    kernel = functools.partial(_fwd_kernel_rpr, scale=scale, causal=causal,
                               dropout_rate=dropout_rate, bq=bq, g=g, m=m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // g, nq),
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec,
                  _table_spec(r, dh), _table_spec(r, dh)],
        out_specs=q_spec,
    )
    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, lq, dh), q.dtype),
        interpret=INTERPRET,
    )(seed, q3, k3, v3, pad_mask[:, None, :], tk, tv)
    return o.reshape(b, h, lq, dh)


def _fused_fwd_rule_rpr(q, k, v, pad_mask, tk, tv, seed, causal,
                        dropout_rate, group, max_rel):
    o = _fused_forward_rpr(q, k, v, pad_mask, tk, tv, seed, causal,
                           dropout_rate, group, max_rel)
    return o, (q, k, v, pad_mask, tk, tv, seed)


def _fused_bwd_rule_rpr(causal, dropout_rate, grp, max_rel, residuals,
                        dout):
    q, k, v, pad_mask, tk, tv, seed = residuals
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    r = tk.shape[0]
    scale = dh ** -0.5
    bh = b * h
    bq = _pick_block(lq, lk)
    nq = lq // bq

    q3 = q.reshape(bh, lq, dh)
    k3 = k.reshape(bh, lk, dh)
    v3 = v.reshape(bh, lk, dh)
    do3 = dout.reshape(bh, lq, dh)

    q_spec, kv_spec, mask_spec = _specs(h, bq, lk, dh, grp)
    kernel = functools.partial(_bwd_kernel_rpr, scale=scale, causal=causal,
                               dropout_rate=dropout_rate, bq=bq, g=grp,
                               m=max_rel)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh // grp, nq),
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec,
                  _table_spec(r, dh), _table_spec(r, dh), q_spec],
        out_specs=[q_spec, kv_spec, kv_spec,
                   _table_spec(r, dh), _table_spec(r, dh)],
    )
    dq, dk, dv, dtk, dtv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, lq, dh), q.dtype),
                   jax.ShapeDtypeStruct((bh, lk, dh), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lk, dh), jnp.float32),
                   jax.ShapeDtypeStruct((r, dh), jnp.float32),
                   jax.ShapeDtypeStruct((r, dh), jnp.float32)],
        interpret=INTERPRET,
    )(seed, q3, k3, v3, pad_mask[:, None, :], tk, tv, do3)
    return (dq.reshape(b, h, lq, dh),
            dk.reshape(b, h, lk, dh).astype(k.dtype),
            dv.reshape(b, h, lk, dh).astype(v.dtype),
            jnp.zeros_like(pad_mask),
            dtk.astype(tk.dtype), dtv.astype(tv.dtype), None)


_fused_attention_rpr.defvjp(_fused_fwd_rule_rpr, _fused_bwd_rule_rpr)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    pad_mask: Optional[jax.Array] = None, *,
                    causal: bool = False, dropout_rate: float = 0.0,
                    rng: Optional[jax.Array] = None,
                    rpr_tables=None,
                    max_relative_position: Optional[int] = None
                    ) -> jax.Array:
    """Fused attention over [B, H, L, Dh] projections.

    pad_mask: [B, Lk] 1/0 key-side padding mask (None = all valid).
    Scaling by Dh^-0.5 happens in-kernel. Returns [B, H, Lq, Dh] in the
    query dtype.

    rpr_tables + max_relative_position: Shaw relative positions
    ({'keys','values'} [2m+1, Dh] tables, reference modules/rpr.py)
    folded into the kernel -- the bias never materialises in HBM and the
    value-side bucket sums ride the same score block. Tables are flipped
    along the bucket axis here (the kernel works in c' = 2m - c space so
    its skew is a forward lane roll); autodiff un-flips their gradients.
    """
    b, _, lq, dh = q.shape
    lk = k.shape[2]
    if pad_mask is None:
        pad_mask = jnp.ones((b, lk), jnp.float32)
    pad_mask = pad_mask.astype(jnp.float32)
    if dropout_rate > 0.0 and rng is not None:
        seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
    else:
        dropout_rate = 0.0
        seed = jnp.zeros((1,), jnp.int32)
    rpr_on = rpr_tables is not None
    if rpr_on and max_relative_position is None:
        raise ValueError("fused_attention rpr_tables needs "
                         "max_relative_position")
    on_kernel_path = (jax.default_backend() == "tpu" or INTERPRET)
    if rpr_on:
        if not (on_kernel_path and rpr_supported(lq, lk,
                                                 max_relative_position)):
            return _xla_equivalent_rpr(q, k, v, pad_mask, causal,
                                       dropout_rate, rng, rpr_tables,
                                       max_relative_position)
    elif not (on_kernel_path and supported(lq, lk)):
        # CPU/GPU or VMEM-oversized shapes: mathematically-equivalent XLA
        # path (dropout stream differs; both are valid inverted dropout)
        return _xla_equivalent(q, k, v, pad_mask, causal, dropout_rate, rng)
    h = q.shape[1]
    bq = _pick_block(lq, lk)
    if rpr_on:
        # the rpr variant keeps extra [G, BQ, Lk] fp32 blocks (bias
        # expansion, bucket temps) live: halve the grouping budget
        group = (_GROUP_OVERRIDE if _GROUP_OVERRIDE is not None
                 else _pick_group(h, bq, lk, b * h,
                                  budget=GROUP_SCORE_BUDGET // 2))
        tk = rpr_tables["keys"][::-1].astype(q.dtype)
        tv = rpr_tables["values"][::-1].astype(q.dtype)
        return _fused_attention_rpr(q, k, v, pad_mask, tk, tv, seed,
                                    causal, float(dropout_rate), group,
                                    int(max_relative_position))
    group = (_GROUP_OVERRIDE if _GROUP_OVERRIDE is not None
             else _pick_group(h, bq, lk, b * h))
    return _fused_attention(q, k, v, pad_mask, seed, causal,
                            float(dropout_rate), group)


def _xla_equivalent_rpr(q, k, v, pad_mask, causal, dropout_rate, rng,
                        rpr_tables, max_rel):
    """CPU/oversized fallback: the one-hot XLA form (ops/rpr.py), same
    math and the same mask/softmax conventions as _xla_equivalent."""
    from zero_tpu.ops import rpr as rpr_mod

    dh = q.shape[-1]
    lq, lk = q.shape[2], k.shape[2]
    qs = q * (dh ** -0.5)
    s = rpr_mod.logits_with_rpr_onehot(
        qs, k, rpr_tables["keys"].astype(q.dtype), max_rel) \
        .astype(jnp.float32)
    s = jnp.where(pad_mask[:, None, None, :] > 0, s, NEG_INF)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        s = jnp.where((rows >= cols)[None, None], s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0 and rng is not None:
        from zero_tpu.ops.common import dropout as _drop
        w = _drop(rng, w, dropout_rate)
    return rpr_mod.output_with_rpr_onehot(
        w.astype(q.dtype), v, rpr_tables["values"].astype(q.dtype),
        max_rel)


def _xla_equivalent(q, k, v, pad_mask, causal, dropout_rate, rng):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * dh ** -0.5
    s = jnp.where(pad_mask[:, None, None, :] > 0, s, NEG_INF)
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        rows = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        s = jnp.where((rows >= cols)[None, None], s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0 and rng is not None:
        from zero_tpu.ops.common import dropout as _drop
        w = _drop(rng, w, dropout_rate)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)
