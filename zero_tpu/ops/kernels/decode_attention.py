"""Fused decode-step attention Pallas TPU kernel (one query position).

The beam-search hot loop runs self-attention with a single query against
the static preallocated KV cache (ops/attention.py:self_attn_step,
replacing the reference's concat-grow cache, func.py:199-205). The XLA
path lowers to a chain of small HLOs per layer (two batched matvecs, a
masked fp32 softmax and the glue reshapes); this kernel fuses the whole
masked-attention read into ONE pass per batch row.

Layout trick: at decode widths the head depth (hidden/heads, typically
64) is below the 128-lane granule, so per-head lane slicing would force
relayouts. Instead the kernel never splits heads:

  * logits: S = K @ (broadcast(q) * Sel)^T -> [T, H], where Sel[h, l] is
    the static 0/1 head-ownership mask (1 iff lane l belongs to head h).
    Row h of the right operand holds q masked to head h's lanes, so the
    full-width contraction reproduces the per-head dot products exactly.
  * softmax over T per head column (fp32, position <= time mask from a
    scalar-prefetched time index -- same semantics as self_attn_step).
  * output: M = W^T @ V -> [H, hidden]; the per-head row of M holds that
    head's weighted value sum across ALL lanes, and the concatenated
    output keeps each lane's own head: o = sum_h (M * Sel)[h, :].

Grid (B,): every program owns one batch(*beam) row, with the row's full
[T_max, hidden] K/V cache blocks VMEM-resident (decode caches are short:
<= a few hundred positions for MT, a few thousand for speech). Decode is
HBM-bound on the cache read, so the ceiling is bandwidth parity with XLA;
the win is removing per-layer HLO overhead and intermediate round trips.
Measured win/loss vs XLA lives in docs/kernels.md; ``use_flash_decode``
stays opt-in either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# one row's K or V cache block must stay comfortably inside VMEM: the
# pipeline double-buffers each input block, so K+V at bf16 cost
# 2 buffers * 2 blocks * 2 bytes * ELEMS -- 1M elems ~ 8MB of the 16MB
# scoped-vmem budget (2M hit the limit: 16.04M > 16.00M, measured v5e)
MAX_CACHE_ELEMS = 1024 * 1024


def supported(lq: int, t_max: int, hidden: int, num_heads: int) -> bool:
    """Kernel eligibility: single-position queries, even head split,
    cache block resident in VMEM."""
    return (lq == 1
            and hidden % num_heads == 0
            and t_max * hidden <= MAX_CACHE_ELEMS)


def pool_supported(beams: int, t_max: int, hidden: int,
                   num_heads: int) -> bool:
    """Ancestry-pool kernel eligibility: the whole batch row's beam pool
    ([beams, T, hidden] K and V) must be VMEM-resident, and the
    (head, beam)-major logits tile needs a bounded row count."""
    return (2 <= beams <= 16
            and hidden % num_heads == 0
            and beams * num_heads <= 512
            and beams * t_max * hidden <= MAX_CACHE_ELEMS)


def cross_supported(beams: int, s_len: int, hidden: int,
                    num_heads: int) -> bool:
    """Cross-kernel eligibility: beam-folded queries against one memory
    block per batch row; bounded beam fold keeps the [S, beams*H] logits
    tile narrow."""
    return (1 <= beams <= 64
            and hidden % num_heads == 0
            and s_len * hidden <= MAX_CACHE_ELEMS)


def _kernel(time_ref, q_ref, k_ref, v_ref, o_ref, *, num_heads: int):
    t = time_ref[0]
    k = k_ref[0]                                 # [T, hidden]
    v = v_ref[0]                                 # [T, hidden]
    q = q_ref[0]                                 # [1, hidden]
    t_max, hidden = k.shape
    dh = hidden // num_heads
    scale = dh ** -0.5

    # static head-ownership mask: Sel[h, l] = 1 iff lane l is head h's
    head_of_lane = jax.lax.broadcasted_iota(
        jnp.int32, (num_heads, hidden), 1) // dh
    head_row = jax.lax.broadcasted_iota(
        jnp.int32, (num_heads, hidden), 0)
    sel = (head_of_lane == head_row).astype(q.dtype)   # [H, hidden]

    q_heads = jnp.broadcast_to(q, (num_heads, hidden)) * sel
    s = jax.lax.dot_general(k, q_heads, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [T, H]
    s = s * scale

    pos = jax.lax.broadcasted_iota(jnp.int32, (t_max, 1), 0)
    s = jnp.where(pos <= t, s, NEG_INF)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    w = (p / jnp.sum(p, axis=0, keepdims=True)).astype(v.dtype)  # [T, H]

    mixed = jax.lax.dot_general(w, v, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    sel_f = sel.astype(jnp.float32)
    o = jnp.sum(mixed * sel_f, axis=0, keepdims=True)            # [1, hidden]
    o_ref[0] = o.astype(o_ref.dtype)


def _cross_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, num_heads: int):
    """Beam-folded single-step cross attention: [beams, hidden] queries
    against one batch row's [S, hidden] memory under a [S] pad mask.

    Same lane-preserving head trick as _kernel, with a (beam, head)
    column block: logits S = K @ q_headsᵀ -> [S, beams*H]; the output
    unfolds the mix back per beam by summing each beam's H head rows
    through the ownership mask."""
    k = k_ref[0]                                 # [S, hidden]
    v = v_ref[0]                                 # [S, hidden]
    q = q_ref[0]                                 # [beams, hidden]
    mask = mask_ref[0, 0, :]                     # [S] float
    s_max, hidden = k.shape
    beams = q.shape[0]
    dh = hidden // num_heads
    scale = dh ** -0.5

    head_of_lane = jax.lax.broadcasted_iota(
        jnp.int32, (num_heads, hidden), 1) // dh
    head_row = jax.lax.broadcasted_iota(
        jnp.int32, (num_heads, hidden), 0)
    sel = (head_of_lane == head_row).astype(q.dtype)   # [H, hidden]

    q_heads = (q[:, None, :] * sel[None, :, :]).reshape(
        beams * num_heads, hidden)
    # keep S on the LANE dim throughout: [beams*H, S] logits let the
    # [1, S] pad mask broadcast across rows (a minor-dim insertion on
    # the i1 mask is unsupported by Mosaic), and the softmax reduces
    # over lanes
    s = jax.lax.dot_general(q_heads, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s * scale                                # [beams*H, S]
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    w = (p / jnp.sum(p, axis=1, keepdims=True)).astype(v.dtype)

    mixed = jax.lax.dot_general(w, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    mixed = mixed.reshape(beams, num_heads, hidden)
    o = jnp.sum(mixed * sel[None].astype(jnp.float32), axis=1)
    o_ref[0] = o.astype(o_ref.dtype)             # [beams, hidden]


def _pool_rows_per_program(b: int, beams: int, t_max: int,
                           hidden: int) -> int:
    """Batch rows handled by one grid program. At serving batch sizes the
    per-row work is tiny (a handful of [H*K, T] dots), so one-row
    programs pay grid/DMA fixed costs hundreds of times per layer step —
    the measured super-linear decode tail past B=64 (docs/kernels.md).
    Group as many rows as divide the batch and keep K+V pool blocks
    inside the scoped-VMEM budget."""
    # measured on v5e (MT pool, K=4 T=82 hidden=512, beam-4 serving
    # A/B): rb=4 565/542 sent/s at B=64/256 vs 563/530 ungrouped;
    # rb=8 (via a raised 1.5M budget) measured WORSE (562/540) -- the
    # bigger block spends VMEM without further overhead to amortize,
    # so the single-row VMEM bound stays the grouping budget too
    for rb in (8, 4, 2):
        if b % rb == 0 and rb * beams * t_max * hidden <= MAX_CACHE_ELEMS:
            return rb
    return 1


def _pool_kernel(time_ref, q_ref, k_ref, v_ref, anc_ref, o_ref, *,
                 num_heads: int, relu: bool = False):
    """Ancestry-selected beam attention over one batch row's UNPERMUTED
    KV pool (see ops/attention.py:_ancestry_attn for the math).

    q: [K, hidden] (all beams); k, v: [K, T, hidden] pool rows; anc:
    [K, T] int32 with the CURRENT position already set to identity
    (self_attn_step writes it before the call). Every (beam, position)
    pair selects exactly one pool row, so masked accumulation over the K
    static rows reproduces the gathered-cache attention exactly: wrong-j
    terms contribute literal 0.0 to both the logits and the value mix.

    Layout: the lane-preserving head trick of ``_kernel`` with
    (head, beam)-major rows -- q_heads[h*K + i] = q[i] masked to head
    h's lanes -- so per-j selection masks tile as whole [K, T] blocks.
    """
    t = time_ref[0]
    rb = q_ref.shape[0]
    for r in range(rb):      # unrolled: rows grouped per program to
        q = q_ref[r]                              # [K, hidden]
        anc = anc_ref[r]                          # [K, T] int32
        beams, hidden = q.shape
        t_max = anc.shape[1]
        dh = hidden // num_heads
        scale = dh ** -0.5

        head_of_lane = jax.lax.broadcasted_iota(
            jnp.int32, (num_heads, hidden), 1) // dh
        head_row = jax.lax.broadcasted_iota(
            jnp.int32, (num_heads, hidden), 0)
        sel = (head_of_lane == head_row).astype(q.dtype)  # [H, hidden]

        q_heads = (sel[:, None, :] * q[None, :, :]).reshape(
            num_heads * beams, hidden)                    # [H*K, hidden]

        rows = num_heads * beams
        s_acc = jnp.zeros((rows, t_max), jnp.float32)
        for j in range(beams):
            mask_j = jnp.broadcast_to((anc == j)[None],
                                      (num_heads,) + anc.shape)
            mask_j = mask_j.reshape(rows, t_max)
            dots = jax.lax.dot_general(q_heads, k_ref[r, j],
                                       (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            s_acc += dots * mask_j.astype(jnp.float32)

        s_acc = s_acc * scale
        pos = jax.lax.broadcasted_iota(jnp.int32, (rows, t_max), 1)
        s_acc = jnp.where(pos <= t, s_acc, NEG_INF)
        if relu:
            # ReLA: relu weights, no normalization (modules/rela.py:63-72;
            # masked positions become relu(NEG_INF) = 0, identical to the
            # reference's zero-multiply masking). The gated-RMSNorm
            # epilogue runs outside the kernel (self_attn_step).
            w = jax.nn.relu(s_acc)                        # [H*K, T] f32
        else:
            m = jnp.max(s_acc, axis=1, keepdims=True)
            p = jnp.exp(s_acc - m)
            w = p / jnp.sum(p, axis=1, keepdims=True)     # [H*K, T] f32

        mixed = jnp.zeros((rows, hidden), jnp.float32)
        for j in range(beams):
            mask_j = jnp.broadcast_to((anc == j)[None],
                                      (num_heads,) + anc.shape)
            mask_j = mask_j.reshape(rows, t_max)
            wj = (w * mask_j.astype(jnp.float32)).astype(v_ref.dtype)
            mixed += jax.lax.dot_general(wj, v_ref[r, j],
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

        mixed = mixed.reshape(num_heads, beams, hidden)
        o = jnp.sum(mixed * sel[:, None, :].astype(jnp.float32), axis=0)
        o_ref[r] = o.astype(o_ref.dtype)                  # [K, hidden]


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "relu", "interpret"))
def decode_pool_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          ancestry: jax.Array, time: jax.Array,
                          num_heads: int, relu: bool = False,
                          interpret: bool = False) -> jax.Array:
    """Ancestry-selected single-step attention over unpermuted beam pools.

    q: [B, K, hidden] beam queries; k, v: [B, K, T_max, hidden] pools
    already holding this step's entries at ``time``; ancestry:
    [B, K, T_max] int32 pool-row indices with column ``time`` set to
    identity. Attends over positions <= time. relu=True switches the
    softmax for ReLA's unnormalized relu weights. Returns [B, K, hidden].
    """
    b, beams, hidden = q.shape
    t_max = k.shape[2]
    time_arr = jnp.asarray(time, jnp.int32).reshape((1,))
    rb = _pool_rows_per_program(b, beams, t_max, hidden)

    def row_map(i, *_):
        return (i, 0, 0)

    def row_map4(i, *_):
        return (i, 0, 0, 0)

    q_spec = pl.BlockSpec((rb, beams, hidden), row_map,
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((rb, beams, t_max, hidden), row_map4,
                           memory_space=pltpu.VMEM)
    anc_spec = pl.BlockSpec((rb, beams, t_max), row_map,
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // rb,),
        in_specs=[q_spec, kv_spec, kv_spec, anc_spec],
        out_specs=q_spec,
    )
    return pl.pallas_call(
        functools.partial(_pool_kernel, num_heads=num_heads, relu=relu),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, beams, hidden), q.dtype),
        interpret=interpret,
    )(time_arr, q, k, v, ancestry)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def decode_cross_attention(q: jax.Array, mk: jax.Array, mv: jax.Array,
                           mask: jax.Array, num_heads: int,
                           interpret: bool = False) -> jax.Array:
    """Beam-folded cross attention over precomputed memory projections.

    q: [B, beams, hidden] (beam queries folded per batch row, the
    beam-invariant-memory layout of ops/attention.py:cross_attn_step);
    mk, mv: [B, S, hidden]; mask: [B, S] 1/0 pad mask.
    Returns [B, beams, hidden] in the query dtype.

    NOT WIRED into cross_attn_step: measured on v5e (MT geometry, B=32
    beam-4, src 32) it is speed-neutral for the base transformer
    (137.3 vs 136.2 ms/batch with the self-attn kernel alone) and
    slightly SLOWER for AAN (39.4 vs 38.5 ms) — XLA's batched matmuls
    over the precomputed mk/mv are already optimal, unlike the
    per-step-growing self-attn cache read this file's main kernel wins
    on. Kept (with interpret-mode tests) for long-memory revisits,
    e.g. speech encoders at thousands of frames.
    """
    b, beams, hidden = q.shape
    s_len = mk.shape[1]
    mask3 = mask.astype(jnp.float32).reshape(b, 1, s_len)

    def row_map(i, *_):
        return (i, 0, 0)

    q_spec = pl.BlockSpec((1, beams, hidden), row_map,
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, s_len, hidden), row_map,
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, s_len), row_map,
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_cross_kernel, num_heads=num_heads),
        grid=(b,),
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, beams, hidden), q.dtype),
        interpret=interpret,
    )(q, mk, mv, mask3)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     time: jax.Array, num_heads: int,
                     interpret: bool = False) -> jax.Array:
    """Single-step masked attention over the static decode cache.

    q: [B, 1, hidden]; k, v: [B, T_max, hidden] caches ALREADY holding this
    step's entries at position ``time``; attends over positions <= time.
    Returns [B, 1, hidden] in the query dtype.
    """
    b, lq, hidden = q.shape
    t_max = k.shape[1]
    del lq
    time_arr = jnp.asarray(time, jnp.int32).reshape((1,))

    def row_map(i, *_):
        return (i, 0, 0)

    q_spec = pl.BlockSpec((1, 1, hidden), row_map, memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, t_max, hidden), row_map,
                           memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
    )
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, hidden), q.dtype),
        interpret=interpret,
    )(time_arr, q, k, v)
