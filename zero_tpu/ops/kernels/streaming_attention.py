"""Streaming (k-blocked) fused attention Pallas TPU kernel.

Extends the query-blocked kernel (fused_attention.py) past its
whole-K/V-resident limit (Lk <= 8192): keys/values stream through VMEM in
BK-row blocks with online-softmax accumulation (flash-attention-2 style),
so Lk is bounded only by HBM. This is the long-context path SURVEY §5
calls for (speech encoders at thousands of frames; the reference is
always-dense O(L^2), func.py:222-254).

Algorithm (per (batch*head, q-block) with k innermost on the grid):
  forward: running row-max m, row-sum l, and output accumulator acc in
  VMEM scratch; per k-block p = exp(s - m_new), acc = acc*alpha + p@v;
  at the last k-block o = acc/l, lse = m + log l. Attention dropout masks
  p inside the accumulation only (l stays unmasked), which equals
  dropping the normalised weights.
  backward: the FA2 delta trick D = rowsum(do * o) replaces the full-row
  rowsum(dw ⊙ w) (valid under dropout because o is accumulated from the
  *masked* weights); dq accumulates over k-blocks, and a second kernel
  with q innermost accumulates dk/dv per k-block. Dropout masks are
  regenerated from a per-(bh, q-block, k-block) seed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# tuned on v5e at Lk=16384 (docs/kernels.md): 512x1024 turns a 0.83x loss
# into 1.02x vs XLA; bk=2048 exceeds the 16MB scoped-VMEM kernel stack
DEFAULT_BQ = 512
DEFAULT_BK = 1024
# tests flip this to run the kernels through the Pallas interpreter on CPU
INTERPRET = False


def _blocks(lq: int, lk: int):
    """(bq, bk) or None when the shape can't be tiled."""
    bq = next((b for b in (DEFAULT_BQ, 256, 128, 64, 32, 16, 8)
               if lq % b == 0), None)
    bk = next((b for b in (DEFAULT_BK, 512, 256, 128) if lk % b == 0), None)
    if bq is None or bk is None:
        return None
    return bq, bk


def supported(lq: int, lk: int) -> bool:
    return _blocks(lq, lk) is not None


def _keep_mask(mask_ref, s_shape, causal, bq, bk, jq, jk):
    keep = mask_ref[0, 0, :] > 0
    keep = jnp.broadcast_to(keep[None, :], s_shape)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, s_shape, 0) + jq * bq
        cols = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1) + jk * bk
        keep = keep & (rows >= cols)
    return keep


def _block_seed(seed_ref, i, jq, jk, nq, nk):
    return seed_ref[0] + (i * nq + jq) * nk + jk


def _dropout_keep(shape, rate: float):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits < jnp.uint32(int((1.0 - rate) * 4294967295.0))


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale, causal, dropout_rate,
                bq, bk):
    i, jq, jk = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jk == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _body():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(_keep_mask(mask_ref, s.shape, causal, bq, bk, jq, jk),
                      s, NEG_INF)

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = m_new

        if dropout_rate > 0.0:
            pltpu.prng_seed(_block_seed(seed_ref, i, jq, jk,
                                        pl.num_programs(1), nk))
            keep = _dropout_keep(p.shape, dropout_rate)
            p_acc = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            p_acc = p
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p_acc, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # skip above-diagonal blocks entirely (their DMA is clamped away
        # in _mk_specs): ~2x at long causal lengths
        pl.when(jq * bq + (bq - 1) >= jk * bk)(_body)
    else:
        _body()

    @pl.when(jk == nk - 1)
    def _finish():
        l = jnp.maximum(l_scr[...], 1e-30)
        o_ref[0] = (acc_scr[...] / l).astype(o_ref.dtype)
        lse_ref[0, 0, :] = (m_scr[...] + jnp.log(l))[:, 0]


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref, delta_ref,
               do_ref, dq_ref, dq_scr, *, scale, causal, dropout_rate,
               bq, bk):
    i, jq, jk = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jk == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    def _body():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0, :][:, None]
        delta = delta_ref[0, 0, :][:, None]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(_keep_mask(mask_ref, s.shape, causal, bq, bk, jq, jk),
                      s, NEG_INF)
        w = jnp.exp(s - lse)

        dw_d = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        if dropout_rate > 0.0:
            pltpu.prng_seed(_block_seed(seed_ref, i, jq, jk,
                                        pl.num_programs(1), nk))
            keep = _dropout_keep(w.shape, dropout_rate)
            dw = jnp.where(keep, dw_d / (1.0 - dropout_rate), 0.0)
        else:
            dw = dw_d
        ds = w * (dw - delta)
        dq_scr[...] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    if causal:
        pl.when(jq * bq + (bq - 1) >= jk * bk)(_body)
    else:
        _body()

    @pl.when(jk == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, lse_ref, delta_ref,
                do_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale, causal,
                dropout_rate, bq, bk):
    # grid (bh, nk, nq): q innermost so dk/dv accumulate in scratch
    i, jk, jq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(jq == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def _body():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0, 0, :][:, None]
        delta = delta_ref[0, 0, :][:, None]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(_keep_mask(mask_ref, s.shape, causal, bq, bk, jq, jk),
                      s, NEG_INF)
        w = jnp.exp(s - lse)

        if dropout_rate > 0.0:
            pltpu.prng_seed(_block_seed(seed_ref, i, jq, jk,
                                        pl.num_programs(2),
                                        pl.num_programs(1)))
            keep = _dropout_keep(w.shape, dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            w_d = jnp.where(keep, w * inv, 0.0)
            dw_d = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            dw = jnp.where(keep, dw_d * inv, 0.0)
        else:
            w_d = w
            dw = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)

        dv_scr[...] += jax.lax.dot_general(
            w_d, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = w * (dw - delta)
        dk_scr[...] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    if causal:
        pl.when(jq * bq + (bq - 1) >= jk * bk)(_body)
    else:
        _body()

    @pl.when(jq == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _mk_specs(heads, bq, bk, dh, q_minor, causal=False):
    """Block specs; q_minor selects grid (bh, nq, nk) vs (bh, nk, nq).

    Under causal masking, blocks strictly above the diagonal contribute
    nothing; their index maps are clamped to the last relevant block so
    the pipeline re-reads an already-resident block (no DMA) while the
    kernel body skips the compute (see _relevant)."""
    if q_minor:  # (bh, nk, nq): used by the dkv kernel
        def _jq(a, b):
            # first q-block whose rows reach k-block a: floor(a*bk / bq)
            return jnp.maximum(b, (a * bk) // bq) if causal else b

        def q_map(i, a, b, *_):
            return (i, _jq(a, b), 0)

        def kv_map(i, a, b, *_):
            return (i, a, 0)

        def mask_map(i, a, b, *_):
            return (i // heads, 0, a)

        def row_map(i, a, b, *_):
            return (i, 0, _jq(a, b))
    else:  # (bh, nq, nk)
        def _jk(a, b):
            # last k-block visible from q-block a: floor((a*bq+bq-1) / bk)
            return jnp.minimum(b, (a * bq + bq - 1) // bk) if causal else b

        def q_map(i, a, b, *_):
            return (i, a, 0)

        def kv_map(i, a, b, *_):
            return (i, _jk(a, b), 0)

        def mask_map(i, a, b, *_):
            return (i // heads, 0, _jk(a, b))

        def row_map(i, a, b, *_):
            return (i, 0, a)

    q_spec = pl.BlockSpec((1, bq, dh), q_map, memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, bk, dh), kv_map, memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, bk), mask_map, memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, bq), row_map, memory_space=pltpu.VMEM)
    return q_spec, kv_spec, mask_spec, row_spec


def _streaming_forward(q, k, v, pad_mask, causal, dropout_rate, seed):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = dh ** -0.5
    bh = b * h
    bq, bk = _blocks(lq, lk)
    nq, nk = lq // bq, lk // bk

    q3 = q.reshape(bh, lq, dh)
    k3 = k.reshape(bh, lk, dh)
    v3 = v.reshape(bh, lk, dh)
    q_spec, kv_spec, mask_spec, row_spec = _mk_specs(h, bq, bk, dh,
                                                     False, causal)

    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               dropout_rate=dropout_rate, bq=bq, bk=bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bh, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec],
        out_specs=[q_spec, row_spec],
        scratch_shapes=[pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, dh), jnp.float32)],
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bh, lq, dh), q.dtype),
                   jax.ShapeDtypeStruct((bh, 1, lq), jnp.float32)],
        interpret=INTERPRET,
    )(seed, q3, k3, v3, pad_mask[:, None, :])
    return o.reshape(b, h, lq, dh), lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _streaming_attention(q, k, v, pad_mask, seed, causal, dropout_rate):
    o, _ = _streaming_forward(q, k, v, pad_mask, causal, dropout_rate, seed)
    return o


def _fwd_rule(q, k, v, pad_mask, seed, causal, dropout_rate):
    o, lse = _streaming_forward(q, k, v, pad_mask, causal, dropout_rate,
                                seed)
    return o, (q, k, v, pad_mask, o, lse, seed)


def _bwd_rule(causal, dropout_rate, residuals, g):
    q, k, v, pad_mask, o, lse, seed = residuals
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = dh ** -0.5
    bh = b * h
    bq, bk = _blocks(lq, lk)
    nq, nk = lq // bq, lk // bk

    # FA2 delta: D_i = rowsum(do_i * o_i) == rowsum(dw ⊙ w_dropped) per row
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1).reshape(bh, 1, lq)

    q3 = q.reshape(bh, lq, dh)
    k3 = k.reshape(bh, lk, dh)
    v3 = v.reshape(bh, lk, dh)
    do3 = g.reshape(bh, lq, dh)
    mask3 = pad_mask[:, None, :]

    q_spec, kv_spec, mask_spec, row_spec = _mk_specs(h, bq, bk, dh,
                                                     False, causal)
    dq_kernel = functools.partial(_dq_kernel, scale=scale, causal=causal,
                                  dropout_rate=dropout_rate, bq=bq, bk=bk)
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nq, nk),
            in_specs=[q_spec, kv_spec, kv_spec, mask_spec, row_spec,
                      row_spec, q_spec],
            out_specs=[q_spec],
            scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, lq, dh), q.dtype)],
        interpret=INTERPRET,
    )(seed, q3, k3, v3, mask3, lse, delta, do3)[0]

    q_spec, kv_spec, mask_spec, row_spec = _mk_specs(h, bq, bk, dh,
                                                     True, causal)
    dkv_kernel = functools.partial(_dkv_kernel, scale=scale, causal=causal,
                                   dropout_rate=dropout_rate, bq=bq, bk=bk)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, nk, nq),
            in_specs=[q_spec, kv_spec, kv_spec, mask_spec, row_spec,
                      row_spec, q_spec],
            out_specs=[kv_spec, kv_spec],
            scratch_shapes=[pltpu.VMEM((bk, dh), jnp.float32),
                            pltpu.VMEM((bk, dh), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, lk, dh), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lk, dh), jnp.float32)],
        interpret=INTERPRET,
    )(seed, q3, k3, v3, mask3, lse, delta, do3)
    return (dq.reshape(b, h, lq, dh),
            dk.reshape(b, h, lk, dh).astype(k.dtype),
            dv.reshape(b, h, lk, dh).astype(v.dtype),
            jnp.zeros_like(pad_mask), None)


_streaming_attention.defvjp(_fwd_rule, _bwd_rule)


def streaming_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                        pad_mask: Optional[jax.Array] = None, *,
                        causal: bool = False, dropout_rate: float = 0.0,
                        rng: Optional[jax.Array] = None) -> jax.Array:
    """K-blocked fused attention over [B, H, L, Dh]; Lk bounded by HBM.

    Same contract as fused_attention.fused_attention."""
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
    if (jax.default_backend() != "tpu" and not INTERPRET) \
            or not supported(lq, lk):
        from zero_tpu.ops.kernels.fused_attention import _xla_equivalent
        return _xla_equivalent(q, k, v, pad_mask, causal, dropout_rate, rng)
    return _streaming_attention(q, k, v, pad_mask, seed, causal,
                                float(dropout_rate))
