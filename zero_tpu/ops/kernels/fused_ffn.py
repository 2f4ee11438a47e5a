"""Fused FFN (linear -> ReLU -> dropout -> linear) Pallas TPU kernel.

The transformer FFN's [tokens, filter] hidden activation (4x the model
width) is the largest tensor a train step materialises: under XLA it
round-trips HBM twice in the forward (write after relu, read for the
second matmul) plus a full random-mask generation and re-read in the
backward. This kernel keeps the hidden block in VMEM: one grid step
computes relu(x@W1+b1), applies inverted dropout with the in-kernel
PRNG, and multiplies by W2 -- the [BM, filter] hidden tile never leaves
the chip, and the backward regenerates it (plus the identical mask) from
the same seed instead of storing it.

Semantics match ops/nn.py:ffn + ops/common.py:dropout exactly in
structure: 8-bit threshold masks (keep = low8(bits) < t, scale 256/t),
bf16 intermediate rounding at the same points as the XLA graph (matmul
out, +bias, relu). The dropout bitstream differs from jax.random.bits
(hardware PRNG, per-block seeds) -- both are valid inverted-dropout
streams, same policy as the attention kernels.

Weights stay VMEM-resident across the token-block grid (index maps are
constant, so Pallas fetches them once): W1+W2 at bf16 cost 4 MB at
base geometry (d=512, f=2048). Backward accumulates dW1/dW2/db in fp32
output blocks revisited across the grid.

Reference cost being replaced: func.py:327-338 (ffn) under
models/common.py hooks; enabled by config use_fused_ffn.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# token-block rows per grid step; the [BM, filter] fp32 hidden tile plus
# resident weights must fit scoped VMEM. BM=128: the backward keeps more
# live tiles (recomputed hidden + mask + dh + dW accumulators) and
# measured 2.6 MB over the 16 MB scoped-vmem limit at BM=256 with
# dropout on (v5e). Forward and backward MUST share one block size: the
# dropout mask regenerates from a per-block-index seed, so block i has
# to cover the same rows in both passes
BM = 128
# tests flip this to run the kernels through the Pallas interpreter on CPU
INTERPRET = False
MAX_FILTER = 4096
MAX_WIDTH = 1024


def supported(n_tokens: int, d_in: int, d_hidden: int, d_out: int) -> bool:
    return (n_tokens % BM == 0
            and d_in % 128 == 0 and d_out % 128 == 0
            and d_hidden % 128 == 0
            and d_hidden <= MAX_FILTER
            and max(d_in, d_out) <= MAX_WIDTH)


def _keep_mask(shape, t: int):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return (bits & jnp.uint32(255)) < jnp.uint32(t)


def _hidden(x_ref, w1_ref, b1_ref, seed_ref, t: int, inv: float):
    """relu(x@W1+b1) with the same bf16 rounding points as the XLA graph,
    then the dropout keep/scale. Returns (h_dropped, h_f32, keep).

    Comparisons run in fp32: the v5e VPU has no bf16 vector compare
    (Mosaic "Target does not support this comparison"). Rounding to the
    input dtype still happens at the matmul output and after the bias
    add, matching the XLA composite."""
    x = x_ref[...]
    s = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    pre = (s.astype(x.dtype).astype(jnp.float32)
           + b1_ref[0, :].astype(jnp.float32))
    pre = pre.astype(x.dtype).astype(jnp.float32)
    h_f = jnp.maximum(pre, 0.0)
    h = h_f.astype(x.dtype)
    if t < 256:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _keep_mask(h.shape, t)
        h_d = jnp.where(keep, h * jnp.asarray(inv, h.dtype),
                        jnp.zeros_like(h))
    else:
        keep = None
        h_d = h
    return h_d, h_f, keep


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                t: int, inv: float):
    h_d, _, _ = _hidden(x_ref, w1_ref, b1_ref, seed_ref, t, inv)
    y = jax.lax.dot_general(h_d, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype) + b2_ref[0, :].astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                t: int, inv: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    h_d, h_f, keep = _hidden(x_ref, w1_ref, b1_ref, seed_ref, t, inv)
    dy = dy_ref[...]
    dyf = dy.astype(jnp.float32)

    db2_ref[...] += jnp.sum(dyf, axis=0, keepdims=True)
    # dW2 += h_d^T @ dy   [f, d_out]
    dw2_ref[...] += jax.lax.dot_general(
        h_d, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dh_d = dy @ W2^T    [BM, f]
    dh_d = jax.lax.dot_general(dy, w2_ref[...], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if keep is not None:
        dh_d = jnp.where(keep, dh_d * inv, 0.0)
    dh = jnp.where(h_f > 0.0, dh_d, 0.0)
    dh_b = dh.astype(dy.dtype)

    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    # dW1 += x^T @ dh     [d_in, f]
    dw1_ref[...] += jax.lax.dot_general(
        x_ref[...], dh_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dx = dh @ W1^T      [BM, d_in]
    dx = jax.lax.dot_general(dh_b, w1_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _specs(d_in, d_hidden, d_out, bm):
    def blk(i, *_):
        return (i, 0)

    def const(i, *_):
        return (0, 0)

    x_spec = pl.BlockSpec((bm, d_in), blk, memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((d_in, d_hidden), const, memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, d_hidden), const, memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((d_hidden, d_out), const, memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((1, d_out), const, memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((bm, d_out), blk, memory_space=pltpu.VMEM)
    return x_spec, w1_spec, b1_spec, w2_spec, b2_spec, o_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_ffn(x, w1, b1, w2, b2, seed, rate):
    return _fused_forward(x, w1, b1, w2, b2, seed, rate)


def _rate_to_t(rate: float):
    """(t, inv) of the 8-bit threshold dropout; t=256 disables."""
    if not (0.0 < rate < 1.0):
        return 256, 1.0
    t = int(round((1.0 - rate) * 256.0))
    if t >= 256:
        return 256, 1.0
    return t, 256.0 / t


def _fused_forward(x, w1, b1, w2, b2, seed, rate):
    n, d_in = x.shape
    d_hidden = w1.shape[1]
    d_out = w2.shape[1]
    t, inv = _rate_to_t(rate)
    x_spec, w1_spec, b1_spec, w2_spec, b2_spec, o_spec = _specs(
        d_in, d_hidden, d_out, BM)
    kernel = functools.partial(_fwd_kernel, t=t, inv=inv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BM,),
        in_specs=[x_spec, w1_spec, b1_spec, w2_spec, b2_spec],
        out_specs=[o_spec],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, d_out), x.dtype)],
        interpret=INTERPRET,
    )(seed, x, w1, b1[None, :], w2, b2[None, :])[0]


def _fwd_rule(x, w1, b1, w2, b2, seed, rate):
    o = _fused_forward(x, w1, b1, w2, b2, seed, rate)
    return o, (x, w1, b1, w2, seed)


def _bwd_rule(rate, residuals, dy):
    x, w1, b1, w2, seed = residuals
    n, d_in = x.shape
    d_hidden = w1.shape[1]
    d_out = w2.shape[1]
    t, inv = _rate_to_t(rate)
    x_spec, w1_spec, b1_spec, w2_spec, b2_spec, o_spec = _specs(
        d_in, d_hidden, d_out, BM)
    kernel = functools.partial(_bwd_kernel, t=t, inv=inv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BM,),
        in_specs=[x_spec, w1_spec, b1_spec, w2_spec, o_spec],
        out_specs=[x_spec, w1_spec, b1_spec, w2_spec, b2_spec],
    )
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n, d_in), x.dtype),
                   jax.ShapeDtypeStruct((d_in, d_hidden), jnp.float32),
                   jax.ShapeDtypeStruct((1, d_hidden), jnp.float32),
                   jax.ShapeDtypeStruct((d_hidden, d_out), jnp.float32),
                   jax.ShapeDtypeStruct((1, d_out), jnp.float32)],
        interpret=INTERPRET,
    )(seed, x, w1, b1[None, :], w2, dy)
    return (dx, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(w2.dtype), None)


_fused_ffn.defvjp(_fwd_rule, _bwd_rule)


def fused_ffn(params, x: jax.Array, rng: Optional[jax.Array] = None,
              relu_dropout: Optional[float] = None) -> Optional[jax.Array]:
    """Drop-in fused path for nn.ffn(params, x, rng, relu_dropout).

    Returns None when the shape/backend is unsupported -- callers fall
    back to the XLA composite. params is the init_ffn pytree (single-input
    linears with biases)."""
    w1 = params["enlarge"]["ws"][0]
    w2 = params["output"]["ws"][0]
    b1 = params["enlarge"].get("b")
    b2 = params["output"].get("b")
    if b1 is None or b2 is None:
        return None
    lead = x.shape[:-1]
    d_in = x.shape[-1]
    n = 1
    for s in lead:
        n *= s
    if not supported(n, d_in, w1.shape[1], w2.shape[1]):
        return None
    # fp32 activations double every VMEM tile: the backward measured 1 MB
    # over the 16 MB scoped limit at base geometry -- bf16/fp16 only
    # (the CPU interpreter has no VMEM limit)
    if jnp.dtype(x.dtype).itemsize > 2 and not INTERPRET:
        return None
    if jax.default_backend() != "tpu" and not INTERPRET:
        return None
    rate = relu_dropout if (rng is not None and relu_dropout) else 0.0
    if rate and not (0.0 < rate < 1.0):
        rate = 0.0
    if rate:
        seed = jax.random.randint(rng, (1,), 0, 2 ** 31 - 1, jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    x2 = x.reshape(n, d_in)
    y = _fused_ffn(x2, w1.astype(x.dtype), b1.astype(x.dtype),
                   w2.astype(x.dtype), b2.astype(x.dtype), seed,
                   float(rate))
    return y.reshape(*lead, w2.shape[1])
