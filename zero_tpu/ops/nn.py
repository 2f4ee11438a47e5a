"""Core NN primitives: linear, norms, FFN, positional signal, attention bias.

Functional counterparts of reference func.py:14-400. Each primitive is an
(init_*, *) pair: init builds a param sub-pytree from a PRNG key, apply is a
pure function of (params, inputs).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from zero_tpu.ops import initializers as inits
from zero_tpu.ops.common import dropout


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def init_linear(key, in_sizes: Union[int, Sequence[int]], out_size: int,
                bias: bool = True, ln: bool = False,
                weight_init=None, bias_init=None, dtype=jnp.float32):
    """Multi-input dense layer params.

    Mirrors reference func.linear (func.py:14-65): by default inputs are
    concatenated (one weight per input block is equivalent and avoids the
    concat copy); with ``ln=True`` each input projection is layer-normed
    before summation (the RNN models' variant).
    """
    if isinstance(in_sizes, int):
        in_sizes = [in_sizes]
    weight_init = weight_init or inits.variance_scaling(1.0, "uniform")
    bias_init = bias_init or inits.zeros()

    params = {"ws": [], "lns": [] if ln else None}
    for i, isz in enumerate(in_sizes):
        k = jax.random.fold_in(key, i)
        params["ws"].append(weight_init(k, (isz, out_size), dtype))
        if ln:
            params["lns"].append(init_layer_norm(out_size, dtype))
    if bias:
        params["b"] = bias_init(jax.random.fold_in(key, 101), (out_size,), dtype)
    return params


def linear(params, xs, ln: bool = False, eps: float = 1e-8):
    """Apply a (possibly multi-input) dense layer; xs is an array or list."""
    if not isinstance(xs, (list, tuple)):
        xs = [xs]
    outs = []
    for i, x in enumerate(xs):
        w = params["ws"][i]
        o = jnp.einsum("...d,df->...f", x, w.astype(x.dtype))
        if ln:
            o = layer_norm(params["lns"][i], o, eps=eps)
        outs.append(o)
    o = outs[0]
    for extra in outs[1:]:
        o = o + extra
    if "b" in params:
        o = o + params["b"].astype(o.dtype)
    return o


# ---------------------------------------------------------------------------
# norms
# ---------------------------------------------------------------------------

def init_layer_norm(size: int, dtype=jnp.float32):
    return {"scale": jnp.ones((size,), dtype), "offset": jnp.zeros((size,), dtype)}


def layer_norm(params, x, eps: float = 1e-8):
    """LayerNorm with the reference's biased-variance formula
    (func.py:289-303). Statistics in fp32 for bf16 stability."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = params["scale"].astype(jnp.float32) * normed \
        + params["offset"].astype(jnp.float32)
    return out.astype(x.dtype)


def init_rms_norm(size: int, dtype=jnp.float32):
    return {"scale": jnp.ones((size,), dtype)}


def rms_norm(params, x, eps: float = 1e-8):
    """RMSNorm (func.py:306-318)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    out = params["scale"].astype(jnp.float32) * xf * jax.lax.rsqrt(ms + eps)
    return out.astype(x.dtype)


def residual_fn(x, y, rng=None, drop: Optional[float] = None):
    """Residual connection with dropout on the branch (func.py:321-324)."""
    return x + dropout(rng, y, drop)


# ---------------------------------------------------------------------------
# FFN
# ---------------------------------------------------------------------------

def init_ffn(key, d_in: int, d_hidden: int, d_out: int,
             weight_init=None, dtype=jnp.float32):
    return {
        "enlarge": init_linear(jax.random.fold_in(key, 0), d_in, d_hidden,
                               weight_init=weight_init, dtype=dtype),
        "output": init_linear(jax.random.fold_in(key, 1), d_hidden, d_out,
                              weight_init=weight_init, dtype=dtype),
    }


def ffn(params, x, rng=None, relu_dropout: Optional[float] = None,
        fused: bool = False):
    """ReLU FFN (func.py:327-338).

    fused=True routes to the Pallas fused kernel on TPU (the [tokens,
    filter] hidden tile stays in VMEM; kernels/fused_ffn.py) and falls
    back here for unsupported shapes/backends."""
    if fused:
        from zero_tpu.ops.kernels.fused_ffn import fused_ffn
        y = fused_ffn(params, x, rng, relu_dropout)
        if y is not None:
            return y
    h = jax.nn.relu(linear(params["enlarge"], x))
    h = dropout(rng, h, relu_dropout)
    return linear(params["output"], h)


# ---------------------------------------------------------------------------
# positional encoding
# ---------------------------------------------------------------------------

def timing_signal(length_or_position, channels: int,
                  min_timescale: float = 1.0, max_timescale: float = 1.0e4,
                  dtype=jnp.float32):
    """Sin/cos positional signal [len, channels] (func.py:341-369).

    ``length_or_position`` is either a static int (training: positions
    0..L-1) or a traced array of positions (decode: the current time)."""
    if isinstance(length_or_position, int):
        position = jnp.arange(length_or_position, dtype=jnp.float32)
    else:
        position = jnp.asarray(length_or_position, dtype=jnp.float32)
        if position.ndim == 0:
            position = position[None]
    num_timescales = channels // 2
    log_inc = (math.log(max_timescale / min_timescale)
               / max(num_timescales - 1, 1))
    inv_timescales = min_timescale * jnp.exp(
        jnp.arange(num_timescales, dtype=jnp.float32) * -log_inc)
    scaled = position[:, None] * inv_timescales[None, :]
    signal = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
    if channels % 2:
        signal = jnp.pad(signal, [(0, 0), (0, 1)])
    return signal.astype(dtype)


def add_timing_signal(x, time=None):
    """Add the positional signal; ``time`` selects decode-position mode."""
    length, channels = x.shape[-2], x.shape[-1]
    if time is None:
        sig = timing_signal(length, channels, dtype=x.dtype)
        return x + sig[None, :, :]
    sig = timing_signal(time, channels, dtype=x.dtype)
    return x + sig[None, :, :]


# ---------------------------------------------------------------------------
# attention bias
# ---------------------------------------------------------------------------

def causal_mask(length: int, dtype=jnp.float32):
    """[1, 1, L, L] 1/0 lower-triangular keep-mask (func.py:379-385 builds
    the additive -inf form; we keep booleans and let attention apply the
    dtype-correct big-negative)."""
    return jnp.tril(jnp.ones((length, length), dtype))[None, None, :, :]


def masking_mask(mask, dtype=jnp.float32):
    """[B, 1, 1, S] keep-mask from a [B, S] 0/1 pad mask (func.py:386-389)."""
    return mask.astype(dtype)[:, None, None, :]


def aan_cummean(x, mask, masked: bool = True):
    """AAN cumulative (masked) mean, O(L) cumsum form.

    Identical math to ``einsum(aan_weight(mask), x)`` -- per position g:
      masked:   m_g * (sum_{j<=g} m_j x_j) / max(sum_{j<=g} m_j, 1)
      unmasked: (sum_{j<=g} x_j)          / max(sum_{j<=g} m_j, 1)
    -- but linear in L instead of the [B, L, L] matmul (the reference's
    softmax construction, func.py:390-398, is quadratic by shape; the
    TPU-friendly form keeps HBM traffic O(B*L*d)). fp32 accumulation."""
    mf = mask.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    num = jnp.cumsum(xf * mf[..., None] if masked else xf, axis=1)
    cnt = jnp.cumsum(mf, axis=1)
    out = num / jnp.maximum(cnt, 1.0)[..., None]
    if masked:
        out = out * mf[..., None]
    return out.astype(x.dtype)


def aan_weight(mask, dtype=jnp.float32):
    """AAN training weight matrix [B, L, L]: row-normalised cumulative
    average restricted to valid positions.

    Equals the reference's softmax construction (func.py:390-398):
    softmax over a 0/1 matrix with -inf holes gives 1/k on the k ones,
    i.e. w[i, j] = m[i, j] / sum_j m[i, j] with m = outer(mask) * tril."""
    length = mask.shape[1]
    tril = jnp.tril(jnp.ones((length, length), jnp.float32))
    m = mask[:, :, None].astype(jnp.float32) \
        * mask[:, None, :].astype(jnp.float32) * tril[None]
    denom = jnp.sum(m, axis=-1, keepdims=True)
    w = jnp.where(denom > 0, m / jnp.maximum(denom, 1.0), 0.0)
    return w.astype(dtype)
