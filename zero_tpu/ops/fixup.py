"""Fixup components: training deep transformers without layer norm.

Counterpart of reference modules/fixup.py: scalar shift/scale parameters,
an FFN with L^(-1/2)-scaled input init + zero-init output + shift/scale
sandwich, and attention input inits scaled by L^(-1/6) (self) or L^(-1/8)
(fuse) with zero-init o_map (modules/fixup.py:29-193).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from zero_tpu.ops import initializers as inits
from zero_tpu.ops import nn, attention
from zero_tpu.ops.common import dropout


def init_shift(dtype=jnp.float32):
    return {"offset": jnp.zeros((1,), dtype)}


def shift(params, x):
    return x - params["offset"].astype(x.dtype)


def init_scale(init: float = 1.0, dtype=jnp.float32):
    return {"scale": jnp.full((1,), init, dtype)}


def scale(params, x):
    return x * params["scale"].astype(x.dtype)


def init_fixup_ffn(key, d_in: int, d_hidden: int, d_out: int, numblocks: int,
                   base_init=None, dtype=jnp.float32):
    """Fixup FFN params: input weight scaled by numblocks^-1/2, output weight
    zero-init, no biases, 3 shifts + 1 scale (modules/fixup.py:29-55)."""
    base_init = base_init or inits.variance_scaling(1.0, "uniform")
    in_init = inits.scale(math.pow(numblocks, -0.5), base_init)
    return {
        "shift0": init_shift(dtype),
        "enlarge": nn.init_linear(jax.random.fold_in(key, 0), d_in, d_hidden,
                                  bias=False, weight_init=in_init, dtype=dtype),
        "shift1": init_shift(dtype),
        "shift2": init_shift(dtype),
        "output": nn.init_linear(jax.random.fold_in(key, 1), d_hidden, d_out,
                                 bias=False, weight_init=inits.zeros(),
                                 dtype=dtype),
        "scale": init_scale(1.0, dtype),
    }


def fixup_ffn(params, x, rng=None, relu_dropout=None):
    x = shift(params["shift0"], x)
    h = nn.linear(params["enlarge"], x)
    h = shift(params["shift1"], h)
    h = jax.nn.relu(h)
    h = dropout(rng, h, relu_dropout)
    h = shift(params["shift2"], h)
    out = nn.linear(params["output"], h)
    return scale(params["scale"], out)


def init_fixup_attention(key, d_query: int, hidden: int, self_attention: bool,
                         numblocks: int, d_memory=None, fuse: bool = False,
                         base_init=None, dtype=jnp.float32):
    """Attention with fixup-scaled input inits and zero-init o_map: scale
    base 6 normally, 8 on the fuse path (modules/fixup.py:91-93), biasless
    projections."""
    base_init = base_init or inits.variance_scaling(1.0, "uniform")
    scale_base = 8.0 if fuse else 6.0
    in_init = inits.scale(math.pow(numblocks, -1.0 / scale_base), base_init)
    return attention.init_attention(
        key, d_query, hidden, self_attention, d_memory=d_memory, fuse=fuse,
        bias=False, weight_init=in_init, out_init=inits.zeros(), dtype=dtype)
