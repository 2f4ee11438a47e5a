"""Weight initializers matching the reference zoo (modules/initializer.py).

uniform / normal / {normal,uniform}_unit_scaling (TF variance_scaling with
mode=fan_avg), plus ``scale(...)`` wrapping any init by a constant -- the
Fixup/depth-scaled-init building block (modules/initializer.py:35-45).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

Initializer = Callable[[jax.Array, tuple], jax.Array]


def uniform(gain: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -gain, gain)
    return init


def normal(stddev: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)
    return init


def _fans(shape) -> tuple:
    if len(shape) < 1:
        return 1.0, 1.0
    if len(shape) == 1:
        return float(shape[0]), float(shape[0])
    receptive = 1.0
    for d in shape[:-2]:
        receptive *= d
    return float(shape[-2]) * receptive, float(shape[-1]) * receptive


def variance_scaling(scale: float, distribution: str = "uniform") -> Initializer:
    """TF variance_scaling with mode=fan_avg (the only mode the reference
    uses). normal flavour is truncated like TF's."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans(shape)
        n = max((fan_in + fan_out) / 2.0, 1.0)
        if distribution == "uniform":
            limit = math.sqrt(3.0 * scale / n)
            return jax.random.uniform(key, shape, dtype, -limit, limit)
        # truncated normal in [-2, 2] sigma, stddev corrected like TF
        stddev = math.sqrt(scale / n) / 0.87962566103423978
        return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)
    return init


def zeros() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jnp.zeros(shape, dtype)
    return init


def ones() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jnp.ones(shape, dtype)
    return init


def scale(factor: float, base: Initializer) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return factor * base(key, shape, dtype)
    return init


def get_initializer(name: str, gain: float) -> Initializer:
    if name == "uniform":
        return uniform(gain)
    if name == "normal":
        return normal(gain)
    if name == "normal_unit_scaling":
        return variance_scaling(gain, "normal")
    if name == "uniform_unit_scaling":
        return variance_scaling(gain, "uniform")
    # default: glorot uniform
    return variance_scaling(1.0, "uniform")


def depth_scaled(layer: int, gain: float) -> Initializer:
    """Depth-scaled init for deep transformers: variance_scaling with
    gain*(layer+1)^-0.5, fan_avg, uniform (reference transformer.py:37-44)."""
    return variance_scaling(gain * (layer + 1) ** -0.5, "uniform")
