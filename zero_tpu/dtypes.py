"""Precision policy: fp32 parameter storage with a configurable compute dtype.

TPU-native replacement for the reference's fp32-master-weights custom
getter (utils/dtype.py:36-69): parameters live fp32 in the optimizer
state; the jitted step casts them to the compute dtype (bf16 on TPU) at
entry; losses/softmaxes/norm statistics stay fp32. bf16 needs no loss
scaling, so ``loss_scale`` is accepted in config only for compatibility.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NAMES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def compute_dtype(cfg):
    """The configured compute dtype (cfg.default_dtype)."""
    return _NAMES[getattr(cfg, "default_dtype", "float32")]


def cast_to_compute(tree, cfg):
    """Cast every floating leaf of a pytree to the compute dtype."""
    dtype = compute_dtype(cfg)
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree)
