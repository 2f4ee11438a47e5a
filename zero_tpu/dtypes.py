"""Precision policy: fp32 parameter storage with a compute dtype.

TPU-native replacement for the reference's fp32-master-weights custom getter
(utils/dtype.py:36-69): parameters are stored fp32 in the optimizer pytree
and cast to the compute dtype (bf16 on TPU) at the top of the jitted step.
bf16 needs no loss scaling; ``loss_scale`` is accepted for config compat.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    # numeric guards (reference utils/dtype.py epsilon()/inf())
    epsilon: float = 1e-8
    inf: float = 1e8

    def cast_to_compute(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree)

    def cast_to_param(self, tree):
        return jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree)


_NAMES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def get_policy(params) -> Policy:
    """Build the precision policy from config (default_dtype, dtype_*)."""
    compute = _NAMES[getattr(params, "default_dtype", "float32")]
    eps = float(getattr(params, "dtype_epsilon", 1e-8))
    inf = float(getattr(params, "dtype_inf", 1e8))
    if compute == jnp.bfloat16:
        # bf16 has coarse resolution; widen epsilon like the reference's
        # float16 guidance (utils/dtype.py docstring suggests ~1e-4 era)
        eps = max(eps, 1e-6)
        inf = min(inf, 1e4)
    return Policy(param_dtype=jnp.float32, compute_dtype=compute,
                  epsilon=eps, inf=inf)


def big_neg(dtype) -> float:
    """A large negative value usable as -inf in softmax masking for dtype."""
    if dtype == jnp.bfloat16 or dtype == jnp.float16:
        return -1e4
    return -1e9
