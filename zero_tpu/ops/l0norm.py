"""L0 regularization via hard-concrete gates.

Counterpart of reference modules/l0norm.py (Google Research l0-regularization
utilities): hard-concrete sampling/mean (beta=2/3, gamma=-0.1, zeta=1.1),
the expected-L0 penalty, and the ramp-up schedule of the penalty weight.
Foundation for transformer_l0drop and AFS speech translation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPSILON = 1e-8
BETA = 2.0 / 3.0
GAMMA = -0.1
ZETA = 1.1


def hard_concrete_sample(rng, log_alpha, beta=BETA, gamma=GAMMA, zeta=ZETA,
                         eps=EPSILON):
    """Sample stretched-and-clipped hard-concrete gates in [0, 1]."""
    noise = jax.random.uniform(rng, log_alpha.shape, log_alpha.dtype, 0.0, 1.0)
    gate_inputs = jnp.log(noise + eps) - jnp.log1p(-noise)
    gate_inputs = jax.nn.sigmoid((gate_inputs + log_alpha) / beta)
    stretched = gate_inputs * (zeta - gamma) + gamma
    return jnp.clip(stretched, 0.0, 1.0)


def hard_concrete_mean(log_alpha, gamma=GAMMA, zeta=ZETA):
    """Deterministic eval-time gate: clipped stretched sigmoid mean."""
    stretched = jax.nn.sigmoid(log_alpha) * (zeta - gamma) + gamma
    return jnp.clip(stretched, 0.0, 1.0)


def l0_norm(log_alpha, beta=BETA, gamma=GAMMA, zeta=ZETA):
    """Expected-L0 contribution per gate: CDF of the stretched concrete at 0."""
    return jax.nn.sigmoid(log_alpha - beta * math.log(-gamma / zeta))


def var_train(rng, weight_parameters, beta=BETA, gamma=GAMMA, zeta=ZETA,
              eps=EPSILON):
    """(theta, log_alpha) -> (gated weights, sampled gates)."""
    theta, log_alpha = weight_parameters
    noise = hard_concrete_sample(rng, log_alpha, beta, gamma, zeta, eps)
    return theta * noise, noise


def var_eval(weight_parameters, gamma=GAMMA, zeta=ZETA):
    """(theta, log_alpha) -> (gated weights, mean gates)."""
    theta, log_alpha = weight_parameters
    noise = hard_concrete_mean(log_alpha, gamma, zeta)
    return theta * noise, noise


def l0_regularization_loss(l0_norm_loss, step, reg_scalar=1.0,
                           start_reg_ramp_up=0, end_reg_ramp_up=1000,
                           warm_up=True):
    """Ramp the penalty weight linearly over [start, end] steps
    (modules/l0norm.py:144-163)."""
    step = jnp.asarray(step, jnp.float32)
    current = jnp.maximum(0.0, step - start_reg_ramp_up)
    fraction = jnp.minimum(
        current / max(end_reg_ramp_up - start_reg_ramp_up, 1), 1.0)
    if warm_up:
        reg_scalar = fraction * reg_scalar
    return reg_scalar * l0_norm_loss
