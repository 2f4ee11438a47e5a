"""ZeRO-1 optimizer-state sharding over the 'data' mesh axis.

An extension the reference lacks (its slot variables are fully
replicated per device, utils/cycle.py); equivalence target is this
framework's own replicated-moment step: zero_stage=1 must change the
Adam moments' LAYOUT only, never a value the host can observe.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.parallel import (batch_sharding, init_train_state, make_mesh,
                               make_train_step)
from tests.helpers import tiny_config, toy_batch


def _mesh_or_skip(cfg):
    need = cfg.mesh_data * cfg.mesh_model
    if len(jax.devices()) < need:
        pytest.skip("needs %d devices" % need)
    return make_mesh(cfg)


def _run_steps(cfg, nsteps=3):
    mesh = _mesh_or_skip(cfg)
    model = get_model("transformer")
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step = make_train_step(model, cfg, mesh, donate=False)
    b = toy_batch(batch=8)
    batch = {k: jnp.asarray(np.stack([v], 0)) for k, v in b.items()}
    batch = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
    losses = []
    for i in range(nsteps):
        state, metrics = step(state, batch, 1e-3,
                              jax.random.fold_in(jax.random.PRNGKey(7), i))
        losses.append(float(metrics["loss"]))
    return state, losses


def _cfg(**over):
    return tiny_config(dropout=0.0, relu_dropout=0.0, residual_dropout=0.0,
                       attention_dropout=0.0, ema_decay=0.999, **over)


def _assert_equivalent(s0, l0, s1, l1):
    """Layout-equivalence oracle. GSPMD legitimately reorders the grad
    reduction under the sharded-moment layout (reduce-scatter vs
    all-reduce summation order, ~1e-7 relative), and early Adam
    amplifies that to ~1e-2 RELATIVE on the update direction for
    near-zero-grad coordinates (u = mu/(sqrt(nu)+eps) is sign-like when
    nu ~ g^2). So: moments and losses must match TIGHTLY (a dropped or
    double-counted shard shows up here at O(1)), params to the
    Adam-noise tolerance (lr=1e-3 x 3 steps x 1e-2 rel => ~3e-5; a real
    bug is >=1e-2)."""
    np.testing.assert_allclose(l0, l1, rtol=1e-6, atol=1e-6)
    merr = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        s0.opt_state.mu, s1.opt_state.mu)
    assert max(jax.tree.leaves(merr)) < 1e-5, max(jax.tree.leaves(merr))
    perr = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        s0.params, s1.params)
    assert max(jax.tree.leaves(perr)) < 3e-4, max(jax.tree.leaves(perr))
    eerr = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        s0.ema, s1.ema)
    assert max(jax.tree.leaves(eerr)) < 3e-4, max(jax.tree.leaves(eerr))


def test_zero1_matches_replicated():
    """Same training whether the moments are replicated or ZeRO-1
    sharded: the layout changes, the math doesn't (up to reduction
    order -- see _assert_equivalent)."""
    base = _cfg(mesh_data=4, mesh_model=1, zero_stage=0)
    z1 = _cfg(mesh_data=4, mesh_model=1, zero_stage=1)
    s0, l0 = _run_steps(base)
    s1, l1 = _run_steps(z1)
    _assert_equivalent(s0, l0, s1, l1)


def test_zero1_moments_actually_sharded():
    """Every Adam moment leaf with a data_par-divisible free dim must
    carry 'data' in its sharding spec after a step (the constraint in
    train_step.py pins it; without it GSPMD may silently re-replicate)."""
    cfg = _cfg(mesh_data=4, mesh_model=1, zero_stage=1)
    state, _ = _run_steps(cfg, nsteps=1)
    data_par = 4
    for tree in (state.opt_state.mu, state.ema):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        sharded = unshardable = 0
        for path, leaf in flat:
            has_data = any(ax == "data" for ax in leaf.sharding.spec)
            divisible = any(d % data_par == 0 and d > 0 for d in leaf.shape)
            if divisible:
                assert has_data, (path, leaf.shape, leaf.sharding)
                sharded += 1
            else:
                unshardable += 1
        assert sharded > 10, (sharded, unshardable)


def test_zero1_reduces_per_chip_bytes():
    """The whole point: per-chip optimizer+EMA bytes must drop by close
    to the data-parallel degree (4) vs the replicated layout."""
    from zero_tpu.parallel.mesh import per_device_bytes
    s0, _ = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=0),
                       nsteps=1)
    s1, _ = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=1),
                       nsteps=1)
    assert per_device_bytes(s1.opt_state) < 0.5 * per_device_bytes(
        s0.opt_state)
    assert per_device_bytes(s1.ema) < 0.5 * per_device_bytes(s0.ema)
    # params stay replicated over 'data' in both layouts
    assert per_device_bytes(s1.params) == per_device_bytes(s0.params)


def test_zero1_composes_with_tp():
    """ZeRO-1 over 'data' on top of Megatron TP over 'model': the moment
    spec keeps the TP axis and gains 'data' on a free dim; values still
    match the replicated run."""
    base = _cfg(mesh_data=2, mesh_model=2, zero_stage=0)
    z1 = _cfg(mesh_data=2, mesh_model=2, zero_stage=1)
    s0, l0 = _run_steps(base)
    s1, l1 = _run_steps(z1)
    _assert_equivalent(s0, l0, s1, l1)
    # at least one TP-sharded weight's moment carries BOTH axes
    flat = jax.tree_util.tree_flatten_with_path(s1.opt_state.mu)[0]
    both = [p for p, leaf in flat
            if set(a for a in leaf.sharding.spec if a) >= {"data", "model"}]
    assert both, "no moment leaf is sharded over both data and model"
