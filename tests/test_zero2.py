"""ZeRO-2: ZeRO-1 moment sharding + the gradient tree pinned to the
same 'data'-sharded layout (reduce-scatter instead of all-reduce; with
gradient accumulation the scan carry itself is sharded).

An extension the reference lacks (its gradients are replicated per
device, utils/cycle.py); equivalence target is this framework's own
replicated step -- stage 2 must change LAYOUT only, never a value the
host can observe.
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
from tests.test_zero1 import _assert_equivalent


def _mesh_or_skip(cfg):
    need = cfg.mesh_data * cfg.mesh_model
    if len(jax.devices()) < need:
        pytest.skip("needs %d devices" % need)
    return make_mesh(cfg)


def _cfg(**over):
    return tiny_config(dropout=0.0, relu_dropout=0.0, residual_dropout=0.0,
                       attention_dropout=0.0, ema_decay=0.999, **over)


def _run_steps(cfg, nsteps=3, cycles=1):
    mesh = _mesh_or_skip(cfg)
    model = get_model("transformer")
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step = make_train_step(model, cfg, mesh, donate=False)
    b = toy_batch(batch=8)
    batch = {k: jnp.asarray(np.stack([v] * cycles, 0)) for k, v in b.items()}
    batch = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
    losses = []
    for i in range(nsteps):
        state, metrics = step(state, batch, 1e-3,
                              jax.random.fold_in(jax.random.PRNGKey(7), i))
        losses.append(float(metrics["loss"]))
    return state, losses


def test_zero2_matches_replicated():
    """Same training whether grads/moments are replicated or ZeRO-2
    sharded (up to reduction order -- see test_zero1._assert_equivalent)."""
    s0, l0 = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=0))
    s2, l2 = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=2))
    _assert_equivalent(s0, l0, s2, l2)


def test_zero2_matches_replicated_with_accumulation():
    """The sharded accumulation carry (the stage-2-specific path: each
    microbatch grad reduce-scatters into a sharded gsum) is exact vs the
    replicated accumulation scan."""
    s0, l0 = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=0),
                        cycles=3)
    s2, l2 = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=2),
                        cycles=3)
    _assert_equivalent(s0, l0, s2, l2)


def test_zero2_state_layout():
    """Moments shard like stage 1; params stay replicated over 'data'
    (param sharding is stage 3's job, not stage 2's)."""
    from zero_tpu.parallel.mesh import per_device_bytes
    s0, _ = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=0),
                       nsteps=1)
    s2, _ = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=2),
                       nsteps=1)
    assert per_device_bytes(s2.opt_state) < 0.5 * per_device_bytes(
        s0.opt_state)
    assert per_device_bytes(s2.params) == per_device_bytes(s0.params)


def test_zero2_grad_tree_is_sharded_in_graph():
    """The gradient accumulator must be PINNED to the shard layout in
    the traced program: stage 2 emits sharding-constraint ops on the
    grad tree (init + every scan-carry update + the final grads) that
    stage 1 does not. Checked on the unpartitioned lowered module, where
    the constraints appear verbatim as Sharding custom-calls."""
    mesh = _mesh_or_skip(_cfg(mesh_data=4, mesh_model=1, zero_stage=2))
    model = get_model("transformer")

    def n_constraints(stage):
        cfg = _cfg(mesh_data=4, mesh_model=1, zero_stage=stage)
        state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh)
        step = make_train_step(model, cfg, mesh, donate=False)
        b = toy_batch(batch=8)
        batch = {k: jnp.asarray(np.stack([v] * 2, 0)) for k, v in b.items()}
        batch = jax.device_put(batch,
                               batch_sharding(batch, mesh, batch_axis=1))
        txt = step.lower(state, batch, 1e-3, jax.random.PRNGKey(7)).as_text()
        return sum(txt.count(marker) for marker in
                   ("@Sharding", "sharding_constraint"))

    c1, c2 = n_constraints(1), n_constraints(2)
    # the grad tree has dozens of leaves and is pinned at >= 3 points
    assert c2 >= c1 + 100, (c1, c2)
