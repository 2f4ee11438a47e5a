"""ZeRO-3 (FSDP) parameter sharding over the 'data' mesh axis.

zero_stage=3 shards the params themselves (plus moments/EMA, as in
stage 1) over 'data': GSPMD all-gathers each weight at its point of use
and reduce-scatters the grads. An extension the reference lacks (its
towers hold full replicas, utils/parallel.py); the equivalence target is
this framework's own replicated-param step -- stage 3 must change
LAYOUT only, never a value the host can observe.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.parallel import (batch_sharding, init_train_state, make_mesh,
                               make_train_step)
from zero_tpu.parallel.mesh import per_device_bytes
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
    """Layout-equivalence oracle (tolerances as in test_zero1.py:
    losses/moments tight, params/EMA to the Adam reduction-order noise)."""
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


def test_zero3_matches_replicated():
    """Same training whether the params are replicated or FSDP-sharded."""
    base = _cfg(mesh_data=4, mesh_model=1, zero_stage=0)
    z3 = _cfg(mesh_data=4, mesh_model=1, zero_stage=3)
    s0, l0 = _run_steps(base)
    s1, l1 = _run_steps(z3)
    _assert_equivalent(s0, l0, s1, l1)


def test_zero3_params_actually_sharded():
    """Every param leaf with a data_par-divisible free dim must carry
    'data' in its sharding after a step, and per-chip param bytes must
    drop by close to the data-parallel degree."""
    cfg = _cfg(mesh_data=4, mesh_model=1, zero_stage=3)
    state, _ = _run_steps(cfg, nsteps=1)
    data_par = 4
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    sharded = 0
    for path, leaf in flat:
        has_data = any(ax == "data" for ax in leaf.sharding.spec)
        divisible = any(d % data_par == 0 and d > 0 for d in leaf.shape)
        if divisible:
            assert has_data, (path, leaf.shape, leaf.sharding)
            sharded += 1
    assert sharded > 10, sharded

    s0, _ = _run_steps(_cfg(mesh_data=4, mesh_model=1, zero_stage=0),
                       nsteps=1)
    assert per_device_bytes(state.params) < 0.5 * per_device_bytes(s0.params)
    assert per_device_bytes(state.opt_state) \
        < 0.5 * per_device_bytes(s0.opt_state)


def test_zero3_composes_with_tp():
    """FSDP over 'data' on top of Megatron TP over 'model': a TP-sharded
    weight's param spec keeps 'model' and gains 'data' on a free dim."""
    base = _cfg(mesh_data=2, mesh_model=2, zero_stage=0)
    z3 = _cfg(mesh_data=2, mesh_model=2, zero_stage=3)
    s0, l0 = _run_steps(base)
    s1, l1 = _run_steps(z3)
    _assert_equivalent(s0, l0, s1, l1)
    flat = jax.tree_util.tree_flatten_with_path(s1.params)[0]
    both = [p for p, leaf in flat
            if set(a for a in leaf.sharding.spec if a) >= {"data", "model"}]
    assert both, "no param leaf is sharded over both data and model"


def test_zero3_eval_runs_on_sharded_params():
    """The scoring path (and by extension eval/decode) must compile and
    run directly on FSDP-sharded weights -- no host gather round-trip."""
    from zero_tpu.parallel.train_step import make_score_step
    cfg = _cfg(mesh_data=4, mesh_model=1, zero_stage=3)
    state, _ = _run_steps(cfg, nsteps=1)
    model = get_model("transformer")
    score = make_score_step(model, cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch(batch=8).items()}
    s = np.asarray(score(state.params, feats))
    assert np.all(np.isfinite(s)) and s.shape == (8,)
