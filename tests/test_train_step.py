"""Train-step tests: loss decreases, grad accumulation semantics, DP/TP
sharded execution on the virtual 8-CPU mesh, EMA, safe_nan skip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.parallel import (batch_sharding, init_train_state, make_mesh,
                               make_train_step, stack_microbatches)
from zero_tpu.parallel.mesh import param_sharding, spec_for_param
from tests.helpers import tiny_config, toy_batch


def _setup(name="transformer", mesh=None, **over):
    cfg = tiny_config(model_name=name, **over)
    model = get_model(name)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step = make_train_step(model, cfg, mesh, donate=False)
    return cfg, model, state, step


def _batch(cycles=1, batch=8):
    b = toy_batch(batch=batch)
    return {k: jnp.asarray(np.stack([v] * cycles, 0)) for k, v in b.items()}


def test_loss_decreases_overfit():
    cfg, model, state, step = _setup()
    batch = _batch()
    rng = jax.random.PRNGKey(42)
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, 1e-2, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_grad_accumulation_matches_big_batch():
    """update_cycle=C over identical microbatches == single microbatch grad
    (means of identical things)."""
    cfg, model, state, step = _setup(dropout=0.0, residual_dropout=0.0,
                                     relu_dropout=0.0, attention_dropout=0.0)
    b1 = _batch(cycles=1)
    b4 = {k: jnp.concatenate([v] * 4, 0) for k, v in b1.items()}
    rng = jax.random.PRNGKey(0)
    s1, m1 = step(state, b1, 1e-3, rng)
    s4, m4 = step(state, b4, 1e-3, rng)
    assert abs(float(m1["loss"]) - float(m4["loss"])) < 1e-5
    p1 = jax.tree.leaves(s1.params)
    p4 = jax.tree.leaves(s4.params)
    for a, b in zip(p1, p4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_dp_sharded_step_matches_single_device():
    mesh = make_mesh(data=8, model=1)
    cfg, model, state_m, step_m = _setup(
        mesh=mesh, dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
        attention_dropout=0.0)
    _, _, state_s, step_s = _setup(
        mesh=None, dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
        attention_dropout=0.0)

    batch = _batch(batch=16)
    sharded = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
    rng = jax.random.PRNGKey(0)
    sm, mm = step_m(state_m, sharded, 1e-3, rng)
    ss, ms = step_s(state_s, batch, 1e-3, rng)
    assert abs(float(mm["loss"]) - float(ms["loss"])) < 1e-4
    assert abs(float(mm["gnorm"]) - float(ms["gnorm"])) < 1e-3


def test_tp_sharded_step_runs():
    mesh = make_mesh(data=4, model=2)
    cfg, model, state, step = _setup(mesh=mesh)
    batch = _batch(batch=8)
    sharded = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
    state, metrics = step(state, sharded, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_tp_spec_rules():
    assert str(spec_for_param("encoder/0/self/qkv/ws/0", (16, 48))) \
        == str(jax.sharding.PartitionSpec(None, "model"))
    assert str(spec_for_param("encoder/0/self/o/ws/0", (16, 16))) \
        == str(jax.sharding.PartitionSpec("model", None))
    assert str(spec_for_param("src_embedding", (20, 16))) \
        == str(jax.sharding.PartitionSpec("model", None))
    assert str(spec_for_param("encoder/0/ln1/scale", (16,))) \
        == str(jax.sharding.PartitionSpec())


def test_ema_updates():
    cfg, model, state, step = _setup(ema_decay=0.9)
    assert state.ema is not None
    batch = _batch()
    s1, _ = step(state, batch, 1e-2, jax.random.PRNGKey(0))
    # ema moved toward new params but not equal to them
    e = jax.tree.leaves(s1.ema)[0]
    p = jax.tree.leaves(s1.params)[0]
    p0 = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(e), np.asarray(p0))
    assert not np.allclose(np.asarray(e), np.asarray(p))


def test_safe_nan_skips_update():
    cfg, model, state, step = _setup(safe_nan=True, gnorm_upper_bound=1e-12)
    batch = _batch()
    s1, m = step(state, batch, 1e-2, jax.random.PRNGKey(0))
    # gnorm certainly exceeds the tiny bound -> params unchanged
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stack_microbatches_pads():
    b1 = {"source": np.ones((2, 5), np.int32), "target": np.ones((2, 4), np.int32)}
    b2 = {"source": np.ones((3, 7), np.int32), "target": np.ones((3, 6), np.int32)}
    out = stack_microbatches([b1, b2])
    assert out["source"].shape == (2, 3, 7)
    assert out["target"].shape == (2, 3, 6)
    assert (out["source"][0, 2] == 0).all()  # padded row


def test_remat_matches_no_remat():
    """use_remat must not change the loss or gradients (dropout off)."""
    import zero_tpu.models  # noqa
    from zero_tpu.models.base import get_model
    over = dict(dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
                attention_dropout=0.0)
    cfg_a = tiny_config(model_name="transformer", use_remat=False, **over)
    cfg_b = tiny_config(model_name="transformer", use_remat=True, **over)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg_a)
    feats = {k: jnp.asarray(v) for k, v in _batch()["source"].shape and
             {"source": _batch()["source"][0], "target": _batch()["target"][0]}.items()}

    def loss(cfg):
        def f(p):
            return model.train_fn(p, feats, cfg, jax.random.PRNGKey(3))["loss"]
        return f

    la, ga = jax.value_and_grad(loss(cfg_a))(params)
    lb, gb = jax.value_and_grad(loss(cfg_b))(params)
    assert abs(float(la) - float(lb)) < 1e-6
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_with_dropout_runs():
    import zero_tpu.models  # noqa
    from zero_tpu.models.base import get_model
    cfg = tiny_config(model_name="transformer", use_remat=True)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {"source": jnp.asarray(_batch()["source"][0]),
             "target": jnp.asarray(_batch()["target"][0])}
    g = jax.grad(lambda p: model.train_fn(p, feats, cfg,
                                          jax.random.PRNGKey(3))["loss"])(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
