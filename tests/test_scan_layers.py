"""scan_layers tests: stacked lax.scan training must match the unrolled
layout exactly (same values), decode must pass the cache==dev oracle, and
remat must compose."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, toy_batch

NO_DROP = dict(dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
               attention_dropout=0.0)


def _stack(layer_list):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)


# every model built on the make_transformer hooks skeleton supports scan.
# (transformer_l0drop is checked on its deterministic scoring path below:
# its hard-concrete gate noise consumes the rng stream in a different
# order under pre-drawn stacked keys, like remat, so train losses are
# equal only in distribution.)
SKELETON_MODELS = ["transformer", "transformer_fuse", "transformer_rpr",
                   "transformer_aan", "transformer_rela",
                   "transformer_fixup"]


@pytest.mark.parametrize("name", SKELETON_MODELS)
def test_scan_matches_unrolled_loss_and_grads(name):
    cfg_u = tiny_config(model_name=name, scan_layers=False, **NO_DROP)
    cfg_s = tiny_config(model_name=name, scan_layers=True, **NO_DROP)
    model = get_model(name)
    params_u = model.init_fn(jax.random.PRNGKey(0), cfg_u)
    # stacked layout with IDENTICAL values
    params_s = dict(params_u)
    params_s["encoder"] = _stack(params_u["encoder"])
    params_s["decoder"] = _stack(params_u["decoder"])
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}

    lu, gu = jax.value_and_grad(
        lambda p: model.train_fn(p, feats, cfg_u, jax.random.PRNGKey(1))
        ["loss"])(params_u)
    ls, gs = jax.value_and_grad(
        lambda p: model.train_fn(p, feats, cfg_s, jax.random.PRNGKey(1))
        ["loss"])(params_s)
    assert abs(float(lu) - float(ls)) < 1e-5
    # stacked grads match the stacked unrolled grads
    gu_stacked = dict(gu)
    gu_stacked["encoder"] = _stack(gu["encoder"])
    gu_stacked["decoder"] = _stack(gu["decoder"])
    for a, b in zip(jax.tree.leaves(gu_stacked), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_scan_matches_unrolled_score_l0drop():
    cfg_u = tiny_config(model_name="transformer_l0drop", scan_layers=False)
    cfg_s = tiny_config(model_name="transformer_l0drop", scan_layers=True)
    model = get_model("transformer_l0drop")
    params_u = model.init_fn(jax.random.PRNGKey(0), cfg_u)
    params_s = dict(params_u)
    params_s["encoder"] = _stack(params_u["encoder"])
    params_s["decoder"] = _stack(params_u["decoder"])
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    su = np.asarray(model.score_fn(params_u, feats, cfg_u)["score"])
    ss = np.asarray(model.score_fn(params_s, feats, cfg_s)["score"])
    np.testing.assert_allclose(su, ss, rtol=1e-5, atol=1e-6)


def test_scan_remat_matches():
    cfg_s = tiny_config(model_name="transformer", scan_layers=True, **NO_DROP)
    cfg_r = tiny_config(model_name="transformer", scan_layers=True,
                        use_remat=True, **NO_DROP)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg_s)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    ls, gs = jax.value_and_grad(
        lambda p: model.train_fn(p, feats, cfg_s, jax.random.PRNGKey(1))
        ["loss"])(params)
    lr, gr = jax.value_and_grad(
        lambda p: model.train_fn(p, feats, cfg_r, jax.random.PRNGKey(1))
        ["loss"])(params)
    assert abs(float(ls) - float(lr)) < 1e-6
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_scan_decode_cache_equals_dev_and_unrolled():
    cfg_u = tiny_config(model_name="transformer", scan_layers=False)
    cfg_s = tiny_config(model_name="transformer", scan_layers=True)
    model = get_model("transformer")
    params_u = model.init_fn(jax.random.PRNGKey(0), cfg_u)
    params_s = dict(params_u)
    params_s["encoder"] = _stack(params_u["encoder"])
    params_s["decoder"] = _stack(params_u["decoder"])
    src = jnp.asarray(toy_batch(batch=2)["source"])

    out_u = beam_search(params_u, src, model.infer_fn(cfg_u), cfg_u)
    out_s = beam_search(params_s, src, model.infer_fn(cfg_s), cfg_s)
    np.testing.assert_array_equal(np.asarray(out_u["seq"]),
                                  np.asarray(out_s["seq"]))

    cfg_dev = tiny_config(model_name="transformer", scan_layers=True,
                          search_mode="dev")
    out_d = beam_search(params_s, src, model.infer_fn(cfg_dev), cfg_dev)
    np.testing.assert_array_equal(np.asarray(out_s["seq"]),
                                  np.asarray(out_d["seq"]))


def test_scan_dropout_training_runs():
    cfg = tiny_config(model_name="transformer", scan_layers=True)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    g = jax.grad(lambda p: model.train_fn(p, feats, cfg,
                                          jax.random.PRNGKey(1))["loss"])(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_scan_tp_specs_for_stacked_weights():
    from zero_tpu.parallel.mesh import spec_for_param
    import jax.sharding as js
    assert str(spec_for_param("encoder/self/qkv/ws/0", (6, 16, 48))) \
        == str(js.PartitionSpec(None, None, "model"))
    assert str(spec_for_param("encoder/self/o/ws/0", (6, 16, 16))) \
        == str(js.PartitionSpec(None, "model", None))


def test_scan_tp_sharded_step_runs():
    from zero_tpu.parallel import (batch_sharding, init_train_state,
                                   make_mesh, make_train_step)
    cfg = tiny_config(model_name="transformer", scan_layers=True)
    model = get_model("transformer")
    mesh = make_mesh(data=4, model=2)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step = make_train_step(model, cfg, mesh, donate=False)
    b = toy_batch(batch=8)
    batch = {k: jnp.asarray(v)[None] for k, v in b.items()}
    sharded = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
    state, metrics = step(state, sharded, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("scan", [False, True])
def test_remat_policy_grads_equal(scan):
    """remat_policy only changes WHAT the backward recomputes, never the
    math: grads under dots / dots_all must equal full recompute exactly
    (both layer layouts; fp32 CPU)."""
    model = get_model("transformer")
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    ref = None
    for pol in ["nothing", "dots", "dots_all"]:
        cfg = tiny_config(use_remat=True, remat_policy=pol,
                          scan_layers=scan)
        params = model.init_fn(jax.random.PRNGKey(0), cfg)
        g = jax.grad(lambda p: model.train_fn(
            p, feats, cfg, jax.random.PRNGKey(1))["loss"])(params)
        if ref is None:
            ref = g
        else:
            for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(g)):
                np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                           atol=1e-6, err_msg=pol)


def test_remat_policy_unknown_rejected():
    model = get_model("transformer")
    cfg = tiny_config(use_remat=True, remat_policy="bogus")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    with pytest.raises(ValueError, match="remat_policy"):
        jax.grad(lambda p: model.train_fn(
            p, feats, cfg, jax.random.PRNGKey(1))["loss"])(params)
