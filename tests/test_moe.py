"""transformer_moe (Switch/GShard extension) + expert parallelism.

The reference has no MoE; correctness targets are the framework's own
oracles: dense-FFN equivalence at E=1, the cache==dev beam oracle, and
sharded-vs-unsharded equality under an 'expert' mesh axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from zero_tpu.models.base import get_model
from zero_tpu.ops import moe, nn
from zero_tpu.parallel.mesh import make_mesh, param_sharding
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, toy_batch


def _moe_params(key, d, f, e):
    return moe.init_moe_ffn(key, d, f, d, e)


def test_single_expert_equals_dense_ffn():
    """E=1: the router is a no-op (prob 1, gate 1) and capacity holds
    every token, so the MoE FFN must equal the plain two-layer FFN with
    the same weights."""
    rs = np.random.RandomState(0)
    d, f = 8, 16
    p = _moe_params(jax.random.PRNGKey(0), d, f, 1)
    x = jnp.asarray(rs.randn(3, 5, d).astype(np.float32))
    y = moe.moe_ffn(p, x, num_experts=1, training=True)
    ref = jax.nn.relu(x @ p["experts"]["w1"][0] + p["experts"]["b1"][0]) \
        @ p["experts"]["w2"][0] + p["experts"]["b2"][0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_routing_matches_per_token_expert():
    """With no capacity pressure, each token's output is p_i * its
    chosen expert's FFN (Switch top-1: the gate IS the router prob --
    that product carries the router's task-loss gradient)."""
    rs = np.random.RandomState(1)
    d, f, e = 8, 16, 4
    p = _moe_params(jax.random.PRNGKey(1), d, f, e)
    x = jnp.asarray(rs.randn(2, 6, d).astype(np.float32))
    y = moe.moe_ffn(p, x, num_experts=e, training=False)

    logits = nn.linear(p["router"], x)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
    idx = jnp.argmax(probs, -1)
    ref = np.zeros(x.shape, np.float32)
    for b in range(2):
        for t in range(6):
            k = int(idx[b, t])
            h = jax.nn.relu(x[b, t] @ p["experts"]["w1"][k]
                            + p["experts"]["b1"][k])
            o = h @ p["experts"]["w2"][k] + p["experts"]["b2"][k]
            ref[b, t] = float(probs[b, t, k]) * np.asarray(o)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_top1_router_gets_task_gradient():
    """The Switch gate (= router prob) must carry task-loss gradient to
    the router WITHOUT the aux loss -- a renormalized top-1 gate is
    identically 1.0 and severs it (r3 review finding)."""
    rs = np.random.RandomState(5)
    d, f, e = 8, 16, 4
    p = _moe_params(jax.random.PRNGKey(5), d, f, e)
    x = jnp.asarray(rs.randn(2, 6, d).astype(np.float32))

    def loss(p_):
        y = moe.moe_ffn(p_, x, num_experts=e, training=True)
        return jnp.sum(y * y)

    g = jax.grad(loss)(p)
    router_g = float(jnp.sum(jnp.abs(g["router"]["ws"][0])))
    assert router_g > 0


def test_capacity_drops_overflow_tokens():
    """Force every token onto one expert with capacity 1: exactly one
    token per row survives, the rest output zero (residual carries
    them)."""
    d, f, e = 8, 16, 4
    p = _moe_params(jax.random.PRNGKey(2), d, f, e)
    # huge router bias toward expert 0 via identical inputs
    x = jnp.ones((2, 6, d), jnp.float32)
    y = moe.moe_ffn(p, x, num_experts=e, capacity_factor=1.0 / 6.0,
                    training=True)
    nonzero = np.asarray(jnp.any(jnp.abs(y) > 1e-9, axis=-1))
    assert nonzero.sum() == 2  # one surviving token per batch row
    assert nonzero[:, 0].all()  # the first token claims the slot


def test_aux_loss_uniform_router_is_one():
    """Perfectly uniform routing gives aux = E * sum(1/E * 1/E) = 1, the
    Switch-paper minimum."""
    d, f, e = 8, 16, 4
    p = _moe_params(jax.random.PRNGKey(3), d, f, e)
    p = jax.tree.map(lambda a: a, p)
    p["router"]["ws"][0] = jnp.zeros_like(p["router"]["ws"][0])
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, d)
                    .astype(np.float32))
    sums = []
    moe.moe_ffn(p, x, num_experts=e, aux_sums=sums, training=True)
    assert len(sums) == 1
    np.testing.assert_allclose(float(sums[0]), 1.0, atol=1e-5)


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("cap", [1.25, 0.25])
def test_scatter_dispatch_equals_einsum(top_k, cap):
    """The scatter backend (r4 default: per-row scatter-add/gather, no
    [B,S,E,C] one-hots) must be value- and gradient-identical to the
    dense einsum form, including under capacity pressure (cap=0.25
    drops most tokens) and top-2 dual dispatch."""
    rs = np.random.RandomState(7)
    d, f, e = 8, 16, 4
    p = _moe_params(jax.random.PRNGKey(7), d, f, e)
    x = jnp.asarray(rs.randn(3, 10, d).astype(np.float32))

    def run(mode, p_, x_):
        return moe.moe_ffn(p_, x_, num_experts=e, top_k=top_k,
                           capacity_factor=cap, training=True,
                           dispatch=mode)

    y_e = run("einsum", p, x)
    y_s = run("scatter", p, x)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_e),
                               atol=1e-6)

    def loss(mode, p_, x_):
        return jnp.sum(run(mode, p_, x_) ** 2)

    ge = jax.grad(loss, argnums=(1, 2))("einsum", p, x)
    gs = jax.grad(loss, argnums=(1, 2))("scatter", p, x)
    for a, b in zip(jax.tree.leaves(ge), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5)


@pytest.mark.parametrize("top_k", [1, 2])
def test_cache_decode_equals_dev_decode(top_k):
    cfg = tiny_config(moe_num_experts=4, moe_top_k=top_k)
    model = get_model("transformer_moe")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    src = jnp.asarray(toy_batch()["source"])
    out_c = jax.jit(lambda p, s: beam_search(
        p, s, model.infer_fn(cfg), cfg))(params, src)
    cfg_dev = tiny_config(moe_num_experts=4, moe_top_k=top_k,
                          search_mode="dev")
    out_d = jax.jit(lambda p, s: beam_search(
        p, s, model.infer_fn(cfg_dev), cfg_dev))(params, src)
    assert bool(jnp.all(out_c["seq"] == out_d["seq"]))
    np.testing.assert_allclose(np.asarray(out_c["score"]),
                               np.asarray(out_d["score"]), atol=1e-4)


def test_train_loss_finite_and_router_learns():
    cfg = tiny_config(moe_num_experts=4)
    model = get_model("transformer_moe")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    out = model.train_fn(params, feats, cfg, jax.random.PRNGKey(1), step=0)
    assert np.isfinite(float(out["loss"]))
    assert float(out["moe_aux"]) >= 1.0 - 1e-4  # 1 is the balanced floor
    g = jax.grad(lambda p: model.train_fn(
        p, feats, cfg, jax.random.PRNGKey(1), step=0)["loss"])(params)
    router_g = float(jnp.sum(jnp.abs(
        g["encoder"][0]["moe"]["router"]["ws"][0])))
    assert router_g > 0


def test_expert_parallel_matches_unsharded():
    """The same train loss under an 8-device (data=2, expert=4) mesh:
    EP is pure GSPMD layout, so values must match the single-device
    run to fp32 tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = tiny_config(moe_num_experts=4, dropout=0.0, relu_dropout=0.0,
                      residual_dropout=0.0, attention_dropout=0.0,
                      mesh_data=2, mesh_model=1, mesh_expert=4)
    model = get_model("transformer_moe")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    rng = jax.random.PRNGKey(1)
    base = float(model.train_fn(params, feats, cfg, rng, step=0)["loss"])

    mesh = make_mesh(cfg)
    assert int(mesh.shape["expert"]) == 4
    shardings = param_sharding(params, mesh)
    w1 = shardings["encoder"][0]["moe"]["experts"]["w1"].spec
    assert w1[0] == "expert"
    sharded_params = jax.device_put(params, shardings)
    sharded = float(jax.jit(
        lambda p, f: model.train_fn(p, f, cfg, rng, step=0)["loss"])(
        sharded_params, feats))
    np.testing.assert_allclose(sharded, base, atol=1e-5)
