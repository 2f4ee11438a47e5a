"""Ring attention (sequence parallelism over a 'seq' mesh axis).

An extension the reference lacks entirely (SURVEY §5: "Long-context /
sequence parallelism: none"); equivalence target is the framework's own
dense masked-softmax attention. Checks: exact forward/grad match vs the
dense path on a multi-axis CPU mesh (incl. causal masking and all-pad
rows), the automatic attn_train route under an active 'seq' mesh, and
end-to-end train-loss equality for the flagship model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from zero_tpu.models.base import get_model
from zero_tpu.ops import attention
from zero_tpu.parallel import ring
from tests.helpers import tiny_config, toy_batch


def _mesh(data, model, seq):
    devs = jax.devices()
    if len(devs) < data * model * seq:
        pytest.skip("needs %d devices" % (data * model * seq))
    return Mesh(np.array(devs[:data * model * seq]).reshape(data, model, seq),
                ("data", "model", "seq"))


def _dense_ref(qh, kh, vh, keep, causal):
    q = qh.astype(jnp.float32) * (qh.shape[-1] ** -0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, kh.astype(jnp.float32))
    if keep is not None:
        logits = jnp.where(keep[:, None, None, :] > 0, logits,
                           jnp.float32(-1e9))
    if causal:
        L = qh.shape[2]
        tri = jnp.tril(jnp.ones((L, L), bool))
        logits = jnp.where(tri[None, None], logits, jnp.float32(-1e9))
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vh.astype(jnp.float32)).astype(
        qh.dtype)


def _qkv(B=4, H=4, S=16, D=8, seed=0):
    rs = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rs.randn(B, H, S, D).astype(np.float32))
    keep = jnp.asarray((rs.rand(B, S) > 0.2).astype(np.float32))
    keep = keep.at[1].set(0.0)  # all-pad row must stay NaN-free
    return mk(), mk(), mk(), keep


@pytest.mark.parametrize("shape", [(2, 2, 2), (1, 1, 8), (4, 1, 2)])
@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense_forward(shape, causal):
    mesh = _mesh(*shape)
    qh, kh, vh, keep = _qkv()
    out = jax.jit(lambda q, k, v: ring.ring_self_attention(
        q, k, v, keep, causal=causal, mesh=mesh))(qh, kh, vh)
    ref = _dense_ref(qh, kh, vh, keep, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_dense_grads(causal):
    mesh = _mesh(2, 2, 2)
    qh, kh, vh, keep = _qkv()

    def loss(f):
        def inner(q, k, v):
            return jnp.sum(jnp.sin(f(q, k, v)))
        return inner

    ring_f = loss(lambda q, k, v: ring.ring_self_attention(
        q, k, v, keep, causal=causal, mesh=mesh))
    dense_f = loss(lambda q, k, v: _dense_ref(q, k, v, keep, causal))
    gr = jax.jit(jax.grad(ring_f, argnums=(0, 1, 2)))(qh, kh, vh)
    gd = jax.jit(jax.grad(dense_f, argnums=(0, 1, 2)))(qh, kh, vh)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6)
        assert np.all(np.isfinite(np.asarray(a)))


def _dense_rela_ref(qh, kh, vh, keep, causal):
    """ReLA dense reference: multiply-mask + relu, NO normalisation
    (ops/attention.py _attn_core relu branch)."""
    q = qh.astype(jnp.float32) * (qh.shape[-1] ** -0.5)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, kh.astype(jnp.float32))
    mult = jnp.ones((), jnp.float32)
    if keep is not None:
        mult = mult * keep[:, None, None, :]
    if causal:
        L = qh.shape[2]
        mult = mult * jnp.tril(jnp.ones((L, L), jnp.float32))[None, None]
    w = jax.nn.relu(logits * mult)
    return jnp.einsum("bhqk,bhkd->bhqd", w, vh.astype(jnp.float32)).astype(
        qh.dtype)


def _dense_rpr_ref(qh, kh, vh, keep, causal, tables, max_rel):
    """Shaw-RPR dense reference (ops/rpr.py math, full [L, L] ids)."""
    from zero_tpu.ops import rpr as rpr_mod
    q = qh.astype(jnp.float32) * (qh.shape[-1] ** -0.5)
    L = qh.shape[2]
    ids = rpr_mod.relative_positions_matrix(L, L, max_rel)
    r_k = jnp.take(tables["keys"].astype(jnp.float32), ids, axis=0)
    r_v = jnp.take(tables["values"].astype(jnp.float32), ids, axis=0)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, kh.astype(jnp.float32))
    logits = logits + jnp.einsum("bhqd,qkd->bhqk", q, r_k)
    if keep is not None:
        logits = jnp.where(keep[:, None, None, :] > 0, logits,
                           jnp.float32(-1e9))
    if causal:
        tri = jnp.tril(jnp.ones((L, L), bool))
        logits = jnp.where(tri[None, None], logits, jnp.float32(-1e9))
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh.astype(jnp.float32))
    o = o + jnp.einsum("bhqk,qkd->bhqd", p, r_v)
    return o.astype(qh.dtype)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_rela_matches_dense(causal):
    """ReLA mode: relu block sums around the ring == dense multiply-
    masked relu attention, fwd + grads (incl. the all-pad row)."""
    mesh = _mesh(2, 1, 4)
    qh, kh, vh, keep = _qkv()
    ring_f = lambda q, k, v: ring.ring_self_attention(
        q, k, v, keep, causal=causal, relu=True, mesh=mesh)
    dense_f = lambda q, k, v: _dense_rela_ref(q, k, v, keep, causal)
    out = jax.jit(ring_f)(qh, kh, vh)
    ref = dense_f(qh, kh, vh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)
    loss = lambda f: (lambda q, k, v: jnp.sum(jnp.sin(f(q, k, v))))
    gr = jax.jit(jax.grad(loss(ring_f), argnums=(0, 1, 2)))(qh, kh, vh)
    gd = jax.jit(jax.grad(loss(dense_f), argnums=(0, 1, 2)))(qh, kh, vh)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)
        assert np.all(np.isfinite(np.asarray(a)))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_rpr_matches_dense(causal):
    """RPR mode: block-local relative distances from GLOBAL positions ==
    the dense full-matrix ids; fwd + grads incl. the tables' grads
    (psum over 'seq' at the shard_map boundary)."""
    mesh = _mesh(2, 1, 4)
    qh, kh, vh, keep = _qkv()
    max_rel = 4
    rs = np.random.RandomState(7)
    tables = {
        "keys": jnp.asarray(
            rs.randn(2 * max_rel + 1, qh.shape[-1]).astype(np.float32)),
        "values": jnp.asarray(
            rs.randn(2 * max_rel + 1, qh.shape[-1]).astype(np.float32)),
    }
    ring_f = lambda q, k, v, t: ring.ring_self_attention(
        q, k, v, keep, causal=causal, rpr_tables=t, max_rel=max_rel,
        mesh=mesh)
    dense_f = lambda q, k, v, t: _dense_rpr_ref(q, k, v, keep, causal,
                                                t, max_rel)
    out = jax.jit(ring_f)(qh, kh, vh, tables)
    ref = dense_f(qh, kh, vh, tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-6)
    loss = lambda f: (lambda q, k, v, t: jnp.sum(jnp.sin(f(q, k, v, t))))
    gr = jax.jit(jax.grad(loss(ring_f), argnums=(0, 1, 2, 3)))(
        qh, kh, vh, tables)
    gd = jax.jit(jax.grad(loss(dense_f), argnums=(0, 1, 2, 3)))(
        qh, kh, vh, tables)
    for a, b in zip(jax.tree.leaves(gr), jax.tree.leaves(gd)):
        # table grads sum over every position (magnitude ~50): allow
        # relative summation-order noise on top of the absolute floor
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=2e-5)
        assert np.all(np.isfinite(np.asarray(a)))


def test_ring_dropout_normalised():
    """Dropout keeps the output an unbiased average: rows where the mask
    kept everything match dense; output stays finite and bounded."""
    mesh = _mesh(1, 1, 8)
    qh, kh, vh, keep = _qkv(S=32)
    rng = jax.random.PRNGKey(3)
    out = jax.jit(lambda q, k, v: ring.ring_self_attention(
        q, k, v, keep, causal=False, rng=rng, drop=0.1, mesh=mesh))(
        qh, kh, vh)
    assert np.all(np.isfinite(np.asarray(out)))
    # magnitude sanity: inverted-scale dropout keeps values in range
    ref = _dense_ref(qh, kh, vh, keep, False)
    assert float(jnp.max(jnp.abs(out))) < 10 * float(jnp.max(jnp.abs(ref))) + 1


def test_route_eligibility():
    mesh = _mesh(2, 2, 2)
    ring.set_active_mesh(mesh)
    try:
        assert ring.seq_degree() == 2
        assert ring.ring_route_ok(4, 4, 16, 16)
        assert not ring.ring_route_ok(4, 4, 15, 15)   # seq not divisible
        assert not ring.ring_route_ok(3, 4, 16, 16)   # batch not divisible
        assert not ring.ring_route_ok(4, 3, 16, 16)   # heads not divisible
        assert not ring.ring_route_ok(4, 4, 16, 8)    # cross-shaped
    finally:
        ring.set_active_mesh(None)
    assert ring.seq_degree() == 1
    assert not ring.ring_route_ok(4, 4, 16, 16)       # no mesh -> dense


def test_attn_train_routes_through_ring():
    """attn_train output under an active seq mesh equals the dense path
    (dropout off), for both the pad-mask and causal declarations."""
    mesh = _mesh(2, 2, 2)
    rs = np.random.RandomState(0)
    B, L, Hid, heads = 4, 16, 16, 4
    params = attention.init_attention(jax.random.PRNGKey(0), Hid, Hid,
                                      self_attention=True)
    x = jnp.asarray(rs.randn(B, L, Hid).astype(np.float32))
    pad = jnp.asarray((rs.rand(B, L) > 0.2).astype(np.float32))
    keep4 = pad[:, None, None, :]

    for kwargs in ({"pad_mask": pad, "causal": False},
                   {"pad_mask": None, "causal": True}):
        keep = keep4 if kwargs["pad_mask"] is not None else \
            jnp.tril(jnp.ones((L, L), np.float32))[None, None]
        dense = attention.attn_train(params, x, None, keep, heads,
                                     **kwargs)["output"]
        ring.set_active_mesh(mesh)
        try:
            routed = attention.attn_train(params, x, None, keep, heads,
                                          **kwargs)["output"]
        finally:
            ring.set_active_mesh(None)
        np.testing.assert_allclose(np.asarray(routed), np.asarray(dense),
                                   rtol=0, atol=1e-5)


@pytest.mark.parametrize("model_name", ["transformer", "transformer_rela",
                                        "transformer_rpr",
                                        "transformer_multilingual",
                                        "transformer_clsr"])
def test_transformer_train_loss_matches_under_sp(model_name):
    """train_fn loss is identical (to fp32 tolerance) with the ring
    route active on a (2,1,4) mesh, dropout off — base softmax, ReLA
    (relu mode), RPR (relative-position mode), and the LaLN/LaLT and
    CLSR multilingual variants (position-free per-language layers)."""
    cfg = tiny_config(dropout=0.0, relu_dropout=0.0, residual_dropout=0.0,
                      attention_dropout=0.0, model_name=model_name,
                      scope_name=model_name)
    model = get_model(model_name)
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    batch = toy_batch(batch=4, src_len=8, tgt_len=8)
    feats = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(1)

    dense = model.train_fn(params, feats, cfg, rng, step=0)["loss"]
    mesh = _mesh(2, 1, 4)
    ring.set_active_mesh(mesh)
    try:
        routed = model.train_fn(params, feats, cfg, rng, step=0)["loss"]
    finally:
        ring.set_active_mesh(None)
    np.testing.assert_allclose(float(routed), float(dense), atol=5e-5)
