"""Bucket-one-hot RPR (ops/rpr.py logits/output_with_rpr_onehot) must be
mathematically identical to the gathered-einsum form it replaces --
forward AND gradients (the tables are trained parameters). Picked over a
pad/reshape skew variant by on-chip measurement
(scripts/ablations/ab_rpr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zero_tpu.ops import rpr


@pytest.mark.parametrize("lq,lk,maxrel", [(8, 8, 3), (8, 8, 16),
                                          (5, 9, 2), (9, 5, 4), (1, 6, 2)])
def test_onehot_logits_match_gathered(lq, lk, maxrel):
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(2, 2, lq, 8).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 2, lk, 8).astype(np.float32))
    table = jnp.asarray(rs.randn(2 * maxrel + 1, 8).astype(np.float32))

    ids = rpr.relative_positions_matrix(lq, lk, maxrel)
    ref = rpr.logits_with_rpr(q, k, rpr.gather_embeddings(table, ids))
    got = rpr.logits_with_rpr_onehot(q, k, table, maxrel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("lq,lk,maxrel", [(8, 8, 3), (5, 9, 2), (9, 5, 4)])
def test_onehot_output_matches_gathered(lq, lk, maxrel):
    rs = np.random.RandomState(3)
    w = jnp.asarray(np.abs(rs.randn(2, 2, lq, lk)).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 2, lk, 8).astype(np.float32))
    table = jnp.asarray(rs.randn(2 * maxrel + 1, 8).astype(np.float32))

    ids = rpr.relative_positions_matrix(lq, lk, maxrel)
    ref = rpr.output_with_rpr(w, v, rpr.gather_embeddings(table, ids))
    got = rpr.output_with_rpr_onehot(w, v, table, maxrel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_onehot_gradients_match_gathered():
    """Table/q/k/v grads agree between the two forms (the tables are
    trained parameters; the one-hot contraction IS the gather)."""
    lq = lk = 6
    maxrel = 2
    rs = np.random.RandomState(4)
    q = jnp.asarray(rs.randn(1, 2, lq, 4).astype(np.float32))
    k = jnp.asarray(rs.randn(1, 2, lk, 4).astype(np.float32))
    v = jnp.asarray(rs.randn(1, 2, lk, 4).astype(np.float32))
    tk = jnp.asarray(rs.randn(2 * maxrel + 1, 4).astype(np.float32))
    tv = jnp.asarray(rs.randn(2 * maxrel + 1, 4).astype(np.float32))
    ids = rpr.relative_positions_matrix(lq, lk, maxrel)

    def loss_ref(q, k, v, tk, tv):
        logits = rpr.logits_with_rpr(q, k, rpr.gather_embeddings(tk, ids))
        w = jax.nn.softmax(logits, axis=-1)
        o = rpr.output_with_rpr(w, v, rpr.gather_embeddings(tv, ids))
        return jnp.sum(o * o)

    def loss_onehot(q, k, v, tk, tv):
        logits = rpr.logits_with_rpr_onehot(q, k, tk, maxrel)
        w = jax.nn.softmax(logits, axis=-1)
        o = rpr.output_with_rpr_onehot(w, v, tv, maxrel)
        return jnp.sum(o * o)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, tk, tv)
    g_new = jax.grad(loss_onehot, argnums=(0, 1, 2, 3, 4))(q, k, v, tk, tv)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_onehot_support_threshold():
    assert rpr.onehot_supported(128, 128, 16)
    assert rpr.onehot_supported(1024, 1024, 16)
    assert not rpr.onehot_supported(4096, 4096, 16)


def test_attn_core_rpr_paths_agree():
    """_attn_core with rpr_max (one-hot) equals _attn_core with rpr_ids
    (gathered) on a causal self-attention block."""
    from zero_tpu.ops import attention

    lq = lk = 8
    maxrel = 3
    heads = 2
    rs = np.random.RandomState(5)
    q = jnp.asarray(rs.randn(2, lq, 8).astype(np.float32))
    k = jnp.asarray(rs.randn(2, lk, 8).astype(np.float32))
    v = jnp.asarray(rs.randn(2, lk, 8).astype(np.float32))
    tables = {"keys": jnp.asarray(rs.randn(2 * maxrel + 1, 4)
                                  .astype(np.float32)),
              "values": jnp.asarray(rs.randn(2 * maxrel + 1, 4)
                                    .astype(np.float32))}
    causal = jnp.tril(jnp.ones((1, 1, lq, lk), jnp.float32))
    ids = rpr.relative_positions_matrix(lq, lk, maxrel)

    o_ref, w_ref = attention._attn_core(q, k, v, causal, heads,
                                        rpr_tables=tables, rpr_ids=ids)
    o_new, w_new = attention._attn_core(q, k, v, causal, heads,
                                        rpr_tables=tables, rpr_max=maxrel)
    np.testing.assert_allclose(np.asarray(w_new), np.asarray(w_ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o_new), np.asarray(o_ref),
                               rtol=0, atol=1e-5)


def test_attn_core_falls_back_when_ids_precomputable():
    """rpr_max set but one-hot unsupported (huge shape guard) -> the core
    computes ids itself and uses the gathered path. Simulated by
    monkeypatching the threshold."""
    from zero_tpu.ops import attention

    lq = lk = 8
    maxrel = 3
    heads = 2
    rs = np.random.RandomState(6)
    q = jnp.asarray(rs.randn(2, lq, 8).astype(np.float32))
    k = jnp.asarray(rs.randn(2, lk, 8).astype(np.float32))
    v = jnp.asarray(rs.randn(2, lk, 8).astype(np.float32))
    tables = {"keys": jnp.asarray(rs.randn(2 * maxrel + 1, 4)
                                  .astype(np.float32)),
              "values": jnp.asarray(rs.randn(2 * maxrel + 1, 4)
                                    .astype(np.float32))}
    o_fast, _ = attention._attn_core(q, k, v, None, heads,
                                     rpr_tables=tables, rpr_max=maxrel)
    saved = rpr._ONEHOT_MAX_ELEMS
    rpr._ONEHOT_MAX_ELEMS = 1
    try:
        o_slow, _ = attention._attn_core(q, k, v, None, heads,
                                         rpr_tables=tables, rpr_max=maxrel)
    finally:
        rpr._ONEHOT_MAX_ELEMS = saved
    np.testing.assert_allclose(np.asarray(o_slow), np.asarray(o_fast),
                               rtol=0, atol=1e-5)
