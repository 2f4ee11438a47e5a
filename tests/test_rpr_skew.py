"""Skew-matmul RPR (ops/rpr.py full_table/rel_to_abs/abs_to_rel) must be
mathematically identical to the gathered-einsum form it replaces --
forward AND gradients (the tables are trained parameters)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zero_tpu.ops import rpr


def _naive_rel_to_abs(x, length_k):
    # out[q, k] = x[q, k - q + Lq - 1]
    *lead, q_len, w = x.shape
    out = np.zeros(tuple(lead) + (q_len, length_k), x.dtype)
    xn = np.asarray(x)
    for q in range(q_len):
        for k in range(length_k):
            out[..., q, k] = xn[..., q, k - q + q_len - 1]
    return out


def _naive_abs_to_rel(x):
    *lead, q_len, k_len = x.shape
    w = q_len + k_len - 1
    out = np.zeros(tuple(lead) + (q_len, w), x.dtype)
    xn = np.asarray(x)
    for q in range(q_len):
        for r in range(w):
            k = q + r - (q_len - 1)
            if 0 <= k < k_len:
                out[..., q, r] = xn[..., q, k]
    return out


@pytest.mark.parametrize("lq,lk", [(4, 4), (7, 7), (5, 9), (9, 5), (1, 6)])
def test_rel_to_abs_matches_naive(lq, lk):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 3, lq, lq + lk - 1).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(rpr.rel_to_abs(x, lk)),
                                  _naive_rel_to_abs(x, lk))


@pytest.mark.parametrize("lq,lk", [(4, 4), (7, 7), (5, 9), (9, 5), (6, 1)])
def test_abs_to_rel_matches_naive(lq, lk):
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 3, lq, lk).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(rpr.abs_to_rel(x)),
                                  _naive_abs_to_rel(x))


@pytest.mark.parametrize("lq,lk,maxrel", [(8, 8, 3), (8, 8, 16),
                                          (5, 9, 2), (9, 5, 4)])
def test_skew_logits_match_gathered(lq, lk, maxrel):
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(2, 2, lq, 8).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 2, lk, 8).astype(np.float32))
    table = jnp.asarray(rs.randn(2 * maxrel + 1, 8).astype(np.float32))

    ids = rpr.relative_positions_matrix(lq, lk, maxrel)
    ref = rpr.logits_with_rpr(q, k, rpr.gather_embeddings(table, ids))
    got = rpr.logits_with_rpr_skew(q, k, table, maxrel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("lq,lk,maxrel", [(8, 8, 3), (5, 9, 2), (9, 5, 4)])
def test_skew_output_matches_gathered(lq, lk, maxrel):
    rs = np.random.RandomState(3)
    w = jnp.asarray(np.abs(rs.randn(2, 2, lq, lk)).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 2, lk, 8).astype(np.float32))
    table = jnp.asarray(rs.randn(2 * maxrel + 1, 8).astype(np.float32))

    ids = rpr.relative_positions_matrix(lq, lk, maxrel)
    ref = rpr.output_with_rpr(w, v, rpr.gather_embeddings(table, ids))
    got = rpr.output_with_rpr_skew(w, v, table, maxrel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_skew_gradients_match_gathered():
    """Table/q/k/v/w grads agree between the two forms (the tables are
    trained parameters; the VJP of the skew is the unskew)."""
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

    def loss_skew(q, k, v, tk, tv):
        logits = rpr.logits_with_rpr_skew(q, k, tk, maxrel)
        w = jax.nn.softmax(logits, axis=-1)
        o = rpr.output_with_rpr_skew(w, v, tv, maxrel)
        return jnp.sum(o * o)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, tk, tv)
    g_new = jax.grad(loss_skew, argnums=(0, 1, 2, 3, 4))(q, k, v, tk, tv)
    for a, b in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


def test_attn_core_rpr_paths_agree():
    """_attn_core with rpr_max (skew) equals _attn_core with rpr_ids
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
