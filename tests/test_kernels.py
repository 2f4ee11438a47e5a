"""Fused-attention kernel tests.

On the CPU test mesh the wrapper routes to the mathematically-equivalent
XLA path; the Pallas kernel itself is validated on real TPU hardware (it
was verified to bit-match the XLA reference forward and match gradients —
see the module docstring). These tests pin the wrapper semantics: masking,
causality, dropout, gradients, and the flash-enabled model path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.ops.kernels.fused_attention import fused_attention, supported
from tests.helpers import tiny_config, toy_batch


def _ref(q, k, v, pad_mask, causal):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * dh ** -0.5
    s = jnp.where(pad_mask[:, None, None, :] > 0, s, -1e30)
    if causal:
        lq, lk = q.shape[2], k.shape[2]
        cm = jnp.tril(jnp.ones((lq, lk)))
        s = jnp.where(cm[None, None] > 0, s, -1e30)
    w = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)


def _rand(i, *shape):
    return jax.random.normal(jax.random.PRNGKey(i), shape, jnp.float32)


def test_fused_attention_matches_reference():
    B, H, L, D = 2, 2, 16, 8
    q, k, v = _rand(1, B, H, L, D), _rand(2, B, H, L, D), _rand(3, B, H, L, D)
    mask = jnp.ones((B, L)).at[0, 12:].set(0)
    for causal in (False, True):
        o1 = fused_attention(q, k, v, mask, causal=causal)
        o2 = _ref(q, k, v, mask, causal)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)


def test_fused_attention_grads_match():
    B, H, L, D = 1, 2, 8, 4
    q, k, v = _rand(1, B, H, L, D), _rand(2, B, H, L, D), _rand(3, B, H, L, D)
    mask = jnp.ones((B, L))
    g1 = jax.grad(lambda q, k, v: jnp.sum(
        fused_attention(q, k, v, mask, causal=True) ** 2), (0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        _ref(q, k, v, mask, True) ** 2), (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_dropout_scales_and_zeroes():
    B, H, L, D = 1, 1, 32, 8
    q = _rand(1, B, H, L, D)
    mask = jnp.ones((B, L))
    rng = jax.random.PRNGKey(0)
    o = fused_attention(q, q, q, mask, dropout_rate=0.5, rng=rng)
    o_clean = fused_attention(q, q, q, mask)
    assert not np.allclose(np.asarray(o), np.asarray(o_clean))


def test_supported_bound():
    assert supported(256, 256)
    assert supported(1024, 1024)
    assert supported(2048, 2048)   # q-blocked
    assert supported(4096, 8192)
    assert not supported(4096, 16384)  # beyond the Lk VMEM residency bound


def test_flash_model_path_matches_xla_path():
    """transformer with use_flash_attention on == off (dropout disabled)."""
    over = dict(dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
                attention_dropout=0.0)
    cfg_x = tiny_config(model_name="transformer", use_flash_attention=False,
                        **over)
    cfg_f = tiny_config(model_name="transformer", use_flash_attention=True,
                        **over)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg_x)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    l_x = float(model.train_fn(params, feats, cfg_x, jax.random.PRNGKey(1))["loss"])
    l_f = float(model.train_fn(params, feats, cfg_f, jax.random.PRNGKey(1))["loss"])
    assert abs(l_x - l_f) < 1e-4, (l_x, l_f)


# -- fused (q-blocked) kernel in interpret mode (ADVICE r4: the CPU suite
# must execute the REAL kernel, not just the XLA fallback) ---------------------

import zero_tpu.ops.kernels.fused_attention as fa_mod  # noqa: E402


def _interpret_case(monkeypatch, B, H, L, D, group, causal, pad_row=None):
    """Run the real fwd+bwd kernels through the Pallas interpreter with a
    forced head-group size and compare against the dense reference."""
    monkeypatch.setattr(fa_mod, "INTERPRET", True)
    monkeypatch.setattr(fa_mod, "_GROUP_OVERRIDE", group)
    q, k, v = _rand(1, B, H, L, D), _rand(2, B, H, L, D), _rand(3, B, H, L, D)
    mask = jnp.ones((B, L)).at[0, L - 3:].set(0)
    if pad_row is not None:
        mask = mask.at[pad_row].set(0)        # an ALL-pad batch row

    def loss_kern(q, k, v):
        return jnp.sum(fa_mod.fused_attention(q, k, v, mask,
                                              causal=causal) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, mask, causal) ** 2)

    o1 = fa_mod.fused_attention(q, k, v, mask, causal=causal)
    o2 = _ref(q, k, v, mask, causal)
    # all-pad rows: both sides produce uniform weights over NEG_INF
    # logits; compare them too (they must be finite, not NaN)
    assert np.isfinite(np.asarray(o1)).all()
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(loss_kern, (0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_kernel_interpret_group1(monkeypatch):
    _interpret_case(monkeypatch, B=2, H=2, L=16, D=8, group=1, causal=False)


def test_fused_kernel_interpret_group_within_row(monkeypatch):
    # g=2 <= h=4: group is a divisor of one batch row's heads
    _interpret_case(monkeypatch, B=2, H=4, L=16, D=8, group=2, causal=True)


def test_fused_kernel_interpret_group_spans_rows(monkeypatch):
    # g=4 > h=2: group spans two whole batch rows (mask block M=2)
    _interpret_case(monkeypatch, B=4, H=2, L=16, D=8, group=4, causal=False)


def test_fused_kernel_interpret_group_spans_rows_causal_allpad(monkeypatch):
    # the a018d79 regression class: all-pad row + causal + row-spanning
    # group, fwd AND bwd
    _interpret_case(monkeypatch, B=4, H=2, L=16, D=8, group=4, causal=True,
                    pad_row=2)


def test_fused_kernel_interpret_multi_qblock(monkeypatch):
    # force >1 q-block so the dk/dv revisited-accumulation path runs
    monkeypatch.setattr(fa_mod, "MAX_BLOCK_SCORE_ELEMS", 8 * 32)
    _interpret_case(monkeypatch, B=1, H=2, L=32, D=8, group=2, causal=True)


# -- RPR-folded fused kernel in interpret mode (VERDICT r4 #3) -----------------

def _ref_rpr(q, k, v, mask, causal, tk, tv, m):
    """Independent dense reference: gathered-table Shaw RPR (reference
    modules/rpr.py semantics, dist = clip(i - j)), NOT the one-hot form
    the kernel fallback uses."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    ids = np.clip(np.arange(Lq)[:, None] - np.arange(Lk)[None, :],
                  -m, m) + m
    rk = jnp.take(tk, jnp.asarray(ids), axis=0)        # [Lq, Lk, D]
    rv = jnp.take(tv, jnp.asarray(ids), axis=0)
    qs = q * (D ** -0.5)
    s = (jnp.einsum("bhqd,bhkd->bhqk", qs, k)
         + jnp.einsum("bhqd,qkd->bhqk", qs, rk)).astype(jnp.float32)
    s = jnp.where(mask[:, None, None, :] > 0, s, -1e30)
    if causal:
        tri = np.tril(np.ones((Lq, Lk), bool))
        s = jnp.where(jnp.asarray(tri)[None, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return (jnp.einsum("bhqk,bhkd->bhqd", w, v)
            + jnp.einsum("bhqk,qkd->bhqd", w, rv))


def _interpret_case_rpr(monkeypatch, B, H, L, D, group, causal, m,
                        pad_row=None, lk=None):
    monkeypatch.setattr(fa_mod, "INTERPRET", True)
    monkeypatch.setattr(fa_mod, "_GROUP_OVERRIDE", group)
    lk = lk or L
    q = _rand(1, B, H, L, D)
    k, v = _rand(2, B, H, lk, D), _rand(3, B, H, lk, D)
    tk, tv = _rand(4, 2 * m + 1, D), _rand(5, 2 * m + 1, D)
    mask = jnp.ones((B, lk)).at[0, lk - 3:].set(0)
    if pad_row is not None:
        mask = mask.at[pad_row].set(0)
    tables = {"keys": tk, "values": tv}

    def loss_kern(q, k, v, tk, tv):
        o = fa_mod.fused_attention(q, k, v, mask, causal=causal,
                                   rpr_tables={"keys": tk, "values": tv},
                                   max_relative_position=m)
        return jnp.sum(o ** 2)

    def loss_ref(q, k, v, tk, tv):
        return jnp.sum(_ref_rpr(q, k, v, mask, causal, tk, tv, m) ** 2)

    o1 = fa_mod.fused_attention(q, k, v, mask, causal=causal,
                                rpr_tables=tables,
                                max_relative_position=m)
    o2 = _ref_rpr(q, k, v, mask, causal, tk, tv, m)
    assert np.isfinite(np.asarray(o1)).all()
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(loss_kern, (0, 1, 2, 3, 4))(q, k, v, tk, tv)
    g2 = jax.grad(loss_ref, (0, 1, 2, 3, 4))(q, k, v, tk, tv)
    for a, b in zip(g1, g2):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_rpr_kernel_interpret_group1(monkeypatch):
    _interpret_case_rpr(monkeypatch, B=2, H=2, L=16, D=8, group=1,
                        causal=False, m=4)


def test_rpr_kernel_interpret_causal_group_within_row(monkeypatch):
    _interpret_case_rpr(monkeypatch, B=2, H=4, L=16, D=8, group=2,
                        causal=True, m=3)


def test_rpr_kernel_interpret_group_spans_rows_allpad(monkeypatch):
    _interpret_case_rpr(monkeypatch, B=4, H=2, L=16, D=8, group=4,
                        causal=True, m=4, pad_row=2)


def test_rpr_kernel_interpret_multi_qblock(monkeypatch):
    # >1 q-block: nonzero r0 exercises the per-block skew offsets and
    # the revisited dk/dv/dtable accumulation
    monkeypatch.setattr(fa_mod, "MAX_BLOCK_SCORE_ELEMS", 8 * 32)
    _interpret_case_rpr(monkeypatch, B=1, H=2, L=32, D=8, group=2,
                        causal=True, m=5)


def test_rpr_kernel_interpret_cross_lengths(monkeypatch):
    # lq != lk (the reference also applies RPR to decoder cross-attn)
    _interpret_case_rpr(monkeypatch, B=2, H=2, L=8, D=8, group=2,
                        causal=False, m=3, lk=32)


def test_rpr_kernel_interpret_wide_band(monkeypatch):
    # R = 2m+1 close to lk (lk > 2m boundary of rpr_supported)
    _interpret_case_rpr(monkeypatch, B=2, H=2, L=16, D=8, group=1,
                        causal=False, m=7)


def test_rpr_flash_model_path_matches_xla_path(monkeypatch):
    """transformer_rpr with use_flash_attention rides the RPR-folded
    kernel (interpret mode) and must equal the XLA one-hot path."""
    monkeypatch.setattr(fa_mod, "INTERPRET", True)
    over = dict(dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
                attention_dropout=0.0, model_name="transformer_rpr",
                scope_name="transformer_rpr",
                # rpr_supported needs lk > 2m; toy lengths are 6-7
                max_relative_position=2)
    cfg_x = tiny_config(use_flash_attention=False, **over)
    cfg_f = tiny_config(use_flash_attention=True, **over)
    model = get_model("transformer_rpr")
    params = model.init_fn(jax.random.PRNGKey(0), cfg_x)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    # the flash path must ACTUALLY route through the RPR kernel (the
    # first version of this test passed vacuously: the model never
    # passed use_flash, so both runs took the XLA one-hot path)
    hits = []
    real = fa_mod._fused_attention_rpr
    monkeypatch.setattr(fa_mod, "_fused_attention_rpr",
                        lambda *a, **kw: (hits.append(1),
                                          real(*a, **kw))[1])
    out_x = model.train_fn(params, feats, cfg_x, jax.random.PRNGKey(1))
    assert not hits, "XLA path unexpectedly hit the kernel"
    out_f = model.train_fn(params, feats, cfg_f, jax.random.PRNGKey(1))
    assert hits, "use_flash_attention did not route RPR to the kernel"
    l_x, l_f = float(out_x["loss"]), float(out_f["loss"])
    assert abs(l_x - l_f) < 1e-4, (l_x, l_f)
    # gradients (incl. the RPR tables) must agree across the two paths
    gx = jax.grad(lambda p: model.train_fn(
        p, feats, cfg_x, jax.random.PRNGKey(1))["loss"])(params)
    gf = jax.grad(lambda p: model.train_fn(
        p, feats, cfg_f, jax.random.PRNGKey(1))["loss"])(params)
    flat_x = jax.tree_util.tree_flatten_with_path(gx)[0]
    flat_f = jax.tree.leaves(gf)
    for (path, a), b in zip(flat_x, flat_f):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


# -- streaming (k-blocked) kernel wrapper -------------------------------------

from zero_tpu.ops.kernels import streaming_attention as sa_mod  # noqa: E402


def test_streaming_attention_matches_reference():
    B, H, L, D = 2, 2, 16, 8
    q, k, v = _rand(1, B, H, L, D), _rand(2, B, H, L, D), _rand(3, B, H, L, D)
    mask = jnp.ones((B, L)).at[0, 12:].set(0)
    for causal in (False, True):
        o1 = sa_mod.streaming_attention(q, k, v, mask, causal=causal)
        o2 = _ref(q, k, v, mask, causal)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-5)


def test_streaming_attention_grads_match():
    B, H, L, D = 1, 2, 8, 4
    q, k, v = _rand(1, B, H, L, D), _rand(2, B, H, L, D), _rand(3, B, H, L, D)
    mask = jnp.ones((B, L))
    g1 = jax.grad(lambda q, k, v: jnp.sum(
        sa_mod.streaming_attention(q, k, v, mask, causal=True) ** 2),
        (0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        _ref(q, k, v, mask, True) ** 2), (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_streaming_supported_past_fused_bound():
    assert sa_mod.supported(4096, 16384)   # fused kernel's documented gap
    assert sa_mod.supported(1024, 65536)
    assert not sa_mod.supported(17, 16384)  # untileable q

    from zero_tpu.ops.attention import kernels_supported
    assert kernels_supported(4096, 16384)  # routed to the streaming kernel


# -- decode-step kernel (interpret mode on CPU) --------------------------------

from zero_tpu.ops.kernels import decode_attention as da_mod  # noqa: E402


def test_decode_attention_matches_reference():
    B, H, T, D = 3, 4, 24, 16
    hidden = H * D
    q = _rand(1, B, 1, hidden)
    k = _rand(2, B, T, hidden)
    v = _rand(3, B, T, hidden)
    for time in (0, 7, T - 1):
        o = da_mod.decode_attention(q, k, v, time, H, interpret=True)
        qh = q.reshape(B, 1, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
        mask = (jnp.arange(T) <= time).astype(jnp.float32)
        r = _ref(qh, kh, vh, jnp.broadcast_to(mask, (B, T)), causal=False)
        r = r.transpose(0, 2, 1, 3).reshape(B, 1, hidden)
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_decode_attention_supported_bounds():
    assert da_mod.supported(1, 82, 512, 8)
    assert da_mod.supported(1, 2048, 512, 8)     # speech-length cache
    assert not da_mod.supported(2, 82, 512, 8)   # multi-position steps
    assert not da_mod.supported(1, 4096, 512, 8)  # beyond VMEM residency


def test_flash_decode_model_path_matches_xla_path():
    """transformer beam decode with use_flash_decode on == off (on CPU the
    wrapper falls back to XLA, so this pins the plumbing; the kernel math
    is pinned by test_decode_attention_matches_reference in interpret
    mode and by the cache==dev oracle on TPU)."""
    from zero_tpu.train import make_decode_fn
    cfg_x = tiny_config(model_name="transformer", use_flash_decode=False)
    cfg_f = tiny_config(model_name="transformer", use_flash_decode=True)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg_x)
    feats = {"src": jnp.asarray(toy_batch()["source"])}
    o_x = make_decode_fn(cfg_x, model)(params, feats)
    o_f = make_decode_fn(cfg_f, model)(params, feats)
    np.testing.assert_array_equal(np.asarray(o_x["seq"]),
                                  np.asarray(o_f["seq"]))


# -- fused FFN kernel (interpret mode on CPU) ----------------------------------

from zero_tpu.ops.kernels import fused_ffn as ffn_mod  # noqa: E402
from zero_tpu.ops import nn as nn_mod  # noqa: E402


def _ffn_params(key, d, f):
    return nn_mod.init_ffn(key, d, f, d)


def test_fused_ffn_matches_xla(monkeypatch):
    monkeypatch.setattr(ffn_mod, "BM", 8)
    monkeypatch.setattr(ffn_mod, "INTERPRET", True)
    d, f, n = 128, 256, 16
    p = _ffn_params(jax.random.PRNGKey(0), d, f)
    x = _rand(1, 2, n // 2, d)
    ref = nn_mod.ffn(p, x)
    out = ffn_mod.fused_ffn(p, x)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_ffn_grads_match(monkeypatch):
    monkeypatch.setattr(ffn_mod, "BM", 8)
    monkeypatch.setattr(ffn_mod, "INTERPRET", True)
    d, f, n = 128, 256, 16
    p = _ffn_params(jax.random.PRNGKey(0), d, f)
    x = _rand(1, n, d)

    def loss_fused(p, x):
        return jnp.sum(ffn_mod.fused_ffn(p, x) ** 2)

    def loss_ref(p, x):
        return jnp.sum(nn_mod.ffn(p, x) ** 2)

    g1 = jax.grad(loss_fused, (0, 1))(p, x)
    g2 = jax.grad(loss_ref, (0, 1))(p, x)
    flat1, _ = jax.tree_util.tree_flatten(g1)
    flat2, _ = jax.tree_util.tree_flatten(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_ffn_supported_bounds():
    assert ffn_mod.supported(512, 512, 2048, 512)
    assert not ffn_mod.supported(100, 512, 2048, 512)   # untileable tokens
    assert not ffn_mod.supported(512, 512, 8192, 512)   # beyond VMEM budget
    assert not ffn_mod.supported(512, 96, 2048, 96)     # unaligned width


def test_fused_ffn_model_path_matches_xla_path():
    """transformer with use_fused_ffn on == off (dropout off; on CPU the
    wrapper falls back, pinning the plumbing; kernel math is pinned by the
    interpret-mode tests above and on-TPU benches)."""
    over = dict(dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
                attention_dropout=0.0)
    cfg_x = tiny_config(model_name="transformer", use_fused_ffn=False, **over)
    cfg_f = tiny_config(model_name="transformer", use_fused_ffn=True, **over)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg_x)
    feats = {k: jnp.asarray(v) for k, v in toy_batch().items()}
    l_x = float(model.train_fn(params, feats, cfg_x,
                               jax.random.PRNGKey(1))["loss"])
    l_f = float(model.train_fn(params, feats, cfg_f,
                               jax.random.PRNGKey(1))["loss"])
    assert abs(l_x - l_f) < 1e-4, (l_x, l_f)


# -- streaming kernel block skipping (interpret mode on CPU) -------------------


def test_streaming_kernel_causal_skip_interpret(monkeypatch):
    """Run the REAL streaming kernels (not the XLA fallback) through the
    Pallas interpreter with shapes that force a multi-block grid with
    skipped above-diagonal blocks: lq=lk=384 tiles as bq=bk=128 (3x3 grid,
    blocks (0,1), (0,2), (1,2) strictly above the diagonal are skipped and
    their index maps clamp)."""
    monkeypatch.setattr(sa_mod, "INTERPRET", True)
    B, H, D = 1, 2, 8
    lq, lk = 384, 384
    # guard against a future block-size change silently re-vacuating this
    # test: the grid must have >1 block on each axis
    bq, bk = sa_mod._blocks(lq, lk)
    assert lq // bq > 1 and lk // bk > 1, (bq, bk)
    q = _rand(1, B, H, lq, D)
    k = _rand(2, B, H, lk, D)
    v = _rand(3, B, H, lk, D)
    mask = jnp.ones((B, lk)).at[0, 300:].set(0)

    o1 = sa_mod.streaming_attention(q, k, v, mask, causal=True)
    # dense reference over the full causal square
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * dh ** -0.5
    s = jnp.where(mask[:, None, None, :] > 0, s, -1e30)
    rows = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
    s = jnp.where((rows >= cols)[None, None], s, -1e30)
    o2 = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1).astype(q.dtype), v)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)


def test_streaming_kernel_causal_skip_grads_interpret(monkeypatch):
    monkeypatch.setattr(sa_mod, "INTERPRET", True)
    B, H, D = 1, 1, 8
    lq, lk = 384, 384
    bq, bk = sa_mod._blocks(lq, lk)
    assert lq // bq > 1 and lk // bk > 1, (bq, bk)
    q = _rand(1, B, H, lq, D)
    k = _rand(2, B, H, lk, D)
    v = _rand(3, B, H, lk, D)
    mask = jnp.ones((B, lk))

    def loss_kern(q, k, v):
        return jnp.sum(sa_mod.streaming_attention(
            q, k, v, mask, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, mask, True) ** 2)

    g1 = jax.grad(loss_kern, (0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_decode_cross_attention_matches_reference():
    B, beams, H, S, Dh = 3, 4, 4, 24, 16
    hidden = H * Dh
    q = _rand(1, B, beams, hidden)
    mk = _rand(2, B, S, hidden)
    mv = _rand(3, B, S, hidden)
    mask = jnp.ones((B, S)).at[0, 17:].set(0).at[2, 5:].set(0)
    o = da_mod.decode_cross_attention(q, mk, mv, mask, H, interpret=True)
    # reference: per-beam single-query attention over the same memory
    for bm in range(beams):
        qh = q[:, bm:bm + 1].reshape(B, 1, H, Dh).transpose(0, 2, 1, 3)
        kh = mk.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        vh = mv.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)
        r = _ref(qh, kh, vh, mask, causal=False)
        r = r.transpose(0, 2, 1, 3).reshape(B, hidden)
        np.testing.assert_allclose(np.asarray(o[:, bm]), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_decode_cross_supported_bounds():
    assert da_mod.cross_supported(4, 64, 512, 8)
    assert da_mod.cross_supported(1, 2048, 512, 8)
    assert not da_mod.cross_supported(65, 64, 512, 8)    # beam fold cap
    assert not da_mod.cross_supported(4, 4096, 512, 8)   # VMEM residency


@pytest.mark.parametrize("B", [2, 16])
def test_decode_pool_attention_matches_gathered_reference(B):
    """Ancestry-pool kernel == attention over the per-beam GATHERED cache
    (every (beam, pos) selects one pool row; masked accumulation over the
    K rows is exact). B=16 exercises the row-grouped grid (rb=8, two
    programs -- the serving-tail amortization, VERDICT r4 #5)."""
    K, H, T, D = 4, 4, 24, 16
    hidden = H * D
    rs = np.random.RandomState(7)
    q = _rand(11, B, K, hidden)
    k = _rand(12, B, K, T, hidden)
    v = _rand(13, B, K, T, hidden)
    anc = jnp.asarray(rs.randint(0, K, (B, K, T)).astype(np.int32))
    for time in (0, 7, T - 1):
        # identity at the in-flight column, as self_attn_step sets it
        ident = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                                 (B, K, 1))
        anc_eff = jax.lax.dynamic_update_slice(anc, ident, (0, 0, time))
        o = da_mod.decode_pool_attention(q, k, v, anc_eff, time, H,
                                         interpret=True)
        # reference: gather each beam's cache by ancestry, run plain masked
        # attention per (b, i)
        kg = jnp.take_along_axis(k, anc_eff[:, :, :, None], axis=1)
        vg = jnp.take_along_axis(v, anc_eff[:, :, :, None], axis=1)
        qh = q.reshape(B * K, 1, H, D).transpose(0, 2, 1, 3)
        kh = kg.reshape(B * K, T, H, D).transpose(0, 2, 1, 3)
        vh = vg.reshape(B * K, T, H, D).transpose(0, 2, 1, 3)
        mask = (jnp.arange(T) <= time).astype(jnp.float32)
        r = _ref(qh, kh, vh, jnp.broadcast_to(mask, (B * K, T)), causal=False)
        r = r.transpose(0, 2, 1, 3).reshape(B, K, hidden)
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_decode_pool_attention_relu_matches_rela_reference():
    """relu mode == ReLA attention (unnormalized relu weights,
    modules/rela.py semantics) over the per-beam gathered cache."""
    B, K, H, T, D = 2, 4, 4, 24, 16
    hidden = H * D
    rs = np.random.RandomState(9)
    q = _rand(21, B, K, hidden)
    k = _rand(22, B, K, T, hidden)
    v = _rand(23, B, K, T, hidden)
    anc = jnp.asarray(rs.randint(0, K, (B, K, T)).astype(np.int32))
    for time in (0, 9, T - 1):
        ident = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None, :, None],
                                 (B, K, 1))
        anc_eff = jax.lax.dynamic_update_slice(anc, ident, (0, 0, time))
        o = da_mod.decode_pool_attention(q, k, v, anc_eff, time, H,
                                         relu=True, interpret=True)
        kg = jnp.take_along_axis(k, anc_eff[:, :, :, None], axis=1)
        vg = jnp.take_along_axis(v, anc_eff[:, :, :, None], axis=1)
        qh = q.reshape(B * K, 1, H, D).transpose(0, 2, 1, 3)
        kh = kg.reshape(B * K, T, H, D).transpose(0, 2, 1, 3)
        vh = vg.reshape(B * K, T, H, D).transpose(0, 2, 1, 3)
        mask = (jnp.arange(T) <= time).astype(jnp.float32)
        logits = jnp.einsum("bhqd,bhkd->bhqk",
                            qh.astype(jnp.float32) * (D ** -0.5),
                            kh.astype(jnp.float32))
        w = jax.nn.relu(logits * mask[None, None, None, :])
        r = jnp.einsum("bhqk,bhkd->bhqd", w, vh.astype(jnp.float32))
        r = r.transpose(0, 2, 1, 3).reshape(B, K, hidden)
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)


def test_decode_pool_supported_bounds():
    assert da_mod.pool_supported(4, 82, 512, 8)
    assert not da_mod.pool_supported(1, 82, 512, 8)    # no beams: plain kernel
    assert not da_mod.pool_supported(4, 1024, 512, 8)  # pool beyond VMEM
