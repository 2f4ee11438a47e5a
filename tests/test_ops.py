"""Unit tests for the tensor-op library against pure-numpy reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zero_tpu.ops import attention, initializers as inits, l0norm, nn
from zero_tpu.ops.common import label_smooth_loss, log_prob_from_logits


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# -- norms -------------------------------------------------------------------

def test_layer_norm_matches_numpy():
    x = rand(0, 2, 3, 8)
    p = nn.init_layer_norm(8)
    y = nn.layer_norm(p, x, eps=1e-8)
    xn = np.asarray(x)
    mean = xn.mean(-1, keepdims=True)
    var = ((xn - mean) ** 2).mean(-1, keepdims=True)
    expected = (xn - mean) / np.sqrt(var + 1e-8)
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-5)


def test_rms_norm_matches_numpy():
    x = rand(1, 2, 8)
    p = nn.init_rms_norm(8)
    y = nn.rms_norm(p, x, eps=1e-8)
    xn = np.asarray(x)
    ms = (xn ** 2).mean(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(y), xn / np.sqrt(ms + 1e-8),
                               rtol=1e-5, atol=1e-5)


# -- timing signal ------------------------------------------------------------

def test_timing_signal_values():
    # matches the T2T formula (reference func.py:341-369)
    sig = np.asarray(nn.timing_signal(4, 8))
    num = 4
    inv = 1.0 * np.exp(np.arange(num) * -(np.log(1e4) / (num - 1)))
    scaled = np.arange(4)[:, None] * inv[None, :]
    expected = np.concatenate([np.sin(scaled), np.cos(scaled)], 1)
    np.testing.assert_allclose(sig, expected, rtol=1e-5, atol=1e-6)


def test_timing_signal_decode_position():
    full = nn.add_timing_signal(jnp.zeros((1, 10, 8)))
    single = nn.add_timing_signal(jnp.zeros((1, 1, 8)), time=jnp.asarray(7))
    np.testing.assert_allclose(np.asarray(full[0, 7]), np.asarray(single[0, 0]),
                               rtol=1e-5, atol=1e-6)


# -- attention bias -----------------------------------------------------------

def test_aan_weight_is_cumulative_average():
    mask = jnp.asarray([[1., 1., 1., 0.]])
    w = np.asarray(nn.aan_weight(mask))
    # row i averages positions 0..i among valid ones
    np.testing.assert_allclose(w[0, 0], [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(w[0, 1], [0.5, 0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(w[0, 2], [1 / 3, 1 / 3, 1 / 3, 0], atol=1e-6)
    np.testing.assert_allclose(w[0, 3], [0, 0, 0, 0], atol=1e-6)  # pad row


def test_aan_cummean_equals_weight_matmul():
    """The O(L) cumsum form must equal einsum(aan_weight(mask), x) for
    random masks (incl. an all-pad row) in masked mode, and the legacy
    cumsum/positions form in unmasked mode."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(3, 8, 5).astype(np.float32))
    mask = jnp.asarray((rs.rand(3, 8) > 0.3).astype(np.float32))
    mask = mask.at[1].set(0.0)  # all-pad row must stay NaN-free
    w = nn.aan_weight(mask)
    ref = jnp.einsum("bqk,bkd->bqd", w, x)
    out = nn.aan_cummean(x, mask, masked=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    denom = jnp.maximum(jnp.cumsum(mask, axis=1), 1.0)[..., None]
    ref_u = jnp.cumsum(x, axis=1) / denom
    out_u = nn.aan_cummean(x, mask, masked=False)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u),
                               rtol=1e-5, atol=1e-6)
    assert np.all(np.isfinite(np.asarray(out)))


# -- label smoothing loss ------------------------------------------------------

def test_label_smooth_loss_matches_reference_math():
    V, factor = 7, 0.1
    logits = np.asarray(rand(3, 2, 4, V))
    labels = np.array([[1, 2, 3, 0], [4, 5, 0, 0]], dtype=np.int32)
    mask = (labels > 0).astype(np.float32)
    # zero-out last label per row is pad; include eos-ish variety
    loss, per_sample = label_smooth_loss(jnp.asarray(logits),
                                         jnp.asarray(labels),
                                         jnp.asarray(mask), factor)
    # numpy reference: smoothed one-hot cross entropy minus normalizer
    n = V - 1
    p, q = 1 - factor, factor / n
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                           .sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    onehot = np.eye(V)[labels]
    soft = onehot * p + (1 - onehot) * q
    ce = -(soft * logp).sum(-1)
    normalizer = -(p * np.log(p) + n * q * np.log(q + 1e-20))
    ce -= normalizer
    ps = (ce * mask).sum(-1) / np.maximum(mask.sum(-1), 1)
    np.testing.assert_allclose(np.asarray(per_sample), ps, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(loss), ps.mean(), rtol=1e-4)


def test_label_smooth_loss_all_pad_row_excluded():
    V = 5
    logits = jnp.zeros((2, 3, V))
    labels = jnp.asarray([[1, 2, 0], [0, 0, 0]], dtype=jnp.int32)
    mask = (labels > 0).astype(jnp.float32)
    loss, per_sample = label_smooth_loss(logits, labels, mask, 0.1)
    assert np.isfinite(float(loss))
    assert float(per_sample[1]) == 0.0


@pytest.mark.parametrize("factor", [0.0, 0.1])
def test_smoothed_centropy_reduced_matches_logp_form(factor):
    """The reduction-form CE (no [N,V] log-prob tensor) must equal the
    log_softmax form in value and gradient -- sum reassociation is the
    only numerical difference."""
    from zero_tpu.ops.common import smoothed_centropy, \
        smoothed_centropy_reduced
    rs = np.random.RandomState(11)
    V = 257
    logits = jnp.asarray(10.0 * rs.randn(4, 9, V).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, V, (4, 9)).astype(np.int32))

    a = smoothed_centropy(logits, labels, factor)
    b = smoothed_centropy_reduced(logits, labels, factor)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-5, atol=1e-5)

    ga = jax.grad(lambda x: jnp.sum(smoothed_centropy(x, labels, factor)))(
        logits)
    gb = jax.grad(lambda x: jnp.sum(
        smoothed_centropy_reduced(x, labels, factor)))(logits)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga),
                               rtol=1e-4, atol=1e-6)


# -- attention ----------------------------------------------------------------

def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_self_attention_matches_numpy():
    B, L, D, H = 2, 5, 8, 2
    key = jax.random.PRNGKey(0)
    p = attention.init_attention(key, D, D, self_attention=True)
    x = rand(11, B, L, D)
    mask = jnp.ones((B, L))
    keep = nn.masking_mask(mask) * nn.causal_mask(L)
    out = attention.attn_train(p, x, None, keep, H)["output"]

    # numpy re-computation
    xn = np.asarray(x)
    w = np.asarray(p["qkv"]["ws"][0])
    b = np.asarray(p["qkv"]["b"])
    h = xn @ w + b
    q, k, v = np.split(h, 3, -1)

    def split(a):
        return a.reshape(B, L, H, D // H).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q) * (D // H) ** -0.5, split(k), split(v)
    logits = qh @ kh.transpose(0, 1, 3, 2)
    tri = np.tril(np.ones((L, L)))
    logits = np.where(tri[None, None] > 0, logits, -1e9)
    o = _np_softmax(logits) @ vh
    o = o.transpose(0, 2, 1, 3).reshape(B, L, D)
    wo = np.asarray(p["o"]["ws"][0])
    bo = np.asarray(p["o"]["b"])
    expected = o @ wo + bo
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-4)


def test_cached_decode_matches_full_recompute():
    """The dev-mode oracle (SURVEY §4): step-by-step cached self-attention
    must equal full-sequence causal attention."""
    B, L, D, H = 2, 6, 8, 2
    key = jax.random.PRNGKey(1)
    p = attention.init_attention(key, D, D, self_attention=True)
    x = rand(12, B, L, D)

    keep = nn.causal_mask(L)
    full = attention.attn_train(p, x, None, keep, H)["output"]

    cache = attention.init_self_cache(B, L, D, jnp.float32)
    outs = []
    for t in range(L):
        o, cache = attention.self_attn_step(p, x[:, t:t + 1], cache,
                                            jnp.asarray(t), H)
        outs.append(o)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_cross_attention_step_matches_full():
    B, S, D, H = 2, 7, 8, 2
    key = jax.random.PRNGKey(2)
    p = attention.init_attention(key, D, D, self_attention=False, d_memory=D)
    memory = rand(13, B, S, D)
    mem_mask = jnp.asarray(np.random.RandomState(0)
                           .randint(0, 2, (B, S)).astype(np.float32))
    mem_mask = mem_mask.at[:, 0].set(1.0)
    x = rand(14, B, 3, D)

    keep = nn.masking_mask(mem_mask)
    full = attention.attn_train(p, x, memory, keep, H)["output"]

    mkv = attention.cross_attn_precompute(p, memory)
    for t in range(3):
        o, _ = attention.cross_attn_step(p, x[:, t:t + 1], mkv, mem_mask, H)
        np.testing.assert_allclose(np.asarray(o[:, 0]),
                                   np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_aan_decode_matches_training_average():
    """AAN O(1) decode cache == training cumulative-average matmul."""
    B, L, D, H = 2, 5, 8, 2
    key = jax.random.PRNGKey(3)
    p = attention.init_attention(key, D, D, self_attention=False, d_memory=D)
    memory = rand(15, B, 4, D)
    mem_mask = jnp.ones((B, 4))
    x = rand(16, B, L, D)

    fuse_w = nn.aan_weight(jnp.ones((B, L)))
    keep = nn.masking_mask(mem_mask)
    full = attention.attn_train(p, x, memory, keep, H,
                                fuse_weight=fuse_w)["output"]

    mkv = attention.cross_attn_precompute(p, memory)
    aan_sum = jnp.zeros((B, 1, D))
    for t in range(L):
        o, aan_sum = attention.cross_attn_step(
            p, x[:, t:t + 1], mkv, mem_mask, H,
            aan_sum=aan_sum, time=jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(o[:, 0]), np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_rela_attention_relu_masking():
    B, L, D, H = 1, 4, 8, 2
    key = jax.random.PRNGKey(4)
    p = attention.init_attention(key, D, D, self_attention=True, rela=True)
    x = rand(17, B, L, D)
    keep = nn.causal_mask(L)
    out = attention.attn_train(p, x, None, keep, H, relu=True)
    # relu weights are nonnegative and masked positions exactly zero
    w = np.asarray(out["weights"])
    assert (w >= 0).all()
    assert (w[..., np.triu_indices(L, 1)[0], np.triu_indices(L, 1)[1]] == 0).all()


def test_rpr_attention_decode_matches_full():
    B, L, D, H, MAXREL = 1, 5, 8, 2, 3
    key = jax.random.PRNGKey(5)
    p = attention.init_attention(key, D, D, self_attention=True)
    tables = attention.init_rpr_tables(jax.random.PRNGKey(6), D, H, MAXREL)
    x = rand(18, B, L, D)
    keep = nn.causal_mask(L)
    full = attention.attn_train(p, x, None, keep, H, rpr_tables=tables,
                                max_relative_position=MAXREL)["output"]
    cache = attention.init_self_cache(B, L, D, jnp.float32)
    for t in range(L):
        o, cache = attention.self_attn_step(
            p, x[:, t:t + 1], cache, jnp.asarray(t), H,
            rpr_tables=tables, max_relative_position=MAXREL)
        np.testing.assert_allclose(np.asarray(o[:, 0]), np.asarray(full[:, t]),
                                   rtol=1e-4, atol=1e-4)


def test_additive_attention_shapes_and_mask():
    B, S, DQ, DM, HID = 2, 6, 4, 8, 8
    key = jax.random.PRNGKey(7)
    p = attention.init_additive_attention(key, DQ, DM, HID)
    q = rand(19, B, DQ)
    mem = rand(20, B, S, DM)
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]],
                       dtype=jnp.float32)
    out = attention.additive_attention(p, q, mem, mask)
    assert out["output"].shape == (B, DM)
    w = np.asarray(out["weights"])
    assert np.allclose(w[0, :, 3:], 0, atol=1e-6)
    assert np.allclose(w.sum(-1), 1, atol=1e-5)


# -- l0norm -------------------------------------------------------------------

def test_hard_concrete_mean_limits():
    assert float(l0norm.hard_concrete_mean(jnp.asarray(20.0))) == 1.0
    assert float(l0norm.hard_concrete_mean(jnp.asarray(-20.0))) == 0.0


def test_hard_concrete_sample_range():
    g = l0norm.hard_concrete_sample(jax.random.PRNGKey(0),
                                    jnp.zeros((1000,)))
    gn = np.asarray(g)
    assert (gn >= 0).all() and (gn <= 1).all()
    assert 0.2 < gn.mean() < 0.8


def test_l0_regularization_ramp():
    full = float(l0norm.l0_regularization_loss(1.0, 1000, reg_scalar=2.0,
                                               start_reg_ramp_up=0,
                                               end_reg_ramp_up=1000))
    half = float(l0norm.l0_regularization_loss(1.0, 500, reg_scalar=2.0,
                                               start_reg_ramp_up=0,
                                               end_reg_ramp_up=1000))
    assert abs(full - 2.0) < 1e-6
    assert abs(half - 1.0) < 1e-6


# -- initializers -------------------------------------------------------------

def test_initializer_ranges():
    key = jax.random.PRNGKey(0)
    u = inits.uniform(0.08)(key, (1000,))
    assert float(jnp.max(jnp.abs(u))) <= 0.08
    vs = inits.variance_scaling(1.0, "uniform")(key, (100, 100))
    limit = np.sqrt(3.0 / 100)
    assert float(jnp.max(jnp.abs(vs))) <= limit + 1e-6


def test_log_prob_from_logits():
    x = rand(30, 2, 5)
    lp = np.asarray(log_prob_from_logits(x))
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-5)


# -- dropout (8-bit masks) ----------------------------------------------------

def test_dropout_unbiased_and_exact_scale():
    from zero_tpu.ops.common import dropout

    x = jnp.ones((512, 512), jnp.float32)
    rate = 0.1
    out = np.asarray(dropout(jax.random.PRNGKey(0), x, rate))
    t = round((1.0 - rate) * 256)
    # kept entries are exactly x * 256/t (the reciprocal of the quantised
    # keep probability), dropped entries exactly 0
    kept = out[out != 0.0]
    np.testing.assert_allclose(kept, 256.0 / t, rtol=1e-6)
    # empirical keep fraction matches the quantised keep prob
    frac = kept.size / out.size
    assert abs(frac - t / 256.0) < 0.01
    # unbiased: E[out] == x
    assert abs(out.mean() - 1.0) < 0.01


def test_dropout_edges_and_noop():
    from zero_tpu.ops.common import dropout

    x = jnp.ones((8, 8), jnp.bfloat16)
    assert dropout(None, x, 0.5) is x
    assert dropout(jax.random.PRNGKey(0), x, 0.0) is x
    assert dropout(jax.random.PRNGKey(0), x, None) is x
    # rate too small to represent in 8 bits -> keep everything
    out = dropout(jax.random.PRNGKey(0), x, 0.001)
    np.testing.assert_array_equal(np.asarray(out), np.ones((8, 8)))
    # dtype preserved
    assert dropout(jax.random.PRNGKey(0), x, 0.3).dtype == jnp.bfloat16


def test_dropout_hash_bits_quality():
    """The fused counter-hash mask source (DROPOUT_BITS='fused') must be
    uniform, decorrelated, deterministic, and key-sensitive. Guards the
    single-fmix32 generator in ops/common.py:_hash_bits against a future
    'simplification' that quietly degrades the mask stream."""
    from zero_tpu.ops import common as C

    k = jax.random.PRNGKey(42)
    n = 1 << 20
    a = np.asarray(C._hash_bits(k, (n,)))
    # deterministic for a fixed key
    np.testing.assert_array_equal(a, np.asarray(C._hash_bits(k, (n,))))
    bits = a & 255
    # uniform low byte: chi-square on 256 bins, df=255 -> mean 255,
    # std ~22.6; 400 is a >6-sigma bound
    counts = np.bincount(bits, minlength=256)
    exp = n / 256
    chi2 = ((counts - exp) ** 2 / exp).sum()
    assert chi2 < 400, chi2
    # keep-mask decorrelation at the strides TPU layout could alias
    keep = (bits < 230).astype(np.float64)
    for stride in (1, 2, 64, 128, 2048):
        c = abs(np.corrcoef(keep[:-stride], keep[stride:])[0, 1])
        assert c < 0.01, (stride, c)
    # different keys give near-independent masks: P(agree) = p^2 + q^2
    b = np.asarray(C._hash_bits(jax.random.fold_in(k, 1), (n,))) & 255
    agree = ((bits < 230) == (b < 230)).mean()
    assert abs(agree - 0.8173) < 0.01, agree
    # raw uint32-array keys (pre-typed-key style) are accepted too
    raw = np.asarray([7, 9], np.uint32)
    np.testing.assert_array_equal(np.asarray(C._hash_bits(jnp.asarray(raw), (64,))),
                                  np.asarray(C._hash_bits(jnp.asarray(raw), (64,))))


def test_dropout_bits_modes_same_policy():
    """Both mask sources implement the identical threshold policy: exact
    256/t scaling on kept entries, zeros elsewhere, same expected rate."""
    from zero_tpu.ops import common as C

    x = jnp.ones((512, 512), jnp.float32)
    t = round((1.0 - 0.1) * 256)
    old = C.DROPOUT_BITS
    try:
        for mode in ("fused", "prng"):
            C.DROPOUT_BITS = mode
            out = np.asarray(C.dropout(jax.random.PRNGKey(3), x, 0.1))
            kept = out[out != 0.0]
            np.testing.assert_allclose(kept, 256.0 / t, rtol=1e-6)
            assert abs(kept.size / out.size - t / 256.0) < 0.01
    finally:
        C.DROPOUT_BITS = old


def _simulate_pool_decode(p, x_beams, H, beam_perms, rpr=None):
    """Drive self_attn_step the way beam search does with the ancestry
    pool: at each step feed a per-beam token, then apply that step's beam
    survival permutation via models.common-style ancestry bookkeeping."""
    B, K, L, D = x_beams.shape
    cache = attention.init_self_cache(B * K, L, D, jnp.float32)
    anc = jnp.zeros((B, K, L), jnp.int32)
    outs = []
    kwargs = {}
    if rpr is not None:
        kwargs = {"rpr_tables": rpr[0], "max_relative_position": rpr[1]}
    for t in range(L):
        c = dict(cache, ancestry=anc)
        o, cache = attention.self_attn_step(
            p, x_beams[:, :, t].reshape(B * K, 1, D), c,
            jnp.asarray(t), H, **kwargs)
        outs.append(o.reshape(B, K, D))
        # beam reorder: identity at column t, then permute by survivors
        ident = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :, None], (B, K, 1))
        anc = jax.lax.dynamic_update_slice(anc, ident, (0, 0, t))
        perm = beam_perms[:, :, t]
        anc = jnp.take_along_axis(anc, perm[:, :, None], axis=1)
    return outs


def test_ancestry_pool_decode_matches_gathered_cache():
    """The ancestry-indexed unpermuted KV pool must reproduce the classic
    permuted-cache decode exactly, under an adversarial random beam
    permutation at every step (including beam duplication)."""
    B, K, L, D, H = 2, 3, 6, 8, 2
    key = jax.random.PRNGKey(11)
    p = attention.init_attention(key, D, D, self_attention=True)
    rs = np.random.RandomState(3)
    x = rand(21, B, K, L, D)
    # random survivor indices: values in [0, K), repeats allowed
    perms = jnp.asarray(rs.randint(0, K, (B, K, L)).astype(np.int32))

    pool_outs = _simulate_pool_decode(p, x, H, perms)

    # reference: classic gathered cache (strip ancestry -> plain path)
    cache = attention.init_self_cache(B * K, L, D, jnp.float32)
    from zero_tpu.ops.common import gather_beams
    ref_outs = []
    x_cur = x
    for t in range(L):
        o, cache = attention.self_attn_step(
            p, x_cur[:, :, t].reshape(B * K, 1, D), cache, jnp.asarray(t), H)
        ref_outs.append(o.reshape(B, K, D))
        perm = perms[:, :, t]
        cache = {kk: gather_beams(v, perm, B, K) for kk, v in cache.items()}
        # the *inputs* of later steps must follow the same permutation
        # history in both drivers: permute the remaining input slices
        x_cur = x_cur.at[:, :, t + 1:].set(
            jnp.take_along_axis(x_cur[:, :, t + 1:],
                                perm[:, :, None, None], axis=1))

    # outputs at each step are pre-permutation in both drivers, but later
    # steps see permuted histories; compare step outputs after aligning:
    # pool driver consumed the ORIGINAL x slices, so replay it with the
    # same permuted inputs for a strict comparison
    pool_outs2 = _simulate_pool_decode(
        p, _permute_inputs_like_ref(x, perms), H, perms)
    for t in range(L):
        np.testing.assert_allclose(np.asarray(pool_outs2[t]),
                                   np.asarray(ref_outs[t]),
                                   rtol=2e-4, atol=2e-4)
    del pool_outs


def _permute_inputs_like_ref(x, perms):
    B, K, L, D = x.shape
    x_cur = x
    for t in range(L):
        perm = perms[:, :, t]
        x_cur = x_cur.at[:, :, t + 1:].set(
            jnp.take_along_axis(x_cur[:, :, t + 1:],
                                perm[:, :, None, None], axis=1))
    return x_cur


def test_ancestry_pool_decode_rpr_matches_gathered_cache():
    B, K, L, D, H, MAXREL = 1, 2, 5, 8, 2, 3
    key = jax.random.PRNGKey(13)
    p = attention.init_attention(key, D, D, self_attention=True)
    tables = attention.init_rpr_tables(jax.random.PRNGKey(14), D, H, MAXREL)
    rs = np.random.RandomState(5)
    x = rand(22, B, K, L, D)
    perms = jnp.asarray(rs.randint(0, K, (B, K, L)).astype(np.int32))
    x_ref = _permute_inputs_like_ref(x, perms)

    pool_outs = _simulate_pool_decode(p, x_ref, H, perms,
                                      rpr=(tables, MAXREL))

    from zero_tpu.ops.common import gather_beams
    cache = attention.init_self_cache(B * K, L, D, jnp.float32)
    x_cur = x
    for t in range(L):
        o, cache = attention.self_attn_step(
            p, x_cur[:, :, t].reshape(B * K, 1, D), cache, jnp.asarray(t),
            H, rpr_tables=tables, max_relative_position=MAXREL)
        np.testing.assert_allclose(np.asarray(pool_outs[t]),
                                   np.asarray(o.reshape(B, K, D)),
                                   rtol=2e-4, atol=2e-4)
        perm = perms[:, :, t]
        cache = {kk: gather_beams(v, perm, B, K) for kk, v in cache.items()}
        x_cur = x_cur.at[:, :, t + 1:].set(
            jnp.take_along_axis(x_cur[:, :, t + 1:],
                                perm[:, :, None, None], axis=1))
