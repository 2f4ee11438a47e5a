"""On-chip kernel correctness checks (run on a real TPU, ~3-5 min).

The CPU test suite exercises every Pallas kernel only through the
interpreter (or the XLA fallback), so two paths ship with no automated
on-hardware coverage (round-2 advisor findings):

  * the fused-FFN in-kernel dropout (pltpu.prng_seed has no CPU
    lowering; the backward must regenerate the forward's exact mask
    from seed + block index);
  * the flash-decode / ancestry-pool decode kernels, which on CPU
    always take the XLA fallback inside the model decode path.

This script runs the real kernels on the attached chip and asserts
against XLA references. It is part of the verify recipe
(.claude/skills/verify/SKILL.md); run it after touching any kernel:

    python -m zero_tpu.scripts.tpu_checks
"""

from __future__ import annotations

import sys

import numpy as np


def _require_tpu():
    import jax

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend attached (backend=%s)"
              % jax.default_backend())
        sys.exit(0)


def check_fused_ffn_dropout():
    """Kernel dropout: deterministic per seed, exact inverted-dropout
    policy, and the backward regenerates the forward's mask.

    W2 = identity / b2 = 0 makes the kernel output equal the dropped
    hidden activation, so the realized keep mask can be read off the
    forward output; the backward is then compared against an XLA
    reference that uses that exact mask. n=256 spans two BM=128 blocks,
    so per-block seed derivation is covered too."""
    import jax
    import jax.numpy as jnp
    from zero_tpu.ops.kernels import fused_ffn as F

    d = 256
    n = 256
    rate = 0.3
    t, inv = F._rate_to_t(rate)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, d), jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(d, d) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rs.randn(d) * 0.1, jnp.bfloat16)
    w2 = jnp.eye(d, dtype=jnp.bfloat16)
    b2 = jnp.zeros((d,), jnp.bfloat16)
    seed = jnp.asarray([12345], jnp.int32)

    fwd = jax.jit(lambda x: F._fused_forward(x, w1, b1, w2, b2, seed, rate))
    y1 = np.asarray(fwd(x), np.float32)
    y2 = np.asarray(fwd(x), np.float32)
    np.testing.assert_array_equal(y1, y2)  # deterministic per seed

    # reference hidden (same rounding points as the kernel)
    xf = x.astype(jnp.float32)
    pre = (jnp.dot(x, w1, preferred_element_type=jnp.float32)
           .astype(jnp.bfloat16).astype(jnp.float32) + b1.astype(jnp.float32))
    pre = pre.astype(jnp.bfloat16).astype(jnp.float32)
    h = np.asarray(jnp.maximum(pre, 0.0), np.float32)

    keep = ~((y1 == 0.0) & (h > 0.0))  # realized mask (h==0 rows: keep moot)
    kept_frac = keep[h > 0.0].mean()
    assert abs(kept_frac - t / 256.0) < 0.03, kept_frac
    # kept entries match h * inv exactly (bf16-rounded)
    hk = np.asarray((jnp.asarray(h, jnp.bfloat16)
                     * jnp.bfloat16(inv)).astype(jnp.float32))
    mism = np.abs(np.where(keep & (h > 0), y1 - hk, 0.0)).max()
    assert mism == 0.0, mism

    # backward vs XLA reference that replays the realized mask
    keep_j = jnp.asarray(keep)

    def ref_loss(x, w1, b1):
        s = jax.lax.dot_general(x, w1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = (s.astype(x.dtype).astype(jnp.float32) + b1.astype(jnp.float32))
        p = p.astype(x.dtype).astype(jnp.float32)
        hh = jnp.maximum(p, 0.0).astype(x.dtype)
        hd = jnp.where(keep_j, hh * jnp.asarray(inv, x.dtype),
                       jnp.zeros_like(hh))
        y = jax.lax.dot_general(hd, w2, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y.astype(x.dtype) + b2.astype(x.dtype)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def ker_loss(x, w1, b1):
        y = F._fused_ffn(x, w1, b1, w2, b2, seed, rate)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gr = jax.jit(jax.grad(ref_loss, (0, 1, 2)))(x, w1, b1)
    gk = jax.jit(jax.grad(ker_loss, (0, 1, 2)))(x, w1, b1)
    for name, a, b in zip(("dx", "dw1", "db1"), gr, gk):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        err = np.abs(a - b).max() / scale
        assert err < 0.02, (name, err)
    print("ok fused_ffn dropout: deterministic, policy-exact, bwd mask "
          "== fwd mask (kept %.3f ~ %.3f)" % (kept_frac, t / 256.0))


def check_flash_decode_oracle():
    """Model-path oracle with the decode kernels ACTIVE: beam decode with
    use_flash_decode on vs off must give identical sequences on TPU
    (the CPU suite only ever pins the fallback plumbing)."""
    import jax
    import jax.numpy as jnp
    from zero_tpu.config import default_config
    from zero_tpu.models.base import get_model
    from zero_tpu.train import make_decode_fn
    from zero_tpu.vocab import Vocab

    def tiny_vocab(n=20):
        v = Vocab()
        for i in range(n):
            v.insert("w%d" % i)
        return v

    def cfg_for(name, flash):
        cfg = default_config()
        cfg.model_name = cfg.scope_name = name
        cfg.hidden_size = cfg.embed_size = 128
        cfg.filter_size = 256
        cfg.num_heads = 4
        cfg.num_encoder_layer = cfg.num_decoder_layer = 2
        cfg.beam_size = 4
        cfg.decode_length = 10
        cfg.decode_max_len = 32
        cfg.max_len = 16
        cfg.src_vocab = tiny_vocab()
        cfg.tgt_vocab = tiny_vocab()
        cfg.use_flash_decode = flash
        return cfg

    # transformer exercises the softmax pool kernel, transformer_rela the
    # relu (ReLA) mode added in r3
    for name in ("transformer", "transformer_rela"):
        model = get_model(name)
        params = model.init_fn(jax.random.PRNGKey(0), cfg_for(name, False))
        rs = np.random.RandomState(0)
        src = rs.randint(3, 20, (8, 9)).astype(np.int32)
        src[:, -1] = 2
        feats = {"src": jnp.asarray(src)}
        o_x = make_decode_fn(cfg_for(name, False), model)(params, feats)
        o_f = make_decode_fn(cfg_for(name, True), model)(params, feats)
        seq_x = np.asarray(o_x["seq"])
        seq_f = np.asarray(o_f["seq"])
        np.testing.assert_array_equal(seq_x, seq_f)
        np.testing.assert_allclose(np.asarray(o_x["score"], np.float32),
                                   np.asarray(o_f["score"], np.float32),
                                   rtol=2e-2, atol=2e-2)
        print("ok flash decode oracle [%s]: kernel-on seq == XLA seq "
              "(%d rows, beam 4)" % (name, seq_x.shape[0]))


def check_attention_kernels():
    """Fused (q-blocked) and streaming (k-blocked) attention fwd+bwd vs
    the XLA reference on-chip, causal + non-causal."""
    import jax
    import jax.numpy as jnp
    from zero_tpu.ops.kernels import fused_attention as FA
    from zero_tpu.ops.kernels import streaming_attention as SA

    B, H, L, D = 2, 4, 384, 64
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(B, H, L, D) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, H, L, D) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, L, D) * 0.3, jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.float32)

    def ref(q, k, v, causal):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (D ** -0.5)
        if causal:
            tri = np.tril(np.ones((L, L), np.float32))
            logits = jnp.where(tri[None, None] > 0, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)

    for causal in (False, True):
        for name, fn in (
                ("fused", lambda q, k, v: FA.fused_attention(
                    q, k, v, mask, causal=causal)),
                ("streaming", lambda q, k, v: SA.streaming_attention(
                    q, k, v, mask, causal=causal)),
        ):
            def loss(f):
                return lambda *a: jnp.sum(f(*a).astype(jnp.float32) ** 2)

            o = np.asarray(fn(q, k, v), np.float32)
            r = np.asarray(ref(q, k, v, causal), np.float32)
            err = np.abs(o - r).max()
            assert err < 0.05, (name, causal, err)
            go = jax.jit(jax.grad(loss(fn), (0, 1, 2)))(q, k, v)
            gr = jax.jit(jax.grad(loss(lambda q, k, v: ref(q, k, v, causal)),
                                  (0, 1, 2)))(q, k, v)
            for a, b in zip(go, gr):
                a = np.asarray(a, np.float32)
                b = np.asarray(b, np.float32)
                scale = max(np.abs(b).max(), 1e-6)
                assert np.abs(a - b).max() / scale < 0.05, (name, causal)
            print("ok %s attention (causal=%s): fwd+bwd vs XLA" %
                  (name, causal))


def main():
    _require_tpu()
    check_fused_ffn_dropout()
    check_flash_decode_oracle()
    check_attention_kernels()
    print("ALL TPU CHECKS PASSED")


if __name__ == "__main__":
    main()
