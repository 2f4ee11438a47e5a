"""Validate + bench the fused FFN kernel on the real chip.

Run from the repo root: python -m zero_tpu.scripts.bench_fused_ffn

1) no-dropout correctness + grads vs the XLA composite
2) dropout statistics (keep rate, exact 256/t scaling)
3) fwd/bwd mask consistency: for the piecewise-linear fused op with a
   fixed seed, the directional derivative must match grad.v (fp32)
4) raw timing vs the XLA composite at the train-step shape
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/zero_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if jax.default_backend() == "tpu":
    jax.config.update("jax_default_prng_impl", "rbg")

from zero_tpu.ops import nn
from zero_tpu.ops.kernels import fused_ffn as ff


def main():
    d, f, n = 512, 2048, 32768
    key = jax.random.PRNGKey(0)
    p = nn.init_ffn(key, d, f, d)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(n, d), jnp.bfloat16)

    # 1) no dropout: fused == XLA
    y_f = np.asarray(jax.jit(lambda x: ff.fused_ffn(p, x))(x), np.float32)
    y_x = np.asarray(jax.jit(lambda x: nn.ffn(p, x))(x), np.float32)
    err = np.max(np.abs(y_f - y_x)) / max(1e-6, np.max(np.abs(y_x)))
    print(f"nodrop fwd rel err: {err:.2e}")

    g_f = jax.jit(jax.grad(lambda p, x: jnp.sum(
        ff.fused_ffn(p, x).astype(jnp.float32) ** 2)))(p, x)
    g_x = jax.jit(jax.grad(lambda p, x: jnp.sum(
        nn.ffn(p, x).astype(jnp.float32) ** 2)))(p, x)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_f),
            jax.tree_util.tree_leaves_with_path(g_x)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.max(np.abs(a - b)) / max(1e-6, np.max(np.abs(b)))
        print(f"  grad {jax.tree_util.keystr(kp)}: rel err {rel:.2e}")

    # 2) dropout statistics
    rate = 0.1
    rng = jax.random.PRNGKey(7)
    h_ref = np.asarray(jax.jit(lambda x: jnp.maximum(
        jnp.einsum("nd,df->nf", x, p["enlarge"]["ws"][0].astype(x.dtype))
        + p["enlarge"]["b"].astype(x.dtype), 0))(x), np.float32)
    # fused with dropout: reconstruct the hidden keep pattern indirectly
    # via output variance is messy; instead check the keep fraction via a
    # linear probe: set W2 = I-ish is overkill -- just check output
    # changes and keep-rate from a direct kernel call is skipped; rely on
    # the fwd/bwd consistency check below + step-level loss sanity.
    y_d = np.asarray(jax.jit(lambda x: ff.fused_ffn(
        p, x, rng=rng, relu_dropout=rate))(x), np.float32)
    frac_changed = np.mean(np.abs(y_d - y_f) > 1e-6)
    print(f"dropout rate={rate}: outputs changed frac {frac_changed:.3f}")

    # 3) fwd/bwd mask consistency via an identity probe: W1=W2=I, big
    # positive b1 (relu always active) => the output reveals the mask
    # elementwise (y = keep * (x+5) * inv) and grad(sum y) wrt x is
    # exactly keep * inv. A finite-difference check is useless here: the
    # MXU's bf16 multiplies quantise each output by ~1e-2, which summed
    # over 256k outputs swamps the directional derivative.
    eye = jnp.eye(d, dtype=jnp.float32)
    b_hi = jnp.full((d,), 5.0, jnp.float32)
    b_z = jnp.zeros((d,), jnp.float32)
    xf = jnp.asarray(rs.randn(256, d), jnp.float32)
    seed = jnp.asarray([999], jnp.int32)

    def probe(xa):
        return ff._fused_ffn(xa, eye, b_hi, eye, b_z, seed, rate)

    yp = np.asarray(jax.jit(probe)(xf))
    t = ff._rate_to_t(rate)[0]
    inv = ff._rate_to_t(rate)[1]
    keep = yp != 0.0
    gp = np.asarray(jax.jit(jax.grad(lambda xa: jnp.sum(probe(xa))))(xf))
    kept_ok = np.allclose(gp[keep], inv, rtol=1e-2)       # bf16 MXU round
    dropped_ok = bool(np.all(gp[~keep] == 0.0))
    print(f"mask probe: keep frac {keep.mean():.4f} (expect {t/256:.4f}), "
          f"bwd mask == fwd mask: kept_ok={kept_ok} dropped_ok={dropped_ok}")

    # 4) timing at the step shape
    for label, fn in (
            ("xla   drop", jax.jit(lambda x, r: nn.ffn(
                p, x, rng=r, relu_dropout=rate))),
            ("fused drop", jax.jit(lambda x, r: ff.fused_ffn(
                p, x, rng=r, relu_dropout=rate))),
            ("xla   grad", jax.jit(jax.grad(lambda x, r: jnp.sum(
                nn.ffn(p, x, rng=r, relu_dropout=rate)
                .astype(jnp.float32))))),
            ("fused grad", jax.jit(jax.grad(lambda x, r: jnp.sum(
                ff.fused_ffn(p, x, rng=r, relu_dropout=rate)
                .astype(jnp.float32))))),
    ):
        r = jax.random.PRNGKey(3)
        o = fn(x, r)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(20):
            o = fn(x, r)
        jax.block_until_ready(o)
        float(jnp.sum(o.astype(jnp.float32)[:1, :1]))
        dt = (time.perf_counter() - t0) / 20
        print(f"{label}: {dt * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
