"""Bench + validate the streaming (k-blocked) attention kernel on TPU.

Run from the repo root: python -m zero_tpu.scripts.bench_streaming_attention

Checks fwd correctness vs highest-precision XLA and times fwd / fwd+bwd
for causal and non-causal at several lengths. With causal block skipping
(streaming_attention.py) the causal rows should run ~2x faster than the
non-causal rows at the same shape.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/zero_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zero_tpu.ops.kernels.fused_attention import _xla_equivalent
from zero_tpu.ops.kernels.streaming_attention import streaming_attention


def timeit(fn, args, iters=12):
    o = fn(*args)
    jax.block_until_ready(o)
    # drain the pipeline with a scalar fetch before timing (tunnel
    # protocol: block_until_ready alone has unclear semantics)
    float(jnp.sum((o[0] if isinstance(o, tuple) else o)
                  .astype(jnp.float32)[:1, :1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    float(jnp.sum(o[0] if isinstance(o, tuple) else o))
    return (time.perf_counter() - t0) / iters


def main():
    H, D = 8, 64
    print("== streaming kernel vs XLA (B*H=8, Dh=64, bf16 in / fp32 acc) ==")
    for L in (2048, 4096, 8192, 16384):
        B = max(1, 8192 // L)
        rs = np.random.RandomState(0)
        q = jnp.asarray(rs.randn(B, H, L, D), jnp.bfloat16)
        k = jnp.asarray(rs.randn(B, H, L, D), jnp.bfloat16)
        v = jnp.asarray(rs.randn(B, H, L, D), jnp.bfloat16)
        mask = jnp.ones((B, L), jnp.float32)

        for causal in (False, True):
            f_kern = jax.jit(lambda q, k, v: streaming_attention(
                q, k, v, mask, causal=causal))
            f_xla = jax.jit(lambda q, k, v: _xla_equivalent(
                q, k, v, mask, causal, 0.0, None))
            ok = np.allclose(
                np.asarray(f_kern(q, k, v), np.float32),
                np.asarray(f_xla(q, k, v), np.float32),
                rtol=3e-2, atol=3e-2)

            def loss_k(q, k, v):
                return jnp.sum(streaming_attention(
                    q, k, v, mask, causal=causal).astype(jnp.float32) ** 2)

            def loss_x(q, k, v):
                return jnp.sum(_xla_equivalent(
                    q, k, v, mask, causal, 0.0, None
                ).astype(jnp.float32) ** 2)

            g_kern = jax.jit(jax.grad(loss_k, (0, 1, 2)))
            g_xla = jax.jit(jax.grad(loss_x, (0, 1, 2)))
            gk, gx = g_kern(q, k, v), g_xla(q, k, v)
            scale = max(float(jnp.max(jnp.abs(x.astype(jnp.float32))))
                        for x in gx)
            gok = all(np.allclose(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32),
                                  rtol=5e-2, atol=5e-2 * scale)
                      for a, b in zip(gk, gx))

            tf_k = timeit(f_kern, (q, k, v))
            tf_x = timeit(f_xla, (q, k, v))
            tg_k = timeit(g_kern, (q, k, v))
            tg_x = timeit(g_xla, (q, k, v))
            print(f"B={B} L={L:6d} causal={int(causal)}: "
                  f"fwd {tf_k*1e3:7.2f}ms (xla {tf_x*1e3:7.2f}, "
                  f"{tf_x/tf_k:4.2f}x)  "
                  f"fwd+bwd {tg_k*1e3:7.2f}ms (xla {tg_x*1e3:7.2f}, "
                  f"{tg_x/tg_k:4.2f}x)  correct={ok} grads={gok}")


if __name__ == "__main__":
    main()
