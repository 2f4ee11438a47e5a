"""A/B the q-blocked fused kernel vs the streaming kernel (with causal
block skipping) on CAUSAL shapes, to pick the kernels_supported routing.

Run from repo root: python scripts/ablations/ab_causal_route.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/zero_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zero_tpu.ops.kernels import fused_attention as fa
from zero_tpu.ops.kernels import streaming_attention as sa


def timeit(fn, args, iters=12):
    o = fn(*args)
    jax.block_until_ready(o)
    # drain the dispatch pipeline with a scalar fetch BEFORE timing:
    # block_until_ready alone has unclear semantics over the tunnel and
    # the first timed window otherwise absorbs queued prior work
    float(jnp.sum((o[0] if isinstance(o, tuple) else o)
                  .astype(jnp.float32)[:1, :1, :1]))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    float(jnp.sum((o[0] if isinstance(o, tuple) else o)
                  .astype(jnp.float32)[:1, :1, :1]))
    return (time.perf_counter() - t0) / iters


H, D = 8, 64
for L in (1024, 2048, 4096, 8192):
    B = max(1, 8192 // L)
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, H, L, D), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, H, L, D), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, L, D), jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.float32)

    f_q = jax.jit(lambda q, k, v: fa.fused_attention(
        q, k, v, mask, causal=True))
    f_s = jax.jit(lambda q, k, v: sa.streaming_attention(
        q, k, v, mask, causal=True))
    g_q = jax.jit(jax.grad(lambda q, k, v: jnp.sum(fa.fused_attention(
        q, k, v, mask, causal=True).astype(jnp.float32) ** 2), (0, 1, 2)))
    g_s = jax.jit(jax.grad(lambda q, k, v: jnp.sum(sa.streaming_attention(
        q, k, v, mask, causal=True).astype(jnp.float32) ** 2), (0, 1, 2)))

    tq, ts = timeit(f_q, (q, k, v)), timeit(f_s, (q, k, v))
    tgq, tgs = timeit(g_q, (q, k, v)), timeit(g_s, (q, k, v))
    print(f"B={B} L={L:5d} causal: fwd q-blocked {tq*1e3:7.2f}ms "
          f"streaming {ts*1e3:7.2f}ms ({tq/ts:4.2f}x)   "
          f"fwd+bwd q-blocked {tgq*1e3:7.2f}ms streaming {tgs*1e3:7.2f}ms "
          f"({tgq/tgs:4.2f}x)")
