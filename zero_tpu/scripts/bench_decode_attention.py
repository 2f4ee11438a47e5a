"""Bench the fused decode-step attention kernel vs XLA on the real chip.

Run from the repo root: python -m zero_tpu.scripts.bench_decode_attention

1) raw single-step microbench at several (B, T_max) shapes
2) full beam-4 transformer decode (use_flash_decode on/off)
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/zero_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from zero_tpu.ops.kernels.decode_attention import decode_attention, supported
from zero_tpu.ops import attention, nn


def xla_step(q, k, v, t, heads):
    # the existing _attn_core path (no projections)
    pos = jnp.arange(k.shape[1])
    keep = (pos <= t).astype(jnp.float32)[None, None, None, :]
    o, _ = attention._attn_core(q, k, v, keep, heads)
    return o


def run(fn, args, iters=30):
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    np.asarray(o[0, 0, :1])
    return (time.perf_counter() - t0) / iters


print("== raw kernel microbench (hidden=512, H=8, bf16) ==")
H, hidden = 8, 512
for B, T in [(128, 96), (128, 256), (32, 1024), (32, 2048), (256, 96)]:
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, 1, hidden), jnp.bfloat16)
    k = jnp.asarray(rs.randn(B, T, hidden), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, T, hidden), jnp.bfloat16)
    t = jnp.asarray(T // 2, jnp.int32)

    f_kern = jax.jit(lambda q, k, v, t: decode_attention(q, k, v, t, H))
    f_xla = jax.jit(lambda q, k, v, t: xla_step(q, k, v, t, H))
    # correctness on-chip first
    ok = np.allclose(np.asarray(f_kern(q, k, v, t), np.float32),
                     np.asarray(f_xla(q, k, v, t), np.float32),
                     rtol=2e-2, atol=2e-2)
    tk = run(f_kern, (q, k, v, t))
    tx = run(f_xla, (q, k, v, t))
    print(f"B={B:4d} T={T:5d}: kernel {tk*1e6:8.1f}us  xla {tx*1e6:8.1f}us  "
          f"speedup {tx/tk:5.2f}x  correct={ok}")

print("== full beam-4 decode (transformer base-ish) ==")
from __graft_entry__ import _base_config
from zero_tpu.models.base import get_model
from zero_tpu.train import make_decode_fn

for flash in (False, True):
    cfg = _base_config()
    cfg.model_name = "transformer"
    cfg.scope_name = "transformer"
    cfg.beam_size = 4
    cfg.decode_length = 50
    cfg.decode_max_len = 82
    cfg.use_flash_decode = flash
    model = get_model("transformer")
    weights = model.init_fn(jax.random.PRNGKey(0), cfg)
    decode = make_decode_fn(cfg, model)
    rs = np.random.RandomState(0)
    batch = {"src": rs.randint(3, 30000, (32, 32)).astype(np.int32)}
    out = decode(weights, batch)
    np.asarray(out["seq"])  # compile+run
    t0 = time.perf_counter()
    for _ in range(5):
        out = decode(weights, batch)
    np.asarray(out["seq"])
    dt = (time.perf_counter() - t0) / 5
    print(f"use_flash_decode={flash}: {dt*1e3:.1f} ms/batch "
          f"({32/dt:.1f} sent/s)")
