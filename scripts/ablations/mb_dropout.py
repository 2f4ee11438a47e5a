"""Microbench the dropout cost components on the chip (VERDICT r2 #3).

Measures, each in its own small jit (fast compiles, one session):
  bits_u8      -- rbg u8 generation rate at the step's total mask volume
  bits_u32cast -- u32 generation + bitcast to u8 (is u8 output slower?)
  apply        -- where(bits<t, x*s, 0) with precomputed bits (pure apply)
  gen_apply    -- bits + apply in one jit (the real dropout op)
  attn_drop    -- one attention block fwd with/without weight dropout
Protocol: drain fetch before windows, >=6 calls/window, median of 3.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

CALLS = 40
WINDOWS = 3


def _drain(out):
    # scalar fetch ONLY: .ravel()[0] stays on device; float() moves 4 bytes.
    # np.asarray(out) would ship the full array over the ~Gb/s tunnel and
    # swamp the kernel time (observed: 67 MB -> 300 ms/call artifacts).
    return float(jax.tree.leaves(out)[0].ravel()[0])


def timeit(fn, *args):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    out = fn(*args)
    _drain(out)
    times = []
    for _w in range(WINDOWS):
        t0 = time.perf_counter()
        for _c in range(CALLS):
            out = fn(*args)
        _drain(out)
        times.append((time.perf_counter() - t0) / CALLS)
    return sorted(times)[len(times) // 2]


def main():
    jax.config.update("jax_default_prng_impl", "rbg")
    key = jax.random.PRNGKey(0)

    # total u8 mask volume of a B=256 L=128 transformer-base step:
    # relu 12*[B,L,2048] + residual 36*[B,L,512] + attn 18*[B,H,L,L]
    B, L, d, f, H = 256, 128, 512, 2048, 8
    vol = 12 * B * L * f + 36 * B * L * d + 18 * B * H * L * L
    print(f"total mask volume/step: {vol/1e9:.2f} GB (u8)")

    n = B * L * f  # one relu site

    @jax.jit
    def bits_u8(k):
        return jax.random.bits(k, (n,), dtype=jnp.uint8)

    @jax.jit
    def bits_u32cast(k):
        w = jax.random.bits(k, (n // 4,), dtype=jnp.uint32)
        return lax.bitcast_convert_type(w, jnp.uint8).reshape(-1)

    x = jnp.ones((n,), jnp.bfloat16)
    bits = jax.random.bits(key, (n,), dtype=jnp.uint8)

    @jax.jit
    def apply(bits, x):
        return jnp.where(bits < 230, x * jnp.bfloat16(256.0 / 230), 0)

    @jax.jit
    def gen_apply(k, x):
        b = jax.random.bits(k, x.shape, dtype=jnp.uint8)
        return jnp.where(b < 230, x * jnp.bfloat16(256.0 / 230), 0)

    for name, fn, args, bytes_moved in (
            ("bits_u8", bits_u8, (key,), n),
            ("bits_u32cast", bits_u32cast, (key,), n),
            ("apply", apply, (bits, x), 5 * n),       # r bits + r/w bf16
            ("gen_apply", gen_apply, (key, x), 4 * n),  # r/w bf16 (+gen)
    ):
        dt = timeit(fn, *args)
        print(f"{name:14s} {dt*1e6:8.1f} us  {bytes_moved/dt/1e9:7.1f} GB/s"
              f"  -> step-total {vol/n*dt*1e3:6.2f} ms", flush=True)

    # one encoder self-attention block fwd, dropout on vs off
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, H, L, d // H), jnp.bfloat16)
    k_ = jnp.asarray(rs.randn(B, H, L, d // H), jnp.bfloat16)
    v = jnp.asarray(rs.randn(B, H, L, d // H), jnp.bfloat16)

    def attn(q, k_, v, key):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_) / np.sqrt(d // H)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if key is not None:
            b = jax.random.bits(key, w.shape, dtype=jnp.uint8)
            w = jnp.where(b < 230, w * (256.0 / 230), 0)
        return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)

    drop_on = jax.jit(lambda q, k_, v, key: attn(q, k_, v, key))
    drop_off = jax.jit(lambda q, k_, v: attn(q, k_, v, None))
    t_on = timeit(drop_on, q, k_, v, key)
    t_off = timeit(drop_off, q, k_, v)
    print(f"attn fwd   on {t_on*1e3:7.3f} ms   off {t_off*1e3:7.3f} ms  "
          f"delta*18 = {(t_on-t_off)*18*1e3:6.2f} ms/step")


if __name__ == "__main__":
    main()
