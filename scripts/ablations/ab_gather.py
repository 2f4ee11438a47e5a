"""Same-session A/B of beam cache-gather implementations inside the full
jitted beam search (tunnel numbers are not comparable across sessions).

Variants patch zero_tpu.search._gather_beams before building each jit:
  taa     -- take_along_axis gather (r2 shipped)
  onehot  -- one-hot einsum "bkj,bj...->bk..." (r3 candidate 1)
  flatmm  -- one-hot over flattened trailing dims: [B,K,K]@[B,K,F] batched
             matmul (r3 candidate 2; forces a plain dot_general)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _base_config
from zero_tpu.models.base import get_model
from zero_tpu import search

CALLS = 6
WINDOWS = 3


def gather_taa(x, beam_indices, batch, beam_size):
    y = x.reshape((batch, beam_size) + x.shape[1:])
    idx = beam_indices.reshape(
        (batch, beam_size) + (1,) * (y.ndim - 2)).astype(jnp.int32)
    y = jnp.take_along_axis(y, idx, axis=1)
    return y.reshape((batch * beam_size,) + x.shape[1:])


def gather_onehot(x, beam_indices, batch, beam_size):
    y = x.reshape((batch, beam_size) + x.shape[1:])
    if jnp.issubdtype(y.dtype, jnp.floating):
        perm = jax.nn.one_hot(beam_indices, beam_size, dtype=y.dtype)
        y = jnp.einsum("bkj,bj...->bk...", perm, y)
    else:
        return gather_taa(x, beam_indices, batch, beam_size)
    return y.reshape((batch * beam_size,) + x.shape[1:])


def gather_flatmm(x, beam_indices, batch, beam_size):
    if not jnp.issubdtype(x.dtype, jnp.floating) or x.ndim < 2:
        return gather_taa(x, beam_indices, batch, beam_size)
    feat = int(np.prod(x.shape[1:]))
    y = x.reshape(batch, beam_size, feat)
    perm = jax.nn.one_hot(beam_indices, beam_size, dtype=x.dtype)
    y = jnp.matmul(perm, y)
    return y.reshape((batch * beam_size,) + x.shape[1:])


def main():
    cfg = _base_config()
    cfg.beam_size = 4
    cfg.decode_length = 50
    cfg.decode_max_len = 82
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)

    impls = {"taa": gather_taa, "onehot": gather_onehot,
             "flatmm": gather_flatmm}
    results = {}
    for rows in (32, 128):
        src = jnp.asarray(rs.randint(3, 30000, (rows, 32)).astype(np.int32))
        for name, impl in impls.items():
            search._gather_beams = impl
            inference = model.infer_fn(cfg)

            @jax.jit
            def run(weights, source):
                return search.beam_search(weights, source, inference, cfg)

            out = run(params, src)
            np.asarray(out["seq"])                 # compile
            out = run(params, src)
            _ = np.asarray(out["seq"])[0, 0, 0]    # drain before timing
            times = []
            for _w in range(WINDOWS):
                t0 = time.perf_counter()
                for _c in range(CALLS):
                    out = run(params, src)
                _ = np.asarray(out["seq"])[0, 0, 0]
                times.append((time.perf_counter() - t0) / CALLS)
            med = sorted(times)[len(times) // 2]
            results[(rows, name)] = rows / med
            print(f"rows={rows:4d} {name:7s} {rows/med:8.1f} sent/s "
                  f"({med*1e3/82:.3f} ms/step)", flush=True)
    for name in impls:
        r = results[(128, name)] / results[(32, name)]
        print(f"{name:7s} B128/B32 throughput ratio: {r:.3f}")


if __name__ == "__main__":
    main()
