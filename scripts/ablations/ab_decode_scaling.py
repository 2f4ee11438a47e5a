"""Serving-batch decode scaling of the SHIPPED path (ancestry pools,
r3): sentences/s, while-loop steps executed, and ms/step at B in
{32, 64, 128, 256}.

Separates the two possible causes of the B=128 throughput dip
(VERDICT r2 #1): the whole batch steps together until EVERY row meets
the termination bound, so steps-executed grows with batch size
(straggler coupling — a semantics cost, not a kernel one), while
ms/step measures how the per-step compute itself scales with rows.

Timing protocol per CLAUDE.md: drain fetch before windows, 6 calls per
window, median of 3.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _base_config
from zero_tpu.models.base import get_model
from zero_tpu.search import beam_search

CALLS = 6
WINDOWS = 3


def run_case(model, params, rows):
    cfg = _base_config()
    cfg.beam_size = 4
    cfg.decode_length = 50
    cfg.decode_max_len = 82
    inference = model.infer_fn(cfg)
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.randint(3, 30000, (rows, 32)).astype(np.int32))

    fn = jax.jit(lambda p, s: beam_search(p, s, inference, cfg))
    out = fn(params, src)
    steps = int(out["steps"])            # compile + warm
    out = fn(params, src)
    _ = float(out["score"][0, 0])        # drain before timing
    times = []
    for _w in range(WINDOWS):
        t0 = time.perf_counter()
        for _c in range(CALLS):
            out = fn(params, src)
        _ = float(out["score"][0, 0])
        times.append((time.perf_counter() - t0) / CALLS)
    med = sorted(times)[len(times) // 2]
    return rows / med, steps, med / steps * 1e3


def main():
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), _base_config())
    print(f"{'rows':>5s} {'sent/s':>8s} {'steps':>6s} {'ms/step':>8s} "
          f"{'rows*steps/s':>12s}")
    r = {}
    for rows in (32, 64, 128, 256):
        sps, steps, ms = run_case(model, params, rows)
        r[rows] = (sps, steps, ms)
        # rows*steps/s: per-step work rate — the straggler-free metric
        print(f"{rows:5d} {sps:8.1f} {steps:6d} {ms:8.3f} "
              f"{rows * 1e3 / ms:12.0f}", flush=True)
    print(f"\nB128/B32 sent/s ratio {r[128][0] / r[32][0]:.3f}; "
          f"steps {r[32][1]}/{r[64][1]}/{r[128][1]}/{r[256][1]}; "
          f"ms/step ratio B128/B32 {r[128][2] / r[32][2]:.3f} "
          f"(rows ratio 4.0)")


if __name__ == "__main__":
    main()
