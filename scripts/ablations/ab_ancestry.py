"""Same-session A/B: ancestry-indexed KV pool (fused pool kernel) vs
classic gathered cache, full jitted beam-4 decode, B in {32, 64, 128}.

Outputs may differ on occasional beam ties (the two paths accumulate f32
dots in different orders); we report the identical fraction and assert
score closeness instead of byte equality.
"""

import time

import numpy as np
import jax

from __graft_entry__ import _base_config
from zero_tpu.models.base import get_model
from zero_tpu.search import beam_search

CALLS = 6
WINDOWS = 3


def main():
    model = get_model("transformer")
    cfg0 = _base_config()
    params = model.init_fn(jax.random.PRNGKey(0), cfg0)
    rs = np.random.RandomState(0)

    results = {}
    for rows in (32, 64, 128):
        src = jax.numpy.asarray(
            rs.randint(3, 30000, (rows, 32)).astype(np.int32))
        outs = {}
        for name, mode in (("gathered", "off"), ("ancestry", "on")):
            cfg = _base_config()
            cfg.beam_size = 4
            cfg.decode_length = 50
            cfg.decode_max_len = 82
            cfg.decode_ancestry = mode
            inf = model.infer_fn(cfg)

            @jax.jit
            def run(weights, source, inf=inf, cfg=cfg):
                return beam_search(weights, source, inf, cfg)

            out = run(params, src)
            outs[name] = {"seq": np.asarray(out["seq"]),
                          "score": np.asarray(out["score"])}
            out = run(params, src)
            _ = np.asarray(out["seq"])[0, 0, 0]    # drain
            times = []
            for _w in range(WINDOWS):
                t0 = time.perf_counter()
                for _c in range(CALLS):
                    out = run(params, src)
                _ = np.asarray(out["seq"])[0, 0, 0]
                times.append((time.perf_counter() - t0) / CALLS)
            med = sorted(times)[len(times) // 2]
            results[(rows, name)] = rows / med
            print(f"rows={rows:4d} {name:9s} {rows/med:8.1f} sent/s "
                  f"({med*1e3/82:.3f} ms/step)", flush=True)
        same = np.mean(np.all(outs["gathered"]["seq"] == outs["ancestry"]
                              ["seq"], axis=-1).all(axis=-1))
        dscore = np.max(np.abs(outs["gathered"]["score"]
                               - outs["ancestry"]["score"]))
        print(f"rows={rows:4d} identical rows: {same:.3f}  "
              f"max |score delta|: {dscore:.4f}", flush=True)
    for name in ("gathered", "ancestry"):
        r = results[(128, name)] / results[(32, name)]
        print(f"{name:9s} B128/B32 throughput ratio: {r:.3f}")


if __name__ == "__main__":
    main()
