"""Decode attention route A/B (ancestry+kernel vs ancestry-XLA vs
classic-XLA) at serving batches; see docs/kernels.md r3 scaling section."""
import time
import numpy as np
import jax, jax.numpy as jnp
from __graft_entry__ import _base_config
from zero_tpu.models.base import get_model
from zero_tpu.search import beam_search

CALLS, WINDOWS = 6, 2

def run_case(model, params, rows, anc, flash):
    cfg = _base_config()
    cfg.beam_size = 4
    cfg.decode_length = 50
    cfg.decode_max_len = 82
    cfg.decode_ancestry = anc
    cfg.use_flash_decode = flash
    inf = model.infer_fn(cfg)
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.randint(3, 30000, (rows, 32)).astype(np.int32))
    fn = jax.jit(lambda p, s: beam_search(p, s, inf, cfg)["score"])
    out = fn(params, src); _ = float(out[0,0])
    out = fn(params, src); _ = float(out[0,0])
    ts = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(CALLS):
            out = fn(params, src)
        _ = float(out[0,0])
        ts.append((time.perf_counter()-t0)/CALLS)
    return rows / min(ts)

model = get_model("transformer")
params = model.init_fn(jax.random.PRNGKey(0), _base_config())
for rows in (128, 256):
    for anc, flash, name in (("on", True, "anc+kernel"),
                             ("on", False, "anc+xla   "),
                             ("off", False, "cls+xla   ")):
        sps = run_case(model, params, rows, anc, flash)
        print(f"rows={rows:4d} {name} {sps:7.1f} sent/s", flush=True)
