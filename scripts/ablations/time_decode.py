import time
import numpy as np
import jax
from __graft_entry__ import _base_config
from zero_tpu.models.base import get_model
from zero_tpu.train import make_decode_fn

cfg = _base_config()
cfg.beam_size = 4
cfg.decode_length = 50
cfg.decode_max_len = 82
model = get_model("transformer")
params = model.init_fn(jax.random.PRNGKey(0), cfg)
decode = make_decode_fn(cfg, model)
rs = np.random.RandomState(0)
for rows in (32, 128):
    batch = {"src": rs.randint(3, 30000, (rows, 32)).astype(np.int32)}
    out = decode(params, batch); np.asarray(out["seq"])  # compile
    out = decode(params, batch); _ = np.asarray(out["seq"])[0,0,0]  # drain
    times = []
    for w in range(3):
        t0 = time.perf_counter()
        for c in range(6):
            out = decode(params, batch)
        _ = np.asarray(out["seq"])[0,0,0]
        times.append((time.perf_counter()-t0)/6)
    med = sorted(times)[1]
    print(f"rows={rows} {rows/med:.1f} sent/s ({med*1e3/82:.3f} ms/step)", flush=True)
