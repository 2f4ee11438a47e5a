"""Per-op profile of one train-step config on the real chip.

Captures a jax.profiler trace around a short dispatch window and parses
the xplane proto with tensorflow's profiler converter into an HLO-op
time table — the evidence base for docs/mfu.md (where the non-matmul
57% of the step goes). Run from repo root, one variant per process:

    python scripts/ablations/profile_step.py default
    python scripts/ablations/profile_step.py nodrop
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.getcwd())

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/zero_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if jax.default_backend() == "tpu":
    jax.config.update("jax_default_prng_impl", "rbg")

from __graft_entry__ import _base_config  # noqa: E402

VARIANTS = {
    "default": {},
    "nodrop": dict(dropout=0.0, residual_dropout=0.0, relu_dropout=0.0,
                   attention_dropout=0.0),
    "flash": dict(use_flash_attention=True),
    "big": dict(hidden_size=1024, filter_size=4096, num_heads=16),
    # the bench_moe config (bench.py): B=128 + remat_policy=dots, scatter
    # dispatch (profiles with full recompute aren't comparable to the
    # bench number; ADVICE r4)
    "moe": dict(model_name="transformer_moe", scope_name="transformer_moe",
                moe_num_experts=8, moe_top_k=1, moe_capacity_factor=1.25,
                use_remat=True, remat_policy="dots"),
}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "default"
    rows = int(os.environ.get("PROFILE_ROWS", "256"))
    seq = int(os.environ.get("PROFILE_LEN", "128"))
    cfg = _base_config(**VARIANTS[variant])

    from zero_tpu.models.base import get_model
    from zero_tpu.parallel import (batch_sharding, init_train_state,
                                   make_mesh, make_train_step)
    n_chips = len(jax.devices())
    cfg.mesh_model = 1
    cfg.mesh_data = n_chips
    mesh = make_mesh(cfg)
    model = get_model(cfg.model_name)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step_fn = make_train_step(model, cfg, mesh)
    rs = np.random.RandomState(0)
    batch = {
        "source": rs.randint(3, 30000, (1, rows, seq)).astype(np.int32),
        "target": rs.randint(3, 30000, (1, rows, seq)).astype(np.int32),
    }
    db = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
    rng = jax.random.PRNGKey(1)

    print("compiled objects ready; warming up", flush=True)
    # compile + drain queued work with a scalar fetch (CLAUDE.md protocol)
    for i in range(4):
        state, metrics = step_fn(state, db, 1e-4, jax.random.fold_in(rng, i))
    float(metrics["pnorm"])
    print("warmup done; tracing", flush=True)

    trace_dir = "/tmp/zt_profile_%s" % variant
    os.system("rm -rf %s" % trace_dir)
    n_steps = int(os.environ.get("PROFILE_STEPS", "10"))
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            state, metrics = step_fn(state, db, 1e-4,
                                     jax.random.fold_in(rng, 100 + i))
        float(metrics["pnorm"])
    print("trace captured; converting", flush=True)

    planes = sorted(glob.glob(trace_dir + "/**/*.xplane.pb",
                              recursive=True))
    if not planes:
        print(json.dumps({"error": "no xplane produced", "dir": trace_dir}))
        return
    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin
    raw, ok = _pywrap_profiler_plugin.xspace_to_tools_data(
        [planes[-1]], "hlo_stats", {})
    if not ok:
        print(json.dumps({"error": "hlo_stats conversion failed"}))
        return
    data = json.loads(raw)
    print(json.dumps({"variant": variant, "file": planes[-1],
                      "keys": list(data)[:10] if isinstance(data, dict)
                      else "list:%d" % len(data)}))
    out_path = "/tmp/zt_profile_%s.json" % variant
    with open(out_path, "w") as f:
        json.dump(data, f)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
