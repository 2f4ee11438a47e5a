"""Precompile every jit shape a training run will hit (cache warming).

On TPU each distinct [rows, src_len, tgt_len] batch shape costs a
separate XLA compile (30 s - 4 min over the axon tunnel; CLAUDE.md),
paid mid-training the first time the data mix produces it. This tool
replays the REAL batcher host-side (no device work) to enumerate the
exact shape set the run will see -- token-budget bucketing, the
geometric row ladder (data.py:snap_rows_ladder), pad multiples,
update_cycle stacking -- then compiles the train step for each shape
into the persistent compilation cache (run.py:setup_compilation_cache),
so the subsequent production run starts at full speed.

No reference counterpart: the TF1 reference builds one static graph up
front; shape-bucketed jit is the TPU-native discipline that makes this
tool necessary (SURVEY §7 "token-bucketed batching vs recompilation").

Usage (same --config/--parameters as training, plus):
  python -m zero_tpu.scripts.warm_cache --parameters "..." \
      [--decode] [--max-shapes 64]

--decode also compiles the beam-search graph for the dev-set eval
shapes. Single-host only (multi-host runs share the on-disk cache, so
warming on one host covers the pod).
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

log = logging.getLogger("zero_tpu.warm_cache")


def collect_train_shapes(params, dataset, max_shapes: int):
    """Replay one epoch of the batcher host-side; return the ordered set
    of stacked [C, rows, src_len, tgt_len] shapes train.py would jit."""
    cycle = max(int(params.update_cycle), 1)
    shapes = []
    seen = set()
    group = []
    size = (params.batch_size if params.batch_or_token == "batch"
            else params.token_size)
    for batch in dataset.batcher(size, buffer_size=params.buffer_size,
                                 shuffle=False, train=True):
        group.append((batch["src"].shape, batch["tgt"].shape))
        if len(group) < cycle:
            continue
        rows = max(s[0][0] for s in group)
        slen = max(s[0][1] for s in group)
        tlen = max(s[1][1] for s in group)
        group = []
        key = (rows, slen, tlen)
        if key not in seen:
            seen.add(key)
            shapes.append(key)
            if len(shapes) >= max_shapes:
                log.warning("shape collection stopped at --max-shapes=%d; "
                            "later novel shapes will still compile lazily",
                            max_shapes)
                break
    return shapes


def collect_eval_shapes(params, dataset, max_shapes: int):
    """Distinct [rows, src_len] shapes of the eval batcher (one per
    sequence bucket at eval_batch_size rows)."""
    shapes = []
    seen = set()
    for batch in dataset.batcher(params.eval_batch_size,
                                 buffer_size=params.buffer_size,
                                 shuffle=False, train=False):
        key = batch["src"].shape
        if key not in seen:
            seen.add(key)
            shapes.append(key)
            if len(shapes) >= max_shapes:
                break
    return shapes


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    parser = argparse.ArgumentParser("zero_tpu.warm_cache")
    parser.add_argument("--config", default="")
    parser.add_argument("--parameters", default="")
    parser.add_argument("--decode", action="store_true",
                        help="also compile beam search for dev-set shapes")
    parser.add_argument("--max-shapes", type=int, default=64)
    args = parser.parse_args(argv)

    from zero_tpu.config import default_config, merge_params
    from zero_tpu.run import (load_vocabs, setup_compilation_cache,
                              setup_prng)

    params = default_config()
    params = merge_params(params, args.config, args.parameters)
    params = load_vocabs(params)
    setup_compilation_cache(params)
    setup_prng(params)

    import jax
    from zero_tpu.models.base import get_model
    from zero_tpu.parallel import (batch_sharding, init_train_state,
                                   make_mesh, make_train_step, ring)
    from zero_tpu.train import _make_dataset, make_decode_fn

    mesh = make_mesh(params)
    data_par = int(mesh.shape.get("data", 1))
    ring.set_active_mesh(mesh)
    model = get_model(params.model_name)
    state = init_train_state(model, params, jax.random.PRNGKey(0), mesh)
    step_fn = make_train_step(model, params, mesh, donate=False)

    dataset = _make_dataset(params, params.src_train_file,
                            params.tgt_train_file, train=True,
                            data_par=data_par)
    shapes = collect_train_shapes(params, dataset, args.max_shapes)
    cycle = max(int(params.update_cycle), 1)
    log.info("train step: %d distinct stacked shapes to warm", len(shapes))
    for i, (rows, slen, tlen) in enumerate(shapes):
        batch = {"source": np.ones((cycle, rows, slen), np.int32),
                 "target": np.ones((cycle, rows, tlen), np.int32)}
        db = jax.device_put(batch, batch_sharding(batch, mesh, batch_axis=1))
        t0 = time.perf_counter()
        step_fn.lower(state, db, 1e-9, jax.random.PRNGKey(1)).compile()
        log.info("[%d/%d] train [C=%d, %d, src %d, tgt %d] compiled "
                 "in %.1f s", i + 1, len(shapes), cycle, rows, slen, tlen,
                 time.perf_counter() - t0)

    if args.decode:
        dev = _make_dataset(params, params.src_dev_file,
                            params.tgt_dev_file, train=False,
                            data_par=data_par)
        eval_shapes = collect_eval_shapes(params, dev, args.max_shapes)
        decode = make_decode_fn(params, model)
        weights = state.params
        log.info("decode: %d distinct eval shapes to warm",
                 len(eval_shapes))
        for i, (rows, slen) in enumerate(eval_shapes):
            t0 = time.perf_counter()
            decode(weights, {"src": np.ones((rows, slen), np.int32)})
            log.info("[%d/%d] decode [%d, %d] compiled in %.1f s",
                     i + 1, len(eval_shapes), rows, slen,
                     time.perf_counter() - t0)

    ring.set_active_mesh(None)
    log.info("cache warm: done (%s)",
             jax.config.jax_compilation_cache_dir or "in-memory only")


if __name__ == "__main__":
    main()
