"""CLI entry point (L6): config merge, vocab load, mode dispatch.

Counterpart of reference run.py:307-420:
  python -m zero_tpu.run --mode {train,test,score,ensemble}
         --config FILE --parameters k=v,... [--ensemble_dirs d1;d2]

Merge priority: command line > saved param.json > config file > defaults
(applied twice around the saved-param load, run.py:367-376). Config files
are JSON or python dict literals, parsed safely (no eval).
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import time

import numpy as np

from zero_tpu import train as graph
from zero_tpu.config import default_config, merge_params, save_parameters
from zero_tpu.recorder import Recorder
from zero_tpu.vocab import Vocab

log = logging.getLogger("zero_tpu")


def setup_recorder(params):
    """Attach a (possibly resumed) Recorder (reference run.py:276-296)."""
    recorder = Recorder()
    recorder.bad_counter = 0
    recorder.estop = False
    recorder.lidx = -1
    recorder.step = 0
    recorder.epoch = 1
    recorder.lrate = params.lrate
    recorder.history_scores = []
    recorder.valid_script_scores = []

    record_path = os.path.abspath(
        os.path.join(params.output_dir, "record.json"))
    if os.path.exists(record_path) and params.train_continue:
        recorder.load_from_json(record_path)

    params.add_param("recorder", recorder)
    return params


def print_parameters(params):
    log.info("The Used Configuration:")
    for k, v in sorted(params.values().items()):
        log.info("%s\t%s", str(k).ljust(30), str(v))


def setup_compilation_cache(params):
    """Enable JAX's persistent compilation cache so identical programs
    compile once across runs (every distinct jitted shape costs a TPU
    compile otherwise)."""
    cache_dir = getattr(params, "compilation_cache_dir", "")
    if not cache_dir:
        return
    import jax

    cache_dir = os.path.expanduser(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log.info("XLA compilation cache: %s", cache_dir)


def setup_prng(params):
    """Pick the PRNG implementation. 'auto' (default) selects the
    hardware rbg generator on TPU -- threefry bit generation is the
    single largest non-matmul cost of a dropout-regularised train step
    (measured 48% of a transformer-base step on v5e; rbg + 8-bit masks
    recover nearly all of it) -- and keeps threefry elsewhere for
    reproducible CPU tests."""
    impl = str(getattr(params, "prng_impl", "auto"))
    import jax

    if impl == "auto":
        impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    jax.config.update("jax_default_prng_impl", impl)
    log.info("PRNG implementation: %s", impl)


def load_vocabs(params):
    start = time.time()
    params.src_vocab = Vocab(params.src_vocab_file)
    params.tgt_vocab = Vocab(params.tgt_vocab_file)
    log.info("Loaded vocab: src %d, tgt %d in %.2f s",
             params.src_vocab.size(), params.tgt_vocab.size(),
             time.time() - start)
    return params


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    log.info("Welcome Using Zero-TPU :)")

    parser = argparse.ArgumentParser("zero_tpu")
    parser.add_argument("--config", default="",
                        help="additional mergeable parameter file")
    parser.add_argument("--parameters", default="",
                        help="command-line refinable parameters k=v,...")
    parser.add_argument("--ensemble_dirs", default="",
                        help="';'-separated model dirs for ensemble")
    parser.add_argument("--name", default="model")
    parser.add_argument("--mode", default="train",
                        choices=["train", "test", "score", "ensemble"])
    args = parser.parse_args(argv)

    if args.mode == "ensemble":
        all_params = []
        for midx, model_dir in enumerate(args.ensemble_dirs.split(";")):
            params = default_config()
            params = merge_params(params, args.config, args.parameters,
                                  output_dir=model_dir)
            params.output_dir = os.path.abspath(model_dir)
            params = load_vocabs(params)
            log.info("Parameters of %d-th model", midx)
            print_parameters(params)
            all_params.append(params)
        graph.ensemble(all_params)
        return "Over"

    params = default_config()
    params = merge_params(params, args.config, args.parameters)

    random.seed(params.random_seed)
    np.random.seed(params.random_seed)

    # multi-host: connect processes before any backend/device usage
    from zero_tpu.parallel import distributed as dist
    dist.maybe_initialize(params)

    params = load_vocabs(params)
    print_parameters(params)
    setup_compilation_cache(params)
    setup_prng(params)

    if args.mode == "train":
        save_parameters(params, params.output_dir)
        params = setup_recorder(params)
        graph.train(params)
    elif args.mode == "test":
        graph.evaluate(params)
    elif args.mode == "score":
        graph.scorer(params)
    return "Over"


if __name__ == "__main__":
    main()
