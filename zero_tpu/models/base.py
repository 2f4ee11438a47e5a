"""Model registry and the functional model contract.

Reference contract (models/model.py): per-model (train_fn, score_fn,
infer_fn) registered by unique name. TPU-native extension: models are pure
functions over explicit param pytrees, so the spec adds ``init_fn`` and the
infer functions expose a static-shape cache API for jit-compiled beam
search:

  init_fn(rng, cfg)                        -> params
  train_fn(params, features, cfg, rng, step) -> {'loss': scalar, ...}
  score_fn(params, features, cfg)          -> {'score': [B] per-sent loss}
  infer_fn(cfg)                            -> Inference with
      encode(params, source)                       -> state (beam-invariant
                                                    + 'mask', 'encodes')
      init_cache(params, state, batch, max_len)    -> mutable cache pytree,
                                                    all leaves [B, ...] with
                                                    static shapes
      decode_step(params, prev_tok, state, cache, time)
                                                   -> (logits [B, V] fp32,
                                                       new_cache)
      decode_prefix(params, tgt_prefix, state, time) -> logits [B, V]
          (dev-mode oracle: full recompute over the padded prefix buffer,
           reference search.py:129-140)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional


class Inference(NamedTuple):
    encode: Callable
    init_cache: Callable
    decode_step: Callable
    decode_prefix: Optional[Callable] = None
    # optional beam-reorder of the cache after each top-k:
    #   reorder_cache(cache, beam_indices [B, K], batch, beam_size, time,
    #                 span=1) -> cache
    # When None the search permutes every cache leaf with a beam gather;
    # models with ancestry-indexed KV pools (models/common.py) override it
    # to update the ancestry index instead of copying the pools.
    reorder_cache: Optional[Callable] = None


class ModelSpec(NamedTuple):
    init_fn: Callable
    train_fn: Callable
    score_fn: Callable
    infer_fn: Callable


_REGISTRY = {}


def model_register(name: str, init_fn, train_fn, score_fn, infer_fn) -> None:
    if name in _REGISTRY:
        raise ValueError("Model name %r is already registered" % name)
    _REGISTRY[name] = ModelSpec(init_fn, train_fn, score_fn, infer_fn)


def get_model(name: str) -> ModelSpec:
    if name not in _REGISTRY:
        raise ValueError("Unknown model %r; registered: %s"
                         % (name, sorted(_REGISTRY)))
    return _REGISTRY[name]


def registered_models():
    return sorted(_REGISTRY)
