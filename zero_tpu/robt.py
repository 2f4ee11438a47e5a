"""Random online backtranslation (ROBT) for zero-shot multilingual NMT.

Spec-driven rebuild of the ROBT training procedure from "Improving
Massively Multilingual Neural Machine Translation and Zero-Shot
Translation" (reference keeps the code on its multilingual_laln_lalt
branch; behavioral spec: docs/multilingual_laln_lalt/README.md:37-42 and
the paper's Algorithm 1): for every training pair (x -> y), sample an
intermediate language z uniformly at random, back-translate y into z with
the CURRENT model, and additionally train on the synthetic pair
(bt(y, z) -> y). This exercises the ~|L|^2 zero-shot directions that the
English-centric corpus never covers.

TPU-native design: the whole procedure stays in-graph inside the jitted
train step -- a greedy incremental decode (lax.scan over the model's
decode_step cache machinery, argmax sampling) produces the synthetic
sources on device under jax.lax.stop_gradient, and the synthetic batch
reuses the original batch's padded shapes, so ROBT adds no host round
trips, no retraces, and composes with gradient accumulation and SPMD
sharding unchanged. Enable with ``robt=True`` (requires a model whose
source carries the Google-style leading target-language tag, i.e.
transformer_multilingual).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32_MIN = jnp.finfo(jnp.float32).min


def greedy_decode(params, source, inference, cfg, out_len: int):
    """Greedy (argmax) incremental decode to a fixed ``out_len``.

    Same cache/decode_step conventions as beam_search (search.py): token
    buffer position 0 is <pad>, eos is blocked at the first position
    (force decoding), and streams that emitted eos are pinned to <pad>.
    Returns [B, out_len] int32 token rows shaped like source sentences
    (tokens, eos, pads).
    """
    batch = source.shape[0]
    eos_id = cfg.tgt_vocab.eos()
    state = inference.encode(params, source)
    cache = inference.init_cache(params, state, batch, out_len)

    def step(carry, t):
        prev, done, cache = carry
        logits, cache = inference.decode_step(params, prev, state, cache, t)
        logits = logits.astype(jnp.float32)
        eos_block = (jnp.arange(logits.shape[-1]) == eos_id)
        logits = jnp.where((t < 1) & eos_block[None, :], F32_MIN, logits)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # [B]
        nxt = jnp.where(done, 0, nxt)
        return (nxt[:, None], done | (nxt == eos_id), cache), nxt

    init = (jnp.zeros((batch, 1), jnp.int32),
            jnp.zeros((batch,), bool), cache)
    _, toks = jax.lax.scan(step, init, jnp.arange(out_len))
    return toks.T                                                # [B, out_len]


def make_augment(model, cfg):
    """(params, feats, rng) -> synthetic ROBT feature dict.

    Per sentence: sample intermediate language z ~ U[0, num_languages),
    back-translate the target into z (input = [tag(z), y] under the
    leading-tag convention, transformer_multilingual.py), and pair the
    synthetic tokens with the ORIGINAL direction tag so the model learns
    z -> lang(y). Decoding runs under stop_gradient: ROBT gradients flow
    only through the training pass on the synthetic pair.
    """
    inference = model.infer_fn(cfg)
    num_languages = int(cfg.num_languages)
    lang_id_offset = int(cfg.lang_id_offset)

    def augment(params, feats, rng):
        src, tgt = feats["source"], feats["target"]
        src_len = src.shape[1]
        z_tag = jax.random.randint(
            rng, (src.shape[0], 1), 0, num_languages) + lang_id_offset
        bt_input = jnp.concatenate([z_tag, tgt], axis=1)
        synth = greedy_decode(jax.lax.stop_gradient(params), bt_input,
                              inference, cfg, src_len - 1)
        # keep the original source's static shape: [orig tag, synth tokens]
        new_src = jnp.concatenate([src[:, :1], synth], axis=1)
        # all-pad (padding) rows stay all-pad
        real = (jnp.sum(tgt != 0, axis=1) > 0)
        new_src = new_src * real[:, None].astype(new_src.dtype)
        out = dict(feats)
        out["source"] = new_src
        return out

    return augment
