"""Interleaved bidirectional Transformer decoder (IBDecoder).

Spec-driven rebuild of "Fast Interleaved Bidirectional Sequence
Generation" (WMT20; reference keeps the code on its
interleaved_bidirectional_transformer branch,
docs/interleaved_bidirectional_transformer/README.md): target words from
the left-to-right and right-to-left directions are interleaved
  z = [y1, yN, y2, yN-1, ...]
so a standard unidirectional decoder is reused; positions are separated
(both members of pair i carry stream position i plus a direction
embedding) and generation emits TWO tokens per decoder step -- one per
direction -- for ~2x decoding speedup.

Training details (derived from the paper's construction):
  * the target's closing <eos> is split into per-stream terminators: the
    l2r stream is y1..y_ceil(m/2)<eos>, the r2l stream is
    yN..y_{ceil(m/2)+1}<eos>; the shorter stream is padded
  * decoder inputs are the pair-shifted embeddings (pair i sees pair i-1)
    under a pair-granular causal mask (q//2 <= p//2): members of a pair
    are conditionally independent given the prefix
  * loss is the standard label-smoothed CE over z positions

Decoding: a dedicated pair beam search (two factorized softmaxes per
step; candidate pairs scored additively from the top-c of each stream;
per-stream done flags force <pad> after a stream's <eos>; finished = both
streams done). ``unfold`` reassembles y = l2r + reversed(r2l).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from zero_tpu import dtypes
from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import model_register
from zero_tpu.ops import nn
from zero_tpu.ops.common import RngGen, dropout

F32_MIN = jnp.finfo(jnp.float32).min


# ---------------------------------------------------------------------------
# target interleaving
# ---------------------------------------------------------------------------

def interleave_target(target: jax.Array, eos_id: int) -> jax.Array:
    """[B, M] eos-terminated padded targets -> [B, Z] interleaved streams.

    Z = M+2 rounded up to even; each stream ends with its own eos; the
    shorter (r2l) stream is zero-padded after its eos."""
    b, m_dim = target.shape
    z_len = m_dim + 2 + (m_dim % 2)
    num_pairs = z_len // 2

    lens = jnp.sum((target != 0).astype(jnp.int32), axis=1)
    m = jnp.maximum(lens - 1, 0)                 # content length (no eos)
    half_l = (m + 1) // 2
    half_r = m // 2

    i = jnp.arange(num_pairs)[None, :]
    l_idx = jnp.minimum(i, m_dim - 1)
    l_tok = jnp.take_along_axis(target, l_idx, axis=1)
    l_tok = jnp.where(i < half_l[:, None], l_tok,
                      jnp.where(i == half_l[:, None], eos_id, 0))

    r_idx = jnp.clip(m[:, None] - 1 - i, 0, m_dim - 1)
    r_tok = jnp.take_along_axis(target, r_idx, axis=1)
    r_tok = jnp.where(i < half_r[:, None], r_tok,
                      jnp.where(i == half_r[:, None], eos_id, 0))

    return jnp.stack([l_tok, r_tok], axis=2).reshape(b, z_len)


def unfold(z_seq: np.ndarray, eos_id: int) -> list:
    """Host-side reassembly of one interleaved sequence into y tokens."""
    l_toks, r_toks = [], []
    for pos, tok in enumerate(z_seq):
        stream = l_toks if pos % 2 == 0 else r_toks
        done = (eos_id in stream) or (0 in stream)
        if not done:
            stream.append(int(tok))

    def strip(toks):
        out = []
        for t in toks:
            if t == eos_id or t == 0:
                break
            out.append(t)
        return out

    return strip(l_toks) + list(reversed(strip(r_toks)))


def pair_causal_mask(z_len: int, dtype=jnp.float32) -> jax.Array:
    """[1, 1, Z, Z] keep-mask with pair granularity: q//2 <= p//2."""
    p = jnp.arange(z_len)[:, None] // 2
    q = jnp.arange(z_len)[None, :] // 2
    return (q <= p).astype(dtype)[None, None]


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def init_fn(rng, cfg):
    init = common.config_initializer(cfg)
    params = common.init_embeddings(jax.random.fold_in(rng, 0), cfg)
    params["dir_embedding"] = init(jax.random.fold_in(rng, 1),
                                   (2, cfg.embed_size))
    params["encoder"] = [
        base.init_enc_layer(jax.random.fold_in(rng, 100 + l), cfg, l)
        for l in range(cfg.num_encoder_layer)]
    params["decoder"] = [
        base.init_dec_layer(jax.random.fold_in(rng, 200 + l), cfg, l)
        for l in range(cfg.num_decoder_layer)]
    return params


def _encode(params, source, cfg, rngs, training):
    mask = (source != 0).astype(jnp.float32)
    src_table, _, _ = common.emb_tables(params, cfg)
    x = common.embed_scaled(src_table, source, params["emb_bias"], cfg,
                            dtypes.compute_dtype(cfg))
    x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)
    keep = nn.masking_mask(mask)
    for p in params["encoder"]:
        x = base.enc_layer(p, x, keep, cfg, rngs)
    return {"encodes": x, "mask": mask}


def _embed_z(params, z, cfg):
    """Interleaved-stream embeddings: token + stream position (i for both
    members of pair i) + direction embedding by parity."""
    _, tgt_table, _ = common.emb_tables(params, cfg)
    x = common.embed_scaled(tgt_table, z, params["emb_bias"], cfg,
                            dtypes.compute_dtype(cfg))
    z_len = z.shape[1]
    pair_pos = jnp.arange(z_len) // 2
    sig = nn.timing_signal(z_len, cfg.embed_size)        # [Z, E]
    x = x + jnp.take(sig, pair_pos, axis=0)[None]
    parity = jnp.arange(z_len) % 2
    x = x + jnp.take(params["dir_embedding"].astype(x.dtype), parity,
                     axis=0)[None]
    return x


def _pair_shift(x):
    """Shift inputs by one pair: pair i sees pair i-1; pair 0 sees zeros."""
    return jnp.pad(x, [(0, 0), (2, 0), (0, 0)])[:, :-2, :]


def _decode_train(params, z, state, cfg, rngs, training):
    x = _embed_z(params, z, cfg)
    x = _pair_shift(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)

    self_keep = pair_causal_mask(z.shape[1])
    mem_keep = nn.masking_mask(state["mask"])
    zmask = (z != 0).astype(jnp.float32)
    for p in params["decoder"]:
        x = base.dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs,
                                 zmask)
    _, _, soft_table = common.emb_tables(params, cfg)
    return x, soft_table, zmask


def train_fn(params, features, cfg, rng, step=0):
    params = dtypes.cast_to_compute(params, cfg)
    rngs = RngGen(rng)
    state = _encode(params, features["source"], cfg, rngs, True)
    z = interleave_target(features["target"], cfg.tgt_vocab.eos())
    feat, soft_table, zmask = _decode_train(params, z, state, cfg, rngs, True)
    loss, _ = common.ce_from_feature(feat, soft_table, z, zmask, cfg,
                                     cfg.label_smooth)
    return {"loss": loss}


def score_fn(params, features, cfg):
    params = dtypes.cast_to_compute(params, cfg)
    rngs = RngGen(None)
    state = _encode(params, features["source"], cfg, rngs, False)
    z = interleave_target(features["target"], cfg.tgt_vocab.eos())
    feat, soft_table, zmask = _decode_train(params, z, state, cfg, rngs,
                                            False)
    _, per_sample = common.ce_from_feature(feat, soft_table, z, zmask, cfg,
                                           0.0)
    return {"score": per_sample}


class IBInference(NamedTuple):
    encode: object
    init_cache: object
    decode_pair: object   # (params, prev_pair [B,2], state, cache, pair_i)
    decode_prefix: object  # (params, z_buffer, state, pair_i) -> [B, 2, V]
    # no ancestry-indexed pools yet: pair search uses the default gather
    reorder_cache: object = None


def infer_fn(cfg):
    def encode(params, source):
        params = dtypes.cast_to_compute(params, cfg)
        rngs = RngGen(None)
        state = _encode(params, source, cfg, rngs, False)
        state["layers"] = [
            base.dec_layer_precompute(p, state["encodes"], cfg)
            for p in params["decoder"]]
        return state

    def init_cache(params, state, batch, max_z_len):
        return {"layers": [base.init_dec_layer_cache(p, batch, max_z_len,
                                                     cfg, dtypes.compute_dtype(cfg))
                           for p in params["decoder"]]}

    def decode_pair(params, prev_pair, state, cache, pair_i):
        """One pair step: feed pair i-1's tokens, emit logits for both
        members of pair i. prev_pair [B, 2] (ignored at pair 0).

        Matches the pair-shifted training inputs exactly: the input at
        pair i's slots is the embedding of pair i-1's tokens carrying
        pair position i-1 and direction parity; pair 0's input is the
        all-zero vector (from the training-time pad)."""
        params = dtypes.cast_to_compute(params, cfg)
        x = _embed_z(params, prev_pair, cfg)  # pos(0) + dirs for slots 0,1
        sig0 = nn.timing_signal(1, cfg.embed_size)[0]
        sig_prev = nn.timing_signal(jnp.maximum(pair_i - 1, 0),
                                    cfg.embed_size)
        x = x - sig0[None, None, :] + sig_prev[None]
        x = jnp.where(pair_i > 0, x, jnp.zeros_like(x))
        new_caches = []
        time = 2 * pair_i
        for p, lstate, lcache in zip(params["decoder"], state["layers"],
                                     cache["layers"]):
            x, new_c = base.dec_layer_step(p, x, lstate, state, lcache, time,
                                           cfg)
            new_caches.append(new_c)
        _, _, soft_table = common.emb_tables(params, cfg)
        logits = common.output_logits(x, soft_table)   # [B, 2, V]
        return logits, {"layers": new_caches}

    def decode_prefix(params, z_buffer, state, pair_i):
        params = dtypes.cast_to_compute(params, cfg)
        rngs = RngGen(None)
        feat, soft_table, _ = _decode_train(params, z_buffer, state, cfg,
                                            rngs, False)
        sl = jax.lax.dynamic_slice_in_dim(feat, 2 * pair_i, 2, axis=1)
        return common.output_logits(sl, soft_table)

    return IBInference(encode=encode, init_cache=init_cache,
                       decode_pair=decode_pair, decode_prefix=decode_prefix)


model_register("transformer_ibdecoder", init_fn, train_fn, score_fn,
               infer_fn)
