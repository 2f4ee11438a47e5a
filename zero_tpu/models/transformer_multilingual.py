"""Multilingual Transformer with language-aware components (LaLN + LaLT).

Spec-driven rebuild of "Improving Massively Multilingual Neural Machine
Translation and Zero-Shot Translation" (reference keeps the code on its
multilingual_laln_lalt branch; docs/multilingual_laln_lalt): multilingual
capacity is added through language-specific components on the decoder
side while the bulk of the model stays shared:

  * **LaLN** -- language-aware layer normalization: every decoder LN owns
    per-target-language scale/offset vectors
  * **LaLT** -- language-aware linear transformation: a per-target-language
    projection of the decoder output before the (shared) softmax
  * the target language is signalled Google-style by a language tag as
    the FIRST source token; by convention the tag ids occupy
    [lang_id_offset, lang_id_offset + num_languages) in the shared vocab

Random online backtranslation (ROBT, the paper's zero-shot training
procedure) lives in zero_tpu/robt.py; enable with ``robt=True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import Inference, model_register
from zero_tpu.ops import attention, nn
from zero_tpu.ops.common import RngGen, dropout


def lang_from_source(source, cfg):
    """Target-language index from the leading language-tag token."""
    return jnp.clip(source[:, 0] - cfg.lang_id_offset, 0,
                    cfg.num_languages - 1)


# -- language-aware layer norm ------------------------------------------------

def init_lang_ln(num_languages: int, size: int, dtype=jnp.float32):
    return {"scale": jnp.ones((num_languages, size), dtype),
            "offset": jnp.zeros((num_languages, size), dtype)}


def lang_layer_norm(params, x, lang, eps: float = 1e-8):
    """LayerNorm with per-language scale/offset; lang: [B] int."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    scale = jnp.take(params["scale"], lang, axis=0).astype(jnp.float32)
    offset = jnp.take(params["offset"], lang, axis=0).astype(jnp.float32)
    while scale.ndim < x.ndim:
        scale = scale[:, None]
        offset = offset[:, None]
    return (scale * normed + offset).astype(x.dtype)


# -- model --------------------------------------------------------------------

def init_dec_layer(key, cfg, layer):
    init = common.layer_initializer(cfg, layer)
    h = cfg.hidden_size
    nl = cfg.num_languages
    return {
        "self": attention.init_attention(jax.random.fold_in(key, 0), h, h,
                                         self_attention=True,
                                         weight_init=init),
        "ln1": init_lang_ln(nl, h),
        "cross": attention.init_attention(jax.random.fold_in(key, 1), h, h,
                                          self_attention=False, d_memory=h,
                                          weight_init=init),
        "ln2": init_lang_ln(nl, h),
        "ffn": nn.init_ffn(jax.random.fold_in(key, 2), h, cfg.filter_size, h,
                           weight_init=init),
        "ln3": init_lang_ln(nl, h),
    }


def init_fn(rng, cfg):
    init = common.config_initializer(cfg)
    params = common.init_embeddings(jax.random.fold_in(rng, 0), cfg)
    params["encoder"] = [
        base.init_enc_layer(jax.random.fold_in(rng, 100 + l), cfg, l)
        for l in range(cfg.num_encoder_layer)]
    params["decoder"] = [
        init_dec_layer(jax.random.fold_in(rng, 200 + l), cfg, l)
        for l in range(cfg.num_decoder_layer)]
    # LaLT: per-language decoder-output projection, identity-initialised so
    # early training matches the shared model
    eye = jnp.eye(cfg.embed_size, dtype=jnp.float32)
    params["lalt"] = jnp.tile(eye[None], (cfg.num_languages, 1, 1))
    return params


def _encode(params, source, cfg, rngs, training):
    mask = (source != 0).astype(jnp.float32)
    src_table, _, _ = common.emb_tables(params, cfg)
    x = common.embed_scaled(src_table, source, params["emb_bias"], cfg,
                            jnp.float32)
    x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)
    keep = nn.masking_mask(mask)
    for p in params["encoder"]:
        x = base.enc_layer(p, x, keep, cfg, rngs)
    return {"encodes": x, "mask": mask,
            "lang": lang_from_source(source, cfg)}


def _dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs, lang):
    # causal declares the decomposed mask so self-attention can ride the
    # ring (SP) route under a 'seq' mesh axis; LaLN/LaLT are position-free
    y = attention.attn_train(p["self"], x, None, self_keep, cfg.num_heads,
                             rng=rngs(), drop=cfg.attention_dropout,
                             causal=True)["output"]
    x = lang_layer_norm(p["ln1"],
                        nn.residual_fn(x, y, rngs(), cfg.residual_dropout),
                        lang)
    y = attention.attn_train(p["cross"], x, state["encodes"], mem_keep,
                             cfg.num_heads, rng=rngs(),
                             drop=cfg.attention_dropout)["output"]
    x = lang_layer_norm(p["ln2"],
                        nn.residual_fn(x, y, rngs(), cfg.residual_dropout),
                        lang)
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = lang_layer_norm(p["ln3"],
                        nn.residual_fn(x, y, rngs(), cfg.residual_dropout),
                        lang)
    return x


def _lalt(params, x, lang):
    w = jnp.take(params["lalt"], lang, axis=0).astype(x.dtype)  # [B, d, d]
    return jnp.einsum("b...d,bdf->b...f", x, w)


def _decode_train(params, target, state, cfg, rngs, training):
    mask = (target != 0).astype(jnp.float32)
    _, tgt_table, soft_table = common.emb_tables(params, cfg)
    x = common.embed_scaled(tgt_table, target, params["emb_bias"], cfg,
                            jnp.float32)
    x = common.shift_right(x)
    x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)

    lang = state["lang"]
    self_keep = nn.causal_mask(target.shape[1])
    mem_keep = nn.masking_mask(state["mask"])
    for p in params["decoder"]:
        x = _dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs,
                             lang)
    x = _lalt(params, x, lang)
    return x, soft_table, mask


def train_fn(params, features, cfg, rng, step=0):
    rngs = RngGen(rng)
    state = _encode(params, features["source"], cfg, rngs, True)
    feat, soft_table, mask = _decode_train(params, features["target"], state,
                                           cfg, rngs, True)
    loss, _ = common.ce_from_feature(feat, soft_table, features["target"],
                                     mask, cfg, cfg.label_smooth)
    return {"loss": loss}


def score_fn(params, features, cfg):
    rngs = RngGen(None)
    state = _encode(params, features["source"], cfg, rngs, False)
    feat, soft_table, mask = _decode_train(params, features["target"], state,
                                           cfg, rngs, False)
    _, per_sample = common.ce_from_feature(feat, soft_table,
                                           features["target"], mask, cfg,
                                           0.0)
    return {"score": per_sample}


def infer_fn(cfg):
    def encode(params, source):
        rngs = RngGen(None)
        state = _encode(params, source, cfg, rngs, False)
        state["layers"] = [
            base.dec_layer_precompute(p, state["encodes"], cfg)
            for p in params["decoder"]]
        return state

    def init_cache(params, state, batch, max_len):
        # per-beam copies of the language ids (queries are per-beam even
        # though the memory is not)
        lang = state["lang"]
        reps = batch // lang.shape[0]
        return {
            "lang": jnp.repeat(lang, reps, axis=0),
            "layers": [base.init_dec_layer_cache(p, batch, max_len, cfg,
                                                 jnp.float32)
                       for p in params["decoder"]],
        }

    def decode_step(params, prev_tok, state, cache, time):
        _, tgt_table, soft_table = common.emb_tables(params, cfg)
        x = common.embed_scaled(tgt_table, prev_tok, params["emb_bias"], cfg,
                                jnp.float32)
        x = jnp.where(time > 0, x, jnp.zeros_like(x))
        x = nn.add_timing_signal(x, time=time)

        lang = cache["lang"]
        new_caches = []
        for p, lstate, lcache in zip(params["decoder"], state["layers"],
                                     cache["layers"]):
            y, new_c = attention.self_attn_step(p["self"], x, lcache, time,
                                                cfg.num_heads,
                                                use_flash=cfg.use_flash_decode)
            x = lang_layer_norm(p["ln1"], x + y, lang)
            y, _ = attention.cross_attn_step(p["cross"], x, lstate,
                                             state["mask"], cfg.num_heads)
            x = lang_layer_norm(p["ln2"], x + y, lang)
            y = nn.ffn(p["ffn"], x)
            x = lang_layer_norm(p["ln3"], x + y, lang)
            new_caches.append(new_c)
        x = _lalt(params, x, lang)
        logits = common.output_logits(x[:, 0], soft_table)
        return logits, {"lang": lang, "layers": new_caches}

    def decode_prefix(params, tgt_buffer, state, time):
        rngs = RngGen(None)
        feat, soft_table, _ = _decode_train(params, tgt_buffer, state, cfg,
                                            rngs, False)
        feat = jax.lax.dynamic_slice_in_dim(
            feat, jnp.asarray(time, jnp.int32), 1, axis=1)[:, 0]
        return common.output_logits(feat, soft_table)

    return Inference(encode=encode, init_cache=init_cache,
                     decode_step=decode_step, decode_prefix=decode_prefix)


model_register("transformer_multilingual", init_fn, train_fn, score_fn,
               infer_fn)
