"""CLSR: conditional language-specific routing for multilingual NMT.

Spec-driven rebuild of "Share or Not? Learning to Schedule
Language-Specific Capacity for Multilingual Translation" (ICLR 2021; the
reference hosts the code on its iclr2021_clsr branch,
docs/conditional_language_specific_routing). Each sublayer output passes
through a CLSR unit that routes between a SHARED projection and a
per-LANGUAGE projection with a learned hard gate:

    CLSR(x) = g(x) * W_lang[lang] x + (1 - g(x)) * W_shared x

g is a per-position scalar gate: hard-concrete sampled during training
(the same machinery as L0Drop, ops/l0norm.py), deterministic mean at
inference. A budget loss |mean(g) - clsr_budget| schedules how much
language-specific capacity is used (the paper's p%), weighted by
clsr_alpha. The target language comes from a leading source-side tag
token (as in transformer_multilingual).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import Inference, model_register
from zero_tpu.models.transformer_multilingual import lang_from_source
from zero_tpu.ops import attention, l0norm, nn
from zero_tpu.ops.common import RngGen, dropout


# -- CLSR unit ----------------------------------------------------------------

def init_clsr(key, cfg, dtype=jnp.float32):
    init = common.config_initializer(cfg)
    h = cfg.hidden_size
    return {
        "gate": nn.init_linear(jax.random.fold_in(key, 0), h, 1,
                               weight_init=init),
        "shared": nn.init_linear(jax.random.fold_in(key, 1), h, h,
                                 weight_init=init),
        # per-language projections, identity-initialised
        "lang": jnp.tile(jnp.eye(h, dtype=dtype)[None],
                         (cfg.num_languages, 1, 1)),
    }


def clsr(params, x, lang, rngs, training, gate_sums):
    """Apply one CLSR unit; accumulates (sum g, count) into gate_sums."""
    log_alpha = nn.linear(params["gate"], x).astype(jnp.float32)  # [B,L,1]
    if training:
        g = l0norm.hard_concrete_sample(rngs(), log_alpha)
    else:
        g = l0norm.hard_concrete_mean(log_alpha)
    h_shared = nn.linear(params["shared"], x)
    w = jnp.take(params["lang"], lang, axis=0).astype(x.dtype)  # [B, d, d]
    h_lang = jnp.einsum("b...d,bdf->b...f", x, w)
    out = g.astype(x.dtype) * h_lang + (1.0 - g.astype(x.dtype)) * h_shared
    if gate_sums is not None:
        gate_sums.append((jnp.sum(g), jnp.asarray(g.size, jnp.float32)))
    return out


# -- model --------------------------------------------------------------------

def init_enc_layer(key, cfg, layer):
    p = base.init_enc_layer(key, cfg, layer)
    p["clsr1"] = init_clsr(jax.random.fold_in(key, 20), cfg)
    p["clsr2"] = init_clsr(jax.random.fold_in(key, 21), cfg)
    return p


def init_dec_layer(key, cfg, layer):
    p = base.init_dec_layer(key, cfg, layer)
    p["clsr1"] = init_clsr(jax.random.fold_in(key, 20), cfg)
    p["clsr2"] = init_clsr(jax.random.fold_in(key, 21), cfg)
    p["clsr3"] = init_clsr(jax.random.fold_in(key, 22), cfg)
    return p


def init_fn(rng, cfg):
    params = common.init_embeddings(jax.random.fold_in(rng, 0), cfg)
    params["encoder"] = [init_enc_layer(jax.random.fold_in(rng, 100 + l),
                                        cfg, l)
                         for l in range(cfg.num_encoder_layer)]
    params["decoder"] = [init_dec_layer(jax.random.fold_in(rng, 200 + l),
                                        cfg, l)
                         for l in range(cfg.num_decoder_layer)]
    return params


def _enc_layer(p, x, src_keep, lang, cfg, rngs, training, gate_sums):
    # pad_mask declares the decomposed mask for the ring (SP) route;
    # the CLSR gates are position-free
    y = attention.attn_train(p["self"], x, None, src_keep, cfg.num_heads,
                             rng=rngs(), drop=cfg.attention_dropout,
                             pad_mask=src_keep[:, 0, 0, :])["output"]
    y = clsr(p["clsr1"], y, lang, rngs, training, gate_sums)
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    y = clsr(p["clsr2"], y, lang, rngs, training, gate_sums)
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def _dec_layer(p, x, state, self_keep, mem_keep, lang, cfg, rngs, training,
               gate_sums):
    y = attention.attn_train(p["self"], x, None, self_keep, cfg.num_heads,
                             rng=rngs(), drop=cfg.attention_dropout,
                             causal=True)["output"]
    y = clsr(p["clsr1"], y, lang, rngs, training, gate_sums)
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = attention.attn_train(p["cross"], x, state["encodes"], mem_keep,
                             cfg.num_heads, rng=rngs(),
                             drop=cfg.attention_dropout)["output"]
    y = clsr(p["clsr2"], y, lang, rngs, training, gate_sums)
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    y = clsr(p["clsr3"], y, lang, rngs, training, gate_sums)
    x = nn.layer_norm(p["ln3"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def _encode(params, source, cfg, rngs, training, gate_sums):
    mask = (source != 0).astype(jnp.float32)
    lang = lang_from_source(source, cfg)
    src_table, _, _ = common.emb_tables(params, cfg)
    x = common.embed_scaled(src_table, source, params["emb_bias"], cfg,
                            jnp.float32)
    x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)
    keep = nn.masking_mask(mask)
    for p in params["encoder"]:
        x = _enc_layer(p, x, keep, lang, cfg, rngs, training, gate_sums)
    return {"encodes": x, "mask": mask, "lang": lang}


def _decode_train(params, target, state, cfg, rngs, training, gate_sums):
    mask = (target != 0).astype(jnp.float32)
    _, tgt_table, soft_table = common.emb_tables(params, cfg)
    x = common.embed_scaled(tgt_table, target, params["emb_bias"], cfg,
                            jnp.float32)
    x = common.shift_right(x)
    x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)

    self_keep = nn.causal_mask(target.shape[1])
    mem_keep = nn.masking_mask(state["mask"])
    for p in params["decoder"]:
        x = _dec_layer(p, x, state, self_keep, mem_keep, state["lang"], cfg,
                       rngs, training, gate_sums)
    return x, soft_table, mask


def train_fn(params, features, cfg, rng, step=0):
    rngs = RngGen(rng)
    gate_sums = []
    state = _encode(params, features["source"], cfg, rngs, True, gate_sums)
    feat, soft_table, mask = _decode_train(params, features["target"], state,
                                           cfg, rngs, True, gate_sums)
    loss, _ = common.ce_from_feature(feat, soft_table, features["target"],
                                     mask, cfg, cfg.label_smooth)
    total_g = sum(s for s, _ in gate_sums)
    total_n = sum(n for _, n in gate_sums)
    budget_loss = jnp.abs(total_g / jnp.maximum(total_n, 1.0)
                          - cfg.clsr_budget)
    return {"loss": loss + cfg.clsr_alpha * budget_loss}


def score_fn(params, features, cfg):
    rngs = RngGen(None)
    state = _encode(params, features["source"], cfg, rngs, False, None)
    feat, soft_table, mask = _decode_train(params, features["target"], state,
                                           cfg, rngs, False, None)
    _, per_sample = common.ce_from_feature(feat, soft_table,
                                           features["target"], mask, cfg,
                                           0.0)
    return {"score": per_sample}


def infer_fn(cfg):
    def encode(params, source):
        rngs = RngGen(None)
        state = _encode(params, source, cfg, rngs, False, None)
        state["layers"] = [
            base.dec_layer_precompute(p, state["encodes"], cfg)
            for p in params["decoder"]]
        return state

    def init_cache(params, state, batch, max_len):
        lang = state["lang"]
        reps = batch // lang.shape[0]
        return {"lang": jnp.repeat(lang, reps, axis=0),
                "layers": [base.init_dec_layer_cache(p, batch, max_len, cfg,
                                                     jnp.float32)
                           for p in params["decoder"]]}

    def decode_step(params, prev_tok, state, cache, time):
        _, tgt_table, soft_table = common.emb_tables(params, cfg)
        x = common.embed_scaled(tgt_table, prev_tok, params["emb_bias"], cfg,
                                jnp.float32)
        x = jnp.where(time > 0, x, jnp.zeros_like(x))
        x = nn.add_timing_signal(x, time=time)

        rngs = RngGen(None)
        lang = cache["lang"]
        new_caches = []
        for p, lstate, lcache in zip(params["decoder"], state["layers"],
                                     cache["layers"]):
            y, new_c = attention.self_attn_step(p["self"], x, lcache, time,
                                                cfg.num_heads,
                                                use_flash=cfg.use_flash_decode)
            y = clsr(p["clsr1"], y, lang, rngs, False, None)
            x = nn.layer_norm(p["ln1"], x + y)
            y, _ = attention.cross_attn_step(p["cross"], x, lstate,
                                             state["mask"], cfg.num_heads)
            y = clsr(p["clsr2"], y, lang, rngs, False, None)
            x = nn.layer_norm(p["ln2"], x + y)
            y = nn.ffn(p["ffn"], x)
            y = clsr(p["clsr3"], y, lang, rngs, False, None)
            x = nn.layer_norm(p["ln3"], x + y)
            new_caches.append(new_c)
        logits = common.output_logits(x[:, 0], soft_table)
        return logits, {"lang": lang, "layers": new_caches}

    def decode_prefix(params, tgt_buffer, state, time):
        rngs = RngGen(None)
        feat, soft_table, _ = _decode_train(params, tgt_buffer, state, cfg,
                                            rngs, False, None)
        feat = jax.lax.dynamic_slice_in_dim(
            feat, jnp.asarray(time, jnp.int32), 1, axis=1)[:, 0]
        return common.output_logits(feat, soft_table)

    return Inference(encode=encode, init_cache=init_cache,
                     decode_step=decode_step, decode_prefix=decode_prefix)


model_register("transformer_clsr", init_fn, train_fn, score_fn, infer_fn)
