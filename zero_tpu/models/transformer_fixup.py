"""Transformer-Fixup: deep training without layer normalisation.

Parity target: reference models/transformer_fixup.py -- LN removed
everywhere; every attention sublayer shifts its input and scales its output
with scalar params; the FFN carries an internal shift/scale sandwich;
numblocks = 2*enc_layers + 3*dec_layers (":55"); the encoder ends with
scale(shift(x)) and the decoder with shift(x); separate softmax embeddings
are zero-initialised (":201").
"""

from __future__ import annotations

import jax

from zero_tpu.models import common
from zero_tpu.models.base import model_register
from zero_tpu.ops import attention, fixup, nn


def _numblocks(cfg):
    return 2 * cfg.num_encoder_layer + 3 * cfg.num_decoder_layer


def init_enc_layer(key, cfg, layer):
    init = common.layer_initializer(cfg, layer)
    h = cfg.hidden_size
    return {
        "self_shift": fixup.init_shift(),
        "self": fixup.init_fixup_attention(jax.random.fold_in(key, 0), h, h,
                                           self_attention=True,
                                           numblocks=_numblocks(cfg),
                                           base_init=init),
        "self_scale": fixup.init_scale(),
        "ffn": fixup.init_fixup_ffn(jax.random.fold_in(key, 1), h,
                                    cfg.filter_size, h,
                                    numblocks=_numblocks(cfg), base_init=init),
    }


def enc_layer(p, x, src_keep, cfg, rngs):
    y = attention.attn_train(p["self"], fixup.shift(p["self_shift"], x), None,
                             src_keep, cfg.num_heads, rng=rngs(),
                             drop=cfg.attention_dropout)["output"]
    y = fixup.scale(p["self_scale"], y)
    x = nn.residual_fn(x, y, rngs(), cfg.residual_dropout)
    y = fixup.fixup_ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = nn.residual_fn(x, y, rngs(), cfg.residual_dropout)
    return x


def init_dec_layer(key, cfg, layer):
    init = common.layer_initializer(cfg, layer)
    h = cfg.hidden_size
    return {
        "self_shift": fixup.init_shift(),
        "self": fixup.init_fixup_attention(jax.random.fold_in(key, 0), h, h,
                                           self_attention=True,
                                           numblocks=_numblocks(cfg),
                                           base_init=init),
        "self_scale": fixup.init_scale(),
        "cross_shift": fixup.init_shift(),
        "cross": fixup.init_fixup_attention(jax.random.fold_in(key, 1), h, h,
                                            self_attention=False, d_memory=h,
                                            numblocks=_numblocks(cfg),
                                            base_init=init),
        "cross_scale": fixup.init_scale(),
        "ffn": fixup.init_fixup_ffn(jax.random.fold_in(key, 2), h,
                                    cfg.filter_size, h,
                                    numblocks=_numblocks(cfg), base_init=init),
    }


def dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs, tgt_mask):
    y = attention.attn_train(p["self"], fixup.shift(p["self_shift"], x), None,
                             self_keep, cfg.num_heads, rng=rngs(),
                             drop=cfg.attention_dropout)["output"]
    y = fixup.scale(p["self_scale"], y)
    x = nn.residual_fn(x, y, rngs(), cfg.residual_dropout)
    y = attention.attn_train(p["cross"], fixup.shift(p["cross_shift"], x),
                             state["encodes"], mem_keep, cfg.num_heads,
                             rng=rngs(), drop=cfg.attention_dropout)["output"]
    y = fixup.scale(p["cross_scale"], y)
    x = nn.residual_fn(x, y, rngs(), cfg.residual_dropout)
    y = fixup.fixup_ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = nn.residual_fn(x, y, rngs(), cfg.residual_dropout)
    return x


def dec_layer_precompute(p, encodes, cfg):
    return attention.cross_attn_precompute(p["cross"], encodes)


def init_dec_layer_cache(p, batch, max_len, cfg, dtype):
    return attention.init_self_cache(batch, max_len, cfg.hidden_size, dtype)


def dec_layer_step(p, x_t, layer_state, state, cache, time, cfg):
    y, cache = attention.self_attn_step(p["self"],
                                        fixup.shift(p["self_shift"], x_t),
                                        cache, time, cfg.num_heads,
                                        use_flash=cfg.use_flash_decode)
    y = fixup.scale(p["self_scale"], y)
    x_t = x_t + y
    y, _ = attention.cross_attn_step(p["cross"],
                                     fixup.shift(p["cross_shift"], x_t),
                                     layer_state, state["mask"], cfg.num_heads)
    y = fixup.scale(p["cross_scale"], y)
    x_t = x_t + y
    y = fixup.fixup_ffn(p["ffn"], x_t)
    x_t = x_t + y
    return x_t, cache


def init_enc_post(key, cfg):
    return {"shift": fixup.init_shift(), "scale": fixup.init_scale()}


def enc_post(p, x):
    # x = scale(shift(x)) after the encoder stack (transformer_fixup.py:75)
    return fixup.scale(p["scale"], fixup.shift(p["shift"], x))


def init_dec_post(key, cfg):
    return {"shift": fixup.init_shift()}


def dec_post(p, x):
    # x = shift(x) after the decoder stack (transformer_fixup.py:191)
    return fixup.shift(p["shift"], x)


HOOKS = common.LayerHooks(
    init_enc_layer=init_enc_layer,
    enc_layer=enc_layer,
    init_dec_layer=init_dec_layer,
    dec_layer_train=dec_layer_train,
    dec_layer_precompute=dec_layer_precompute,
    init_dec_layer_cache=init_dec_layer_cache,
    dec_layer_step=dec_layer_step,
    init_enc_post=init_enc_post,
    enc_post=enc_post,
    init_dec_post=init_dec_post,
    dec_post=dec_post,
)

init_fn, train_fn, score_fn, infer_fn = common.make_transformer(
    HOOKS, zero_softmax=True)
model_register("transformer_fixup", init_fn, train_fn, score_fn, infer_fn)
