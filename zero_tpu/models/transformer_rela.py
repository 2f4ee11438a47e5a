"""Transformer-ReLA: all attention softmaxes replaced by ReLU activations.

Parity target: reference models/transformer_rela.py -- encoder self, decoder
self, and cross attention all use rela.dot_attention (":48,134,154"):
multiplicative masking + ReLU weights + gated RMSNorm stabilising epilogue.
"""

from __future__ import annotations

import jax

from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import model_register
from zero_tpu.ops import attention, nn


def init_enc_layer(key, cfg, layer):
    init = common.layer_initializer(cfg, layer)
    h = cfg.hidden_size
    return {
        "self": attention.init_attention(jax.random.fold_in(key, 0), h, h,
                                         self_attention=True, rela=True,
                                         weight_init=init),
        "ln1": nn.init_layer_norm(h),
        "ffn": nn.init_ffn(jax.random.fold_in(key, 1), h, cfg.filter_size, h,
                           weight_init=init),
        "ln2": nn.init_layer_norm(h),
    }


def enc_layer(p, x, src_keep, cfg, rngs):
    # pad_mask declares the decomposed mask so ReLA can ride the ring
    # (SP) route; the dense path keeps using src_keep
    y = attention.attn_train(p["self"], x, None, src_keep, cfg.num_heads,
                             rng=rngs(), drop=cfg.attention_dropout,
                             relu=True,
                             pad_mask=src_keep[:, 0, 0, :])["output"]
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def init_dec_layer(key, cfg, layer):
    init = common.layer_initializer(cfg, layer)
    h = cfg.hidden_size
    return {
        "self": attention.init_attention(jax.random.fold_in(key, 0), h, h,
                                         self_attention=True, rela=True,
                                         weight_init=init),
        "ln1": nn.init_layer_norm(h),
        "cross": attention.init_attention(jax.random.fold_in(key, 1), h, h,
                                          self_attention=False, d_memory=h,
                                          rela=True, weight_init=init),
        "ln2": nn.init_layer_norm(h),
        "ffn": nn.init_ffn(jax.random.fold_in(key, 2), h, cfg.filter_size, h,
                           weight_init=init),
        "ln3": nn.init_layer_norm(h),
    }


def dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs, tgt_mask):
    y = attention.attn_train(p["self"], x, None, self_keep, cfg.num_heads,
                             rng=rngs(), drop=cfg.attention_dropout,
                             relu=True, causal=True)["output"]
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = attention.attn_train(p["cross"], x, state["encodes"], mem_keep,
                             cfg.num_heads, rng=rngs(),
                             drop=cfg.attention_dropout, relu=True)["output"]
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = nn.layer_norm(p["ln3"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def dec_layer_precompute(p, encodes, cfg):
    return attention.cross_attn_precompute(p["cross"], encodes)


def dec_layer_step(p, x_t, layer_state, state, cache, time, cfg):
    y, cache = attention.self_attn_step(p["self"], x_t, cache, time,
                                        cfg.num_heads, relu=True,
                                        use_flash=cfg.use_flash_decode)
    x_t = nn.layer_norm(p["ln1"], x_t + y)
    y, _ = attention.cross_attn_step(p["cross"], x_t, layer_state,
                                     state["mask"], cfg.num_heads, relu=True)
    x_t = nn.layer_norm(p["ln2"], x_t + y)
    y = nn.ffn(p["ffn"], x_t)
    x_t = nn.layer_norm(p["ln3"], x_t + y)
    return x_t, cache


HOOKS = common.LayerHooks(
    init_enc_layer=init_enc_layer,
    enc_layer=enc_layer,
    init_dec_layer=init_dec_layer,
    dec_layer_train=dec_layer_train,
    dec_layer_precompute=dec_layer_precompute,
    init_dec_layer_cache=base.init_dec_layer_cache,
    dec_layer_step=dec_layer_step,
    # the pool kernel's relu mode (decode_attention.py) covers ReLA's
    # unnormalized relu attention; the gated-RMSNorm epilogue runs in
    # self_attn_step after the kernel
    pool_kernel=True,
    # ReLA rides the ring's relu mode (parallel/ring.py _block_attn);
    # cross-attention reads replicated memory and is position-free
    seq_in_pipe_enc=True,
    seq_in_pipe_dec=True,
)

init_fn, train_fn, score_fn, infer_fn = common.make_transformer(HOOKS)
model_register("transformer_rela", init_fn, train_fn, score_fn, infer_fn)
