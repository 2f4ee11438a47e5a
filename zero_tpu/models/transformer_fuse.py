"""Transformer with merged attention (MAtt): fused cross-attention + AAN.

Parity target: reference models/transformer_fuse.py -- the decoder layer is
a single 'fuse_attention' (cross attention whose output is summed with the
AAN cumulative average of query-side values through the shared v projection,
func.py:258-275) followed by FFN: 2 sublayers per decoder layer instead of
3. Pairs with deep_transformer_init for 12-30 layer models
(docs/depth_scale_init_and_merged_attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import model_register
from zero_tpu.ops import attention, nn


def init_dec_layer(key, cfg, layer):
    init = common.layer_initializer(cfg, layer)
    h = cfg.hidden_size
    return {
        "fuse": attention.init_attention(jax.random.fold_in(key, 0), h, h,
                                         self_attention=False, d_memory=h,
                                         fuse=True, weight_init=init),
        "ln1": nn.init_layer_norm(h),
        "ffn": nn.init_ffn(jax.random.fold_in(key, 1), h, cfg.filter_size, h,
                           weight_init=init),
        "ln2": nn.init_layer_norm(h),
    }


def dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs, tgt_mask):
    # pass the raw mask: attn_train builds the [B, Lq, Lq] averaging
    # matrix itself, or runs a seq-parallel prefix mean inside the
    # {'pipe','seq'} manual region where x is a local block
    y = attention.attn_train(p["fuse"], x, state["encodes"], mem_keep,
                             cfg.num_heads, rng=rngs(),
                             drop=cfg.attention_dropout,
                             fuse_mask=tgt_mask)["output"]
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def dec_layer_precompute(p, encodes, cfg):
    return attention.cross_attn_precompute(p["fuse"], encodes)


def init_dec_layer_cache(p, batch, max_len, cfg, dtype):
    return {"aan": jnp.zeros((batch, 1, cfg.hidden_size), dtype)}


def dec_layer_step(p, x_t, layer_state, state, cache, time, cfg):
    y, new_sum = attention.cross_attn_step(
        p["fuse"], x_t, layer_state, state["mask"], cfg.num_heads,
        aan_sum=cache["aan"], time=time)
    x_t = nn.layer_norm(p["ln1"], x_t + y)
    y = nn.ffn(p["ffn"], x_t)
    x_t = nn.layer_norm(p["ln2"], x_t + y)
    return x_t, {"aan": new_sum}


HOOKS = common.LayerHooks(
    init_enc_layer=base.init_enc_layer,
    enc_layer=base.enc_layer,
    init_dec_layer=init_dec_layer,
    dec_layer_train=dec_layer_train,
    dec_layer_precompute=dec_layer_precompute,
    init_dec_layer_cache=init_dec_layer_cache,
    dec_layer_step=dec_layer_step,
    # encoder = base layers (ring-capable); the decoder's merged
    # attention rides the seq-parallel AAN prefix mean (ops/attention.py
    # manual-seq fuse path)
    seq_in_pipe_enc=True,
    seq_in_pipe_dec=True,
)

init_fn, train_fn, score_fn, infer_fn = common.make_transformer(HOOKS)
model_register("transformer_fuse", init_fn, train_fn, score_fn, infer_fn)
