"""Transformer with Shaw relative-position representations (RPR).

Parity target: reference models/transformer_rpr.py -- relative positions in
encoder self-attention (":53-55"), decoder self-attention and decoder cross
attention (":143-169"), each attention block owning its own key/value RPR
tables at per-head depth. Decode uses the single-distance-row form instead
of the reference's last=1 slicing.
"""

from __future__ import annotations

import jax

from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import model_register
from zero_tpu.ops import attention, nn


def init_enc_layer(key, cfg, layer):
    p = base.init_enc_layer(key, cfg, layer)
    init = common.layer_initializer(cfg, layer)
    p["self_rpr"] = attention.init_rpr_tables(
        jax.random.fold_in(key, 10), cfg.hidden_size, cfg.num_heads,
        cfg.max_relative_position, weight_init=init)
    return p


def enc_layer(p, x, src_keep, cfg, rngs):
    # pad_mask declares the decomposed mask so RPR self-attention can
    # ride the ring (SP) route (relative distances from global
    # positions, parallel/ring.py:_rpr_block)
    y = attention.attn_train(
        p["self"], x, None, src_keep, cfg.num_heads, rng=rngs(),
        drop=cfg.attention_dropout, rpr_tables=p["self_rpr"],
        max_relative_position=cfg.max_relative_position,
        use_flash=cfg.use_flash_attention,
        pad_mask=src_keep[:, 0, 0, :])["output"]
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def init_dec_layer(key, cfg, layer):
    p = base.init_dec_layer(key, cfg, layer)
    init = common.layer_initializer(cfg, layer)
    p["self_rpr"] = attention.init_rpr_tables(
        jax.random.fold_in(key, 10), cfg.hidden_size, cfg.num_heads,
        cfg.max_relative_position, weight_init=init)
    p["cross_rpr"] = attention.init_rpr_tables(
        jax.random.fold_in(key, 11), cfg.hidden_size, cfg.num_heads,
        cfg.max_relative_position, weight_init=init)
    return p


def dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs, tgt_mask):
    y = attention.attn_train(
        p["self"], x, None, self_keep, cfg.num_heads, rng=rngs(),
        drop=cfg.attention_dropout, rpr_tables=p["self_rpr"],
        max_relative_position=cfg.max_relative_position,
        use_flash=cfg.use_flash_attention,
        causal=True)["output"]
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = attention.attn_train(
        p["cross"], x, state["encodes"], mem_keep, cfg.num_heads, rng=rngs(),
        drop=cfg.attention_dropout, rpr_tables=p["cross_rpr"],
        max_relative_position=cfg.max_relative_position,
        use_flash=cfg.use_flash_attention,
        pad_mask=mem_keep[:, 0, 0, :])["output"]
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = nn.layer_norm(p["ln3"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def dec_layer_step(p, x_t, layer_state, state, cache, time, cfg):
    y, cache = attention.self_attn_step(
        p["self"], x_t, cache, time, cfg.num_heads, rpr_tables=p["self_rpr"],
        max_relative_position=cfg.max_relative_position)
    x_t = nn.layer_norm(p["ln1"], x_t + y)
    y, _ = attention.cross_attn_step(
        p["cross"], x_t, layer_state, state["mask"], cfg.num_heads,
        rpr_tables=p["cross_rpr"], time=time,
        max_relative_position=cfg.max_relative_position)
    x_t = nn.layer_norm(p["ln2"], x_t + y)
    y = nn.ffn(p["ffn"], x_t)
    x_t = nn.layer_norm(p["ln3"], x_t + y)
    return x_t, cache


HOOKS = common.LayerHooks(
    init_enc_layer=init_enc_layer,
    enc_layer=enc_layer,
    init_dec_layer=init_dec_layer,
    dec_layer_train=dec_layer_train,
    dec_layer_precompute=base.dec_layer_precompute,
    init_dec_layer_cache=base.init_dec_layer_cache,
    dec_layer_step=dec_layer_step,
    pool_kernel=False,  # RPR's relative-position tables need per-step
    # score offsets the pool kernel doesn't compute (ReLA, by contrast,
    # rides the kernel's relu mode since r3)
    # encoder self-attention rides the ring's RPR mode (global-position
    # distances, parallel/ring.py _rpr_block); the DECODER stays dense:
    # its cross-attention applies cross_rpr, whose distance matrix is
    # query-position-dependent -- inside the seq-manual region the dense
    # fallback would use local (not global) query positions, silently
    # wrong, so dec is not declared
    seq_in_pipe_enc=True,
    seq_in_pipe_dec=False,
)

init_fn, train_fn, score_fn, infer_fn = common.make_transformer(HOOKS)
model_register("transformer_rpr", init_fn, train_fn, score_fn, infer_fn)
