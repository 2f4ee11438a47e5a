"""Transformer-AAN: decoder self-attention replaced by average attention.

Parity target: reference models/transformer_aan.py -- strategy dispatch
(":92-117": 'aan' cumulative average via the aan weight matrix or cumsum),
optional FFN on the averaged path (use_ffn), the input/forget gating layer
(":185-189"), and the O(1) decode cache holding the running sum of layer
inputs (":109-113"). Cross attention and FFN sublayers are standard.
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
    p = {
        "z_project": nn.init_linear(jax.random.fold_in(key, 0), 2 * h, 2 * h,
                                    weight_init=init),
        "ln1": nn.init_layer_norm(h),
        "cross": attention.init_attention(jax.random.fold_in(key, 1), h, h,
                                          self_attention=False, d_memory=h,
                                          weight_init=init),
        "ln2": nn.init_layer_norm(h),
        "ffn": nn.init_ffn(jax.random.fold_in(key, 2), h, cfg.filter_size, h,
                           weight_init=init),
        "ln3": nn.init_layer_norm(h),
    }
    if cfg.use_ffn:
        p["aan_ffn"] = nn.init_ffn(jax.random.fold_in(key, 3), h,
                                   cfg.filter_size, h, weight_init=init)
    return p


def _gate(p, x, y):
    """Input/forget gating: z = linear([x, y]); y' = sig(i)*x + sig(f)*y
    (transformer_aan.py:185-189)."""
    z = nn.linear(p["z_project"], jnp.concatenate([x, y], axis=-1))
    i, f = jnp.split(z, 2, axis=-1)
    return jax.nn.sigmoid(i) * x + jax.nn.sigmoid(f) * y


def _aan_block_train(p, x, tgt_mask, cfg, rngs):
    from zero_tpu.parallel import ring
    if ring.in_manual_seq():
        # seq-manual pipeline region: x is a [B, L/n, d] local block and
        # tgt_mask the full [B, L] mask -- the cumulative average runs
        # as a seq-parallel prefix mean
        x_fwd = ring.seq_cummean_manual(x, tgt_mask,
                                        masked=bool(cfg.aan_mask))
    else:
        # O(L) cumsum form of the cumulative (masked) mean -- equal to
        # einsum(nn.aan_weight(mask), x) without the [B, L, L] matmul
        x_fwd = nn.aan_cummean(x, tgt_mask, masked=bool(cfg.aan_mask))
    if cfg.use_ffn:
        y = nn.ffn(p["aan_ffn"], x_fwd, rngs(), cfg.relu_dropout)
    else:
        y = x_fwd
    return _gate(p, x, y)


def dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs, tgt_mask):
    y = _aan_block_train(p, x, tgt_mask, cfg, rngs)
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = attention.attn_train(p["cross"], x, state["encodes"], mem_keep,
                             cfg.num_heads, rng=rngs(),
                             drop=cfg.attention_dropout)["output"]
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = nn.ffn(p["ffn"], x, rngs(), cfg.relu_dropout)
    x = nn.layer_norm(p["ln3"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def init_dec_layer_cache(p, batch, max_len, cfg, dtype):
    # O(1) running-sum cache (transformer_aan.py:79-88: 'aan' zeros [B,1,h])
    return {"aan": jnp.zeros((batch, 1, cfg.hidden_size), dtype)}


def dec_layer_step(p, x_t, layer_state, state, cache, time, cfg):
    new_sum = cache["aan"] + x_t
    x_fwd = new_sum / (time + 1).astype(x_t.dtype)
    if cfg.use_ffn:
        y = nn.ffn(p["aan_ffn"], x_fwd)
    else:
        y = x_fwd
    y = _gate(p, x_t, y)
    x_t = nn.layer_norm(p["ln1"], x_t + y)
    y, _ = attention.cross_attn_step(p["cross"], x_t, layer_state,
                                     state["mask"], cfg.num_heads)
    x_t = nn.layer_norm(p["ln2"], x_t + y)
    y = nn.ffn(p["ffn"], x_t)
    x_t = nn.layer_norm(p["ln3"], x_t + y)
    return x_t, {"aan": new_sum}


HOOKS = common.LayerHooks(
    init_enc_layer=base.init_enc_layer,
    enc_layer=base.enc_layer,
    init_dec_layer=init_dec_layer,
    dec_layer_train=dec_layer_train,
    dec_layer_precompute=base.dec_layer_precompute,
    init_dec_layer_cache=init_dec_layer_cache,
    dec_layer_step=dec_layer_step,
    # encoder = base (ring); the AAN block rides the seq-parallel prefix
    # mean and cross-attention reads replicated memory
    seq_in_pipe_enc=True,
    seq_in_pipe_dec=True,
)

init_fn, train_fn, score_fn, infer_fn = common.make_transformer(HOOKS)
model_register("transformer_aan", init_fn, train_fn, score_fn, infer_fn)
