"""Transformer-L0Drop: differentiable pruning of encoder outputs.

Parity target: reference models/transformer_l0drop.py. Per-position gate
log-alpha = x.w (":250"); training samples hard-concrete gates, multiplies
the encodings, restricts cross attention to surviving positions, and adds
the ramped expected-L0 penalty (":252-266"); evaluation uses mean gates.

TPU design note: the reference's eval path gathers surviving positions into
a shorter memory with a count-carrying pad slot and renormalises the softmax
over it (":103-135" + the custom dot_attention ":16-100"). Mathematically
the pad slot contributes ``dropped_count * exp(logit(k0)) * v0`` where
k0/v0 are the projections of the ZERO vector -- i.e. the compacted form is
exactly equivalent to full-length attention over encodings where dropped
positions are zeroed. We use that full-length form: it is static-shape,
gather-free, and bit-equivalent; optional static-k compaction is a later
throughput optimisation.

Deviation: the reference's score_fn runs the training graph, so scoring
samples random gates (TF random ops stay live even with dropout closed);
here scoring uses deterministic mean gates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import model_register
from zero_tpu.ops import l0norm, nn


def compact_encodings(encodes, mask, keep_score, ratio: float):
    """Static-k eval-time compaction (the reference's extract_encodes,
    transformer_l0drop.py:103-135, with a STATIC k for XLA).

    Gathers the top ceil(ratio*S) positions by keep_score (>0 survivors)
    into a shorter memory headed by a ZERO pad slot whose softmax count
    equals the number of positions left out -- so the count-renormalised
    attention equals full-length attention with dropped encodings zeroed.
    Returns (memory [B, k+1, d], mask [B, k+1], count [B, k+1]).
    Exact when k >= the survivor count; excess survivors fold into the
    pad slot (approximated as zero vectors).
    """
    import math
    s_len = mask.shape[1]
    k = min(max(int(math.ceil(s_len * ratio)), 1), s_len)

    score = keep_score * mask
    top_vals, top_idx = jax.lax.top_k(score, k)
    g_x = jnp.take_along_axis(encodes, top_idx[..., None], axis=1)
    g_mask = (top_vals > 0).astype(mask.dtype)
    g_x = g_x * g_mask[..., None].astype(encodes.dtype)

    kept = jnp.sum(g_mask, axis=1)
    total = jnp.sum(mask, axis=1)
    dropped = jnp.maximum(total - kept, 0.0)
    pad_flag = (dropped > 0).astype(mask.dtype)

    memory = jnp.concatenate(
        [jnp.zeros_like(g_x[:, :1]), g_x], axis=1)
    new_mask = jnp.concatenate([pad_flag[:, None], g_mask], axis=1)
    count = jnp.concatenate(
        [jnp.maximum(dropped, 1.0)[:, None], jnp.ones_like(g_mask)], axis=1)
    return memory, new_mask, count


def extra_init(key, cfg):
    init = common.config_initializer(cfg)
    return {"source_pruning": nn.init_linear(key, cfg.hidden_size, 1,
                                             weight_init=init)}


def post_encode(params, state, cfg, rngs, training):
    encodes = state["encodes"]
    mask = state["mask"]
    log_alpha = nn.linear(params["source_pruning"], encodes)  # [B, S, 1]
    log_alpha = log_alpha.astype(jnp.float32)

    if training:
        gates = l0norm.hard_concrete_sample(rngs(), log_alpha)
        gated = encodes * gates.astype(encodes.dtype)
        # expected-L0 penalty, per-sentence mean then batch mean (":254-256")
        penalty = l0norm.l0_norm(log_alpha)[..., 0]
        maskf = mask.astype(jnp.float32)
        penalty = jnp.sum(penalty * maskf, -1) / jnp.maximum(
            jnp.sum(maskf, -1), 1.0)
        valid = (jnp.sum(maskf, -1) > 0).astype(jnp.float32)
        penalty = jnp.sum(penalty * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        # only attend to surviving positions (":266")
        new_mask = (gates[..., 0] > 0).astype(mask.dtype) * mask
        state = dict(state, encodes=gated, mask=new_mask, l0_penalty=penalty)
    else:
        gates = l0norm.hard_concrete_mean(log_alpha)
        keep = (gates > 0).astype(encodes.dtype)
        # zero dropped encodings; equivalent to the reference's compacted
        # memory + count-renormalised softmax (see module docstring)
        gated = encodes * (gates.astype(encodes.dtype) * keep) \
            * mask[..., None].astype(encodes.dtype)
        if cfg.l0_compact_ratio > 0:
            memory, new_mask, count = compact_encodings(
                gated, mask, gates[..., 0].astype(mask.dtype),
                cfg.l0_compact_ratio)
            state = dict(state, encodes=memory, mask=new_mask, count=count)
        else:
            state = dict(state, encodes=gated)
    return state


def extra_loss(params, state, cfg, step):
    return l0norm.l0_regularization_loss(
        state["l0_penalty"], step,
        reg_scalar=cfg.l0_norm_reg_scalar,
        start_reg_ramp_up=cfg.l0_norm_start_reg_ramp_up,
        end_reg_ramp_up=cfg.l0_norm_end_reg_ramp_up,
        warm_up=cfg.l0_norm_warm_up)


HOOKS = common.LayerHooks(
    init_enc_layer=base.init_enc_layer,
    enc_layer=base.enc_layer,
    init_dec_layer=base.init_dec_layer,
    dec_layer_train=base.dec_layer_train,
    dec_layer_precompute=base.dec_layer_precompute,
    init_dec_layer_cache=base.init_dec_layer_cache,
    dec_layer_step=base.dec_layer_step,
    post_encode=post_encode,
    # base layers throughout (post_encode runs after the stack): both
    # stacks ride the ring inside the combined {'pipe','seq'} region
    seq_in_pipe_enc=True,
    seq_in_pipe_dec=True,
)

init_fn, train_fn, score_fn, infer_fn = common.make_transformer(
    HOOKS, extra_init=extra_init, extra_loss=extra_loss)
model_register("transformer_l0drop", init_fn, train_fn, score_fn, infer_fn)
