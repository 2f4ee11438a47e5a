"""RNNSearch with deep attention (TPAMI).

Parity target: reference models/rnnsearch_deepatt.py -- encoder is an
alternating-direction one2one cond_rnn stack over the previous layer's
hidden sequence (":68-128"); the decoder is a custom scan where each
timestep runs ``depth`` (attention -> higher-cell) stages sharing one
projected memory, with a per-stage attention module (":132-237"); readout
is linear([outputs, all-depth contexts, inputs]) + tanh (":289-292").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zero_tpu import rnns
from zero_tpu.models import common
from zero_tpu.models.base import Inference, model_register
from zero_tpu.models.rnnsearch import _embed, _tables
from zero_tpu.ops import attention as attn_mod
from zero_tpu.ops import nn
from zero_tpu.ops.common import RngGen, dropout


def init_fn(rng, cfg):
    init = common.config_initializer(cfg)
    cell = rnns.get_cell(cfg.cell)
    d, e, ln = cfg.hidden_size, cfg.embed_size, cfg.layer_norm

    params = {}
    src_vocab, tgt_vocab = cfg.src_vocab.size(), cfg.tgt_vocab.size()
    if cfg.shared_source_target_embedding:
        params["embedding"] = init(jax.random.fold_in(rng, 0), (src_vocab, e))
    else:
        params["src_embedding"] = init(jax.random.fold_in(rng, 1),
                                       (src_vocab, e))
        params["tgt_embedding"] = init(jax.random.fold_in(rng, 2),
                                       (tgt_vocab, e))
        if not cfg.shared_target_softmax_embedding:
            params["softmax_embedding"] = init(jax.random.fold_in(rng, 3),
                                               (tgt_vocab, e))
    params["emb_bias"] = init(jax.random.fold_in(rng, 4), (e,))

    # encoder: layer 0 plain rnn; layers 1..N one2one cond_rnn stacks
    params["enc0"] = cell.init(jax.random.fold_in(rng, 10), e, d, ln, init)
    params["encoder"] = [
        rnns.init_cond_rnn(jax.random.fold_in(rng, 100 + l), cfg.cell, e, d,
                           d, ln=ln, weight_init=init, one2one=True,
                           att_num_heads=cfg.num_heads)
        for l in range(cfg.num_encoder_layer)]

    params["decoder_init"] = rnns.init_state_params(
        jax.random.fold_in(rng, 11), cell, d, d, ln, init)

    # decoder: one lower cell, `depth` higher cells + per-depth attention,
    # one shared memory projection
    depth = cfg.num_decoder_layer
    params["dec_lower"] = cell.init(jax.random.fold_in(rng, 12), e, d, ln,
                                    init)
    params["dec_higher"] = [
        cell.init(jax.random.fold_in(rng, 400 + l), d, d, ln, init)
        for l in range(depth)]
    params["dec_att"] = [
        attn_mod.init_additive_attention(jax.random.fold_in(rng, 500 + l),
                                         d, d, d, num_heads=cfg.num_heads,
                                         weight_init=init)
        for l in range(depth)]
    params["context_att"] = nn.init_linear(jax.random.fold_in(rng, 13), d, d,
                                           bias=False, ln=ln,
                                           weight_init=init)
    params["ff"] = nn.init_linear(jax.random.fold_in(rng, 14),
                                  [d, depth * d, e], e, ln=ln,
                                  weight_init=init)
    return params


def _encode(params, source, cfg, rngs, training):
    cell = rnns.get_cell(cfg.cell)
    d, ln = cfg.hidden_size, cfg.layer_norm
    mask = (source != 0).astype(jnp.float32)
    src_table, _, _ = _tables(params, cfg)
    x = _embed(src_table, source, params["emb_bias"])
    x = dropout(rngs(), x, cfg.dropout if training else None)

    (_, _), (h, z) = rnns.rnn(cell, params["enc0"], x, d, mask=mask, ln=ln)
    for layer, lp in enumerate(params["encoder"]):
        is_reverse = (layer % 2 == 0)  # reference layers 1,3,..: layer%2==1
        xin = jnp.flip(x, axis=1) if is_reverse else x
        hin = jnp.flip(h, axis=1) if is_reverse else h
        min_ = jnp.flip(mask, axis=1) if is_reverse else mask
        (_, _), (h, z), _, _ = rnns.cond_rnn(
            cfg.cell, lp, xin, hin, d, mask=min_, ln=ln, one2one=True,
            num_heads=cfg.num_heads)
        h = jnp.flip(h, axis=1) if is_reverse else h

    init_state = rnns.init_state_from(params["decoder_init"], cell, z, ln=ln)
    return {"encodes": h, "mask": mask, "decoder_initializer": init_state}


def _dec_stage(params, s, memory, mem_mask, proj_memories, cfg, m=None):
    """Run the `depth` attention->higher-cell stages from state s.

    Returns (final state, list of contexts)."""
    cell = rnns.get_cell(cfg.cell)
    ln = cfg.layer_norm
    ctxs = []
    for layer in range(cfg.num_decoder_layer):
        vle = attn_mod.additive_attention(
            params["dec_att"][layer], cell.get_hidden(s), memory, mem_mask,
            num_heads=cfg.num_heads, proj_memory=proj_memories)
        c = vle["output"]
        ctxs.append(c)
        cc = cell.fetch(params["dec_higher"][layer], c[:, None, :], ln)
        cc = tuple(v[:, 0] for v in cc)
        ss = cell.step(params["dec_higher"][layer], s, cc, ln)
        if m is not None:
            ss = m * ss + (1.0 - m) * s
        s = ss
    return s, ctxs


def _decode_train(params, target, state, cfg, rngs, training,
                  init_state=None, mask_override=None):
    cell = rnns.get_cell(cfg.cell)
    d, ln = cfg.hidden_size, cfg.layer_norm
    mask = mask_override if mask_override is not None \
        else (target != 0).astype(jnp.float32)
    _, tgt_table, soft_table = _tables(params, cfg)
    inputs = _embed(tgt_table, target, params["emb_bias"])
    inputs = jnp.pad(inputs, [(0, 0), (1, 0), (0, 0)])[:, :-1, :]
    inputs = dropout(rngs(), inputs, cfg.dropout if training else None)

    if init_state is None:
        init_state = state["decoder_initializer"]
    memory = state["encodes"]
    mem_mask = state["mask"]
    proj_memories = nn.linear(params["context_att"], memory, ln=ln)

    fetched = cell.fetch(params["dec_lower"], inputs, ln)
    xs = tuple(jnp.swapaxes(v, 0, 1) for v in fetched)
    mask_t = jnp.swapaxes(mask, 0, 1)[..., None]

    def step(h_, inp):
        m, vs = inp
        s = cell.step(params["dec_lower"], h_, vs, ln)
        s = m * s + (1.0 - m) * h_
        h, ctxs = _dec_stage(params, s, memory, mem_mask, proj_memories,
                             cfg, m=m)
        return h, (h, jnp.concatenate(ctxs, axis=-1))

    last, (outputs, contexts) = jax.lax.scan(step, init_state, (mask_t, xs))
    outputs = jnp.swapaxes(outputs, 0, 1)
    contexts = jnp.swapaxes(contexts, 0, 1)

    hidden = cell.get_hidden(outputs)
    feature = nn.linear(params["ff"], [hidden, contexts, inputs], ln=ln)
    feature = jnp.tanh(feature)
    feature = dropout(rngs(), feature, cfg.dropout if training else None)
    mask_loss = (target != 0).astype(jnp.float32)
    return feature, soft_table, mask_loss, last


def train_fn(params, features, cfg, rng, step=0):
    rngs = RngGen(rng)
    state = _encode(params, features["source"], cfg, rngs, True)
    feat, soft_table, mask, _ = _decode_train(params, features["target"],
                                              state, cfg, rngs, True)
    loss, _ = common.ce_from_feature(feat, soft_table, features["target"],
                                     mask, cfg, cfg.label_smooth)
    return {"loss": loss}


def score_fn(params, features, cfg):
    rngs = RngGen(None)
    state = _encode(params, features["source"], cfg, rngs, False)
    feat, soft_table, mask, _ = _decode_train(params, features["target"],
                                              state, cfg, rngs, False)
    _, per_sample = common.ce_from_feature(feat, soft_table,
                                           features["target"], mask, cfg,
                                           0.0)
    return {"score": per_sample}


def infer_fn(cfg):
    cell = rnns.get_cell(cfg.cell)
    ln = cfg.layer_norm

    def encode(params, source):
        rngs = RngGen(None)
        state = _encode(params, source, cfg, rngs, False)
        state["proj_memories"] = nn.linear(params["context_att"],
                                           state["encodes"], ln=ln)
        return state

    def init_cache(params, state, batch, max_len):
        h0 = state["decoder_initializer"]
        return {"h": jnp.repeat(h0, batch // h0.shape[0], axis=0)}

    def decode_step(params, prev_tok, state, cache, time):
        _, tgt_table, soft_table = _tables(params, cfg)
        x = _embed(tgt_table, prev_tok[:, 0], params["emb_bias"])
        x = jnp.where(time > 0, x, jnp.zeros_like(x))
        vs = cell.fetch(params["dec_lower"], x[:, None, :], ln)
        vs = tuple(v[:, 0] for v in vs)
        s = cell.step(params["dec_lower"], cache["h"], vs, ln)
        h, ctxs = _dec_stage(params, s, state["encodes"], state["mask"],
                             state["proj_memories"], cfg)
        feature = nn.linear(params["ff"],
                            [cell.get_hidden(h),
                             jnp.concatenate(ctxs, axis=-1), x], ln=ln)
        feature = jnp.tanh(feature)
        logits = common.output_logits(feature, soft_table)
        return logits, {"h": h}

    def decode_prefix(params, tgt_buffer, state, time):
        rngs = RngGen(None)
        positions = jnp.arange(tgt_buffer.shape[1])[None, :]
        mask = (positions <= time).astype(jnp.float32) \
            * jnp.ones_like(tgt_buffer, jnp.float32)
        feat, soft_table, _, _ = _decode_train(params, tgt_buffer, state,
                                               cfg, rngs, False,
                                               mask_override=mask)
        feat = jax.lax.dynamic_slice_in_dim(
            feat, jnp.asarray(time, jnp.int32), 1, axis=1)[:, 0]
        return common.output_logits(feat, soft_table)

    return Inference(encode=encode, init_cache=init_cache,
                     decode_step=decode_step, decode_prefix=decode_prefix)


model_register("rnnsearch_deepatt", init_fn, train_fn, score_fn, infer_fn)
