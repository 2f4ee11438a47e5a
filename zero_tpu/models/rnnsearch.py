"""RNNSearch: attention-based RNN seq2seq (Bahdanau-style).

Parity target: reference models/rnnsearch.py -- bidirectional encoder
(forward RNN + backward RNN, or the CAEncoder: backward conditioned
one2one on the forward pass, ":41-54"), tanh'd initial decoder state from
the encoder feature (":65-69"), conditional-GRU attention decoder
(cond_rnn, ":108-116"), readout linear([outputs, contexts, inputs]) + tanh
(":118-124"), cell zoo via the ``cell`` config. Embeddings are NOT
sqrt-scaled and carry no timing signal (unlike the transformer family).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zero_tpu import rnns
from zero_tpu.models import common
from zero_tpu.models.base import Inference, model_register
from zero_tpu.ops import nn
from zero_tpu.ops.common import RngGen, dropout


def _emb_init(cfg):
    return common.config_initializer(cfg)


def init_fn(rng, cfg):
    init = common.config_initializer(cfg)
    cell = rnns.get_cell(cfg.cell)
    d = cfg.hidden_size
    e = cfg.embed_size
    ln = cfg.layer_norm

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

    params["forward"] = cell.init(jax.random.fold_in(rng, 10), e, d, ln, init)
    if cfg.caencoder:
        params["backward"] = rnns.init_cond_rnn(
            jax.random.fold_in(rng, 11), cfg.cell, e, d, d, ln=ln,
            weight_init=init, one2one=True, att_num_heads=cfg.num_heads)
    else:
        params["backward"] = cell.init(jax.random.fold_in(rng, 11), e, d, ln,
                                       init)

    enc_dim = d if cfg.caencoder else 2 * d
    params["decoder_init"] = rnns.init_state_params(
        jax.random.fold_in(rng, 12), cell, enc_dim, d, ln, init)
    params["decoder"] = rnns.init_cond_rnn(
        jax.random.fold_in(rng, 13), cfg.cell, e, enc_dim, d, ln=ln,
        weight_init=init, one2one=False, att_num_heads=cfg.num_heads)
    params["pre_logits"] = nn.init_linear(
        jax.random.fold_in(rng, 14), [d, enc_dim, e], e, ln=ln,
        weight_init=init)
    return params


def _tables(params, cfg):
    if cfg.shared_source_target_embedding:
        e = params["embedding"]
        return e, e, e
    soft = params["tgt_embedding"] if cfg.shared_target_softmax_embedding \
        else params["softmax_embedding"]
    return params["src_embedding"], params["tgt_embedding"], soft


def _embed(table, ids, bias):
    return jnp.take(table, ids, axis=0) + bias


def _encode(params, source, cfg, rngs, training):
    cell = rnns.get_cell(cfg.cell)
    d, ln = cfg.hidden_size, cfg.layer_norm
    mask = (source != 0).astype(jnp.float32)
    src_table, _, _ = _tables(params, cfg)
    inputs = _embed(src_table, source, params["emb_bias"])
    inputs = dropout(rngs(), inputs, cfg.dropout if training else None)

    (_, _), (out_fw, state_fw) = rnns.rnn(cell, params["forward"], inputs, d,
                                          mask=mask, ln=ln)
    rev_inputs = jnp.flip(inputs, axis=1)
    rev_mask = jnp.flip(mask, axis=1)
    if cfg.caencoder:
        (_, _), (out_bw, state_bw), _, _ = rnns.cond_rnn(
            cfg.cell, params["backward"], rev_inputs,
            jnp.flip(out_fw, axis=1), d, mask=rev_mask, ln=ln, one2one=True,
            num_heads=cfg.num_heads)
    else:
        (_, _), (out_bw, state_bw) = rnns.rnn(cell, params["backward"],
                                              rev_inputs, d, mask=rev_mask,
                                              ln=ln)
    out_bw = jnp.flip(out_bw, axis=1)

    if cfg.caencoder:
        encodes, feature = out_bw, state_bw
    else:
        encodes = jnp.concatenate([out_fw, out_bw], axis=-1)
        feature = jnp.concatenate([state_fw, state_bw], axis=-1)

    init_state = jnp.tanh(
        rnns.init_state_from(params["decoder_init"], cell, feature, ln=ln))
    return {"encodes": encodes, "mask": mask, "decoder_initializer": init_state}


def _decode_train(params, target, state, cfg, rngs, training,
                  init_state=None, mask_override=None):
    ln = cfg.layer_norm
    mask = mask_override if mask_override is not None \
        else (target != 0).astype(jnp.float32)
    _, tgt_table, soft_table = _tables(params, cfg)
    inputs = _embed(tgt_table, target, params["emb_bias"])
    inputs = jnp.pad(inputs, [(0, 0), (1, 0), (0, 0)])[:, :-1, :]  # shift
    inputs = dropout(rngs(), inputs, cfg.dropout if training else None)

    if init_state is None:
        init_state = state["decoder_initializer"]
    (_, last_state), (outputs, _), contexts, _ = rnns.cond_rnn(
        cfg.cell, params["decoder"], inputs, state["encodes"],
        cfg.hidden_size, init_state=init_state, mask=mask,
        mem_mask=state["mask"], ln=ln, one2one=False,
        num_heads=cfg.num_heads)

    feature = nn.linear(params["pre_logits"], [outputs, contexts, inputs],
                        ln=ln)
    feature = jnp.tanh(feature)
    feature = dropout(rngs(), feature, cfg.dropout if training else None)
    return feature, soft_table, mask, last_state


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
        # precompute projected memory for the decoder attention
        state["proj_memories"] = nn.linear(
            params["decoder"]["context_att"], state["encodes"], ln=ln)
        return state

    def init_cache(params, state, batch, max_len):
        # per-beam mutable state: tile the initial decoder state (the
        # beam-invariant parts of `state` stay untiled)
        h0 = state["decoder_initializer"]
        return {"h": jnp.repeat(h0, batch // h0.shape[0], axis=0)}

    def decode_step(params, prev_tok, state, cache, time):
        _, tgt_table, soft_table = _tables(params, cfg)
        x = _embed(tgt_table, prev_tok[:, 0], params["emb_bias"])
        x = jnp.where(time > 0, x, jnp.zeros_like(x))
        h, hidden, context = rnns.cond_rnn_step(
            cfg.cell, params["decoder"], cache["h"], x, state["encodes"],
            state["mask"], state["proj_memories"], ln=ln,
            num_heads=cfg.num_heads)
        feature = nn.linear(params["pre_logits"], [hidden, context, x], ln=ln)
        feature = jnp.tanh(feature)
        logits = common.output_logits(feature, soft_table)
        return logits, {"h": h}

    def decode_prefix(params, tgt_buffer, state, time):
        rngs = RngGen(None)
        # match cache semantics: every step up to `time` updates the state
        # unconditionally (the reference's dev mode appends a dummy non-pad
        # token for the same reason, search.py:139-140)
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


model_register("rnnsearch", init_fn, train_fn, score_fn, infer_fn)
