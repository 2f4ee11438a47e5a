"""DeepNMT: GNMT-style deep RNN stacks.

Parity target: reference models/deepnmt.py -- encoder layer 0 bidirectional
(optionally CAEncoder), layers 1..N unidirectional, per-layer ff projection
to embed_size with residual + optional LN (":33-84"); per-decoder-layer
initial states from the top encoder feature (":86-100"); deep decoder where
layer 0 (or all layers, use_deep_att) runs the attention cond_rnn and upper
layers consume the contexts (one2one under caencoder, else a plain RNN over
[x, c]) (":133-174"); dl4mt-style re-dict readout (":176-182").

Deviation: the reference's dev_decode path reads the pre-readout feature
(":184-185"), inconsistent with its own cache decode when dl4mt_redict is
on; here both paths use the same (redict) feature so cache == dev holds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zero_tpu import rnns
from zero_tpu.models import common
from zero_tpu.models.base import Inference, model_register
from zero_tpu.models.rnnsearch import _embed, _tables
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

    # encoder stack
    enc_layers = []
    for layer in range(cfg.num_encoder_layer):
        k = jax.random.fold_in(rng, 100 + layer)
        in_dim = e
        lp = {"forward": cell.init(jax.random.fold_in(k, 0), in_dim, d, ln,
                                   init)}
        if layer == 0:
            if cfg.caencoder:
                lp["backward"] = rnns.init_cond_rnn(
                    jax.random.fold_in(k, 1), cfg.cell, in_dim, d, d, ln=ln,
                    weight_init=init, one2one=True,
                    att_num_heads=cfg.num_heads)
            else:
                lp["backward"] = cell.init(jax.random.fold_in(k, 1), in_dim,
                                           d, ln, init)
            y_dim = d if cfg.caencoder else 2 * d
        else:
            y_dim = d
        lp["ff"] = nn.init_linear(jax.random.fold_in(k, 2), y_dim, e,
                                  weight_init=init)
        if ln:
            lp["ln"] = nn.init_layer_norm(e)
        enc_layers.append(lp)
    params["encoder"] = enc_layers
    if e != d:
        params["x_map"] = nn.init_linear(jax.random.fold_in(rng, 5), e, d,
                                         weight_init=init)
        params["x_map_ln"] = nn.init_layer_norm(d)

    z_dim = d if (cfg.caencoder and cfg.num_encoder_layer == 1) else \
        (2 * d if cfg.num_encoder_layer == 1 else d)
    # z is the top layer's hidden state: 2d only when the single layer is
    # the bidirectional one without caencoder
    params["decoder_init"] = [
        rnns.init_state_params(jax.random.fold_in(rng, 200 + l), cell, z_dim,
                               d, ln, init)
        for l in range(cfg.num_decoder_layer)]

    # decoder stack
    dec_layers = []
    for layer in range(cfg.num_decoder_layer):
        k = jax.random.fold_in(rng, 300 + layer)
        in_dim = e
        lp = {}
        if layer == 0 or cfg.use_deep_att:
            lp["cond"] = rnns.init_cond_rnn(
                jax.random.fold_in(k, 0), cfg.cell, in_dim, d, d, ln=ln,
                weight_init=init, one2one=False, att_num_heads=cfg.num_heads)
        elif cfg.caencoder:
            lp["cond"] = rnns.init_cond_rnn(
                jax.random.fold_in(k, 0), cfg.cell, in_dim, d, d, ln=ln,
                weight_init=init, one2one=True, att_num_heads=cfg.num_heads)
        else:
            lp["plain"] = cell.init(jax.random.fold_in(k, 0), in_dim + d, d,
                                    ln, init)
        lp["ff"] = nn.init_linear(jax.random.fold_in(k, 2), d, e,
                                  weight_init=init)
        if ln:
            lp["ln"] = nn.init_layer_norm(e)
        dec_layers.append(lp)
    params["decoder"] = dec_layers

    if cfg.dl4mt_redict:
        params["redict"] = nn.init_linear(jax.random.fold_in(rng, 6), e + d,
                                          e, ln=ln, weight_init=init)
    return params


def _encode(params, source, cfg, rngs, training):
    cell = rnns.get_cell(cfg.cell)
    d, ln = cfg.hidden_size, cfg.layer_norm
    mask = (source != 0).astype(jnp.float32)
    src_table, _, _ = _tables(params, cfg)
    x = _embed(src_table, source, params["emb_bias"])
    x = dropout(rngs(), x, cfg.dropout if training else None)

    z = None
    for layer, lp in enumerate(params["encoder"]):
        (_, _), (out_fw, state_fw) = rnns.rnn(cell, lp["forward"], x, d,
                                              mask=mask, ln=ln)
        if layer == 0:
            rev_x = jnp.flip(x, axis=1)
            rev_mask = jnp.flip(mask, axis=1)
            if cfg.caencoder:
                (_, _), (out_bw, state_bw), _, _ = rnns.cond_rnn(
                    cfg.cell, lp["backward"], rev_x, jnp.flip(out_fw, axis=1),
                    d, mask=rev_mask, ln=ln, one2one=True,
                    num_heads=cfg.num_heads)
                y = jnp.flip(out_bw, axis=1)
                z = state_bw
            else:
                (_, _), (out_bw, state_bw) = rnns.rnn(
                    cell, lp["backward"], rev_x, d, mask=rev_mask, ln=ln)
                y = jnp.concatenate([out_fw, jnp.flip(out_bw, axis=1)],
                                    axis=-1)
                z = jnp.concatenate([state_fw, state_bw], axis=-1)
        else:
            y = out_fw
            z = state_fw

        y = nn.linear(lp["ff"], y)
        if x.shape[-1] == y.shape[-1]:
            x = nn.residual_fn(x, y, rngs(), cfg.dropout if training else None)
        else:
            x = y
        if ln:
            x = nn.layer_norm(lp["ln"], x)

    if cfg.embed_size != d:
        x = nn.layer_norm(params["x_map_ln"], nn.linear(params["x_map"], x))

    init_states = [rnns.init_state_from(p, cell, z, ln=ln)
                   for p in params["decoder_init"]]
    return {"encodes": x, "mask": mask, "decoder_initializer": init_states}


def _decode_train(params, target, state, cfg, rngs, training,
                  init_states=None, mask_override=None):
    cell = rnns.get_cell(cfg.cell)
    d, ln = cfg.hidden_size, cfg.layer_norm
    mask = mask_override if mask_override is not None \
        else (target != 0).astype(jnp.float32)
    _, tgt_table, soft_table = _tables(params, cfg)
    inputs = _embed(tgt_table, target, params["emb_bias"])
    inputs = jnp.pad(inputs, [(0, 0), (1, 0), (0, 0)])[:, :-1, :]
    inputs = dropout(rngs(), inputs, cfg.dropout if training else None)

    if init_states is None:
        init_states = state["decoder_initializer"]

    x = inputs
    c = None
    last_states = []
    for layer, lp in enumerate(params["decoder"]):
        init_state = init_states[layer]
        if layer == 0 or cfg.use_deep_att:
            (_, last), (outputs, _), contexts, _ = rnns.cond_rnn(
                cfg.cell, lp["cond"], x, state["encodes"], d,
                init_state=init_state, mask=mask, mem_mask=state["mask"],
                ln=ln, one2one=False, num_heads=cfg.num_heads)
            c = contexts
        elif cfg.caencoder:
            (_, last), (outputs, _), _, _ = rnns.cond_rnn(
                cfg.cell, lp["cond"], x, c, d, init_state=init_state,
                mask=mask, mem_mask=mask, ln=ln, one2one=True,
                num_heads=cfg.num_heads)
        else:
            (_, last), (outputs, _) = rnns.rnn(
                cell, lp["plain"], jnp.concatenate([x, c], axis=-1), d,
                mask=mask, ln=ln, init_state=init_state)
        last_states.append(last)

        y = nn.linear(lp["ff"], outputs)
        if x.shape[-1] == y.shape[-1]:
            x = nn.residual_fn(x, y, rngs(), cfg.dropout if training else None)
        else:
            x = y
        if ln:
            x = nn.layer_norm(lp["ln"], x)

    if cfg.dl4mt_redict:
        feature = nn.linear(params["redict"],
                            jnp.concatenate([x, c], axis=-1), ln=ln)
        feature = jnp.tanh(feature)
        feature = dropout(rngs(), feature, cfg.dropout if training else None)
    else:
        feature = x
    mask_loss = (target != 0).astype(jnp.float32)
    return feature, soft_table, mask_loss, last_states


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
        # projected memories for each attending decoder layer
        projs = []
        for layer, lp in enumerate(params["decoder"]):
            if layer == 0 or cfg.use_deep_att:
                projs.append(nn.linear(lp["cond"]["context_att"],
                                       state["encodes"], ln=ln))
            else:
                projs.append(jnp.zeros((0,)))
        state["proj_memories"] = projs
        return state

    def init_cache(params, state, batch, max_len):
        return {"layers": [jnp.repeat(h0, batch // h0.shape[0], axis=0)
                           for h0 in state["decoder_initializer"]]}

    def decode_step(params, prev_tok, state, cache, time):
        _, tgt_table, soft_table = _tables(params, cfg)
        x = _embed(tgt_table, prev_tok[:, 0], params["emb_bias"])
        x = jnp.where(time > 0, x, jnp.zeros_like(x))

        c = None
        new_states = []
        for layer, lp in enumerate(params["decoder"]):
            h_ = cache["layers"][layer]
            if layer == 0 or cfg.use_deep_att:
                h, hidden, c = rnns.cond_rnn_step(
                    cfg.cell, lp["cond"], h_, x, state["encodes"],
                    state["mask"], state["proj_memories"][layer], ln=ln,
                    num_heads=cfg.num_heads)
            elif cfg.caencoder:
                vs = cell.fetch(lp["cond"]["lower"], x[:, None, :], ln)
                vs = tuple(v[:, 0] for v in vs)
                s = cell.step(lp["cond"]["lower"], h_, vs, ln)
                cc = cell.fetch(lp["cond"]["higher"], c[:, None, :], ln)
                cc = tuple(v[:, 0] for v in cc)
                h = cell.step(lp["cond"]["higher"], s, cc, ln)
                hidden = cell.get_hidden(h)
            else:
                vs = cell.fetch(lp["plain"],
                                jnp.concatenate([x, c], axis=-1)[:, None, :],
                                ln)
                vs = tuple(v[:, 0] for v in vs)
                h = cell.step(lp["plain"], h_, vs, ln)
                hidden = cell.get_hidden(h)
            new_states.append(h)

            y = nn.linear(lp["ff"], hidden)
            if x.shape[-1] == y.shape[-1]:
                x = x + y
            else:
                x = y
            if ln:
                x = nn.layer_norm(lp["ln"], x)

        if cfg.dl4mt_redict:
            feature = nn.linear(params["redict"],
                                jnp.concatenate([x, c], axis=-1), ln=ln)
            feature = jnp.tanh(feature)
        else:
            feature = x
        logits = common.output_logits(feature, soft_table)
        return logits, {"layers": new_states}

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


model_register("deepnmt", init_fn, train_fn, score_fn, infer_fn)
