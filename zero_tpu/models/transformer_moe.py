"""Transformer with mixture-of-experts FFNs (Switch/GShard).

An extension model the reference lacks (no MoE anywhere in the
checkout; the zoo's conditional-computation relatives are L0Drop and
CLSR). Architecture: the base post-LN transformer
(models/transformer.py, reference models/transformer.py:15-289) with
every encoder/decoder FFN replaced by a routed expert FFN
(ops/moe.py): top-1 or top-2 routing, per-row capacity, load-balance
aux loss added to the training objective (accumulator pattern of
transformer_clsr.py). Expert weights are [E, ...]-stacked and shard
over the 'expert' mesh axis (expert parallelism, parallel/mesh.py);
GSPMD inserts the token all-to-alls.

Config: moe_num_experts, moe_top_k, moe_capacity_factor,
moe_aux_weight, mesh_expert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zero_tpu import dtypes
from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import Inference, model_register
from zero_tpu.ops import attention, moe, nn
from zero_tpu.ops.common import RngGen, dropout


def _moe_args(cfg):
    mode = getattr(cfg, "moe_dispatch", "auto")
    if mode == "auto":
        # einsum everywhere: under an 'expert' axis its one-hot dispatch
        # is what GSPMD rewrites into token all-to-alls, and on a single
        # chip it MEASURES 14% faster than scatter too (E=8 bench shapes,
        # v5e: 167.1k tok/s 33.2% MFU vs 146.3k 29.1% — the [B,S,E,C]
        # one-hots are tiny at real capacities while scatter's per-row
        # scatter-add/gather serialises on the VPU). scatter remains an
        # explicit option for the huge-E/long-S regime where [B,S,E,C]
        # genuinely blows up (it is O(S*k*d + E*C*d) HBM).
        mode = "einsum"
    return dict(num_experts=int(cfg.moe_num_experts),
                top_k=int(cfg.moe_top_k),
                capacity_factor=float(cfg.moe_capacity_factor),
                dispatch=mode)


def init_enc_layer(key, cfg, layer):
    init = common.layer_initializer(cfg, layer)
    h = cfg.hidden_size
    return {
        "self": attention.init_attention(jax.random.fold_in(key, 0), h, h,
                                         self_attention=True,
                                         weight_init=init),
        "ln1": nn.init_layer_norm(h),
        "moe": moe.init_moe_ffn(jax.random.fold_in(key, 1), h,
                                cfg.filter_size, h,
                                int(cfg.moe_num_experts), weight_init=init),
        "ln2": nn.init_layer_norm(h),
    }


def init_dec_layer(key, cfg, layer):
    init = common.layer_initializer(cfg, layer)
    h = cfg.hidden_size
    return {
        "self": attention.init_attention(jax.random.fold_in(key, 0), h, h,
                                         self_attention=True,
                                         weight_init=init),
        "ln1": nn.init_layer_norm(h),
        "cross": attention.init_attention(jax.random.fold_in(key, 1), h, h,
                                          self_attention=False, d_memory=h,
                                          weight_init=init),
        "ln2": nn.init_layer_norm(h),
        "moe": moe.init_moe_ffn(jax.random.fold_in(key, 2), h,
                                cfg.filter_size, h,
                                int(cfg.moe_num_experts), weight_init=init),
        "ln3": nn.init_layer_norm(h),
    }


def init_fn(rng, cfg):
    params = common.init_embeddings(jax.random.fold_in(rng, 0), cfg)
    params["encoder"] = [init_enc_layer(jax.random.fold_in(rng, 100 + l),
                                        cfg, l)
                         for l in range(cfg.num_encoder_layer)]
    params["decoder"] = [init_dec_layer(jax.random.fold_in(rng, 200 + l),
                                        cfg, l)
                         for l in range(cfg.num_decoder_layer)]
    return params


def _enc_layer(p, x, src_keep, cfg, rngs, training, aux_sums):
    y = attention.attn_train(p["self"], x, None, src_keep, cfg.num_heads,
                             rng=rngs(), drop=cfg.attention_dropout,
                             pad_mask=src_keep[:, 0, 0, :])["output"]
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = moe.moe_ffn(p["moe"], x, rngs, cfg.relu_dropout,
                    aux_sums=aux_sums, training=training, **_moe_args(cfg))
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def _dec_layer(p, x, state, self_keep, mem_keep, cfg, rngs, training,
               aux_sums):
    y = attention.attn_train(p["self"], x, None, self_keep, cfg.num_heads,
                             rng=rngs(), drop=cfg.attention_dropout,
                             causal=True)["output"]
    x = nn.layer_norm(p["ln1"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = attention.attn_train(p["cross"], x, state["encodes"], mem_keep,
                             cfg.num_heads, rng=rngs(),
                             drop=cfg.attention_dropout,
                             pad_mask=mem_keep[:, 0, 0, :])["output"]
    x = nn.layer_norm(p["ln2"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    y = moe.moe_ffn(p["moe"], x, rngs, cfg.relu_dropout,
                    aux_sums=aux_sums, training=training, **_moe_args(cfg))
    x = nn.layer_norm(p["ln3"],
                      nn.residual_fn(x, y, rngs(), cfg.residual_dropout))
    return x


def _encode(params, source, cfg, rngs, training, aux_sums):
    dtype = dtypes.compute_dtype(cfg) if training else jnp.float32
    mask = (source != 0).astype(dtype)
    src_table, _, _ = common.emb_tables(params, cfg)
    x = common.embed_scaled(src_table, source, params["emb_bias"], cfg,
                            dtype)
    x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)
    src_keep = nn.masking_mask(mask)
    for p in params["encoder"]:
        x = _enc_layer(p, x, src_keep, cfg, rngs, training, aux_sums)
    return {"encodes": x, "mask": mask}


def _decode_train(params, target, state, cfg, rngs, training, aux_sums):
    dtype = state["encodes"].dtype
    mask = (target != 0).astype(dtype)
    _, tgt_table, soft_table = common.emb_tables(params, cfg)
    x = common.embed_scaled(tgt_table, target, params["emb_bias"], cfg,
                            dtype)
    x = common.shift_right(x)
    x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)
    self_keep = nn.causal_mask(target.shape[1])
    mem_keep = nn.masking_mask(state["mask"])
    for p in params["decoder"]:
        x = _dec_layer(p, x, state, self_keep, mem_keep, cfg, rngs,
                       training, aux_sums)
    return x, soft_table, mask


def train_fn(params, features, cfg, rng, step=0):
    rngs = RngGen(rng)
    aux_sums = []
    state = _encode(params, features["source"], cfg, rngs, True, aux_sums)
    feat, soft_table, mask = _decode_train(params, features["target"], state,
                                           cfg, rngs, True, aux_sums)
    loss, _ = common.ce_from_feature(feat, soft_table, features["target"],
                                     mask, cfg, cfg.label_smooth)
    aux = sum(aux_sums) / max(len(aux_sums), 1)
    return {"loss": loss + cfg.moe_aux_weight * aux, "moe_aux": aux}


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
            attention.cross_attn_precompute(p["cross"], state["encodes"])
            for p in params["decoder"]]
        return state

    def init_cache(params, state, batch, max_len):
        return {"layers": [attention.init_self_cache(batch, max_len,
                                                     cfg.hidden_size,
                                                     jnp.float32)
                           for _ in params["decoder"]]}

    def decode_step(params, prev_tok, state, cache, time):
        _, tgt_table, soft_table = common.emb_tables(params, cfg)
        x = common.embed_scaled(tgt_table, prev_tok, params["emb_bias"],
                                cfg, jnp.float32)
        x = jnp.where(time > 0, x, jnp.zeros_like(x))
        x = nn.add_timing_signal(x, time=time)

        rngs = RngGen(None)
        new_caches = []
        for p, lstate, lcache in zip(params["decoder"], state["layers"],
                                     cache["layers"]):
            y, new_c = attention.self_attn_step(p["self"], x, lcache, time,
                                                cfg.num_heads,
                                                use_flash=cfg.use_flash_decode)
            x = nn.layer_norm(p["ln1"], x + y)
            y, _ = attention.cross_attn_step(p["cross"], x, lstate,
                                             state["mask"], cfg.num_heads)
            x = nn.layer_norm(p["ln2"], x + y)
            y = moe.moe_ffn(p["moe"], x, training=False, **_moe_args(cfg))
            x = nn.layer_norm(p["ln3"], x + y)
            new_caches.append(new_c)
        logits = common.output_logits(x[:, 0], soft_table)
        return logits, {"layers": new_caches}

    def decode_prefix(params, tgt_buffer, state, time):
        rngs = RngGen(None)
        feat, soft_table, _ = _decode_train(params, tgt_buffer, state, cfg,
                                            rngs, False, None)
        feat = jax.lax.dynamic_slice_in_dim(
            feat, jnp.asarray(time, jnp.int32), 1, axis=1)[:, 0]
        return common.output_logits(feat, soft_table)

    return Inference(encode=encode, init_cache=init_cache,
                     decode_step=decode_step, decode_prefix=decode_prefix)


model_register("transformer_moe", init_fn, train_fn, score_fn, infer_fn)
