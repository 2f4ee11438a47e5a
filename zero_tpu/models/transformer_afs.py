"""Transformer-AFS: end-to-end speech translation with adaptive feature
selection and (coarse-label) CTC regularization.

Spec-driven rebuild (the reference keeps this code on its
speech_translation / st_from_scratch branches; behavioral spec from
docs/afs_speech_translation/README.md and docs/colactc/README.md, built on
the in-checkout L0Drop machinery, modules/l0norm.py):

  * frontend: log-mel frames, optional k-frame stacking
    (audio_frame_stride), linear to hidden + sinusoidal positions
  * ASR encoder: num_encoder_layer transformer layers
  * AFS: hard-concrete gates pruning ASR outputs temporally
    (input-dependent log-alpha, afs_mode='t') and optionally per feature
    dimension (global log-alpha vector, afs_mode='tf'); expected-L0
    penalties weighted by afs_l0_scalar ramp up like L0Drop
  * ST encoder: num_st_encoder_layer transformer layers over the gated
    features
  * decoder: standard transformer decoder with static caches
  * CTC head on the ASR encoder output (ctc_enable/ctc_alpha), labels =
    transcript ids, optionally folded into a coarse space by the dataset
    (CoLaCTC, coarse_label_base)

Eval-time pruning uses mean gates with dropped positions zeroed -- the
gather-free equivalence used by transformer_l0drop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from zero_tpu import dtypes
from zero_tpu.models import common, transformer as base
from zero_tpu.models.base import Inference, model_register
from zero_tpu.ops import l0norm, nn
from zero_tpu.ops.common import RngGen, dropout


def _ctc_vocab_size(cfg) -> int:
    if cfg.coarse_label_base > 0:
        return cfg.coarse_label_base + 3  # specials pass through
    return cfg.src_vocab.size()


def init_fn(rng, cfg):
    init = common.config_initializer(cfg)
    h = cfg.hidden_size
    k = max(int(cfg.audio_frame_stride), 1)
    params = {
        "frontend": nn.init_linear(jax.random.fold_in(rng, 0),
                                   cfg.audio_num_mel_bins * k, h,
                                   weight_init=init),
        "asr_encoder": [base.init_enc_layer(jax.random.fold_in(rng, 100 + l),
                                            cfg, l)
                        for l in range(cfg.num_encoder_layer)],
        "st_encoder": [base.init_enc_layer(jax.random.fold_in(rng, 200 + l),
                                           cfg, l)
                       for l in range(cfg.num_st_encoder_layer)],
        "decoder": [base.init_dec_layer(jax.random.fold_in(rng, 300 + l),
                                        cfg, l)
                    for l in range(cfg.num_decoder_layer)],
        # AFS gates
        "afs_temporal": nn.init_linear(jax.random.fold_in(rng, 1), h, 1,
                                       weight_init=init),
    }
    if cfg.afs_mode == "tf":
        params["afs_feature"] = jnp.zeros((h,), jnp.float32)

    emb_init = common.config_initializer(cfg)
    tgt_vocab = cfg.tgt_vocab.size()
    params["tgt_embedding"] = emb_init(jax.random.fold_in(rng, 2),
                                       (tgt_vocab, cfg.embed_size))
    if not cfg.shared_target_softmax_embedding:
        params["softmax_embedding"] = emb_init(jax.random.fold_in(rng, 3),
                                               (tgt_vocab, cfg.embed_size))
    params["emb_bias"] = emb_init(jax.random.fold_in(rng, 4),
                                  (cfg.embed_size,))
    if cfg.ctc_enable:
        params["ctc_head"] = nn.init_linear(jax.random.fold_in(rng, 5), h,
                                            _ctc_vocab_size(cfg),
                                            weight_init=init)
    return params


def _soft_table(params, cfg):
    if cfg.shared_target_softmax_embedding:
        return params["tgt_embedding"]
    return params["softmax_embedding"]


def _frontend(params, audio, mask, cfg, rngs, training):
    """Frame-stack, project, add positions. Returns (x [B,T',h], mask')."""
    audio = audio.astype(dtypes.compute_dtype(cfg))
    k = max(int(cfg.audio_frame_stride), 1)
    b, t, m = audio.shape
    if k > 1:
        t2 = t // k
        audio = audio[:, :t2 * k].reshape(b, t2, m * k)
        mask = mask[:, :t2 * k].reshape(b, t2, k).max(axis=-1)
    x = nn.linear(params["frontend"], audio)
    if cfg.sinusoid_posenc:
        x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)
    return x, mask


def _asr_encode(params, x, mask, cfg, rngs):
    keep = nn.masking_mask(mask)
    for p in params["asr_encoder"]:
        x = base.enc_layer(p, x, keep, cfg, rngs)
    return x


def _afs_gate(params, x, mask, cfg, rngs, training):
    """Apply temporal (+feature) hard-concrete gates.

    Returns (gated features, new mask, penalty scalar)."""
    log_alpha_t = nn.linear(params["afs_temporal"], x).astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    penalty = jnp.asarray(0.0, jnp.float32)

    if training:
        g_t = l0norm.hard_concrete_sample(rngs(), log_alpha_t)
        pen_t = l0norm.l0_norm(log_alpha_t)[..., 0]
        pen_t = jnp.sum(pen_t * maskf, -1) / jnp.maximum(jnp.sum(maskf, -1),
                                                         1.0)
        valid = (jnp.sum(maskf, -1) > 0).astype(jnp.float32)
        penalty += jnp.sum(pen_t * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    else:
        g_t = l0norm.hard_concrete_mean(log_alpha_t)

    x = x * g_t.astype(x.dtype)

    if cfg.afs_mode == "tf" and "afs_feature" in params:
        log_alpha_f = params["afs_feature"].astype(jnp.float32)
        if training:
            g_f = l0norm.hard_concrete_sample(rngs(), log_alpha_f)
            penalty += jnp.mean(l0norm.l0_norm(log_alpha_f))
        else:
            g_f = l0norm.hard_concrete_mean(log_alpha_f)
        x = x * g_f.astype(x.dtype)[None, None, :]

    if training:
        # attend only to surviving frames (L0Drop semantics)
        new_mask = (g_t[..., 0] > 0).astype(mask.dtype) * mask
        keep_score = None
    else:
        # zero-vector equivalence; mask unchanged
        x = x * ((g_t[..., 0] > 0).astype(x.dtype)
                 * maskf.astype(x.dtype))[..., None]
        new_mask = mask
        keep_score = g_t[..., 0].astype(jnp.float32) * maskf
    return x, new_mask, penalty, keep_score


def _st_encode(params, x, mask, cfg, rngs):
    keep = nn.masking_mask(mask)
    for p in params["st_encoder"]:
        x = base.enc_layer(p, x, keep, cfg, rngs)
    return x


def _encode(params, audio, mask, cfg, rngs, training,
            context=None, context_mask=None):
    x, mask = _frontend(params, audio, mask, cfg, rngs, training)
    asr_out = _asr_encode(params, x, mask, cfg, rngs)
    gated, st_mask, penalty, keep_score = _afs_gate(params, asr_out, mask,
                                                    cfg, rngs, training)
    if cfg.st_context and context is not None:
        # context-aware ST (docs/context_aware_st): run the previous
        # segment through the shared frontend/ASR/AFS stack and prepend
        # its reduced features; no CTC/penalty contribution from context
        cx, cmask = _frontend(params, context, context_mask, cfg, rngs,
                              training)
        c_asr = _asr_encode(params, cx, cmask, cfg, rngs)
        c_gated, c_st_mask, _, c_score = _afs_gate(params, c_asr, cmask, cfg,
                                                   rngs, training)
        gated = jnp.concatenate([c_gated, gated], axis=1)
        st_mask = jnp.concatenate([c_st_mask, st_mask], axis=1)
        if keep_score is not None:
            keep_score = jnp.concatenate([c_score, keep_score], axis=1)

    count = None
    if not training and cfg.l0_compact_ratio > 0:
        # static-k compaction BEFORE the ST encoder: this is where the
        # reference's ~1.4x AFS decode speedup comes from (shorter ST
        # encoder + decoder memory)
        from zero_tpu.models.transformer_l0drop import compact_encodings
        gated, st_mask, count = compact_encodings(
            gated, st_mask, keep_score, cfg.l0_compact_ratio)

    encodes = _st_encode(params, gated, st_mask, cfg, rngs)
    state = {"encodes": encodes, "mask": st_mask, "asr_out": asr_out,
             "asr_mask": mask, "afs_penalty": penalty}
    if count is not None:
        state["count"] = count
    return state


def _decode_train(params, target, state, cfg, rngs, training):
    dmask = (target != 0).astype(jnp.float32)
    x = common.embed_scaled(params["tgt_embedding"], target,
                            params["emb_bias"], cfg, dtypes.compute_dtype(cfg))
    x = common.shift_right(x)
    x = nn.add_timing_signal(x)
    x = dropout(rngs(), x, cfg.dropout if training else None)

    self_keep = nn.causal_mask(target.shape[1])
    mem_keep = nn.masking_mask(state["mask"])
    for p in params["decoder"]:
        x = base.dec_layer_train(p, x, state, self_keep, mem_keep, cfg, rngs,
                                 dmask)
    return x, dmask


def _ctc_loss(params, state, transcript, cfg):
    """CTC regularization over the ASR encoder output (CoLaCTC spec)."""
    logits = nn.linear(params["ctc_head"], state["asr_out"])
    logits = logits.astype(jnp.float32)
    logit_pad = 1.0 - state["asr_mask"].astype(jnp.float32)
    label_pad = (transcript == 0).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, transcript, label_pad,
                             blank_id=0)
    lens = jnp.maximum(jnp.sum(1.0 - label_pad, -1), 1.0)
    valid = (jnp.sum(1.0 - label_pad, -1) > 0).astype(jnp.float32)
    per_seq = per_seq / lens * valid
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(valid), 1.0)


def train_fn(params, features, cfg, rng, step=0):
    params = dtypes.cast_to_compute(params, cfg)
    rngs = RngGen(rng)
    state = _encode(params, features["audio"],
                    features["audio_mask"], cfg, rngs, True,
                    context=features.get("context"),
                    context_mask=features.get("context_mask"))
    feat, dmask = _decode_train(params, features["target"], state, cfg,
                                rngs, True)
    loss, _ = common.ce_from_feature(feat, _soft_table(params, cfg),
                                     features["target"], dmask, cfg,
                                     cfg.label_smooth)
    loss += l0norm.l0_regularization_loss(
        state["afs_penalty"], step, reg_scalar=cfg.afs_l0_scalar,
        start_reg_ramp_up=cfg.l0_norm_start_reg_ramp_up,
        end_reg_ramp_up=cfg.l0_norm_end_reg_ramp_up,
        warm_up=cfg.l0_norm_warm_up)
    if cfg.ctc_enable and "transcript" in features:
        loss += cfg.ctc_alpha * _ctc_loss(params, state,
                                          features["transcript"], cfg)
    return {"loss": loss}


def score_fn(params, features, cfg):
    params = dtypes.cast_to_compute(params, cfg)
    rngs = RngGen(None)
    state = _encode(params, features["audio"], features["audio_mask"], cfg,
                    rngs, False, context=features.get("context"),
                    context_mask=features.get("context_mask"))
    feat, dmask = _decode_train(params, features["target"], state, cfg,
                                rngs, False)
    _, per_sample = common.ce_from_feature(feat, _soft_table(params, cfg),
                                           features["target"], dmask, cfg,
                                           0.0)
    return {"score": per_sample}


def infer_fn(cfg):
    def encode(params, source):
        params = dtypes.cast_to_compute(params, cfg)
        rngs = RngGen(None)
        state = _encode(params, source["audio"], source["mask"], cfg, rngs,
                        False, context=source.get("context"),
                        context_mask=source.get("context_mask"))
        state.pop("asr_out")
        state.pop("asr_mask")
        state.pop("afs_penalty")  # 0-d scalar; not beam-tileable
        state["layers"] = [base.dec_layer_precompute(p, state["encodes"], cfg)
                           for p in params["decoder"]]
        return state

    def init_cache(params, state, batch, max_len):
        return {"layers": [base.init_dec_layer_cache(p, batch, max_len, cfg,
                                                     dtypes.compute_dtype(cfg))
                           for p in params["decoder"]]}

    def decode_step(params, prev_tok, state, cache, time):
        params = dtypes.cast_to_compute(params, cfg)
        x = common.embed_scaled(params["tgt_embedding"], prev_tok,
                                params["emb_bias"], cfg, dtypes.compute_dtype(cfg))
        x = jnp.where(time > 0, x, jnp.zeros_like(x))
        x = nn.add_timing_signal(x, time=time)
        new_caches = []
        for p, lstate, lcache in zip(params["decoder"], state["layers"],
                                     cache["layers"]):
            x, new_c = base.dec_layer_step(p, x, lstate, state, lcache, time,
                                           cfg)
            new_caches.append(new_c)
        logits = common.output_logits(x[:, 0], _soft_table(params, cfg))
        return logits, {"layers": new_caches}

    def decode_prefix(params, tgt_buffer, state, time):
        rngs = RngGen(None)
        feat, _ = _decode_train(params, tgt_buffer, state, cfg, rngs, False)
        feat = jax.lax.dynamic_slice_in_dim(
            feat, jnp.asarray(time, jnp.int32), 1, axis=1)[:, 0]
        return common.output_logits(feat, _soft_table(params, cfg))

    return Inference(encode=encode, init_cache=init_cache,
                     decode_step=decode_step, decode_prefix=decode_prefix)


model_register("transformer_afs", init_fn, train_fn, score_fn, infer_fn)
