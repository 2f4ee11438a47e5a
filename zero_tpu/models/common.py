"""Shared transformer-family skeleton: embeddings, encoder/decoder drivers,
loss, and the static-cache inference API.

The reference duplicates this scaffolding across its 7 transformer variants
(models/transformer*.py); here variants supply a ``LayerHooks`` bundle and
share one skeleton, so the cache/dev-mode/loss semantics are identical by
construction.

Semantics preserved from the reference base model (models/transformer.py):
  * embeddings scaled by sqrt(hidden) plus one bias shared between source
    and target sides (tf AUTO_REUSE makes encoder/decoder 'bias' the same
    variable, transformer.py:27+102)
  * decoder-input shift-right after the bias add, so position 0 input is
    the zero vector + timing signal (transformer.py:107-111)
  * sharing flags: shared_source_target_embedding ties all three tables;
    shared_target_softmax_embedding ties softmax to target
    (transformer.py:22-27, 186-192)
  * label-smoothed CE minus normalizer, per-sentence mean then batch mean,
    computed in fp32 (transformer.py:196-216)
  * ``remove_invalid_seq`` (util.py:274-287) is intentionally dropped:
    it strips all-pad columns, a TF dynamic-shape trick; padding is fully
    masked here and static shapes are required for XLA.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from zero_tpu import dtypes
from zero_tpu.models.base import Inference
from zero_tpu.ops import initializers as inits
from zero_tpu.ops import nn
from zero_tpu.ops import common as ops_common
from zero_tpu.ops.common import (RngGen, dropout, label_smooth_loss,
                                 sentence_mean_loss)


class LayerHooks(NamedTuple):
    """Per-variant layer constructors/applications.

    All apply hooks receive cfg and a RngGen for dropout; decode hooks are
    dropout-free (inference).
    """
    init_enc_layer: Callable  # (key, cfg, layer) -> params
    enc_layer: Callable       # (p, x, src_keep, cfg, rngs) -> x
    init_dec_layer: Callable  # (key, cfg, layer) -> params
    dec_layer_train: Callable  # (p, x, state, self_keep, mem_keep, cfg, rngs, tgt_mask) -> x
    dec_layer_precompute: Callable  # (p, encodes, cfg) -> layer_state
    init_dec_layer_cache: Callable  # (p, batch, max_len, cfg, dtype) -> cache
    dec_layer_step: Callable  # (p, x_t, layer_state, state, cache, time, cfg) -> (x_t, cache)
    # optional encoder-output postprocessor (e.g. L0Drop): (params, state, cfg, rngs, training) -> state
    post_encode: Optional[Callable] = None
    # False for variants whose decode self-attention the fused pool kernel
    # cannot serve (RPR's relative-position tables; ReLA is served via the
    # kernel's relu mode): on TPU they keep the classic gathered cache;
    # the XLA ancestry path would be slower than the gather it avoids
    # (r3 A/B: 104 vs 235 sent/s at B=32)
    pool_kernel: bool = True
    # optional post-stack transforms (fixup's trailing shift/scale):
    init_enc_post: Optional[Callable] = None  # (key, cfg) -> params
    enc_post: Optional[Callable] = None       # (p, x) -> x
    init_dec_post: Optional[Callable] = None  # (key, cfg) -> params
    dec_post: Optional[Callable] = None       # (p, x) -> x
    # SP-inside-PP capability: True when every attention in this stack's
    # layer body is ring-capable (routes through the manual ring body --
    # or attends over replicated memory -- inside the combined
    # {'pipe','seq'} manual region, parallel/pipe.py). A stack flagged
    # False keeps the dense fallback when both axes are active.
    seq_in_pipe_enc: bool = False
    seq_in_pipe_dec: bool = False


def config_initializer(cfg):
    return inits.get_initializer(cfg.initializer, cfg.initializer_gain)


def layer_initializer(cfg, layer: int):
    """Depth-scaled per-layer initializer when deep_transformer_init is on
    (reference transformer.py:37-44), else the config initializer."""
    if cfg.deep_transformer_init:
        return inits.depth_scaled(layer, cfg.initializer_gain)
    return config_initializer(cfg)


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

def init_embeddings(key, cfg, zero_softmax: bool = False):
    """Embedding tables per the sharing flags + the shared scale bias.

    zero_softmax: fixup zero-initialises the softmax table
    (transformer_fixup.py:201)."""
    emb_init = inits.normal(cfg.hidden_size ** -0.5)
    params = {}
    src_vocab = cfg.src_vocab.size()
    tgt_vocab = cfg.tgt_vocab.size()
    if cfg.shared_source_target_embedding:
        params["embedding"] = emb_init(jax.random.fold_in(key, 0),
                                       (src_vocab, cfg.embed_size))
    else:
        params["src_embedding"] = emb_init(jax.random.fold_in(key, 1),
                                           (src_vocab, cfg.embed_size))
        params["tgt_embedding"] = emb_init(jax.random.fold_in(key, 2),
                                           (tgt_vocab, cfg.embed_size))
        if not cfg.shared_target_softmax_embedding:
            # fixup zero-initialises a *separate* softmax table; with
            # sharing on, the tied table keeps its init (tf AUTO_REUSE
            # ignores the zeros initializer, transformer_fixup.py:350-356)
            init = inits.zeros() if zero_softmax else emb_init
            params["softmax_embedding"] = init(jax.random.fold_in(key, 3),
                                               (tgt_vocab, cfg.embed_size))
    # one bias shared by source and target sides (AUTO_REUSE artifact)
    params["emb_bias"] = config_initializer(cfg)(
        jax.random.fold_in(key, 4), (cfg.embed_size,))
    return params


def emb_tables(params, cfg, zero_softmax: bool = False):
    """Resolve (src, tgt, softmax) tables under the sharing flags."""
    if cfg.shared_source_target_embedding:
        e = params["embedding"]
        return e, e, e
    src = params["src_embedding"]
    tgt = params["tgt_embedding"]
    if not cfg.shared_target_softmax_embedding:
        soft = params["softmax_embedding"]
    else:
        soft = tgt
    return src, tgt, soft


def embed_scaled(table, ids, bias, cfg, dtype):
    """gather(emb) * sqrt(hidden) + bias (transformer.py:29-30)."""
    x = jnp.take(table, ids, axis=0).astype(dtype)
    x = x * (cfg.hidden_size ** 0.5)
    return x + bias.astype(dtype)


def shift_right(x):
    """Prepend a zero vector and drop the last position
    (transformer.py:107-111; applied post-bias, so the zero survives)."""
    return jnp.pad(x, [(0, 0), (1, 0), (0, 0)])[:, :-1, :]


def remat_policy(cfg):
    """Resolve cfg.remat_policy to a jax.checkpoint policy.

    "nothing" (default) = full recompute: minimum memory, the backward
    re-runs each layer's whole forward (~+25% step FLOPs). "dots" =
    dots_with_no_batch_dims_saveable: layer matmul outputs (projections,
    FFN) stay resident and only elementwise ops + the [B,H,L,L]
    attention scores are recomputed -- most of remat's memory win for a
    fraction of its FLOP cost (docs/mfu.md). "dots_all" additionally
    saves batched dots (the attention score/context matmuls)."""
    name = str(getattr(cfg, "remat_policy", "nothing") or "nothing")
    if name == "nothing":
        return None
    table = {
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        "dots_all": jax.checkpoint_policies.dots_saveable,
    }
    if name not in table:
        raise ValueError("unknown remat_policy %r (nothing|dots|dots_all)"
                         % name)
    return table[name]


def output_logits(feature, softmax_table):
    """Weight-tied softmax logits in fp32 (transformer.py:190-196)."""
    logits = jnp.einsum("...d,vd->...v", feature,
                        softmax_table.astype(feature.dtype))
    return logits.astype(jnp.float32)


def chunked_tied_ce(feature, soft_table, labels, factor, chunk_tokens):
    """Per-position label-smoothed CE without persisting full logits.

    The [B*L, V] fp32 logits tensor of a WMT-scale step is multi-GB; kept
    alive for the backward pass it dominates the step's HBM traffic. This
    computes the tied-softmax CE in ``chunk_tokens``-row chunks under
    jax.checkpoint: the forward keeps only the per-position centropy, and
    the backward recomputes each chunk's logits (one extra d*V matmul per
    token, a few % FLOPs, for multi-GB less traffic). Per-position math is
    IDENTICAL to smoothed_centropy(output_logits(...)) -- chunking over
    positions changes nothing numerically.

    feature: [B, L, d] compute dtype; returns centropy [B, L] fp32.
    """
    b, l, d = feature.shape
    n = b * l
    xf = feature.reshape(n, d)
    lf = labels.reshape(n).astype(jnp.int32)
    chunk = max(1, min(int(chunk_tokens), n))
    pad = (-n) % chunk
    if pad:
        xf = jnp.concatenate([xf, jnp.zeros((pad, d), xf.dtype)], axis=0)
        lf = jnp.concatenate([lf, jnp.zeros((pad,), lf.dtype)], axis=0)
    nc = (n + pad) // chunk

    @jax.checkpoint
    def _chunk_ce(xc, lc, table):
        # reduction-form CE: the chunk's logits feed only per-token
        # reductions, so the [chunk, V] fp32 log-probs never exist
        return ops_common.smoothed_centropy_reduced(
            output_logits(xc, table), lc, factor)

    def body(_, xl):
        xc, lc = xl
        return None, _chunk_ce(xc, lc, soft_table)

    _, cent = jax.lax.scan(
        body, None, (xf.reshape(nc, chunk, d), lf.reshape(nc, chunk)))
    return cent.reshape(-1)[:n].reshape(b, l)


def ce_from_feature(feature, soft_table, labels, mask, cfg, factor):
    """Tied-softmax label-smoothed CE from decoder features: the chunked
    no-persistent-logits path when cfg.loss_chunk_tokens > 0, the plain
    full-logits path otherwise. Returns (scalar loss, per-sentence [B])."""
    chunk = int(getattr(cfg, "loss_chunk_tokens", 0) or 0)
    if chunk > 0:
        return sentence_mean_loss(
            chunked_tied_ce(feature, soft_table, labels, factor, chunk),
            mask)
    return label_smooth_loss(output_logits(feature, soft_table), labels,
                             mask, factor)


# ---------------------------------------------------------------------------
# skeleton model
# ---------------------------------------------------------------------------

def make_transformer(hooks: LayerHooks, zero_softmax: bool = False,
                     extra_init: Optional[Callable] = None,
                     extra_loss: Optional[Callable] = None):
    """Build (init_fn, train_fn, score_fn, infer_fn) from layer hooks.

    extra_init(key, cfg) -> dict merged into params (e.g. L0Drop gate).
    extra_loss(params, aux, cfg, step) -> scalar added to the loss (e.g.
    expected-L0 penalty); ``aux`` is whatever post_encode stashed in state.
    """

    def _scan_layers(cfg):
        return bool(getattr(cfg, "scan_layers", False))

    def init_fn(rng, cfg):
        params = init_embeddings(jax.random.fold_in(rng, 0), cfg, zero_softmax)
        params["encoder"] = [
            hooks.init_enc_layer(jax.random.fold_in(rng, 100 + l), cfg, l)
            for l in range(cfg.num_encoder_layer)]
        params["decoder"] = [
            hooks.init_dec_layer(jax.random.fold_in(rng, 200 + l), cfg, l)
            for l in range(cfg.num_decoder_layer)]
        if _scan_layers(cfg):
            # stack per-layer trees into [L, ...] leaves so training can
            # lax.scan over the stacks (values identical to the unrolled
            # layout; decode slices layers back out)
            params["encoder"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *params["encoder"])
            params["decoder"] = jax.tree.map(
                lambda *xs: jnp.stack(xs), *params["decoder"])
        if hooks.init_enc_post is not None:
            params["enc_post"] = hooks.init_enc_post(
                jax.random.fold_in(rng, 400), cfg)
        if hooks.init_dec_post is not None:
            params["dec_post"] = hooks.init_dec_post(
                jax.random.fold_in(rng, 401), cfg)
        if extra_init is not None:
            params.update(extra_init(jax.random.fold_in(rng, 300), cfg))
        return params

    # remat: recompute each layer in the backward pass (use_remat). Dropout
    # keys are pre-drawn OUTSIDE the checkpointed fn and passed explicitly,
    # so the remat re-trace consumes identical keys (a closure-held RngGen
    # would advance again and desynchronise the dropout masks).
    _REMAT_KEYS = 10  # upper bound on dropout sites per layer

    def _draw_keys(rngs):
        return [rngs() for _ in range(_REMAT_KEYS)]

    def _use_remat(cfg, training):
        return bool(getattr(cfg, "use_remat", False)) and training

    def _enc_layer_plain(p, x, src_keep, keys, cfg):
        it = iter(keys)
        return hooks.enc_layer(p, x, src_keep, cfg, lambda: next(it))

    def _dec_layer_plain(p, x, state, self_keep, mem_keep, tgt_mask, keys,
                         cfg):
        it = iter(keys)
        return hooks.dec_layer_train(p, x, state, self_keep, mem_keep, cfg,
                                     lambda: next(it), tgt_mask)

    def _enc_layer_remat(p, x, src_keep, keys, cfg):
        return jax.checkpoint(_enc_layer_plain, static_argnums=(4,),
                              policy=remat_policy(cfg))(
            p, x, src_keep, keys, cfg)

    def _dec_layer_remat(p, x, state, self_keep, mem_keep, tgt_mask, keys,
                         cfg):
        return jax.checkpoint(_dec_layer_plain, static_argnums=(7,),
                              policy=remat_policy(cfg))(
            p, x, state, self_keep, mem_keep, tgt_mask, keys, cfg)

    def _stacked_keys(rngs, num_layers):
        """[L, NKEYS, key] stacked dropout keys for scan bodies, or None
        when the rng is inactive (eval/score: dropout no-op)."""
        if rngs() is None:
            return None
        return jnp.stack([jnp.stack(_draw_keys(rngs))
                          for _ in range(num_layers)])

    def _layer_rngs(keys_l):
        it = iter([keys_l[i] for i in range(_REMAT_KEYS)])
        return lambda: next(it)

    def _scan_stack(layer_fn, x, stacked_params, keys, use_remat, policy):
        """lax.scan ``layer_fn`` over stacked per-layer params.

        layer_fn(p_l, x, rngs) -> x. Dropout keys are explicit scan inputs
        so remat re-traces consume identical masks."""
        if keys is not None:
            def inner(p_l, x, keys_l):
                return layer_fn(p_l, x, _layer_rngs(keys_l))
            if use_remat:
                inner = jax.checkpoint(inner, policy=policy)

            def sb(carry, inp):
                p_l, keys_l = inp
                return inner(p_l, carry, keys_l), None
            out, _ = jax.lax.scan(sb, x, (stacked_params, keys))
        else:
            def inner(p_l, x):
                return layer_fn(p_l, x, lambda: None)
            if use_remat:
                inner = jax.checkpoint(inner, policy=policy)

            def sb(carry, p_l):
                return inner(p_l, carry), None
            out, _ = jax.lax.scan(sb, x, stacked_params)
        return out

    def _layer_slices(stacked, num_layers):
        """Per-layer views of a stacked params tree (decode paths)."""
        if isinstance(stacked, list):
            return stacked
        return [jax.tree.map(lambda a: a[l], stacked)
                for l in range(num_layers)]

    def _apply_stack(layer_fn, x, stacked_params, keys, use_remat,
                     num_layers, cfg, consts, seq_in_pipe=False):
        """Stacked-layer application: pipeline-parallel over the 'pipe'
        mesh axis when active and divisible, plain lax.scan otherwise.

        layer_fn(p_l, h, rngs, consts) with ``consts`` a pytree of
        layer-invariant tensors; under PP, batch-leading const leaves are
        sliced to the current microbatch's rows (parallel/pipe.py).
        seq_in_pipe carries the hooks' declared SP-in-PP capability."""
        from zero_tpu.parallel import pipe as pipe_mod
        mb = int(getattr(cfg, "pp_microbatches", 0))
        policy = remat_policy(cfg)
        if pipe_mod.pipe_eligible(num_layers, x.shape[0], mb):
            return pipe_mod.pipeline_stack(
                layer_fn, x, stacked_params, keys, consts,
                microbatches=mb, use_remat=use_remat,
                remat_policy=policy, seq_in_pipe=seq_in_pipe)
        return _scan_stack(lambda p_l, h, r: layer_fn(p_l, h, r, consts),
                           x, stacked_params, keys, use_remat, policy)

    # -- encoder ------------------------------------------------------------
    def _encode(params, source, cfg, rngs, dtype, training):
        mask = (source != 0).astype(dtype)
        src_table, _, _ = emb_tables(params, cfg, zero_softmax)
        x = embed_scaled(src_table, source, params["emb_bias"], cfg, dtype)
        x = nn.add_timing_signal(x)
        x = dropout(rngs(), x, cfg.dropout if training else None)

        src_keep = nn.masking_mask(mask)
        if _scan_layers(cfg):
            keys = _stacked_keys(rngs, cfg.num_encoder_layer) \
                if training else None
            x = _apply_stack(
                lambda p_l, h, r, c: hooks.enc_layer(p_l, h, c["src_keep"],
                                                     cfg, r),
                x, params["encoder"], keys, _use_remat(cfg, training),
                cfg.num_encoder_layer, cfg, {"src_keep": src_keep},
                seq_in_pipe=hooks.seq_in_pipe_enc)
        else:
            for p in params["encoder"]:
                if _use_remat(cfg, training):
                    x = _enc_layer_remat(p, x, src_keep, _draw_keys(rngs),
                                         cfg)
                else:
                    x = hooks.enc_layer(p, x, src_keep, cfg, rngs)
        if hooks.enc_post is not None:
            x = hooks.enc_post(params["enc_post"], x)

        state = {"encodes": x, "mask": mask}
        if hooks.post_encode is not None:
            state = hooks.post_encode(params, state, cfg, rngs, training)
        return state

    # -- decoder (training / scoring: full sequence) -------------------------
    def _decode_train(params, target, state, cfg, rngs, dtype, training):
        mask = (target != 0).astype(dtype)
        _, tgt_table, soft_table = emb_tables(params, cfg, zero_softmax)
        x = embed_scaled(tgt_table, target, params["emb_bias"], cfg, dtype)
        x = shift_right(x)
        x = nn.add_timing_signal(x)
        x = dropout(rngs(), x, cfg.dropout if training else None)

        length = target.shape[1]
        self_keep = nn.causal_mask(length)
        mem_keep = nn.masking_mask(state["mask"])
        if _scan_layers(cfg):
            keys = _stacked_keys(rngs, cfg.num_decoder_layer) \
                if training else None
            x = _apply_stack(
                lambda p_l, h, r, c: hooks.dec_layer_train(
                    p_l, h, c["state"], c["self_keep"], c["mem_keep"], cfg,
                    r, c["mask"]),
                x, params["decoder"], keys, _use_remat(cfg, training),
                cfg.num_decoder_layer, cfg,
                {"state": state, "self_keep": self_keep,
                 "mem_keep": mem_keep, "mask": mask},
                seq_in_pipe=hooks.seq_in_pipe_dec)
        else:
            for p in params["decoder"]:
                if _use_remat(cfg, training):
                    x = _dec_layer_remat(p, x, state, self_keep, mem_keep,
                                         mask, _draw_keys(rngs), cfg)
                else:
                    x = hooks.dec_layer_train(p, x, state, self_keep,
                                              mem_keep, cfg, rngs, mask)
        if hooks.dec_post is not None:
            x = hooks.dec_post(params["dec_post"], x)
        return x, soft_table, mask

    def _loss(params, features, cfg, rng, step, training, label_smooth):
        dtype = dtypes.compute_dtype(cfg)
        cparams = dtypes.cast_to_compute(params, cfg)
        rngs = RngGen(rng if training else None)
        state = _encode(cparams, features["source"], cfg, rngs, dtype, training)
        feature, soft_table, mask = _decode_train(
            cparams, features["target"], state, cfg, rngs, dtype, training)
        loss, per_sample = ce_from_feature(feature, soft_table,
                                           features["target"], mask, cfg,
                                           label_smooth)
        if extra_loss is not None and training:
            loss = loss + extra_loss(cparams, state, cfg, step)
        return loss, per_sample

    def train_fn(params, features, cfg, rng, step=0):
        loss, _ = _loss(params, features, cfg, rng, step, True,
                        cfg.label_smooth)
        return {"loss": loss}

    def score_fn(params, features, cfg):
        # dropout off, label smoothing off (reference score_fn,
        # transformer.py:235-249)
        _, per_sample = _loss(params, features, cfg, None, 0, False, 0.0)
        return {"score": per_sample}

    # -- inference ------------------------------------------------------------
    def infer_fn(cfg):
        dtype = dtypes.compute_dtype(cfg)

        def encode(params, source):
            cparams = dtypes.cast_to_compute(params, cfg)
            rngs = RngGen(None)
            state = _encode(cparams, source, cfg, rngs, dtype, False)
            # per-layer beam-invariant decode state (cross mk/mv)
            state["layers"] = [
                hooks.dec_layer_precompute(p, state["encodes"], cfg)
                for p in _layer_slices(cparams["decoder"],
                                       cfg.num_decoder_layer)]
            return state

        def _use_ancestry(beams, max_len):
            """Ancestry-indexed pools pay off only where the fused pool
            kernel runs (on TPU); the pure-XLA selection path is slower
            than the gather it avoids, so elsewhere (and for kernel-
            ineligible variants) decode keeps the classic permuted cache.
            CPU always takes the ancestry path so tests exercise it;
            cfg.decode_ancestry on/off overrides for A/B measurement."""
            if beams <= 1:
                return False
            mode = str(getattr(cfg, "decode_ancestry", "auto"))
            if mode in ("on", "off"):
                return mode == "on"
            if jax.default_backend() != "tpu":
                return True
            if not (hooks.pool_kernel and bool(cfg.use_flash_decode)):
                return False
            import zero_tpu.ops.kernels.decode_attention as da_mod
            return da_mod.pool_supported(beams, max_len, cfg.hidden_size,
                                         cfg.num_heads)

        def init_cache(params, state, batch, max_len):
            # ancestry[b, i, t] = pool row whose position-t KV belongs to
            # live beam i; beam count inferred from the beam-invariant
            # encoder state (batch = B * K). All-zeros start: every beam
            # descends from slot 0, matching the init_log_probs tie-break.
            beams = max(batch // state["mask"].shape[0], 1)
            cache = {
                "layers": [hooks.init_dec_layer_cache(p, batch, max_len, cfg,
                                                      dtype)
                           for p in _layer_slices(params["decoder"],
                                                  cfg.num_decoder_layer)],
            }
            if _use_ancestry(beams, max_len):
                cache["ancestry"] = jnp.zeros(
                    (batch // beams, beams, max_len), jnp.int32)
            return cache

        def _embed_step(params, prev_tok, time):
            _, tgt_table, _ = emb_tables(params, cfg, zero_softmax)
            x = embed_scaled(tgt_table, prev_tok, params["emb_bias"], cfg,
                             dtype)
            # position 0's input is the zero vector (shift-right semantics;
            # reference zeroes when the fed token batch is all-pad,
            # transformer.py:113-115)
            x = jnp.where(time > 0, x, jnp.zeros_like(x))
            return nn.add_timing_signal(x, time=time)

        def decode_step(params, prev_tok, state, cache, time):
            cparams = dtypes.cast_to_compute(params, cfg)
            _, _, soft_table = emb_tables(cparams, cfg, zero_softmax)
            x = _embed_step(cparams, prev_tok, time)
            anc = cache.get("ancestry")
            new_layer_caches = []
            for p, lstate, lcache in zip(
                    _layer_slices(cparams["decoder"], cfg.num_decoder_layer),
                    state["layers"], cache["layers"]):
                if anc is not None:
                    lcache = dict(lcache, ancestry=anc)
                x, new_c = hooks.dec_layer_step(p, x, lstate, state, lcache,
                                                time, cfg)
                new_c.pop("ancestry", None)
                new_layer_caches.append(new_c)
            if hooks.dec_post is not None:
                x = hooks.dec_post(cparams["dec_post"], x)
            logits = output_logits(x[:, 0], soft_table)
            out_cache = {"layers": new_layer_caches}
            if anc is not None:
                out_cache["ancestry"] = anc
            return logits, out_cache

        def reorder_cache(cache, beam_indices, batch, beam_size, time,
                          span=1):
            """Beam-reorder the cache WITHOUT copying the KV pools.

            The just-written positions [time, time+span) sit in each
            beam's own row: record that as identity ancestry, then permute
            the [B, K, T] index (a few KB) by the surviving-beam indices.
            Every other leaf (AAN sums, gate states, ...) gets the plain
            beam gather. Replaces two full cache copies per decode step
            (41-46% of the v5e step at beam 4, r3 ablation)."""
            if "ancestry" not in cache:
                # classic mode (kernel-ineligible variant/shape): permute
                # every leaf, pools included
                return jax.tree.map(
                    lambda x: ops_common.gather_beams(x, beam_indices,
                                                      batch, beam_size),
                    cache)
            anc = cache["ancestry"]
            ident = jnp.broadcast_to(
                jnp.arange(beam_size, dtype=anc.dtype)[None, :, None],
                (batch, beam_size, span))
            anc = jax.lax.dynamic_update_slice(anc, ident, (0, 0, time))
            anc = jnp.take_along_axis(
                anc, beam_indices[:, :, None].astype(jnp.int32), axis=1)
            new_layers = []
            for lc in cache["layers"]:
                new_layers.append({
                    k: (v if k.startswith("pool_")
                        else ops_common.gather_beams(v, beam_indices, batch,
                                                     beam_size))
                    for k, v in lc.items()})
            return {"layers": new_layers, "ancestry": anc}

        def decode_prefix(params, tgt_buffer, state, time):
            """Dev-mode oracle: full causal recompute over the [B, T_max]
            buffer; positions > time are garbage but causally invisible."""
            cparams = dtypes.cast_to_compute(params, cfg)
            rngs = RngGen(None)
            _, tgt_table, soft_table = emb_tables(cparams, cfg, zero_softmax)
            x = embed_scaled(tgt_table, tgt_buffer, cparams["emb_bias"], cfg,
                             dtype)
            x = shift_right(x)
            x = nn.add_timing_signal(x)
            length = tgt_buffer.shape[1]
            self_keep = nn.causal_mask(length)
            mem_keep = nn.masking_mask(state["mask"])
            mask = jnp.ones_like(tgt_buffer).astype(dtype)
            for p in _layer_slices(cparams["decoder"],
                                   cfg.num_decoder_layer):
                x = hooks.dec_layer_train(p, x, state, self_keep, mem_keep,
                                          cfg, rngs, mask)
            if hooks.dec_post is not None:
                x = hooks.dec_post(cparams["dec_post"], x)
            feature = jax.lax.dynamic_slice_in_dim(
                x, jnp.asarray(time, jnp.int32), 1, axis=1)[:, 0]
            return output_logits(feature, soft_table)

        return Inference(encode=encode, init_cache=init_cache,
                         decode_step=decode_step, decode_prefix=decode_prefix,
                         reorder_cache=reorder_cache)

    return init_fn, train_fn, score_fn, infer_fn
