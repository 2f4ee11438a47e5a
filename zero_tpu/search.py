"""Beam search (L3): fully on-device, static-shape, jit-compiled.

Parity target: reference search.py:19-275 -- 2k-candidate expansion, k alive
/ 3k-pool finished bookkeeping, GNMT length penalty ((5+len)/6)^alpha,
worst-finished >= best-alive termination, forced EOS-block at t<1, gumbel
noise + temperature options, per-sentence length budget source_len +
decode_length, and alive-fallback when nothing finished.

TPU re-design vs the reference:
  * the sequence buffers are preallocated [batch, beam, T_max+1] and written
    at position time+1 each step, replacing concat-grow (search.py:186-188)
  * the model cache is a static pytree; per-beam reordering is a
    take_along_axis gather on the beam axis (search.py:206-209)
  * the dummy-run cache init (search.py:56-74) is unnecessary: caches are
    preallocated by the model's init_cache with explicit shapes
  * dev mode re-runs the full decoder over the token buffer through
    Inference.decode_prefix (search.py:129-140)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from zero_tpu.ops.common import (gather_beams, gumbel_noise,
                                 log_prob_from_logits)

F32_MIN = jnp.finfo(jnp.float32).min


class BeamState(NamedTuple):
    time: jax.Array
    alive_seq: jax.Array       # [B, K, T+1] int32
    alive_log_probs: jax.Array  # [B, K] f32
    alive_scores: jax.Array    # [B, K] f32
    cache: dict                # model cache pytree, leaves [B*K, ...]
    fin_seq: jax.Array         # [B, K, T+1] int32
    fin_scores: jax.Array      # [B, K] f32
    fin_flags: jax.Array       # [B, K] bool


def _tile_beam(x, beam_size):
    """[B, ...] -> [B*K, ...] by tiling each row K times
    (reference expand_tile_dims + merge, util.py:158-186)."""
    reps = [1] * x.ndim
    x = jnp.expand_dims(x, 1)
    reps.insert(1, beam_size)
    x = jnp.tile(x, reps)
    return x.reshape((-1,) + x.shape[2:])


# default whole-leaf beam permutation (models without reorder_cache)
_gather_beams = gather_beams


def beam_search(params, source, inference, cfg, rng: Optional[jax.Array] = None):
    """Run beam search over a source batch.

    ``source`` is either a padded int32 token batch [B, Ls] (text models)
    or a dict carrying a 'mask' [B, S] key plus whatever the model's encode
    consumes (speech models: {'audio', 'mask'}).
    Returns {'seq': [B, K, T_max] int32, 'score': [B, K] f32}.
    """
    beam_size = int(cfg.beam_size)
    alpha = float(cfg.decode_alpha)
    eos_id = cfg.tgt_vocab.eos()
    if isinstance(source, dict):
        src_mask = source["mask"].astype(jnp.float32)
    else:
        src_mask = (source != 0).astype(jnp.float32)
    batch = src_mask.shape[0]
    src_len = src_mask.shape[1]
    t_max = min(int(cfg.decode_max_len), src_len + int(cfg.decode_length))
    dev_mode = cfg.search_mode != "cache"

    # encode once. In cache mode the beam-invariant state stays UNTILED at
    # [B, ...]: cross attention folds beams into the query axis, reading
    # encoder memory once per batch row (vs the reference tiling everything
    # per beam, search.py:36-39). Dev mode recomputes the full decoder over
    # per-beam buffers, so there the state is tiled.
    state = inference.encode(params, source)
    if dev_mode:
        state = jax.tree.map(lambda x: _tile_beam(x, beam_size), state)

    source_length = jnp.sum(src_mask, -1)                      # [B]
    max_target_length = jnp.minimum(source_length + cfg.decode_length,
                                    t_max).astype(jnp.int32)  # [B]

    cache = inference.init_cache(params, state, batch * beam_size, t_max)

    init_log_probs = jnp.tile(
        jnp.asarray([[0.0] + [F32_MIN] * (beam_size - 1)], jnp.float32),
        [batch, 1])
    bs = BeamState(
        time=jnp.asarray(0, jnp.int32),
        alive_seq=jnp.zeros((batch, beam_size, t_max + 1), jnp.int32),
        alive_log_probs=init_log_probs,
        alive_scores=jnp.zeros_like(init_log_probs),
        cache=cache,
        fin_seq=jnp.zeros((batch, beam_size, t_max + 1), jnp.int32),
        fin_scores=jnp.full((batch, beam_size), F32_MIN, jnp.float32),
        fin_flags=jnp.zeros((batch, beam_size), bool),
    )

    def not_finished(bs: BeamState):
        # worst finished vs best possible alive (reference search.py:85-113)
        max_penalty = jnp.power(
            (5.0 + max_target_length.astype(jnp.float32)) / 6.0, alpha)
        best_alive = bs.alive_log_probs[:, 0] / max_penalty
        worst_finish = jnp.min(
            bs.fin_scores * bs.fin_flags.astype(jnp.float32), axis=1)
        worst_finish += (1.0 - jnp.any(bs.fin_flags, 1).astype(jnp.float32)) \
            * F32_MIN
        bound_is_met = jnp.all(worst_finish > best_alive)
        length_is_met = jnp.any(bs.time < max_target_length)
        return jnp.logical_and(jnp.logical_not(bound_is_met), length_is_met)

    def step(bs: BeamState):
        time = bs.time
        # 1. expand: previous tokens -> next-token log probs
        prev_tok = jax.lax.dynamic_slice_in_dim(
            bs.alive_seq, time, 1, axis=2)           # [B, K, 1]
        prev_tok = prev_tok.reshape(batch * beam_size, 1)
        if dev_mode:
            buffer = bs.alive_seq[:, :, 1:].reshape(batch * beam_size, t_max)
            logits = inference.decode_prefix(params, buffer, state, time)
            new_cache = bs.cache
        else:
            logits, new_cache = inference.decode_step(params, prev_tok, state,
                                                      bs.cache, time)
        logits = logits.astype(jnp.float32)
        if cfg.enable_noise_beam_search and rng is not None:
            logits += gumbel_noise(jax.random.fold_in(rng, time),
                                   logits.shape)
        logits = logits / cfg.beam_search_temperature
        vocab = logits.shape[-1]

        # force decoding: no eos before the first real token
        eos_block = (jnp.arange(vocab) == eos_id).astype(jnp.float32) * F32_MIN
        blocked = jnp.where(time < 1, logits + eos_block[None], logits)

        # 2. score 2k candidates -- two-stage exact top-k. A candidate's
        # score is (alive[b,k] + logits[b,k,v] - lse[b,k]) / penalty, a
        # strictly increasing function of logits within each beam row, so
        # every member of the global top-2K lies in its own row's top-2K:
        # take per-row top-2K over raw logits, rescore exactly, then
        # top-2K over the K*2K survivors. The lse stays computed over the
        # UNBLOCKED logits (the reference normalizes before blocking eos).
        # Tie-breaking is bit-identical: per-row ranks preserve symbol
        # order and the k-major candidate layout preserves beam order --
        # the same (k, v)-lexicographic rule lax.top_k applies to the
        # naive [B, K*V] flattening. vs materializing fp32 [B, K*V]
        # log-probs + scores: measured 0.90 -> 0.28 ms/step at 512 rows
        # (v5e, scripts/ablations/ab_decode_breakdown.py).
        lse = jax.scipy.special.logsumexp(logits, axis=-1)  # [B*K]
        # kprime = min(2K, V): tiny vocabularies (toy/char tasks) can have
        # V < 2K, where the per-row stage simply keeps the whole row --
        # still exact, and lax.top_k would reject k > V
        kprime = min(2 * beam_size, vocab)
        cand_val, cand_idx = jax.lax.top_k(blocked, kprime)
        penalty = jnp.power((5.0 + (time + 1).astype(jnp.float32)) / 6.0,
                            alpha)
        cand_scores = (bs.alive_log_probs.reshape(-1, 1) + cand_val
                       - lse[:, None]) / penalty     # [B*K, K']
        flat = cand_scores.reshape(batch, beam_size * kprime)
        topk_scores, pos = jax.lax.top_k(flat, 2 * beam_size)
        curr_beam = (pos // kprime).astype(jnp.int32)           # [B, 2K]
        curr_symbol = jnp.take_along_axis(
            cand_idx.reshape(batch, beam_size * kprime), pos,
            axis=1).astype(jnp.int32)                           # [B, 2K]

        # candidate sequences: reorder beams, write symbol at time+1
        curr_seq = jnp.take_along_axis(bs.alive_seq, curr_beam[:, :, None],
                                       axis=1)       # [B, 2K, T+1]
        curr_seq = jax.lax.dynamic_update_slice_in_dim(
            curr_seq, curr_symbol[:, :, None], time + 1, axis=2)

        # 3. alive: top-k non-finished of the 2k
        curr_fin = jnp.logical_or(
            curr_symbol == eos_id,
            (time >= max_target_length)[:, None])
        alive_cand = topk_scores + curr_fin.astype(jnp.float32) * F32_MIN
        alive_scores, alive_idx = jax.lax.top_k(alive_cand, beam_size)
        alive_seq = jnp.take_along_axis(curr_seq, alive_idx[:, :, None],
                                        axis=1)
        alive_beam = jnp.take_along_axis(curr_beam, alive_idx, axis=1)
        alive_log_probs = alive_scores * penalty
        if dev_mode:
            # the cache is an unused dummy (decode_prefix recomputes from
            # the token buffer): skip the reorder entirely
            alive_cache = new_cache
        elif inference.reorder_cache is not None:
            alive_cache = inference.reorder_cache(new_cache, alive_beam,
                                                  batch, beam_size, time)
        else:
            alive_cache = jax.tree.map(
                lambda x: _gather_beams(x, alive_beam, batch, beam_size),
                new_cache)

        # 4. finished: top-k of previous k + current 2k
        curr_fin_scores = topk_scores + \
            (1.0 - curr_fin.astype(jnp.float32)) * F32_MIN
        fin_flags = jnp.concatenate([bs.fin_flags, curr_fin], axis=1)
        fin_scores = jnp.concatenate([bs.fin_scores, curr_fin_scores], axis=1)
        fin_seq_pool = jnp.concatenate([bs.fin_seq, curr_seq], axis=1)
        fin_scores, fin_idx = jax.lax.top_k(fin_scores, beam_size)
        fin_flags = jnp.take_along_axis(fin_flags, fin_idx, axis=1)
        fin_seq = jnp.take_along_axis(fin_seq_pool, fin_idx[:, :, None],
                                      axis=1)

        return BeamState(time=time + 1, alive_seq=alive_seq,
                         alive_log_probs=alive_log_probs,
                         alive_scores=alive_scores, cache=alive_cache,
                         fin_seq=fin_seq, fin_scores=fin_scores,
                         fin_flags=fin_flags)

    final = jax.lax.while_loop(not_finished, step, bs)

    never_finished = jnp.logical_not(jnp.any(final.fin_flags, axis=1))
    seqs = jnp.where(never_finished[:, None, None], final.alive_seq,
                     final.fin_seq)
    scores = jnp.where(never_finished[:, None], final.alive_scores,
                       final.fin_scores)
    # 'steps' = while_loop iterations actually executed (scalar): the whole
    # batch steps together until every row meets the termination bound, so
    # this is the straggler-coupling diagnostic for serving-batch decode
    return {"seq": seqs[:, :, 1:], "score": scores, "steps": final.time}


class IBBeamState(NamedTuple):
    pair: jax.Array            # current pair index
    alive_seq: jax.Array       # [B, K, Z] interleaved tokens
    alive_log_probs: jax.Array
    alive_scores: jax.Array
    done_l: jax.Array          # [B, K] bool: l2r stream emitted eos
    done_r: jax.Array
    cache: dict
    fin_seq: jax.Array
    fin_scores: jax.Array
    fin_flags: jax.Array


def ib_beam_search(params, source, inference, cfg,
                   rng: Optional[jax.Array] = None):
    """Pair beam search for the interleaved bidirectional decoder.

    Each step expands TWO factorized token distributions (one per
    direction); candidate pairs are scored additively from the top-c of
    each stream (c = 2*beam). A stream that has emitted eos is pinned to
    <pad> at log-prob 0; a hypothesis is finished when both streams are
    done. Effective length for the GNMT penalty is the number of emitted
    pair slots, 2*(pair+1).
    Returns {'seq': [B, K, Z] interleaved (unfold on the host), 'score'}.
    """
    beam_size = int(cfg.beam_size)
    alpha = float(cfg.decode_alpha)
    eos_id = cfg.tgt_vocab.eos()
    src_mask = (source != 0).astype(jnp.float32)
    batch, src_len = src_mask.shape
    t_max = min(int(cfg.decode_max_len), src_len + int(cfg.decode_length))
    max_pairs = t_max // 2 + 1
    z_max = 2 * max_pairs

    state = inference.encode(params, source)  # untiled; see beam_search
    source_length = jnp.sum(src_mask, -1)
    max_target_length = jnp.minimum(source_length + cfg.decode_length,
                                    t_max).astype(jnp.int32)

    cache = inference.init_cache(params, state, batch * beam_size, z_max)
    init_log_probs = jnp.tile(
        jnp.asarray([[0.0] + [F32_MIN] * (beam_size - 1)], jnp.float32),
        [batch, 1])
    bs = IBBeamState(
        pair=jnp.asarray(0, jnp.int32),
        alive_seq=jnp.zeros((batch, beam_size, z_max), jnp.int32),
        alive_log_probs=init_log_probs,
        alive_scores=jnp.zeros_like(init_log_probs),
        done_l=jnp.zeros((batch, beam_size), bool),
        done_r=jnp.zeros((batch, beam_size), bool),
        cache=cache,
        fin_seq=jnp.zeros((batch, beam_size, z_max), jnp.int32),
        fin_scores=jnp.full((batch, beam_size), F32_MIN, jnp.float32),
        fin_flags=jnp.zeros((batch, beam_size), bool),
    )

    def not_finished(bs: IBBeamState):
        max_penalty = jnp.power(
            (5.0 + max_target_length.astype(jnp.float32)) / 6.0, alpha)
        best_alive = bs.alive_log_probs[:, 0] / max_penalty
        worst_finish = jnp.min(
            bs.fin_scores * bs.fin_flags.astype(jnp.float32), axis=1)
        worst_finish += (1.0 - jnp.any(bs.fin_flags, 1).astype(jnp.float32)) \
            * F32_MIN
        bound_is_met = jnp.all(worst_finish > best_alive)
        length_is_met = jnp.any(2 * bs.pair < max_target_length)
        return jnp.logical_and(jnp.logical_not(bound_is_met), length_is_met)

    def step(bs: IBBeamState):
        i = bs.pair
        prev_pair = jax.lax.dynamic_slice(
            bs.alive_seq, (0, 0, jnp.maximum(2 * i - 2, 0)),
            (batch, beam_size, 2)).reshape(batch * beam_size, 2)
        logits2, new_cache = inference.decode_pair(params, prev_pair, state,
                                                   bs.cache, i)
        logits2 = logits2.astype(jnp.float32)
        if cfg.enable_noise_beam_search and rng is not None:
            logits2 += gumbel_noise(jax.random.fold_in(rng, i), logits2.shape)
        logits2 = logits2 / cfg.beam_search_temperature
        vocab = logits2.shape[-1]
        lp = log_prob_from_logits(logits2).reshape(batch, beam_size, 2,
                                                   vocab)
        lp_l, lp_r = lp[:, :, 0], lp[:, :, 1]

        # first pair: l2r stream must emit a real token
        eos_block = (jnp.arange(vocab) == eos_id).astype(jnp.float32) \
            * F32_MIN
        lp_l = jnp.where(i < 1, lp_l + eos_block[None, None], lp_l)

        # done streams are pinned to <pad> with log-prob 0
        pad_onehot = jnp.where(jnp.arange(vocab) == 0, 0.0, F32_MIN)
        lp_l = jnp.where(bs.done_l[:, :, None], pad_onehot[None, None], lp_l)
        lp_r = jnp.where(bs.done_r[:, :, None], pad_onehot[None, None], lp_r)

        # factorized pair expansion: top-c of each stream, additive grid
        c = 2 * beam_size
        top_l, idx_l = jax.lax.top_k(lp_l, c)     # [B, K, c]
        top_r, idx_r = jax.lax.top_k(lp_r, c)
        grid = top_l[:, :, :, None] + top_r[:, :, None, :]   # [B, K, c, c]
        pair_lp, grid_idx = jax.lax.top_k(
            grid.reshape(batch, beam_size, c * c), c)        # [B, K, c]
        tok_l = jnp.take_along_axis(idx_l, grid_idx // c, axis=2)
        tok_r = jnp.take_along_axis(idx_r, grid_idx % c, axis=2)

        curr_log_probs = bs.alive_log_probs[:, :, None] + pair_lp
        gen_len = (2.0 * (i + 1).astype(jnp.float32))
        penalty = jnp.power((5.0 + gen_len) / 6.0, alpha)
        curr_scores = curr_log_probs / penalty

        flat = curr_scores.reshape(batch, beam_size * c)
        topk_scores, topk_idx = jax.lax.top_k(flat, 2 * beam_size)
        beam_idx = (topk_idx // c).astype(jnp.int32)
        cand_idx = (topk_idx % c).astype(jnp.int32)

        def gather_bc(x):
            y = jnp.take_along_axis(x, beam_idx[:, :, None], axis=1)
            return jnp.take_along_axis(y, cand_idx[:, :, None], axis=2)[..., 0]

        sym_l = gather_bc(tok_l)
        sym_r = gather_bc(tok_r)

        curr_seq = jnp.take_along_axis(bs.alive_seq, beam_idx[:, :, None],
                                       axis=1)
        pair_tok = jnp.stack([sym_l, sym_r], axis=-1)        # [B, 2K, 2]
        curr_seq = jax.lax.dynamic_update_slice(
            curr_seq, pair_tok, (0, 0, 2 * i))

        prev_done_l = jnp.take_along_axis(bs.done_l, beam_idx, axis=1)
        prev_done_r = jnp.take_along_axis(bs.done_r, beam_idx, axis=1)
        new_done_l = jnp.logical_or(prev_done_l, sym_l == eos_id)
        new_done_r = jnp.logical_or(prev_done_r, sym_r == eos_id)
        curr_fin = jnp.logical_or(
            jnp.logical_and(new_done_l, new_done_r),
            (2 * i >= max_target_length)[:, None])

        alive_cand = topk_scores + curr_fin.astype(jnp.float32) * F32_MIN
        alive_scores, alive_idx = jax.lax.top_k(alive_cand, beam_size)
        alive_seq = jnp.take_along_axis(curr_seq, alive_idx[:, :, None],
                                        axis=1)
        alive_beam = jnp.take_along_axis(beam_idx, alive_idx, axis=1)
        alive_log_probs = alive_scores * penalty
        if inference.reorder_cache is not None:
            alive_cache = inference.reorder_cache(new_cache, alive_beam,
                                                  batch, beam_size, 2 * i,
                                                  span=2)
        else:
            alive_cache = jax.tree.map(
                lambda x: _gather_beams(x, alive_beam, batch, beam_size),
                new_cache)
        alive_done_l = jnp.take_along_axis(new_done_l, alive_idx, axis=1)
        alive_done_r = jnp.take_along_axis(new_done_r, alive_idx, axis=1)

        curr_fin_scores = topk_scores + \
            (1.0 - curr_fin.astype(jnp.float32)) * F32_MIN
        fin_flags = jnp.concatenate([bs.fin_flags, curr_fin], axis=1)
        fin_scores = jnp.concatenate([bs.fin_scores, curr_fin_scores], axis=1)
        fin_pool = jnp.concatenate([bs.fin_seq, curr_seq], axis=1)
        fin_scores, fin_idx = jax.lax.top_k(fin_scores, beam_size)
        fin_flags = jnp.take_along_axis(fin_flags, fin_idx, axis=1)
        fin_seq = jnp.take_along_axis(fin_pool, fin_idx[:, :, None], axis=1)

        return IBBeamState(pair=i + 1, alive_seq=alive_seq,
                           alive_log_probs=alive_log_probs,
                           alive_scores=alive_scores, done_l=alive_done_l,
                           done_r=alive_done_r, cache=alive_cache,
                           fin_seq=fin_seq, fin_scores=fin_scores,
                           fin_flags=fin_flags)

    final = jax.lax.while_loop(not_finished, step, bs)
    never = jnp.logical_not(jnp.any(final.fin_flags, axis=1))
    seqs = jnp.where(never[:, None, None], final.alive_seq, final.fin_seq)
    scores = jnp.where(never[:, None], final.alive_scores, final.fin_scores)
    return {"seq": seqs, "score": scores}
