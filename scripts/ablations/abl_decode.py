"""Ablate the beam-search decode step to explain the serving-batch
regression (VERDICT r2 #1: 234.7 sent/s at B=32 vs 205.5 at B=128).

Variants (each toggles ONE suspect off; results are wrong where noted,
only timing matters):
  base        -- the shipped beam_search
  fixed       -- no early-termination bound (always t_max steps):
                 isolates the steps-executed difference
  nogather    -- skip the per-step cache beam gather (WRONG results)
  twostage    -- top-k via per-beam top-2K over vocab, then over 2K^2
  notopk      -- replace the 2K top-k over [B, K*V] with argmax tiles
                 (WRONG): bounds the top-k cost
Timing protocol per CLAUDE.md: drain fetch before windows, >=6 calls per
window, median of 3.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _base_config
from zero_tpu.models.base import get_model
from zero_tpu.ops.common import log_prob_from_logits
from zero_tpu.search import F32_MIN, BeamState, _gather_beams

CALLS = 6
WINDOWS = 3


def build(cfg, inference, variant):
    beam_size = int(cfg.beam_size)
    alpha = float(cfg.decode_alpha)
    eos_id = cfg.tgt_vocab.eos()

    def run(params, source):
        src_mask = (source != 0).astype(jnp.float32)
        batch = src_mask.shape[0]
        src_len = src_mask.shape[1]
        t_max = min(int(cfg.decode_max_len), src_len + int(cfg.decode_length))

        state = inference.encode(params, source)
        source_length = jnp.sum(src_mask, -1)
        max_target_length = jnp.minimum(source_length + cfg.decode_length,
                                        t_max).astype(jnp.int32)
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

        def not_finished(bs):
            if variant == "fixed":
                return bs.time < t_max
            max_penalty = jnp.power(
                (5.0 + max_target_length.astype(jnp.float32)) / 6.0, alpha)
            best_alive = bs.alive_log_probs[:, 0] / max_penalty
            worst_finish = jnp.min(
                bs.fin_scores * bs.fin_flags.astype(jnp.float32), axis=1)
            worst_finish += (1.0 - jnp.any(bs.fin_flags, 1)
                             .astype(jnp.float32)) * F32_MIN
            bound_is_met = jnp.all(worst_finish > best_alive)
            length_is_met = jnp.any(bs.time < max_target_length)
            return jnp.logical_and(jnp.logical_not(bound_is_met),
                                   length_is_met)

        def step(bs):
            t = bs.time
            prev_tok = jax.lax.dynamic_slice_in_dim(
                bs.alive_seq, t, 1, axis=2).reshape(batch * beam_size, 1)
            logits, new_cache = inference.decode_step(params, prev_tok,
                                                      state, bs.cache, t)
            logits = logits.astype(jnp.float32)
            log_probs = log_prob_from_logits(logits)
            vocab = log_probs.shape[-1]
            eos_block = (jnp.arange(vocab) == eos_id).astype(
                jnp.float32) * F32_MIN
            log_probs = jnp.where(t < 1, log_probs + eos_block[None],
                                  log_probs)
            log_probs = log_probs.reshape(batch, beam_size, vocab)
            curr_log_probs = bs.alive_log_probs[:, :, None] + log_probs
            penalty = jnp.power((5.0 + (t + 1).astype(jnp.float32)) / 6.0,
                                alpha)
            curr_scores = curr_log_probs / penalty

            if variant == "twostage":
                per_beam, pb_idx = jax.lax.top_k(curr_scores, 2 * beam_size)
                flat2 = per_beam.reshape(batch, beam_size * 2 * beam_size)
                topk_scores, local = jax.lax.top_k(flat2, 2 * beam_size)
                curr_beam = (local // (2 * beam_size)).astype(jnp.int32)
                sym_local = local % (2 * beam_size)
                curr_symbol = jnp.take_along_axis(
                    pb_idx.reshape(batch, beam_size * 2 * beam_size),
                    curr_beam * 2 * beam_size + sym_local, axis=1
                ).astype(jnp.int32)
            elif variant == "notopk":
                flat = curr_scores.reshape(batch, beam_size * vocab)
                # WRONG: per-tile argmax of 2K contiguous tiles
                tiles = flat.reshape(batch, 2 * beam_size, -1)
                topk_scores = jnp.max(tiles, -1)
                topk_indices = jnp.argmax(tiles, -1).astype(jnp.int32)
                width = flat.shape[1] // (2 * beam_size)
                topk_indices = topk_indices + \
                    (jnp.arange(2 * beam_size) * width)[None]
                curr_beam = (topk_indices // vocab).astype(jnp.int32)
                curr_symbol = (topk_indices % vocab).astype(jnp.int32)
            else:
                flat = curr_scores.reshape(batch, beam_size * vocab)
                topk_scores, topk_indices = jax.lax.top_k(flat,
                                                          2 * beam_size)
                curr_beam = (topk_indices // vocab).astype(jnp.int32)
                curr_symbol = (topk_indices % vocab).astype(jnp.int32)

            curr_seq = jnp.take_along_axis(bs.alive_seq,
                                           curr_beam[:, :, None], axis=1)
            curr_seq = jax.lax.dynamic_update_slice_in_dim(
                curr_seq, curr_symbol[:, :, None], t + 1, axis=2)
            curr_fin = jnp.logical_or(
                curr_symbol == eos_id, (t >= max_target_length)[:, None])
            alive_cand = topk_scores + curr_fin.astype(jnp.float32) * F32_MIN
            alive_scores, alive_idx = jax.lax.top_k(alive_cand, beam_size)
            alive_seq = jnp.take_along_axis(curr_seq, alive_idx[:, :, None],
                                            axis=1)
            alive_beam = jnp.take_along_axis(curr_beam, alive_idx, axis=1)
            alive_log_probs = alive_scores * penalty
            if variant == "nogather":
                alive_cache = new_cache
            else:
                alive_cache = jax.tree.map(
                    lambda x: _gather_beams(x, alive_beam, batch, beam_size),
                    new_cache)

            curr_fin_scores = topk_scores + \
                (1.0 - curr_fin.astype(jnp.float32)) * F32_MIN
            fin_flags = jnp.concatenate([bs.fin_flags, curr_fin], axis=1)
            fin_scores = jnp.concatenate([bs.fin_scores, curr_fin_scores],
                                         axis=1)
            fin_pool = jnp.concatenate([bs.fin_seq, curr_seq], axis=1)
            fin_scores, fin_idx = jax.lax.top_k(fin_scores, beam_size)
            fin_flags = jnp.take_along_axis(fin_flags, fin_idx, axis=1)
            fin_seq = jnp.take_along_axis(fin_pool, fin_idx[:, :, None],
                                          axis=1)
            return BeamState(time=t + 1, alive_seq=alive_seq,
                             alive_log_probs=alive_log_probs,
                             alive_scores=alive_scores, cache=alive_cache,
                             fin_seq=fin_seq, fin_scores=fin_scores,
                             fin_flags=fin_flags)

        final = jax.lax.while_loop(not_finished, step, bs)
        never = jnp.logical_not(jnp.any(final.fin_flags, axis=1))
        seqs = jnp.where(never[:, None, None], final.alive_seq,
                         final.fin_seq)
        return {"seq": seqs[:, :, 1:], "steps": final.time}

    return jax.jit(run)


def main():
    cfg = _base_config()
    cfg.beam_size = 4
    cfg.decode_length = 50
    cfg.decode_max_len = 82
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    inference = model.infer_fn(cfg)

    rs = np.random.RandomState(0)
    results = {}
    for rows in (32, 128):
        src = jnp.asarray(
            rs.randint(3, 30000, (rows, 32)).astype(np.int32))
        for variant in ("base", "fixed", "nogather", "twostage", "notopk"):
            fn = build(cfg, inference, variant)
            out = fn(params, src)
            steps = int(out["steps"])          # drain + warm
            out = fn(params, src)
            _ = np.asarray(out["seq"])[0, 0, 0]  # drain before timing
            times = []
            for _w in range(WINDOWS):
                t0 = time.perf_counter()
                for _c in range(CALLS):
                    out = fn(params, src)
                _ = np.asarray(out["seq"])[0, 0, 0]
                times.append((time.perf_counter() - t0) / CALLS)
            med = sorted(times)[len(times) // 2]
            sps = rows / med
            per_step_ms = med / steps * 1e3
            results[(rows, variant)] = (sps, steps, per_step_ms)
            print(f"rows={rows:4d} {variant:9s} {sps:8.1f} sent/s "
                  f"steps={steps:3d} {per_step_ms:6.3f} ms/step",
                  flush=True)
    base32 = results[(32, "base")][0]
    base128 = results[(128, "base")][0]
    print(f"\nB128/B32 sentence-throughput ratio: {base128 / base32:.3f}")


if __name__ == "__main__":
    main()
