"""Beam-search oracle: an independent pure-numpy implementation of the
reference's search semantics (2k expand, k alive / 3k finished pools,
GNMT penalty, per-sentence length budget, eos block at t<1, worst-finished
>= best-alive termination, alive fallback) is compared against the jitted
static-shape beam search. The model's step function itself is trusted via
the cache==dev oracles; this test isolates the SEARCH logic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import zero_tpu.models  # noqa: F401
from zero_tpu.models.base import get_model
from zero_tpu.search import beam_search
from tests.helpers import tiny_config, toy_batch

F32_MIN = np.finfo(np.float32).min


def numpy_beam_search(logits_fn, src_mask, cfg, eos_id):
    """Reference-semantics beam search in plain numpy.

    logits_fn(prev_tokens [B*K, T_buf], time) -> [B*K, V] log-ready logits
    for the next position (teacher-forced on the growing buffer)."""
    B, K = src_mask.shape[0], cfg.beam_size
    alpha = cfg.decode_alpha
    t_max = min(cfg.decode_max_len,
                src_mask.shape[1] + cfg.decode_length)
    max_tgt_len = np.minimum(src_mask.sum(-1) + cfg.decode_length,
                             t_max).astype(np.int64)

    alive_seq = np.zeros((B, K, 1), np.int64)  # leading pad/BOS
    alive_lp = np.tile(np.array([[0.0] + [F32_MIN] * (K - 1)], np.float32),
                       (B, 1))
    alive_scores = np.zeros_like(alive_lp)
    fin_seq = np.zeros((B, K, 1), np.int64)
    fin_scores = np.full((B, K), F32_MIN, np.float32)
    fin_flags = np.zeros((B, K), bool)

    np.seterr(over="ignore")  # F32_MIN * penalty on dead beams
    time = 0
    while True:
        # termination (reference search.py:85-113)
        max_pen = ((5.0 + max_tgt_len) / 6.0) ** alpha
        best_alive = alive_lp[:, 0] / max_pen
        worst_fin = np.min(fin_scores * fin_flags, axis=1)
        worst_fin = worst_fin + (~fin_flags.any(1)) * F32_MIN
        if np.all(worst_fin > best_alive) or not np.any(time < max_tgt_len):
            break

        buf = np.zeros((B * K, t_max), np.int64)
        grown = alive_seq[:, :, 1:].reshape(B * K, -1)
        buf[:, :grown.shape[1]] = grown
        logits = np.asarray(logits_fn(buf, time), np.float32)
        logp = logits - np.log(np.exp(
            logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
            - logits.max(-1, keepdims=True)
        V = logp.shape[-1]
        if time < 1:
            logp[:, eos_id] += F32_MIN
        logp = logp.reshape(B, K, V)

        curr_lp = alive_lp[:, :, None] + logp
        penalty = ((5.0 + time + 1) / 6.0) ** alpha
        curr_scores = (curr_lp / penalty).reshape(B, K * V)
        top_idx = np.argsort(-curr_scores, axis=1)[:, :2 * K]
        top_scores = np.take_along_axis(curr_scores, top_idx, axis=1)
        beam_idx = top_idx // V
        sym_idx = top_idx % V

        curr_seq = np.concatenate(
            [np.take_along_axis(alive_seq, beam_idx[:, :, None], axis=1),
             sym_idx[:, :, None]], axis=2)

        curr_fin = (sym_idx == eos_id) | (time >= max_tgt_len)[:, None]
        # alive: top-k of non-finished
        alive_cand = top_scores + curr_fin * F32_MIN
        order = np.argsort(-alive_cand, axis=1)[:, :K]
        alive_scores = np.take_along_axis(alive_cand, order, axis=1)
        alive_seq = np.take_along_axis(curr_seq, order[:, :, None], axis=1)
        alive_lp = alive_scores * penalty

        # finished: top-k of previous-k + current-2k pool
        curr_fin_scores = top_scores + (1.0 - curr_fin) * F32_MIN
        pool_flags = np.concatenate([fin_flags, curr_fin], axis=1)
        pool_scores = np.concatenate([fin_scores, curr_fin_scores], axis=1)
        fin_seq = np.concatenate(
            [fin_seq, np.zeros((B, K, 1), np.int64)], axis=2)
        pool_seq = np.concatenate([fin_seq, curr_seq], axis=1)
        order = np.argsort(-pool_scores, axis=1)[:, :K]
        fin_scores = np.take_along_axis(pool_scores, order, axis=1)
        fin_flags = np.take_along_axis(pool_flags, order, axis=1)
        fin_seq = np.take_along_axis(pool_seq, order[:, :, None], axis=1)
        time += 1

    never = ~fin_flags.any(1)
    seqs = np.where(never[:, None, None], alive_seq, fin_seq)
    scores = np.where(never[:, None], alive_scores, fin_scores)
    return seqs[:, :, 1:], scores


@pytest.mark.parametrize("seed,beam_size", [(0, 3), (1, 3), (2, 3),
                                            (0, 13)])
def test_jit_beam_matches_numpy_oracle(seed, beam_size):
    # beam_size=13 > vocab/2 (V=23 < 2K=26): exercises the kprime =
    # min(2K, V) clamp in the two-stage top-k (pre-clamp, lax.top_k
    # rejected k > V at trace time for toy/char-scale vocabularies)
    cfg = tiny_config(model_name="transformer", beam_size=beam_size,
                      decode_length=6, decode_max_len=16)
    model = get_model("transformer")
    params = model.init_fn(jax.random.PRNGKey(seed), cfg)
    src = jnp.asarray(toy_batch(np.random.RandomState(seed),
                                batch=3)["source"])
    inf = model.infer_fn(cfg)

    out = beam_search(params, src, inf, cfg)

    state = inf.encode(params, src)
    K = cfg.beam_size

    def tile(x):
        return jnp.repeat(x, K, axis=0)
    tiled_state = jax.tree.map(tile, state)

    def logits_fn(buf, time):
        return inf.decode_prefix(params, jnp.asarray(buf, jnp.int32),
                                 tiled_state, jnp.asarray(time))

    src_mask = np.asarray(src != 0, np.float32)
    oseq, oscore = numpy_beam_search(logits_fn, src_mask, cfg,
                                     cfg.tgt_vocab.eos())

    jseq = np.asarray(out["seq"])
    # compare up to the oracle's (ragged) length; the jit buffers are
    # fixed-size and zero beyond the written positions
    t = oseq.shape[2]
    np.testing.assert_array_equal(jseq[:, :, :t], oseq)
    assert (jseq[:, :, t:] == 0).all()
    np.testing.assert_allclose(np.asarray(out["score"]), oscore,
                               rtol=1e-4, atol=1e-4)
