"""Per-component decode-step cost at B in {32, 64, 128, 256}, beam 4.

ab_decode_scaling.py showed steps-executed is CONSTANT (82) across batch
sizes, so the serving-batch falloff is per-step compute: marginal cost
22 us/row at B<=64 jumping to ~31 us/row past 64. This script isolates
which component's regime changes: each piece runs in its own jitted
fori_loop over 82 iterations (same dispatch pattern as the shipped
while_loop), timed with the CLAUDE.md drain protocol.

  model   -- inference.decode_step only (embed + 6 layers incl. ancestry
             pool attention + cross attn + FFN + vocab logits)
  model_noflash -- same with use_flash_decode=False (XLA ancestry attn):
             separates the pool-kernel's scaling from XLA's
  topk    -- the search's top-k chain on synthetic scores:
             [B, K*V] 2K top-k + two [B, 2K] -> K top-ks
  gathers -- seq bookkeeping: take_along_axis on [B, 2K, T+1] pools +
             fin-pool concat/top-k
  e2e     -- shipped beam_search per-step cost for reference
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _base_config
from zero_tpu.models.base import get_model
from zero_tpu.search import F32_MIN, beam_search

CALLS = 6
WINDOWS = 3
STEPS = 82
K = 4


def timed(fn, *args):
    out = fn(*args)
    _ = float(jnp.sum(out) * 0)          # compile + warm
    out = fn(*args)
    _ = float(jnp.sum(out) * 0)          # drain before timing
    times = []
    for _w in range(WINDOWS):
        t0 = time.perf_counter()
        for _c in range(CALLS):
            out = fn(*args)
        _ = float(jnp.sum(out) * 0)
        times.append((time.perf_counter() - t0) / CALLS)
    return sorted(times)[len(times) // 2]


def model_loop(model, params, cfg, rows):
    inference = model.infer_fn(cfg)
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.randint(3, 30000, (rows, 32)).astype(np.int32))

    def run(params, source):
        state = inference.encode(params, source)
        cache = inference.init_cache(params, state, rows * K, STEPS + 1)
        tok = jnp.full((rows * K, 1), 5, jnp.int32)

        def body(t, carry):
            cache, acc = carry
            logits, cache = inference.decode_step(params, tok, state,
                                                  cache, t)
            return cache, acc + jnp.sum(logits[:, -1])
        _, acc = jax.lax.fori_loop(0, STEPS, body,
                                   (cache, jnp.float32(0)))
        return acc

    return timed(jax.jit(run), params, src)


def topk_loop(rows, vocab=32768):
    rs = np.random.RandomState(0)
    base = jnp.asarray(rs.randn(rows, K, vocab).astype(np.float32))

    def run(base):
        def body(t, carry):
            scores, acc = carry
            flat = scores.reshape(rows, K * vocab)
            top2k, idx = jax.lax.top_k(flat, 2 * K)
            fin = (idx % vocab) == 2
            alive_cand = top2k + fin.astype(jnp.float32) * F32_MIN
            alive, a_idx = jax.lax.top_k(alive_cand, K)
            fin_scores = top2k + (1 - fin.astype(jnp.float32)) * F32_MIN
            fin_top, _ = jax.lax.top_k(fin_scores, K)
            scores = scores + alive[:, :, None] * 1e-9  # carry dependence
            return scores, acc + jnp.sum(fin_top)
        _, acc = jax.lax.fori_loop(0, STEPS, body, (base, jnp.float32(0)))
        return acc

    return timed(jax.jit(run), base)


def gather_loop(rows):
    rs = np.random.RandomState(0)
    seq = jnp.asarray(rs.randint(0, 30000,
                                 (rows, K, STEPS + 1)).astype(np.int32))

    def run(seq):
        fin_seq = jnp.zeros_like(seq)
        fin_scores = jnp.full((rows, K), F32_MIN)
        fin_flags = jnp.zeros((rows, K), bool)

        def body(t, carry):
            seq, fin_seq, fin_scores, fin_flags = carry
            curr_beam = (seq[:, :, 0] % K).astype(jnp.int32)
            curr_beam = jnp.tile(curr_beam, (1, 2))          # [B, 2K]
            curr_seq = jnp.take_along_axis(seq, curr_beam[:, :, None],
                                           axis=1)           # [B, 2K, T+1]
            sym = (curr_beam + t).astype(jnp.int32)[:, :, None]
            curr_seq = jax.lax.dynamic_update_slice_in_dim(
                curr_seq, sym, t, axis=2)
            alive_idx = curr_beam[:, :K]
            seq = jnp.take_along_axis(curr_seq, alive_idx[:, :, None],
                                      axis=1)
            curr_fin = sym[:, :, 0] == 2
            curr_fs = jnp.where(curr_fin, 0.0, F32_MIN)
            ff = jnp.concatenate([fin_flags, curr_fin], axis=1)
            fs = jnp.concatenate([fin_scores, curr_fs], axis=1)
            fp = jnp.concatenate([fin_seq, curr_seq], axis=1)
            fs, fi = jax.lax.top_k(fs, K)
            ff = jnp.take_along_axis(ff, fi, axis=1)
            fin_seq = jnp.take_along_axis(fp, fi[:, :, None], axis=1)
            return seq, fin_seq, fs, ff
        seq, fin_seq, fs, ff = jax.lax.fori_loop(
            0, STEPS, body, (seq, fin_seq, fin_scores, fin_flags))
        return jnp.sum(fin_seq) + jnp.sum(seq)

    return timed(jax.jit(run), seq)


def e2e(model, params, cfg, rows):
    inference = model.infer_fn(cfg)
    rs = np.random.RandomState(0)
    src = jnp.asarray(rs.randint(3, 30000, (rows, 32)).astype(np.int32))
    fn = jax.jit(lambda p, s: beam_search(p, s, inference, cfg)["score"])
    return timed(fn, params, src)


def main():
    model = get_model("transformer")
    cfg = _base_config()
    cfg.beam_size = K
    cfg.decode_length = 50
    cfg.decode_max_len = STEPS
    params = model.init_fn(jax.random.PRNGKey(0), cfg)
    cfg_nf = _base_config()
    cfg_nf.beam_size = K
    cfg_nf.decode_length = 50
    cfg_nf.decode_max_len = STEPS
    cfg_nf.use_flash_decode = False

    print(f"{'rows':>5s} {'e2e':>7s} {'model':>7s} {'noflash':>7s} "
          f"{'topk':>7s} {'gather':>7s} {'resid':>7s}   (ms/step)")
    for rows in (32, 64, 128, 256):
        t_e2e = e2e(model, params, cfg, rows) / STEPS * 1e3
        t_model = model_loop(model, params, cfg, rows) / STEPS * 1e3
        t_nf = model_loop(model, params, cfg_nf, rows) / STEPS * 1e3
        t_topk = topk_loop(rows) / STEPS * 1e3
        t_gather = gather_loop(rows) / STEPS * 1e3
        resid = t_e2e - t_model - t_topk - t_gather
        print(f"{rows:5d} {t_e2e:7.3f} {t_model:7.3f} {t_nf:7.3f} "
              f"{t_topk:7.3f} {t_gather:7.3f} {resid:7.3f}", flush=True)


if __name__ == "__main__":
    main()
