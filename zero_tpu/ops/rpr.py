"""Shaw-style relative position representations (RPR).

Counterpart of reference modules/rpr.py: clipped-distance embedding tables
for keys/values and the batched einsum add-on to attention logits/outputs.
Decode-time usage takes a single distance row for the current step instead
of the reference's ``last=1`` slicing (modules/rpr.py:53-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_rpr(key, max_relative_position: int, depth: int, weight_init,
             dtype=jnp.float32):
    """Two embedding tables [2*max+1, depth]: one for keys, one for values."""
    vocab = 2 * max_relative_position + 1
    return {
        "keys": weight_init(jax.random.fold_in(key, 0), (vocab, depth), dtype),
        "values": weight_init(jax.random.fold_in(key, 1), (vocab, depth), dtype),
    }


def relative_positions_matrix(length_q: int, length_k: int,
                              max_relative_position: int) -> jax.Array:
    """[Lq, Lk] clipped relative-distance ids in [0, 2*max]."""
    rq = jnp.arange(length_q)[:, None]
    rk = jnp.arange(length_k)[None, :]
    dist = jnp.clip(rq - rk, -max_relative_position, max_relative_position)
    return dist + max_relative_position


def relative_positions_row(time, length_k: int,
                           max_relative_position: int) -> jax.Array:
    """[1, Lk] distance ids for a single decode step at position ``time``."""
    rk = jnp.arange(length_k)[None, :]
    dist = jnp.clip(time - rk, -max_relative_position, max_relative_position)
    return dist + max_relative_position


def gather_embeddings(table: jax.Array, ids: jax.Array) -> jax.Array:
    """[Lq, Lk, depth] (or [1, Lk, depth]) relative-position embeddings."""
    return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# bucket-one-hot matmul form (the fast full-sequence path)
#
# The naive add-on (logits_with_rpr/output_with_rpr below) contracts a
# gathered [Lq, Lk, depth] tensor per QUERY position: XLA lowers those
# einsums as q-batched dot_generals whose layout churn measured as a 25%
# step-time tax at L=128 (BENCH_r03 transformer_rpr_train 31.1% MFU vs
# base 41.7%). The fast form factors the relative term through the
# CLIPPED BUCKETS: with M buckets (M = 2*max+1, e.g. 33),
#     rel_logits[b,h,q,k] = (q @ table^T)[b,h,q, ids[q,k]]
#                         = sum_m (q @ table^T)[b,h,q,m] * OH[q,k,m]
#     rpr_out[b,h,q,:]    = (sum_k w[q,k] * OH[q,k,m]) @ table
# where OH = one_hot(ids) is a small [Lq, Lk, M] CONSTANT. q @ table^T
# is one dense MXU matmul to a skinny [B, H, Lq, M]; the one-hot
# contractions are tiny-m matmuls XLA fuses cleanly. Measured on v5e
# (scripts/ablations/ab_rpr.py, B=64 H=8 L=128, fwd+bwd): +0.06 ms over
# plain attention vs +0.50 ms (gathered form) and +0.42 ms (a pad/
# reshape skew variant); a take_along_axis variant was 66x (TPU minor-
# dim gather). Same math: the one-hot contraction IS the gather, with
# the per-bucket sums reassociated.
# ---------------------------------------------------------------------------

# beyond this many [Lq, Lk, M] one-hot elements (~0.5 GB bf16), fall back
# to the gathered form rather than materializing a huge constant
_ONEHOT_MAX_ELEMS = 1 << 28


def onehot_supported(length_q: int, length_k: int,
                     max_relative_position: int) -> bool:
    return (length_q * length_k * (2 * max_relative_position + 1)
            <= _ONEHOT_MAX_ELEMS)


def _dist_onehot(length_q: int, length_k: int, max_relative_position: int,
                 dtype) -> jax.Array:
    ids = relative_positions_matrix(length_q, length_k,
                                    max_relative_position)
    return jax.nn.one_hot(ids, 2 * max_relative_position + 1, dtype=dtype)


def logits_with_rpr_onehot(qh: jax.Array, kh: jax.Array, table: jax.Array,
                           max_relative_position: int) -> jax.Array:
    """q @ k^T + (q @ table^T) expanded through the distance one-hot."""
    lq, lk = qh.shape[2], kh.shape[2]
    oh = _dist_onehot(lq, lk, max_relative_position, qh.dtype)
    qr = jnp.einsum("bhqd,md->bhqm", qh, table.astype(qh.dtype))
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    return logits + jnp.einsum("bhqm,qkm->bhqk", qr, oh)


def output_with_rpr_onehot(w: jax.Array, v: jax.Array, table: jax.Array,
                           max_relative_position: int) -> jax.Array:
    """w @ v + bucket-summed weights @ table."""
    lq, lk = w.shape[2], w.shape[3]
    oh = _dist_onehot(lq, lk, max_relative_position, w.dtype)
    wb = jnp.einsum("bhqk,qkm->bhqm", w, oh)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return o + jnp.einsum("bhqm,md->bhqd", wb, table.astype(w.dtype))


def logits_with_rpr(q: jax.Array, k: jax.Array, r: jax.Array) -> jax.Array:
    """q @ k^T + q @ r^T with q,k: [B, H, L, Dh], r: [Lq, Lk, Dh].

    The r-term contracts per query position (reference
    relative_attention_inner with transpose=True, modules/rpr.py:10-43)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    logits += jnp.einsum("bhqd,qkd->bhqk", q, r.astype(q.dtype))
    return logits


def output_with_rpr(w: jax.Array, v: jax.Array, r: jax.Array) -> jax.Array:
    """w @ v + w @ r with w: [B, H, Lq, Lk], v: [B, H, Lk, Dh],
    r: [Lq, Lk, Dh] (transpose=False path)."""
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    o += jnp.einsum("bhqk,qkd->bhqd", w, r.astype(w.dtype))
    return o
