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
# skew-matmul form (the fast full-sequence path)
#
# The naive add-on (logits_with_rpr/output_with_rpr below) contracts a
# gathered [Lq, Lk, depth] tensor per QUERY position: XLA lowers those
# einsums as q-batched dot_generals, which forces two full transposes of
# the [B, H, Lq, Lk] logits tensor per direction -- measured as a 25%
# step-time tax at L=128 (BENCH_r03 transformer_rpr_train 31.1% MFU vs
# base 41.7%). The skew form replaces them with ONE dense MXU matmul
# against the table expanded over all unclipped relative offsets
# (q @ full_table^T -> [B, H, Lq, Lq+Lk-1]) plus a pad/reshape "skew"
# between relative and absolute indexing (Huang et al. 2018 appendix /
# T2T relative attention v2) -- no q-batched ops, no big transposes.
# Mathematically identical: full_table[r] = table[clip(q-k)] row for the
# offset r = k - q + (Lq - 1), so every (q, k) dot product sums the same
# scalars in the same order.
# ---------------------------------------------------------------------------

def full_table(table: jax.Array, length_q: int, length_k: int,
               max_relative_position: int) -> jax.Array:
    """[Lq+Lk-1, depth]: the clipped-bucket table expanded over every
    unclipped relative offset r = k - q + (Lq - 1) (a tiny gather from
    [2*max+1, depth])."""
    r = jnp.arange(length_q + length_k - 1) - (length_q - 1)   # k - q
    ids = jnp.clip(-r, -max_relative_position, max_relative_position) \
        + max_relative_position                                 # bucket(q-k)
    return jnp.take(table, ids, axis=0)


def rel_to_abs(x: jax.Array, length_k: int) -> jax.Array:
    """[..., Lq, Lq+Lk-1] relative-offset scores -> [..., Lq, Lk] absolute:
    out[..., q, k] = x[..., q, k - q + Lq - 1], via pad/reshape only."""
    *lead, q_len, w = x.shape
    assert w == q_len + length_k - 1, (x.shape, length_k)
    pad = [(0, 0)] * len(lead)
    x = jnp.pad(x, pad + [(0, 0), (0, 1)])             # [..., Lq, W+1]
    flat = x.reshape(*lead, q_len * (w + 1))
    flat = jnp.pad(flat, pad + [(0, w - q_len)])
    x = flat.reshape(*lead, q_len + 1, w)
    return x[..., :q_len, q_len - 1:q_len - 1 + length_k]


def abs_to_rel(x: jax.Array) -> jax.Array:
    """[..., Lq, Lk] absolute weights -> [..., Lq, Lq+Lk-1] by relative
    offset: out[..., q, r] = x[..., q, q + r - Lq + 1] (zero where the
    absolute index falls outside [0, Lk))."""
    *lead, q_len, k_len = x.shape
    w = q_len + k_len - 1
    pad = [(0, 0)] * len(lead)
    xp = jnp.pad(x, pad + [(0, 0), (q_len - 1, 0)])    # [..., Lq, W]
    flat = xp.reshape(*lead, q_len * w)
    flat = jnp.pad(flat, pad + [(0, q_len)])
    y = flat.reshape(*lead, q_len, w + 1)[..., :w]
    # entries past the row boundary alias the next query's data: zero them
    # (out-of-range on the right; the left side is genuine zero padding)
    q_idx = jnp.arange(q_len)[:, None]
    r_idx = jnp.arange(w)[None, :]
    valid = (q_idx + r_idx) <= (w - 1)
    return y * valid.astype(y.dtype)


def logits_with_rpr_skew(qh: jax.Array, kh: jax.Array, table: jax.Array,
                         max_relative_position: int) -> jax.Array:
    """q @ k^T + skew(q @ full_table^T): [B, H, Lq, Lk] logits."""
    lq, lk = qh.shape[2], kh.shape[2]
    tf = full_table(table, lq, lk, max_relative_position).astype(qh.dtype)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    return logits + rel_to_abs(jnp.einsum("bhqd,rd->bhqr", qh, tf), lk)


def output_with_rpr_skew(w: jax.Array, v: jax.Array, table: jax.Array,
                         max_relative_position: int) -> jax.Array:
    """w @ v + unskew(w) @ full_table: [B, H, Lq, Dh] outputs."""
    lq, lk = w.shape[2], w.shape[3]
    tf = full_table(table, lq, lk, max_relative_position).astype(w.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return o + jnp.einsum("bhqr,rd->bhqd", abs_to_rel(w), tf)


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
