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
