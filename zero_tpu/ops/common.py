"""Shared functional utilities: rng threading, dropout, masking, smoothing.

Counterparts of reference utils/util.py helpers (valid_apply_dropout:75-79,
mask_scale:68-72, label_smooth:88-103, log_prob_from_logits:198-200) in
pure-functional JAX form.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class Keys:
    """Deterministic named PRNG-key derivation.

    ``Keys(key)("encoder", 3)`` folds the name path into the base key; the
    same path always yields the same subkey, making param init reproducible
    and order-independent.
    """

    def __init__(self, key: jax.Array):
        self.key = key

    def __call__(self, *path) -> jax.Array:
        k = self.key
        for p in path:
            if isinstance(p, str):
                p = _string_hash(p)
            k = jax.random.fold_in(k, p)
        return k


def _string_hash(s: str) -> int:
    # stable across processes (unlike hash())
    h = 2166136261
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 16777619) & 0x7FFFFFFF
    return h


class RngGen:
    """Trace-time splitter for dropout rngs inside an apply function.

    Holds a base key and yields a fresh subkey per call. When constructed
    with None, yields None -- downstream dropout becomes a no-op, which is
    how eval/score paths disable dropout (reference closing_dropout,
    utils/util.py:106-114).
    """

    def __init__(self, key: Optional[jax.Array]):
        self._key = key
        self._count = 0

    def __call__(self) -> Optional[jax.Array]:
        if self._key is None:
            return None
        self._count += 1
        return jax.random.fold_in(self._key, self._count)


def dropout(rng: Optional[jax.Array], x: jax.Array,
            rate: Optional[float]) -> jax.Array:
    """Inverted dropout; no-op when rate is falsy/invalid or rng is None
    (reference valid_apply_dropout semantics).

    Masks come from 8-bit random draws instead of bernoulli's fp32
    uniforms: PRNG bit generation is the single largest cost of a
    dropout-regularised train step on TPU (measured 48% of a
    transformer-base step with 32-bit threefry on v5e), and 8 bits cut the
    generated volume 4x. The keep probability is quantised to t/256 and
    the kept values are scaled by its exact reciprocal, so the estimator
    stays unbiased: E[out] = (t/256) * x * (256/t) = x.
    """
    if rng is None or rate is None or not (0.0 < rate < 1.0):
        return x
    t = int(round((1.0 - rate) * 256.0))
    if t >= 256:
        return x
    if t <= 0:
        return jnp.zeros_like(x)
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    inv_keep = jnp.asarray(256.0 / t, x.dtype)
    return jnp.where(bits < t, x * inv_keep, jnp.zeros_like(x))


def log_prob_from_logits(logits: jax.Array) -> jax.Array:
    return logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)


def smoothed_centropy(logits: jax.Array, labels: jax.Array,
                      factor: float) -> jax.Array:
    """Per-position label-smoothed CE minus the smoothing normalizer
    (transformer.py:198-216, util.py:88-103), fp32. Shape = labels'."""
    logits = logits.astype(jnp.float32)
    vocab_size = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    gold_logp = jnp.take_along_axis(
        logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]

    if 0.0 < factor < 1.0:
        n = float(vocab_size - 1)
        p = 1.0 - factor
        q = factor / n
        # cross entropy with the smoothed one-hot: p on gold, q elsewhere
        sum_logp = jnp.sum(logp, axis=-1)
        centropy = -(p * gold_logp + q * (sum_logp - gold_logp))
        normalizer = -(p * jnp.log(p) + n * q * jnp.log(q + 1e-20))
        return centropy - normalizer
    return -gold_logp


def sentence_mean_loss(centropy: jax.Array, mask: jax.Array):
    """The reference's per-sentence-mean-then-batch-mean reduction.
    All-pad sentences (padded batch rows) contribute 0 and are excluded
    from the batch mean, generalising the reference's zero-batch guard.
    Returns (scalar loss, per-sentence loss [B])."""
    mask = mask.astype(jnp.float32)
    msum = jnp.sum(mask, axis=-1)
    per_sample = jnp.sum(centropy * mask, axis=-1) / jnp.maximum(msum, 1.0)
    valid = (msum > 0).astype(jnp.float32)
    loss = jnp.sum(per_sample * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return loss, per_sample


def label_smooth_loss(logits: jax.Array, labels: jax.Array, mask: jax.Array,
                      factor: float = 0.1):
    """Label-smoothed CE with normalizer subtraction and the reference's
    per-sentence-mean-then-batch-mean reduction. Returns (scalar loss,
    per-sentence loss [B])."""
    return sentence_mean_loss(smoothed_centropy(logits, labels, factor),
                              mask)


def gumbel_noise(rng: jax.Array, shape, eps: float = 1e-8) -> jax.Array:
    u = jax.random.uniform(rng, shape, minval=0.0, maxval=1.0)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gather_beams(x: jax.Array, beam_indices: jax.Array, batch: int,
                 beam_size: int) -> jax.Array:
    """Reorder the beam axis of a [B*K, ...] leaf by [B, K] indices.

    take_along_axis is the fastest full-leaf permutation on TPU (r3
    same-session A/B vs one-hot einsum / permutation matmul). The big
    self-attention KV pools skip this entirely via the ancestry index
    (models/common.py reorder_cache)."""
    y = x.reshape((batch, beam_size) + x.shape[1:])
    idx = beam_indices.reshape(
        (batch, beam_size) + (1,) * (y.ndim - 2)).astype(jnp.int32)
    y = jnp.take_along_axis(y, idx, axis=1)
    return y.reshape((batch * beam_size,) + x.shape[1:])
