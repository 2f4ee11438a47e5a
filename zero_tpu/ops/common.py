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


# Dropout mask source. "fused": counter-based hash bits XLA fuses into the
# consuming where() -- zero mask HBM traffic. "prng": jax.random.bits u8
# draws (kept for A/B and as the conservative fallback). The fused path is
# the r3 answer to the dropout MFU gap: RngBitGenerator is an unfusable
# HLO, so the u8 masks of a B=256 L=128 transformer-base step (2.0 GB)
# generate at ~70 GB/s and round-trip HBM -- ~29 ms of a ~158 ms step
# (microbenched v5e via scripts/ablations/mb_dropout.py). The hash path
# costs ~10 VPU ops per element inside the consumer fusion instead.
DROPOUT_BITS = "fused"


def _mix32(x: jax.Array, mult: int) -> jax.Array:
    x = x ^ (x >> jnp.uint32(16))
    return x * jnp.uint32(mult)


def _hash_bits(rng: jax.Array, shape) -> jax.Array:
    """Uniform u32 draws from a murmur3-style finalizer over the element
    index, seeded by the PRNG key's raw words.

    Each element hashes its own linear index (a fused iota) through the
    murmur3 fmix32 finalizer with the key words xor'd in; the finalizer
    is a bijection on u32 designed for sequential-integer avalanche, so
    low bits are uniform and decorrelated across both elements and keys
    (measured: chi2 274 on df=255, adjacent/stride-128 keep correlation
    <0.002, cross-key mask agreement 0.8172 vs theoretical 0.8173).
    Counter-based generation is the same design family as Philox/Squares
    -- ample quality for dropout masks, and unlike RngBitGenerator it
    fuses. One extra round was measured to cost ~0.5 MFU pt on v5e with
    no quality delta at these volumes.
    """
    if jnp.issubdtype(jnp.asarray(rng).dtype, jax.dtypes.prng_key):
        words = jax.random.key_data(rng)
    else:
        words = rng
    words = words.astype(jnp.uint32).ravel()
    s0, s1 = words[0], words[words.shape[0] - 1]
    n = 1
    for d in shape:
        n *= d
    x = jax.lax.iota(jnp.uint32, max(n, 1)).reshape(shape)
    x = _mix32(x ^ s0, 0x85EBCA6B)
    x = _mix32(x, 0xC2B2AE35)
    return x ^ (x >> jnp.uint32(16)) ^ s1


def dropout(rng: Optional[jax.Array], x: jax.Array,
            rate: Optional[float]) -> jax.Array:
    """Inverted dropout; no-op when rate is falsy/invalid or rng is None
    (reference valid_apply_dropout semantics).

    Masks come from 8-bit threshold draws instead of bernoulli's fp32
    uniforms: PRNG bit generation is the single largest cost of a
    dropout-regularised train step on TPU (measured 48% of a
    transformer-base step with 32-bit threefry on v5e). The keep
    probability is quantised to t/256 and the kept values are scaled by
    its exact reciprocal, so the estimator stays unbiased:
    E[out] = (t/256) * x * (256/t) = x. Bits come from the fusable
    counter hash (_hash_bits) by default; see DROPOUT_BITS.
    """
    if rng is None or rate is None or not (0.0 < rate < 1.0):
        return x
    t = int(round((1.0 - rate) * 256.0))
    if t >= 256:
        return x
    if t <= 0:
        return jnp.zeros_like(x)
    inv_keep = jnp.asarray(256.0 / t, x.dtype)
    if DROPOUT_BITS == "fused":
        bits = _hash_bits(rng, x.shape) & jnp.uint32(255)
        keep = bits < jnp.uint32(t)
    else:
        keep = jax.random.bits(rng, x.shape, dtype=jnp.uint8) < t
    return jnp.where(keep, x * inv_keep, jnp.zeros_like(x))


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


def smoothed_centropy_reduced(logits: jax.Array, labels: jax.Array,
                              factor: float) -> jax.Array:
    """smoothed_centropy in reduction form: numerically the same math,
    but expressed as per-token reductions over the vocab axis (max,
    logsumexp, centered logit sum, gold logit) so no [N, V] log-prob
    tensor is ever materialized. The identities:

        gold_logp = logits[label] - lse
        sum_v logp_v = (sum_v logits_v - V*max) - V*log(sum_v e^(l_v-max))

    All consumers of the logits are reductions, which XLA fuses into (or
    right after) the logits matmul -- on a v5e this removed the
    HBM-bound f32 [chunk, V] log_softmax writes that were 11% of the
    base train step (profile: docs/mfu.md). Within-fp32-rounding equal
    to smoothed_centropy (sum reassociation only).
    """
    logits = logits.astype(jnp.float32)
    vocab_size = logits.shape[-1]
    # stop_gradient on the max is the standard stable-lse trick: the
    # true gradient of lse routes entirely through the exp term
    m = jax.lax.stop_gradient(jnp.max(logits, axis=-1))
    centered = logits - m[..., None]
    sum_exp = jnp.sum(jnp.exp(centered), axis=-1)
    lse = m + jnp.log(sum_exp)
    # the gold logit as a masked REDUCTION rather than a gather: a
    # gather HLO cannot fuse into the logits matmul, forcing the full
    # [N, V] fp32 buffer into HBM; a where+sum joins the other vocab
    # reductions in the dot's (multi-output) fusion epilogue. Exact:
    # one matching lane, zeros elsewhere.
    lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                    logits.ndim - 1)
    onehot_mask = lane == labels[..., None].astype(jnp.int32)
    gold = jnp.sum(jnp.where(onehot_mask, logits, 0.0), axis=-1)
    gold_logp = gold - lse

    if 0.0 < factor < 1.0:
        n = float(vocab_size - 1)
        p = 1.0 - factor
        q = factor / n
        csum = jnp.sum(centered, axis=-1)     # sum(logits) - V*max
        sum_logp = csum - float(vocab_size) * jnp.log(sum_exp)
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
