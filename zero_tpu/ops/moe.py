"""Mixture-of-experts FFN (Switch/GShard pattern), TPU-native.

An extension the reference lacks entirely (no MoE anywhere in the
checkout); built for the 'expert' mesh axis (expert parallelism): the
expert-stacked weights [E, ...] shard over 'expert', and the dispatch/
combine einsums below let GSPMD insert the token all-to-alls between
the data-sharded token layout and the expert-sharded compute layout --
no hand-written collectives, matching the framework's GSPMD-first
stance (SURVEY §2.3).

Design (static shapes throughout, per XLA requirements):
  * top-1 (Switch, Fedus et al. 2021: gate = router prob, which carries
    the router's task-loss gradient) or top-2 (GShard, Lepikhin et al.
    2020: gates renormalized over the chosen k) routing;
  * per-row capacity C = ceil(S * capacity_factor * k / E): each batch
    row is its own dispatch group, so the [B, S, E, C] dispatch tensor
    stays small and the decode step (S=1, C=1) routes losslessly;
  * tokens beyond an expert's capacity contribute zero here and survive
    through the residual connection (standard overflow semantics);
  * load-balance aux loss E * sum_e f_e * P_e (fraction dispatched x
    mean router prob), accumulated per layer by the caller.

Router math runs in fp32 regardless of compute dtype.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from zero_tpu.ops import initializers as inits
from zero_tpu.ops import nn
from zero_tpu.ops.common import dropout


def init_moe_ffn(key, d_in: int, d_hidden: int, d_out: int,
                 num_experts: int, weight_init=None, dtype=jnp.float32):
    """Router + expert-stacked two-layer FFN weights ([E, ...] leaves;
    the 'experts' path component is the expert-parallel sharding hook,
    parallel/mesh.py)."""
    weight_init = weight_init or inits.variance_scaling(1.0, "uniform")
    e = num_experts
    k1, k2, k3 = (jax.random.fold_in(key, i) for i in range(3))
    return {
        "router": nn.init_linear(k1, d_in, e, bias=False,
                                 weight_init=weight_init, dtype=dtype),
        "experts": {
            "w1": weight_init(k2, (e, d_in, d_hidden), dtype),
            "b1": jnp.zeros((e, d_hidden), dtype),
            "w2": weight_init(k3, (e, d_hidden, d_out), dtype),
            "b2": jnp.zeros((e, d_out), dtype),
        },
    }


def capacity(seq_len: int, num_experts: int, capacity_factor: float,
             top_k: int) -> int:
    return max(1, int(math.ceil(seq_len * capacity_factor * top_k
                                / num_experts)))


def moe_ffn(params, x, rngs=None, drop=None, *, num_experts: int,
            top_k: int = 1, capacity_factor: float = 1.25,
            aux_sums=None, training: bool = True):
    """Switch/GShard FFN on [B, S, d] inputs; returns [B, S, d_out].

    aux_sums: optional list collecting this layer's scalar load-balance
    loss (the caller weights and adds it to the training loss, the
    transformer_clsr accumulator pattern).

    training=False lifts the capacity cap (C = S: no expert can receive
    more) so inference never drops tokens -- capacity dropping is
    sequence-length-dependent, and lossless eval routing is what makes
    the single-step decode path equal the full-recompute dev path (the
    framework's cache==dev oracle).
    """
    b, s, d = x.shape
    e = num_experts
    c = capacity(s, e, capacity_factor, top_k) if training else s

    logits = nn.linear(params["router"], x).astype(jnp.float32)  # [B,S,E]
    probs = jax.nn.softmax(logits, axis=-1)

    # top-k expert choices per token. Switch (top-1) scales the expert
    # output by the router prob p_i itself -- that product is how the
    # router gets task-loss gradient (Fedus et al. 2021 §2.2; a
    # renormalized top-1 gate is identically 1 and severs it). GShard
    # (top-2) renormalizes the gates over the chosen k.
    top_probs, top_idx = jax.lax.top_k(probs, top_k)     # [B, S, k]
    if top_k == 1:
        gates = top_probs
    else:
        gates = top_probs / jnp.maximum(
            jnp.sum(top_probs, axis=-1, keepdims=True), 1e-9)

    # position of each token in its expert's buffer, k slots sequenced so
    # primary choices claim capacity first
    combine = jnp.zeros((b, s, e, c), jnp.float32)
    f_frac = jnp.zeros((b, e), jnp.float32)
    for slot in range(top_k):
        onehot = jax.nn.one_hot(top_idx[..., slot], e,
                                dtype=jnp.float32)       # [B, S, E]
        prior = f_frac * s                                # tokens used
        pos = jnp.cumsum(onehot, axis=1) + prior[:, None, :]
        pos = pos * onehot                                # [B, S, E] 1-based
        keep = (pos > 0) & (pos <= c)
        slot_oh = jax.nn.one_hot((pos - 1).astype(jnp.int32), c,
                                 dtype=jnp.float32) \
            * keep[..., None].astype(jnp.float32)         # [B, S, E, C]
        combine = combine + slot_oh * gates[..., slot, None, None]
        f_frac = f_frac + jnp.mean(onehot * keep.astype(jnp.float32),
                                   axis=1)
    dispatch = (combine > 0).astype(x.dtype)              # [B, S, E, C]

    if aux_sums is not None:
        # Switch load-balance loss over PRIMARY assignments (pre-capacity
        # fractions keep the gradient signal even when overflowing)
        primary = jax.nn.one_hot(top_idx[..., 0], e, dtype=jnp.float32)
        f_e = jnp.mean(primary, axis=(0, 1))              # [E]
        p_e = jnp.mean(probs, axis=(0, 1))                # [E]
        aux_sums.append(e * jnp.sum(f_e * p_e))

    # dispatch tokens -> [E, B*C, d], run the expert FFNs batched over E,
    # combine back. GSPMD turns the layout change between data-sharded
    # tokens and expert-sharded weights into all-to-alls over ICI.
    ex = params["experts"]
    xin = jnp.einsum("bsec,bsd->ebcd", dispatch, x)
    xin = xin.reshape(e, b * c, d)
    h = jnp.einsum("etd,edf->etf", xin, ex["w1"]) + ex["b1"][:, None, :]
    h = jax.nn.relu(h)
    if rngs is not None:
        h = dropout(rngs(), h, drop)
    out = jnp.einsum("etf,efd->etd", h, ex["w2"]) + ex["b2"][:, None, :]
    out = out.reshape(e, b, c, -1)
    y = jnp.einsum("bsec,ebcd->bsd", combine.astype(x.dtype), out)
    return y
