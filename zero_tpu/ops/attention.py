"""Multi-head attention: training (full-sequence) and static-cache decoding.

Functional counterpart of reference func.dot_attention (func.py:164-286)
and func.additive_attention (func.py:107-161), redesigned for TPU/XLA:

* The decode KV cache is PREALLOCATED at [B, T_max, hidden] and written at
  the current step with ``lax.dynamic_update_slice`` -- replacing the
  reference's concat-grow cache (func.py:199-205), which implies dynamic
  shapes that XLA cannot compile. Validity is a ``position <= time`` mask.
* The reference's dummy-run cache init (search.py:56-74) duplicates the
  position-0 entry in its cache; we implement the clean semantics (each
  position written exactly once), which bit-matches the reference's own
  dev-mode correctness oracle (search.py:129-140).
* Softmax is computed in fp32 regardless of compute dtype.

Self-attention uses one fused qkv projection (func.py:196-197); cross
attention computes memory k/v once at encode time (the reference's 'mk/mv'
cache, func.py:208-216). The AAN fuse path shares the memory v projection
with the query-side projection (func.py:258-260) and keeps an O(1) running
sum at decode (func.py:262-272).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from zero_tpu.ops import initializers as inits
from zero_tpu.ops import rpr as rpr_mod
from zero_tpu.ops import nn
from zero_tpu.ops.common import dropout


def kernels_supported(lq: int, lk: int) -> bool:
    """Fused-kernel eligibility (deferred import keeps CPU paths light).

    Lk <= 8192 uses the whole-KV-resident query-blocked kernel; longer
    sequences stream K/V in blocks with online softmax."""
    import zero_tpu.ops.kernels.fused_attention as fa_mod
    import zero_tpu.ops.kernels.streaming_attention as sa_mod
    return fa_mod.supported(lq, lk) or sa_mod.supported(lq, lk)


def _rpr_flash_ok(lq: int, lk: int, max_rel, causal, pad_mask) -> bool:
    """RPR may ride the fused kernel when the standard clipped-distance
    matrix applies (max_relative_position given; callers with custom
    rpr_ids stay on XLA), the mask decomposes (causal/pad_mask declared),
    and the lane-roll skew geometry holds (lk > 2m)."""
    import zero_tpu.ops.kernels.fused_attention as fa_mod
    return (max_rel is not None and (causal or pad_mask is not None)
            and fa_mod.rpr_supported(lq, lk, max_rel))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_attention(key, d_query: int, hidden: int,
                   self_attention: bool,
                   d_memory: Optional[int] = None,
                   fuse: bool = False,
                   out_map: bool = True,
                   bias: bool = True,
                   weight_init=None,
                   out_init=None,
                   rpr_max: Optional[int] = None,
                   rela: bool = False,
                   dtype=jnp.float32):
    """Build attention params.

    self_attention -> fused 'qkv' projection; otherwise separate q/k/v with
    k/v from d_memory. ``fuse`` adds nothing (it reuses 'v' on the query
    side). ``out_init`` overrides the o_map initializer (fixup zero-init).
    ``rela`` adds the gated-RMSNorm epilogue params.
    """
    weight_init = weight_init or inits.variance_scaling(1.0, "uniform")
    params = {}
    if self_attention:
        params["qkv"] = nn.init_linear(
            jax.random.fold_in(key, 1), d_query, hidden * 3,
            bias=bias, weight_init=weight_init, dtype=dtype)
    else:
        d_memory = d_memory if d_memory is not None else d_query
        params["q"] = nn.init_linear(
            jax.random.fold_in(key, 2), d_query, hidden,
            bias=bias, weight_init=weight_init, dtype=dtype)
        params["k"] = nn.init_linear(
            jax.random.fold_in(key, 3), d_memory, hidden,
            bias=bias, weight_init=weight_init, dtype=dtype)
        params["v"] = nn.init_linear(
            jax.random.fold_in(key, 4), d_memory, hidden,
            bias=bias, weight_init=weight_init, dtype=dtype)
    if out_map:
        params["o"] = nn.init_linear(
            jax.random.fold_in(key, 5), hidden, hidden,
            bias=bias, weight_init=out_init or weight_init, dtype=dtype)
    del rpr_max  # RPR tables live beside the layer; see init_rpr_tables
    if rela:
        params["post"] = {
            "scale": jnp.ones((hidden,), dtype),
            "gate": weight_init(jax.random.fold_in(key, 7), (hidden,), dtype),
        }
    return params


def init_rpr_tables(key, hidden: int, num_heads: int, max_relative_position: int,
                    weight_init=None, dtype=jnp.float32):
    """RPR tables at per-head depth (reference passes k_shp[3] = hidden/heads,
    func.py:233-235)."""
    weight_init = weight_init or inits.variance_scaling(1.0, "uniform")
    return rpr_mod.init_rpr(key, max_relative_position, hidden // num_heads,
                            weight_init, dtype)


# ---------------------------------------------------------------------------
# core
# ---------------------------------------------------------------------------

def split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """[B, L, H*Dh] -> [B, H, L, Dh] (func.py:68-85)."""
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def combine_heads(x: jax.Array) -> jax.Array:
    """[B, H, L, Dh] -> [B, L, H*Dh] (func.py:88-104)."""
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def _attn_core(q, k, v, keep_mask, num_heads, *, rng=None, drop=None,
               rpr_tables=None, rpr_ids=None, rpr_max=None, relu=False,
               count_weights=None):
    """Shared attention math on [B, L, hidden] projections.

    keep_mask: broadcastable to [B, 1, Lq, Lk]; 1 = attend, 0 = block.
    relu=True switches to ReLA: multiply-mask + relu instead of
    softmax(-inf mask) (modules/rela.py:63-72).
    count_weights: [B, Lk] multiplies the exp-logits before normalisation
    (L0Drop count softmax). Returns ([B, Lq, hidden],
    weights [B, H, Lq, Lk]).

    RPR: with ``rpr_max`` the relative terms run in the bucket-one-hot
    matmul form (ops/rpr.py logits/output_with_rpr_onehot) -- same math
    as the gathered-einsum form but measured at ~1/9 its overhead on v5e
    (scripts/ablations/ab_rpr.py; the gathered form cost 10 MFU points
    at L=128, BENCH_r03). ``rpr_ids`` without ``rpr_max`` keeps the
    gathered form (callers with precomputed non-standard distance
    matrices), as do shapes whose one-hot constant would be oversized.
    """
    qh = split_heads(q, num_heads)
    kh = split_heads(k, num_heads)
    vh = split_heads(v, num_heads)
    dh = qh.shape[-1]
    qh = qh * (dh ** -0.5)

    use_onehot = (rpr_tables is not None and rpr_max is not None
                  and rpr_mod.onehot_supported(qh.shape[2], kh.shape[2],
                                               rpr_max))
    if rpr_tables is not None and not use_onehot and rpr_ids is None:
        rpr_ids = rpr_mod.relative_positions_matrix(qh.shape[2],
                                                    kh.shape[2], rpr_max)
    if use_onehot:
        logits = rpr_mod.logits_with_rpr_onehot(qh, kh, rpr_tables["keys"],
                                                rpr_max)
    elif rpr_tables is not None:
        r_k = rpr_mod.gather_embeddings(rpr_tables["keys"], rpr_ids)
        logits = rpr_mod.logits_with_rpr(qh, kh, r_k)
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)

    logits = logits.astype(jnp.float32)
    if relu:
        if keep_mask is not None:
            logits = logits * keep_mask.astype(jnp.float32)
        weights = jax.nn.relu(logits)
    elif count_weights is not None:
        if keep_mask is not None:
            logits = jnp.where(keep_mask > 0, logits, jnp.float32(-1e9))
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        exp = jnp.exp(logits) * count_weights.astype(jnp.float32)[:, None, None, :]
        weights = exp / jnp.sum(exp, axis=-1, keepdims=True)
    else:
        if keep_mask is not None:
            logits = jnp.where(keep_mask > 0, logits, jnp.float32(-1e9))
        weights = jax.nn.softmax(logits, axis=-1)

    dweights = dropout(rng, weights, drop).astype(q.dtype)

    if use_onehot:
        o = rpr_mod.output_with_rpr_onehot(dweights, vh,
                                           rpr_tables["values"], rpr_max)
    elif rpr_tables is not None:
        r_v = rpr_mod.gather_embeddings(rpr_tables["values"], rpr_ids)
        o = rpr_mod.output_with_rpr(dweights, vh, r_v)
    else:
        o = jnp.einsum("bhqk,bhkd->bhqd", dweights, vh)
    return combine_heads(o), weights


def gated_rms_norm(params, x, eps: float = 1e-8):
    """ReLA epilogue: scale*x*rsqrt(ms)*sigmoid(gate*x)
    (modules/rela.py:95-109)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    out = (params["scale"].astype(jnp.float32) * xf * jax.lax.rsqrt(ms + eps)
           * jax.nn.sigmoid(params["gate"].astype(jnp.float32) * xf))
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# training / full-sequence apply
# ---------------------------------------------------------------------------

def attn_train(params, query, memory, keep_mask, num_heads, *,
               rng=None, drop=None, fuse_weight=None, fuse_mask=None,
               rpr_tables=None, max_relative_position=None,
               relu=False, use_flash=False, causal=False, pad_mask=None,
               count_weights=None):
    """Full-sequence attention.

    memory=None -> self-attention via the fused qkv projection.
    keep_mask: [B or 1, 1, Lq, Lk] 1/0; caller combines causal+padding.
    fuse_weight: AAN [B, Lq, Lq] averaging matrix; adds the averaged
    query-side values through the shared 'v' projection (func.py:258-266).
    fuse_mask: alternative to fuse_weight -- the raw [B, Lq] target pad
    mask; the averaging matrix is built here, or, inside the seq-manual
    pipeline region, the average runs as a seq-parallel prefix mean
    (parallel/ring.py:seq_cummean_manual) where query is a local block.

    use_flash + (causal, pad_mask): route the softmax path through the
    fused Pallas kernel when the semantic mask decomposes into a causal
    flag + key-side [B, Lk] padding mask and the score matrix fits VMEM;
    exotic paths (ReLA, RPR, AAN count-softmax) stay on XLA.
    """
    if memory is None:
        h = nn.linear(params["qkv"], query)
        q, k, v = jnp.split(h, 3, axis=-1)
    else:
        q = nn.linear(params["q"], query)
        k = nn.linear(params["k"], memory)
        v = nn.linear(params["v"], memory)

    # Sequence parallelism: when the driver published a mesh with a 'seq'
    # axis (parallel/ring.py), eligible self-attention routes through ring
    # attention -- blockwise online softmax with K/V blocks ppermuted over
    # ICI -- instead of any single-device path. Eligibility mirrors the
    # flash route: the semantic mask must decompose into a causal flag +
    # key-side pad mask, declared by the caller passing causal/pad_mask.
    from zero_tpu.parallel import ring as ring_mod
    # ring-capable = the semantic mask decomposes (causal flag + key-side
    # pad mask) and there is no full-matrix epilogue coupling; ReLA
    # (relu) and Shaw RPR ride the ring via _block_attn's variant modes.
    ring_clean = (memory is None and count_weights is None
                  and fuse_weight is None and fuse_mask is None
                  and (causal or pad_mask is not None)
                  and (rpr_tables is None
                       or max_relative_position is not None))
    manual_seq = ring_mod.in_manual_seq() and memory is None
    ring_ok = (not manual_seq and ring_clean
               and ring_mod.ring_route_ok(q.shape[0], num_heads,
                                          q.shape[1], k.shape[1]))
    if manual_seq and not ring_clean:
        # Inside the combined {'pipe','seq'} manual region the activations
        # are seq-LOCAL blocks: self-attention MUST run the ring body (a
        # dense fallback would attend only within the local block, which
        # is silently wrong math). The pipeline gates entry on the hooks'
        # declared capability, so failing here means a wiring bug.
        raise ValueError(
            "self-attention variant is not ring-capable inside the "
            "seq-manual pipeline region; the model's LayerHooks must "
            "not declare seq_in_pipe for this stack")
    if manual_seq or ring_ok:
        qh = split_heads(q, num_heads)
        kh = split_heads(k, num_heads)
        vh = split_heads(v, num_heads)
        ring_fn = (ring_mod.ring_self_attention_manual if manual_seq
                   else ring_mod.ring_self_attention)
        o = ring_fn(qh, kh, vh, pad_mask, causal=causal, rng=rng,
                    drop=drop, relu=relu, rpr_tables=rpr_tables,
                    max_rel=max_relative_position)
        # falls through to the shared epilogue (ReLA gated RMS norm,
        # AAN/fuse add-on, output projection)
        o = combine_heads(o.astype(q.dtype))
        weights = None
    elif (use_flash and not relu
          and count_weights is None
          and kernels_supported(q.shape[1], k.shape[1])
          and (rpr_tables is None or _rpr_flash_ok(
              q.shape[1], k.shape[1], max_relative_position,
              causal, pad_mask))):
        import zero_tpu.ops.kernels.fused_attention as fa_mod
        import zero_tpu.ops.kernels.streaming_attention as sa_mod
        qh = split_heads(q, num_heads)
        kh = split_heads(k, num_heads)
        vh = split_heads(v, num_heads)
        drop_rate = float(drop) if (drop and rng is not None) else 0.0
        if rpr_tables is not None:
            # Shaw-RPR folded into the q-blocked kernel: bias expansion
            # by lane-roll skew, value-side bucket sums, table grads
            # accumulated across the grid (kernels/fused_attention.py)
            o = fa_mod.fused_attention(
                qh, kh, vh, pad_mask, causal=causal,
                dropout_rate=drop_rate, rng=rng, rpr_tables=rpr_tables,
                max_relative_position=max_relative_position)
        else:
            if fa_mod.supported(q.shape[1], k.shape[1]):
                kernel = fa_mod.fused_attention
            else:
                kernel = sa_mod.streaming_attention
            o = kernel(qh, kh, vh, pad_mask, causal=causal,
                       dropout_rate=drop_rate, rng=rng)
        o = combine_heads(o.astype(q.dtype))
        weights = None
    else:
        o, weights = _attn_core(q, k, v, keep_mask, num_heads, rng=rng,
                                drop=drop, rpr_tables=rpr_tables,
                                rpr_max=max_relative_position, relu=relu,
                                count_weights=count_weights)

    if relu and "post" in params:
        o = gated_rms_norm(params["post"], o)

    if fuse_weight is not None or fuse_mask is not None:
        v_q = nn.linear(params["v"], query)
        if fuse_mask is not None and ring_mod.in_manual_seq():
            aan_o = ring_mod.seq_cummean_manual(v_q, fuse_mask, masked=True)
        elif fuse_mask is not None:
            # O(L) cumsum form (nn.aan_cummean) == einsum(aan_weight, .)
            aan_o = nn.aan_cummean(v_q, fuse_mask, masked=True)
        else:
            aan_o = jnp.einsum("bqk,bkd->bqd", fuse_weight.astype(v_q.dtype),
                               v_q)
        o = o + aan_o

    if "o" in params:
        o = nn.linear(params["o"], o)
    return {"output": o, "weights": weights}


# ---------------------------------------------------------------------------
# decode: static caches
# ---------------------------------------------------------------------------

def init_self_cache(batch: int, max_len: int, hidden: int, dtype):
    """Preallocated self-attention KV pool.

    The ``pool_`` prefix marks leaves that beam search must NOT permute
    when the owning model provides a ``reorder_cache`` (ancestry-indexed
    decoding, models/common.py): each row's K/V stay where they were
    written and ``self_attn_step`` resolves beam ancestry at read time.
    Models without reorder_cache still get these leaves permuted by the
    search's default gather, which keeps the plain semantics."""
    return {
        "pool_k": jnp.zeros((batch, max_len, hidden), dtype),
        "pool_v": jnp.zeros((batch, max_len, hidden), dtype),
    }


def _ancestry_attn(q, k, v, ancestry, time, num_heads, *, span=1,
                   rpr_tables=None, max_relative_position=None, relu=False):
    """Self-attention over an UNPERMUTED beam KV pool via ancestry indices.

    The classic beam decode permutes every layer's [B*K, T, h] KV cache
    after each top-k (2 full cache copies per step -- measured 41-46% of
    the decode step on v5e at beam 4). Here the pool rows stay where each
    beam wrote them; ``ancestry[b, i, t]`` names the pool row j whose
    position-t entry belongs to live beam i. Attention flattens the pool
    to a [K*T] key axis and masks (j, t) pairs where ancestry selects a
    different row -- softmax over the selection equals softmax over the
    per-beam gathered cache, so results are identical while the per-step
    cost drops to one streaming read of the pool (the read attention needs
    anyway) plus a [B, K, T] int gather in the search.

    q: [B*K, s, hidden] (s = freshly-written span, positions
    time..time+s-1, which always live in the beam's OWN row -- identity
    selection); k, v: [B*K, T, hidden] pools; ancestry: [B, K, T] int32.
    """
    batch, beams, t_max = ancestry.shape
    s = q.shape[1]
    qh = split_heads(q, num_heads)                       # [B*K, H, s, dh]
    dh = qh.shape[-1]
    qh = (qh * (dh ** -0.5)).reshape(batch, beams, num_heads, s, dh)
    kh = split_heads(k.reshape(batch, beams * t_max, -1), num_heads)
    vh = split_heads(v.reshape(batch, beams * t_max, -1), num_heads)

    logits = jnp.einsum("bihsd,bhjd->bhisj", qh, kh)     # j = flat (K, T)
    logits = logits.astype(jnp.float32)

    # selection mask over (source row j, position t): ancestry for written
    # history, identity for the in-flight span [time, time+s)
    pos = jnp.arange(t_max)
    sel = ancestry[:, :, None, :] == jnp.arange(beams)[None, None, :, None]
    ident = (jnp.arange(beams)[:, None] == jnp.arange(beams)[None, :])
    in_span = (pos >= time) & (pos <= time + (s - 1))
    sel = jnp.where(in_span[None, None, None, :],
                    ident[None, :, :, None], sel)        # [B, i, j, t]
    keep = (sel & (pos <= time + (s - 1))[None, None, None, :]) \
        .reshape(batch, beams, beams * t_max)            # [B, i, (j t)]
    keep = keep[:, None, :, None, :]                     # [B, 1, i, 1, jt]

    rpr_ids = None
    if rpr_tables is not None:
        # same distance row for every pool row j of a position t
        rpr_ids = rpr_mod.relative_positions_row(time, t_max,
                                                 max_relative_position)
        r_k = rpr_mod.gather_embeddings(rpr_tables["keys"], rpr_ids)
        r_k = jnp.tile(r_k, (1, beams, 1))               # [1, K*T, dh]
        logits += jnp.einsum("bihsd,sjd->bhisj", qh,
                             r_k.astype(qh.dtype)).astype(jnp.float32)

    if relu:
        weights = jax.nn.relu(logits * keep.astype(jnp.float32))
    else:
        logits = jnp.where(keep, logits, jnp.float32(-1e9))
        weights = jax.nn.softmax(logits, axis=-1)
    weights = weights.astype(q.dtype)

    o = jnp.einsum("bhisj,bhjd->bihsd", weights, vh)
    if rpr_tables is not None:
        r_v = rpr_mod.gather_embeddings(rpr_tables["values"], rpr_ids)
        r_v = jnp.tile(r_v, (1, beams, 1))
        o += jnp.einsum("bhisj,sjd->bihsd", weights, r_v.astype(q.dtype))
    o = o.reshape(batch * beams, num_heads, s, dh)
    return combine_heads(o)


def self_attn_step(params, x_t, cache, time, num_heads, *,
                   rpr_tables=None, max_relative_position=None, relu=False,
                   use_flash=False):
    """One-step self-attention with a static cache.

    x_t: [B, 1, d]; cache: {'pool_k','pool_v': [B, T_max, hidden]}; time:
    scalar int. Writes this step's k/v at position ``time`` and attends
    over positions <= time. Returns (output [B, 1, hidden], new_cache).

    cache['ancestry'] ([B, K, T] int32, injected by the skeleton's
    decode_step) switches beam decode to the ancestry-indexed pool path
    (_ancestry_attn): the pools are never beam-permuted. With one beam the
    plain path runs (ancestry is all zeros by construction).

    use_flash routes the plain-softmax single-position single-beam path
    through the fused decode kernel (ops/kernels/decode_attention.py);
    exotic paths (RPR, ReLA, multi-position steps) stay on XLA.
    """
    h = nn.linear(params["qkv"], x_t)
    q, k_t, v_t = jnp.split(h, 3, axis=-1)

    k = jax.lax.dynamic_update_slice(
        cache["pool_k"], k_t.astype(cache["pool_k"].dtype), (0, time, 0))
    v = jax.lax.dynamic_update_slice(
        cache["pool_v"], v_t.astype(cache["pool_v"].dtype), (0, time, 0))
    t_max = k.shape[1]
    new_cache = {"pool_k": k, "pool_v": v}

    ancestry = cache.get("ancestry")
    if ancestry is not None and ancestry.shape[1] > 1:
        batch, beams = ancestry.shape[:2]
        hidden = k.shape[2]
        use_pool_kernel = False
        if use_flash and rpr_tables is None and x_t.shape[1] == 1:
            # the pool kernel handles both softmax and ReLA (relu) paths
            import zero_tpu.ops.kernels.decode_attention as da_mod
            use_pool_kernel = (jax.default_backend() == "tpu"
                               and da_mod.pool_supported(beams, t_max,
                                                         hidden, num_heads))
        if use_pool_kernel:
            # the in-flight position lives in each beam's own row: set the
            # ancestry column at ``time`` to identity for the kernel
            ident = jnp.broadcast_to(
                jnp.arange(beams, dtype=ancestry.dtype)[None, :, None],
                (batch, beams, 1))
            anc_eff = jax.lax.dynamic_update_slice(ancestry, ident,
                                                   (0, 0, time))
            o = da_mod.decode_pool_attention(
                q.reshape(batch, beams, hidden),
                k.reshape(batch, beams, t_max, hidden),
                v.reshape(batch, beams, t_max, hidden),
                anc_eff, time, num_heads, relu=relu)
            o = o.reshape(batch * beams, 1, hidden)
        else:
            o = _ancestry_attn(q, k, v, ancestry, time, num_heads,
                               span=x_t.shape[1], rpr_tables=rpr_tables,
                               max_relative_position=max_relative_position,
                               relu=relu)
        if relu and "post" in params:
            o = gated_rms_norm(params["post"], o)
        if "o" in params:
            o = nn.linear(params["o"], o)
        return o, new_cache

    if use_flash and not relu and rpr_tables is None:
        import zero_tpu.ops.kernels.decode_attention as da_mod
        if (jax.default_backend() == "tpu"
                and da_mod.supported(x_t.shape[1], t_max, k.shape[2],
                                     num_heads)):
            o = da_mod.decode_attention(q, k, v, time, num_heads)
            if "o" in params:
                o = nn.linear(params["o"], o)
            return o, new_cache
    pos = jnp.arange(t_max)
    # multi-position steps (x_t length > 1, e.g. IBDecoder pairs) may
    # attend across all freshly-written slots
    keep = (pos <= time + (x_t.shape[1] - 1)) \
        .astype(jnp.float32)[None, None, None, :]

    rpr_ids = None
    if rpr_tables is not None:
        rpr_ids = rpr_mod.relative_positions_row(time, t_max,
                                                 max_relative_position)

    o, _ = _attn_core(q, k, v, keep, num_heads,
                      rpr_tables=rpr_tables, rpr_ids=rpr_ids, relu=relu)
    if relu and "post" in params:
        o = gated_rms_norm(params["post"], o)
    if "o" in params:
        o = nn.linear(params["o"], o)
    return o, new_cache


def cross_attn_precompute(params, memory):
    """Compute the memory-side projections once (the reference's mk/mv
    cache entries, func.py:208-216)."""
    return {"mk": nn.linear(params["k"], memory),
            "mv": nn.linear(params["v"], memory)}


def cross_attn_step(params, x_t, mkv, mem_keep, num_heads, *,
                    aan_sum=None, time=None, relu=False,
                    rpr_tables=None, max_relative_position=None,
                    count_weights=None):
    """One-step cross attention over precomputed memory projections.

    mem_keep: [B, S] 1/0 pad mask. With ``aan_sum`` ([B, 1, hidden] running
    sum) the AAN fuse path is added: aan_o = (v_q + sum) / (time + 1),
    new_sum = sum + v_q (func.py:262-272, clean single-count semantics).
    rpr_tables: relative positions between decode step ``time`` and memory
    positions (transformer_rpr decoder cross attention).
    count_weights: [B, S] multiplicative exp-weights for the L0Drop
    count-renormalised softmax (transformer_l0drop.py:72-83).
    Returns (output, new_aan_sum or None).
    """
    q = nn.linear(params["q"], x_t)          # [B*K, 1, h]
    mem_batch = mkv["mk"].shape[0]
    q_batch = q.shape[0]
    # beam-invariant memory: the memory tree may stay UNTILED at [B, ...]
    # while queries come per-beam at [B*K, 1, ...]. Fold the beams into the
    # query-length dimension so k/v are read once per batch row instead of
    # once per beam (the main decode HBM saving vs the reference's tiled
    # towers).
    beams = q_batch // mem_batch
    q2 = q.reshape(mem_batch, beams * q.shape[1], q.shape[2])

    keep = mem_keep.astype(jnp.float32)[:, None, None, :]
    rpr_ids = None
    if rpr_tables is not None:
        rpr_ids = rpr_mod.relative_positions_row(
            time, mkv["mk"].shape[1], max_relative_position)
        # same decode position for every beam-query row
        rpr_ids = jnp.tile(rpr_ids, (q2.shape[1], 1))
    o, _ = _attn_core(q2, mkv["mk"], mkv["mv"], keep, num_heads, relu=relu,
                      rpr_tables=rpr_tables, rpr_ids=rpr_ids,
                      count_weights=count_weights)
    o = o.reshape(q_batch, q.shape[1], -1)
    if relu and "post" in params:
        o = gated_rms_norm(params["post"], o)

    new_sum = None
    if aan_sum is not None:
        v_q = nn.linear(params["v"], x_t)
        new_sum = aan_sum + v_q
        aan_o = new_sum / (time + 1).astype(v_q.dtype)
        o = o + aan_o

    if "o" in params:
        o = nn.linear(params["o"], o)
    return o, new_sum


# ---------------------------------------------------------------------------
# additive (Bahdanau) attention for RNN decoders
# ---------------------------------------------------------------------------

def init_additive_attention(key, d_query: int, d_memory: int, hidden: int,
                            num_heads: int = 1, att_fun: str = "add",
                            weight_init=None, dtype=jnp.float32):
    params = {
        "feed_memory": nn.init_linear(jax.random.fold_in(key, 0), d_memory,
                                      hidden, weight_init=weight_init,
                                      dtype=dtype),
        "feed_query": nn.init_linear(jax.random.fold_in(key, 1), d_query,
                                     hidden, weight_init=weight_init,
                                     dtype=dtype),
    }
    if att_fun == "add":
        params["feed_logits"] = nn.init_linear(
            jax.random.fold_in(key, 2), hidden // num_heads, 1,
            weight_init=weight_init, dtype=dtype)
    return params


def additive_attention(params, query, memory, mem_mask, num_heads=1, *,
                       proj_memory=None, rng=None, drop=None, att_fun="add"):
    """Bahdanau attention (func.py:107-161).

    query: [B, d] or [B*K, d] against beam-invariant memory [B, S, dm]
    (per-beam queries fold into an extra query axis so the memory is read
    once per batch row); mem_mask: [B, S].
    Returns {'output': [B(*K), dm], 'weights', 'cache_state': projected
    memory}.
    """
    if proj_memory is None:
        proj_memory = nn.linear(params["feed_memory"], memory)
    mem_batch = memory.shape[0]
    beams = query.shape[0] // mem_batch
    q = nn.linear(params["feed_query"], query)
    q = q.reshape(mem_batch, beams, -1)

    qh = split_heads(q, num_heads)             # [B, H, K, hidden/H]
    pmh = split_heads(proj_memory, num_heads)  # [B, H, S, hidden/H]

    if att_fun == "add":
        value = jnp.tanh(qh[:, :, :, None, :] + pmh[:, :, None, :, :])
        logits = nn.linear(params["feed_logits"], value)[..., 0]  # [B,H,K,S]
    else:
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, pmh)

    logits = logits.astype(jnp.float32)
    logits = jnp.where(mem_mask[:, None, None, :] > 0, logits,
                       jnp.float32(-1e9))
    weights = jax.nn.softmax(logits, axis=-1)              # [B, H, K, S]
    dweights = dropout(rng, weights, drop)

    mh = split_heads(memory, num_heads)                    # [B, H, S, dm/H]
    value = jnp.einsum("bhks,bhsd->bkhd",
                       dweights.astype(memory.dtype), mh)
    value = value.reshape(query.shape[0], -1)              # [B*K, dm]
    weights = weights.transpose(0, 2, 1, 3).reshape(
        query.shape[0], num_heads, -1)                     # [B*K, H, S]
    return {"weights": weights, "output": value, "cache_state": proj_memory}
