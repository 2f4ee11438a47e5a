"""Ring attention: sequence-parallel self-attention over a 'seq' mesh axis.

The reference has no sequence parallelism of any kind (SURVEY §5: host-side
truncation only); this is the TPU-native extension point SURVEY reserves
for long inputs — speech-translation log-mel streams run to thousands of
frames before AFS pruning, where a single chip's attention memory and a
pure-DP batch split both give out.

Design (blockwise/ring, Liu et al. 2023 pattern, built from scratch on
shard_map + ppermute): activations are sharded [B, S/n, D] over the 'seq'
axis; every position-wise op (LN, FFN, residual, projections) needs no
communication under GSPMD. Self-attention runs under shard_map: each
device holds its query block and one rotating K/V block, accumulates
online-softmax state (running max m, denominator l, weighted sum acc) in
fp32, and ppermutes the K/V block around the ring — n steps, each
overlapping one block matmul with one neighbour transfer over ICI; no
[S, S] score tensor and no all-gather of K/V ever materialises.

Masking matches the dense path exactly: blocked logits are set to -1e9
(not -inf), so an all-pad row degrades to uniform attention over the pad
positions — the same "legal all-pad batch rows" invariant the rest of the
framework keeps (no NaNs). Causal blocks compare global positions
(q_owner*Lq + i vs kv_owner*Lk + j), so enc/dec self-attention both work.

Attention dropout folds the (query-owner, kv-owner) pair into the PRNG
key and draws the fused counter-hash mask per block (ops/common.py
DROPOUT_BITS): masks stay decorrelated across shards without any
cross-device mask traffic. The mask stream differs from the dense path's
(different element indexing), which is fine — dropout is stochastic; the
dropout-off path is what the equivalence tests pin down.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from zero_tpu.ops.common import _hash_bits

# plain python float, NOT jnp.float32(...): a module-level jnp constant
# would initialize the XLA backend at import time, which breaks
# jax.distributed.initialize in multi-host workers (train.py imports
# this module)
_NEG = -1e9

# Mesh registry: model code (ops/attention.py) routes through shard_map but
# only the driver knows the mesh; the driver (train.py / tests) publishes it
# here. None => no mesh => ring attention unavailable, dense path runs.
_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def seq_degree() -> int:
    """Size of the 'seq' axis of the active mesh (1 = SP off)."""
    m = _ACTIVE_MESH
    return int(m.shape.get("seq", 1)) if m is not None else 1


# SP-inside-PP: a nested shard_map over 'seq' inside the 'pipe' manual
# region is rejected by the shardy lowering, but ONE region manual over
# BOTH axes is legal -- the pipeline (parallel/pipe.py) opens such a
# region and flags it here at trace time, and attention routes to the
# ring BODY directly (no nested shard_map). Trace-time python state is
# safe: shard_map traces its callee exactly once.
_MANUAL_SEQ = False


@contextlib.contextmanager
def manual_seq_region():
    """Mark that tracing is inside a manual region that includes 'seq'."""
    global _MANUAL_SEQ
    prev = _MANUAL_SEQ
    _MANUAL_SEQ = True
    try:
        yield
    finally:
        _MANUAL_SEQ = prev


def in_manual_seq() -> bool:
    return _MANUAL_SEQ


def ring_supported(lq: int, lk: int) -> bool:
    n = seq_degree()
    return n > 1 and lq % n == 0 and lk % n == 0 and lq == lk


def ring_route_ok(batch: int, num_heads: int, lq: int, lk: int) -> bool:
    """True when the active mesh can shard [B, H, L, dh] as
    P('data', 'model', 'seq', None): every axis must divide its dim."""
    m = _ACTIVE_MESH
    if m is None or not ring_supported(lq, lk):
        return False
    # inside another partial-manual region (the 'pipe' pipeline), a
    # nested manual 'seq' computation is rejected by the shardy lowering
    # ("axis already bound by a parent manual computation", jax 0.9.0):
    # fall back to the dense path there (still sharded over the auto
    # axes by GSPMD)
    ambient = jax.sharding.get_abstract_mesh()
    if ambient is not None and getattr(ambient, "manual_axes", ()):
        return False
    return (batch % int(m.shape.get("data", 1)) == 0
            and num_heads % int(m.shape.get("model", 1)) == 0)


def _drop_mask(p, rng, drop):
    """Counter-hash dropout on block weights (inverted scale)."""
    if rng is None or not drop:
        return p
    t = int(round((1.0 - drop) * 256.0))
    if t <= 0:
        return jnp.zeros_like(p)
    if t >= 256:
        return p
    bits = _hash_bits(rng, p.shape) & jnp.uint32(255)
    return jnp.where(bits < jnp.uint32(t), p * (256.0 / t),
                     jnp.zeros_like(p))


def _rpr_block(rpr_tables, qpos, kpos, max_rel):
    """Per-block relative-position embeddings from GLOBAL positions:
    ids [Lq, Lk] = clip(qpos - kpos, ±max_rel) + max_rel; returns fp32
    (r_k [Lq, Lk, dh], r_v [Lq, Lk, dh]) -- ops/rpr.py math on ring
    blocks (the dense path computes the same ids over the full [L, L])."""
    ids = jnp.clip(qpos[:, None] - kpos[None, :], -max_rel, max_rel) \
        + max_rel
    r_k = jnp.take(rpr_tables["keys"].astype(jnp.float32), ids, axis=0)
    r_v = jnp.take(rpr_tables["values"].astype(jnp.float32), ids, axis=0)
    return r_k, r_v


def _block_attn(q, kh, vh, keep, qpos, kpos, causal, rng, drop, m, l, acc,
                relu=False, rpr_tables=None, max_rel=None):
    """One accumulation step against a single K/V block.

    q is pre-scaled fp32 [B, H, Lq, dh]; kh/vh [B, H, Lk, dh];
    keep [B, Lk] or None. Returns updated (m, l, acc).

    relu=True: ReLA mode (ops/attention.py _attn_core relu branch) --
    multiply-masked relu weights, NO normalisation, so the block sum is
    linear and m/l pass through untouched.
    rpr_tables: Shaw relative-position add-ons on logits and outputs;
    distances come from the blocks' GLOBAL positions, so the ring result
    equals the dense [L, L] computation."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, kh.astype(jnp.float32))
    r_v = None
    if rpr_tables is not None:
        r_k, r_v = _rpr_block(rpr_tables, qpos, kpos, max_rel)
        logits = logits + jnp.einsum("bhqd,qkd->bhqk", q, r_k)

    if relu:
        mult = jnp.ones((), jnp.float32)
        if keep is not None:
            mult = mult * keep[:, None, None, :]
        if causal:
            allowed = (kpos[None, :] <= qpos[:, None]).astype(jnp.float32)
            mult = mult * allowed[None, None]
        p = _drop_mask(jax.nn.relu(logits * mult), rng, drop)
    else:
        if keep is not None:
            logits = jnp.where(keep[:, None, None, :] > 0, logits, _NEG)
        if causal:
            allowed = kpos[None, :] <= qpos[:, None]      # [Lq, Lk]
            logits = jnp.where(allowed[None, None], logits, _NEG)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        rescale = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l = l * rescale + jnp.sum(p, axis=-1)
        p = _drop_mask(p, rng, drop)
        acc = acc * rescale[..., None]
        m = m_new

    acc = acc + jnp.einsum("bhqk,bhkd->bhqd", p, vh.astype(jnp.float32))
    if r_v is not None:
        acc = acc + jnp.einsum("bhqk,qkd->bhqd", p, r_v)
    return m, l, acc


def _ring_body(qh, kh, vh, kv_keep, rng, *, n, axis_name, causal, drop,
               relu=False, rpr_tables=None, max_rel=None):
    """Per-device body under shard_map: n-step ring accumulation."""
    b, h, lq, dh = qh.shape
    lk = kh.shape[2]
    me = jax.lax.axis_index(axis_name)
    q = qh.astype(jnp.float32) * (dh ** -0.5)
    qpos = me * lq + jnp.arange(lq)

    # online-softmax carries vary across seq members from round 1 on (and
    # across any enclosing manual axes, e.g. nested inside the 'pipe'
    # pipeline): derive the zero inits from q so they inherit the full
    # varying-axes type instead of pinning a hardcoded axis set
    zero = q[..., 0] * 0
    m = zero + _NEG * 2
    l = zero
    acc = q * 0
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, s):
        m, l, acc, kh, vh, keep = carry
        owner = (me - s) % n                      # whose K/V block we hold
        kpos = owner * lk + jnp.arange(lk)
        step_rng = None
        if rng is not None and drop:
            step_rng = jax.random.fold_in(jax.random.fold_in(rng, me), owner)
        m, l, acc = _block_attn(q, kh, vh, keep, qpos, kpos, causal,
                                step_rng, drop, m, l, acc, relu=relu,
                                rpr_tables=rpr_tables, max_rel=max_rel)
        if n > 1:
            kh = jax.lax.ppermute(kh, axis_name, perm)
            vh = jax.lax.ppermute(vh, axis_name, perm)
            if keep is not None:
                keep = jax.lax.ppermute(keep, axis_name, perm)
        return (m, l, acc, kh, vh, keep), None

    (m, l, acc, _, _, _), _ = jax.lax.scan(
        step, (m, l, acc, kh, vh, kv_keep), jnp.arange(n))
    # ReLA has no normalisation: the relu block sums are final
    out = acc if relu else acc / jnp.maximum(l[..., None], 1e-30)
    return out.astype(qh.dtype)


def ring_self_attention_manual(qh, kh, vh, kv_keep_global=None, *,
                               causal=False, rng=None, drop=None,
                               relu=False, rpr_tables=None, max_rel=None):
    """Ring self-attention INSIDE an ambient manual region over 'seq'
    (the combined {'pipe','seq'} region of parallel/pipe.py).

    qh/kh/vh: LOCAL [B, H, S/n, dh] blocks (the caller's activations are
    already seq-sharded by the enclosing shard_map); kv_keep_global: the
    FULL [B, S] key-side pad mask (consts enter the region replicated) --
    this member's block is sliced out here -- or None. Same math as
    ring_self_attention; no nested shard_map. relu/rpr_tables/max_rel:
    the ReLA and Shaw-RPR attention variants (_block_attn)."""
    n = seq_degree()
    drop = float(drop) if (drop and rng is not None) else 0.0
    lk = kh.shape[2]
    if kv_keep_global is None:
        # mark varying over 'seq': the ring ppermutes this block around
        keep = jax.lax.pcast(jnp.ones((qh.shape[0], lk), jnp.float32),
                             ("seq",), to="varying")
    else:
        me = jax.lax.axis_index("seq")
        keep = jax.lax.dynamic_slice_in_dim(
            kv_keep_global.astype(jnp.float32), me * lk, lk, axis=1)
    if not drop:
        rng = jax.random.PRNGKey(0)  # unused placeholder
    return _ring_body(qh, kh, vh, keep, rng, n=n, axis_name="seq",
                      causal=causal, drop=drop, relu=relu,
                      rpr_tables=rpr_tables, max_rel=max_rel)


def _exclusive_shard_prefix(total):
    """Sum of ``total`` over all 'seq' members strictly before this one.

    total: this member's local reduction [B, ...]; the gather moves
    n*B*D elements (shard totals only, not sequences) over ICI."""
    n = seq_degree()
    me = jax.lax.axis_index("seq")
    allt = jax.lax.all_gather(total, "seq")               # [n, B, ...]
    w = (jnp.arange(n) < me).astype(allt.dtype)           # exclusive
    return jnp.einsum("s,s...->...", w, allt)


def seq_cummean_manual(x_loc, mask_global, *, masked=True):
    """Cumulative (masked) mean over the GLOBAL sequence, seq-parallel.

    Inside a manual region over 'seq': x_loc [B, L/n, D] is this
    member's block; mask_global [B, L] the full target pad mask (consts
    enter replicated). Per global position g:
      masked=True  (AAN aan_mask, nn.aan_weight semantics):
        m_g * (sum_{j<=g} m_j x_j) / max(sum_{j<=g} m_j, 1)
      masked=False (AAN cumsum mode):
        (sum_{j<=g} x_j) / max(sum_{j<=g} m_j, 1)
    Local cumsums + one all-gather of shard totals give the exact
    global prefix; fp32 accumulation."""
    l = x_loc.shape[1]
    me = jax.lax.axis_index("seq")
    m_loc = jax.lax.dynamic_slice_in_dim(
        mask_global.astype(jnp.float32), me * l, l, axis=1)  # [B, L/n]
    xf = x_loc.astype(jnp.float32)
    num_loc = jnp.cumsum(xf * m_loc[..., None] if masked else xf, axis=1)
    cnt_loc = jnp.cumsum(m_loc, axis=1)
    num = num_loc + _exclusive_shard_prefix(num_loc[:, -1])[:, None]
    cnt = cnt_loc + _exclusive_shard_prefix(cnt_loc[:, -1])[:, None]
    out = num / jnp.maximum(cnt, 1.0)[..., None]
    if masked:
        out = out * m_loc[..., None]
    return out.astype(x_loc.dtype)


def ring_self_attention(qh, kh, vh, kv_keep=None, *, causal=False,
                        rng=None, drop=None, mesh: Optional[Mesh] = None,
                        relu=False, rpr_tables=None, max_rel=None):
    """Sequence-parallel self-attention on head-split projections.

    qh/kh/vh: [B, H, S, dh] GLOBAL arrays (inside jit, GSPMD-sharded);
    kv_keep: [B, S] 1/0 key-side pad mask or None. Shards B over 'data',
    H over 'model', S over 'seq'; returns [B, H, S, dh] sharded the same
    way. Equals dense masked softmax attention (fp32 accumulation) up to
    summation order. relu=True runs the ReLA variant (linear relu block
    sums, no normalisation); rpr_tables/max_rel add Shaw relative-
    position terms computed from global positions (tables enter the
    region replicated; their grads psum over 'seq' at the boundary).
    """
    mesh = mesh if mesh is not None else _ACTIVE_MESH
    if mesh is None:
        raise ValueError("ring_self_attention needs a mesh: call "
                         "parallel.set_active_mesh(mesh) or pass mesh=")
    n = int(mesh.shape.get("seq", 1))
    drop = float(drop) if (drop and rng is not None) else 0.0
    if kv_keep is None:
        kv_keep = jnp.ones(
            (qh.shape[0], kh.shape[2]), jnp.float32)
    if not drop:
        rng = jax.random.PRNGKey(0)  # unused placeholder (shard_map arg)

    body = functools.partial(_ring_body, n=n, axis_name="seq",
                             causal=causal, drop=drop, relu=relu,
                             max_rel=max_rel)
    # partial-manual: only 'seq' is mapped here; batch/head sharding over
    # 'data'/'model' stays GSPMD-managed, which also lets the ring nest
    # inside other partial-manual regions (the 'pipe' pipeline). When an
    # ambient mesh context is already set (inside such a region), the
    # mesh kwarg must be omitted -- the context supplies it.
    qspec = P(None, None, "seq", None)
    kwargs = {}
    ambient = jax.sharding.get_abstract_mesh()
    if ambient is None or not ambient.shape:
        kwargs["mesh"] = mesh
    f = jax.shard_map(
        lambda q_, k_, v_, keep_, rng_, rpr_: body(q_, k_, v_, keep_, rng_,
                                                   rpr_tables=rpr_),
        axis_names={"seq"},
        in_specs=(qspec, qspec, qspec, P(None, "seq"), P(),
                  jax.tree.map(lambda _: P(), rpr_tables)),
        out_specs=qspec,
        **kwargs)
    return f(qh, kh, vh, kv_keep, rng, rpr_tables)
