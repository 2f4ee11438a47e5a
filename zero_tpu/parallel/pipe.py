"""Pipeline parallelism: layer stacks sharded over a 'pipe' mesh axis.

The reference's only parallelism is single-host data parallelism
(SURVEY §2.3); this is a TPU-native extension for deep stacks (the
20L/30L presets of docs/depth_scale_init_and_merged_attention) on
multi-chip meshes where pure DP replicates every layer's weights into
every chip's HBM.

Design (GPipe schedule expressed in SPMD, built on shard_map +
ppermute): scan_layers already stores a stack as [L, ...] leaves; PP
shards that leading layer dim over 'pipe', so each device holds L/P
layers and runs them with the same lax.scan body. The batch is split
into M microbatches; over M+P-1 rounds, stage p processes microbatch
i-p and ppermutes its activations to stage p+1 over ICI. Stage 0
injects a fresh microbatch each round, the last stage collects
finished ones; off-diagonal rounds compute masked garbage (the GPipe
bubble, (P-1)/(M+P-1) of the schedule). Only the 'pipe' axis is
mapped (shard_map axis_names): 'data'/'model'/'seq' sharding inside
the body stays GSPMD-managed, so PP composes with DP/TP/SP and with
gradient checkpointing.

Equivalence: with dropout off the result is bit-comparable to the
plain stacked scan (tests/test_pipe.py: fwd + grads vs _scan_stack).
Dropout draws per-(layer, microbatch) keys -- fold_in of the
microbatch index -- so masks are decorrelated across microbatches;
the mask stream necessarily differs from the dense run's (mask shape
is the microbatch), which is fine: dropout is stochastic and the
dropout-off path pins the math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from zero_tpu.parallel import ring


def pipe_degree() -> int:
    """Size of the 'pipe' axis of the active mesh (1 = PP off)."""
    m = ring.active_mesh()
    return int(m.shape.get("pipe", 1)) if m is not None else 1


def pipe_eligible(num_layers: int, batch: int, microbatches: int) -> bool:
    p = pipe_degree()
    if p <= 1:
        return False
    m = microbatches if microbatches > 0 else p
    return num_layers % p == 0 and batch % m == 0


def _fold_keys(keys_l, mb_idx):
    """Per-(layer, microbatch) dropout keys: fold the microbatch index
    into each of the layer's stacked rng keys."""
    return jax.vmap(lambda k: jax.random.fold_in(k, mb_idx))(keys_l)


def pipeline_stack(layer_fn, x, stacked_params, keys, consts=None, *,
                   microbatches=0, use_remat=False, remat_policy=None,
                   mesh=None, axis="pipe", seq_in_pipe=False):
    """Run ``layer_fn`` over a pipe-sharded layer stack; semantically the
    stacked lax.scan of models/common.py:_scan_stack.

    layer_fn(p_l, h, rngs, consts_mb) -> h, where rngs() yields the
    layer's dropout keys in order (None keys => rngs() returns None).
    x: [B, ...] global activations; stacked_params / keys: [L, ...]
    leaves. ``consts`` is a pytree of layer-invariant tensors (masks,
    encoder state); every leaf whose leading dim equals the batch is
    sliced to the current microbatch's rows, other leaves pass through
    whole. Non-'pipe' mesh axes are left to GSPMD (shard_map
    axis_names), so callers do not re-spec data/model/seq sharding here.

    seq_in_pipe=True (callers pass the model hooks' declared capability):
    when the mesh also has a 'seq' axis that divides x's sequence dim,
    the region goes manual over BOTH {'pipe','seq'} -- a nested
    shard_map over 'seq' inside the pipe region is rejected by shardy,
    but one region manual over both axes is legal. x enters sliced
    [B, S/n, ...]; consts stay replicated (the ring route slices its own
    key-side mask block by axis_index, parallel/ring.py
    ring_self_attention_manual), and attention inside the layer body
    routes through the ring BODY directly (ops/attention.py).
    """
    mesh = mesh if mesh is not None else ring.active_mesh()
    n_stage = int(mesh.shape.get(axis, 1))
    n_mb = microbatches if microbatches > 0 else n_stage
    batch = x.shape[0]
    mb_rows = batch // n_mb
    assert batch % n_mb == 0, (batch, n_mb)
    n_seq = int(mesh.shape.get("seq", 1))
    use_seq = (seq_in_pipe and n_seq > 1 and x.ndim >= 2
               and x.shape[1] % n_seq == 0)
    manual_axes = {axis} | ({"seq"} if use_seq else set())

    def inner(p_l, h, keys_l, consts_mb):
        if keys_l is None:
            return layer_fn(p_l, h, lambda: None, consts_mb)
        it = iter([keys_l[i] for i in range(keys_l.shape[0])])
        return layer_fn(p_l, h, lambda: next(it), consts_mb)

    if use_remat:
        inner = jax.checkpoint(inner, static_argnums=(),
                               policy=remat_policy)

    def _slice_consts(consts, mb_idx):
        def sl(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                    and leaf.shape[0] == batch:
                return jax.lax.dynamic_slice_in_dim(
                    leaf, mb_idx * mb_rows, mb_rows, 0)
            return leaf
        return jax.tree.map(sl, consts)

    # bf16 tensors cross the shard_map boundary as fp32: a replicated-in
    # (P()) input's cotangent is an automatic psum over 'pipe', and a
    # bf16 all-reduce crashes XLA CPU's AllReducePromotion pass ("Invalid
    # binary instruction opcode copy", jaxlib 0.9.0). Compute stays in
    # the original dtype -- the casts bracket only the boundary.
    x_dtype = x.dtype
    const_dtypes = jax.tree.map(lambda c: c.dtype if hasattr(c, "dtype")
                                else None, consts)
    # with 'seq' also manual, the P('pipe') params are REPLICATED w.r.t.
    # 'seq', so their cotangent is a psum over 'seq' -- and the compute
    # params are bf16 (models/common.py cast_to_compute), which hits the
    # same AllReducePromotion crash. Widen them across the boundary too
    # (PP-only keeps the direct path: params are fully sharded on the
    # lone manual axis there, no psum).
    param_dtypes = jax.tree.map(lambda c: c.dtype if hasattr(c, "dtype")
                                else None, stacked_params) \
        if use_seq else None

    def _widen(t):
        return jax.tree.map(
            lambda c: c.astype(jnp.float32)
            if hasattr(c, "dtype") and c.dtype == jnp.bfloat16 else c, t)

    def _narrow(t, dtypes):
        return jax.tree.map(
            lambda c, d: c.astype(d) if d is not None else c, t, dtypes)

    def _vary_seq(t):
        # mark leaves varying over 'seq' while STILL fp32: a bf16 leaf
        # that stays seq-invariant gets its cotangent psum_invariant'ed
        # over 'seq' in bf16 at the checkpoint/scan transpose boundary
        # (the AllReducePromotion crash again); pcast-ing the fp32 side
        # moves that psum to fp32. Free at runtime (type info only).
        return jax.tree.map(
            lambda c: jax.lax.pcast(c, ("seq",), to="varying"), t)

    def local(params_loc, keys_loc, xg, consts):
        if param_dtypes is not None:
            params_loc = _narrow(_vary_seq(params_loc), param_dtypes)
            if keys_loc is not None:
                keys_loc = _vary_seq(keys_loc)
        stage = jax.lax.axis_index(axis)
        mb_shape = (n_mb, mb_rows) + xg.shape[1:]
        # the pipeline plumbing (xs / rotating buf / banked out and their
        # selects) stays fp32 end to end: the invariant->varying vma
        # boundaries sit on these tensors, and each such boundary's
        # backward is a psum over 'pipe' (see the boundary note above).
        # The compute dtype is restored only inside stage_layers.
        xs = xg.reshape(mb_shape)

        def stage_layers(h, mb_idx):
            consts_mb = _slice_consts(consts, mb_idx)
            if param_dtypes is not None:
                consts_mb = _vary_seq(consts_mb)
            consts_mb = _narrow(consts_mb, const_dtypes)
            h = h.astype(x_dtype)
            if keys_loc is None:
                def sb(carry, p_l):
                    return inner(p_l, carry, None, consts_mb), None
                h, _ = jax.lax.scan(sb, h, params_loc)
            else:
                def sb(carry, inp):
                    p_l, keys_l = inp
                    return inner(p_l, carry, _fold_keys(keys_l, mb_idx),
                                 consts_mb), None
                h, _ = jax.lax.scan(sb, h, (params_loc, keys_loc))
            return h.astype(jnp.float32)

        def round_body(i, carry):
            buf, out = carry
            # stage 0 ingests microbatch i; later stages consume the
            # activations ppermuted in at the end of round i-1
            mb_in = jnp.clip(i, 0, n_mb - 1)
            h = jnp.where(stage == 0,
                          jax.lax.dynamic_index_in_dim(xs, mb_in, 0,
                                                       keepdims=False),
                          buf)
            h = stage_layers(h, jnp.clip(i - stage, 0, n_mb - 1))
            # last stage banks finished microbatch j = i - (P-1)
            j = i - (n_stage - 1)
            valid = jnp.logical_and(stage == n_stage - 1,
                                    jnp.logical_and(j >= 0, j < n_mb))
            banked = jax.lax.dynamic_update_index_in_dim(
                out, h, jnp.clip(j, 0, n_mb - 1), 0)
            out = jnp.where(valid, banked, out)
            if n_stage > 1:
                perm = [(q, (q + 1) % n_stage) for q in range(n_stage)]
                buf = jax.lax.ppermute(h, axis, perm)
            else:
                buf = h
            return buf, out

        # the carries VARY across pipe members (and seq members when the
        # region is manual over 'seq' too) while the zero inits are
        # invariant: pcast marks them varying so the loop types line up
        vaxes = tuple(sorted(manual_axes))
        # fresh zeros (not zeros_like): the inits must start fully
        # invariant so one pcast covers every manual axis
        out0 = jax.lax.pcast(jnp.zeros(mb_shape, xg.dtype), vaxes,
                             to="varying")
        buf0 = jax.lax.pcast(jnp.zeros(xs.shape[1:], xs.dtype), vaxes,
                             to="varying")
        _, out = jax.lax.fori_loop(0, n_mb + n_stage - 1, round_body,
                                   (buf0, out0))
        # all stages must agree for the replicated-out spec: only the
        # last stage holds real data; psum broadcasts it over the ring.
        # The reduction runs in fp32: a bf16 all-reduce crashes XLA CPU's
        # AllReducePromotion pass ("Invalid binary instruction opcode
        # copy", jaxlib 0.9.0) and fp32 summation is also exact here
        # (every addend but one is literal zero).
        out = jnp.where(stage == n_stage - 1, out, jnp.zeros_like(out))
        out = jax.lax.psum(out.astype(jnp.float32), axis)
        # stays fp32 across the boundary (see _widen above); the caller
        # casts back to the compute dtype
        return out.reshape(xg.shape)

    pspec = jax.tree.map(lambda _: P(axis), stacked_params)
    kspec = None if keys is None else jax.tree.map(lambda _: P(axis), keys)
    cspec = jax.tree.map(lambda _: P(), consts)
    # x enters sliced over 'seq' (dim 1) when the region is manual over
    # 'seq'; otherwise replicated w.r.t. 'pipe' with GSPMD managing the
    # auto axes as before
    xspec = P(None, "seq") if use_seq else P()
    # NOTE: check_vma must stay at its default -- check_vma=False makes
    # shard_map treat P() as referring to every mesh axis, breaking the
    # partial-manual (axis_names={'pipe'}) mode (measured jax 0.9.0)
    f = jax.shard_map(
        local, mesh=mesh, axis_names=manual_axes,
        in_specs=(pspec, kspec, xspec, cspec),
        out_specs=xspec)
    if use_seq:
        with ring.manual_seq_region():
            out = f(_widen(stacked_params), keys, _widen(x), _widen(consts))
    else:
        out = f(stacked_params, keys, _widen(x), _widen(consts))
    return out.astype(x_dtype)


