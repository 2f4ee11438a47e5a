"""Multi-host (multi-process) training support.

The reference is strictly single-process/single-host (SURVEY §2.3: "no
multi-node support of any kind"). zero_tpu extends to multi-host SPMD the
JAX way: ``jax.distributed.initialize`` connects the processes, the mesh
spans all global devices, and each host feeds its own shard of the data-
parallel batch through ``jax.make_array_from_process_local_data`` -- GSPMD
inserts the cross-host collectives (ICI within a slice, DCN across).

Config knobs: dist_coordinator ("host:port", empty = single process),
dist_num_processes, dist_process_id. Multi-host batches must be
shape-identical across hosts: every host builds the same deterministic
batch stream, takes one batch per group of nproc, and pads it to the
group's max shape (train.py grouped_device_batches) -- token bucketing
stays available with zero communication.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger("zero_tpu.distributed")


def maybe_initialize(params) -> None:
    """Connect this process to the training job (no-op when single)."""
    coordinator = getattr(params, "dist_coordinator", "")
    if not coordinator:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(params.dist_num_processes),
        process_id=int(params.dist_process_id),
    )
    log.info("distributed: process %d/%d, %d global / %d local devices",
             jax.process_index(), jax.process_count(),
             jax.device_count(), jax.local_device_count())


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def host_fetchable(tree):
    """Make every array leaf of ``tree`` safe to fetch on THIS host.

    Single-process: returns the tree unchanged (no copies). Multi-process:
    no global jax.Array is fully addressable, so every device leaf takes
    one of two paths:
      * REPLICATED leaves (one full copy per device) fetch locally via
        ``addressable_data(0)`` -- valid on every host, no collective, no
        per-shape compile;
      * genuinely cross-host-sharded leaves (ZeRO-1 moments/EMA, ZeRO-3
        params spanning the 'data' axis over hosts) are all-gathered to
        every host as numpy arrays via ``process_allgather`` (a jitted
        identity collective; ``tiled=True`` is REQUIRED for global
        inputs -- the result is the full global array, not a
        per-process stack).
    COLLECTIVE: when process_count() > 1 every process must call this at
    the same program point, even if only the primary consumes the result
    (checkpoint writes, primary-host eval) -- a primary-only call
    deadlocks.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def fetch(leaf):
        if not isinstance(leaf, jax.Array):
            return leaf
        if leaf.is_fully_replicated:
            # every device holds the full value: local fetch, no collective
            return jax.device_get(leaf.addressable_data(0))
        if not leaf.is_fully_addressable:
            return multihost_utils.process_allgather(leaf, tiled=True)
        return leaf
    return jax.tree.map(fetch, tree)


def put_eval_batch(batch, mesh, batch_axis: int = 0):
    """Shard an eval/decode batch's rows over the mesh 'data' axis.

    Unlike training batches (where each host contributes only its own
    shard, put_global_batch), eval batches are IDENTICAL on every host:
    the dev/test stream is deterministic and every process builds the
    same batches. ``jax.make_array_from_callback`` therefore works on
    one host and many alike -- each host serves whatever row slices its
    addressable devices need from its full local copy. The reference
    counterpart is the N-GPU eval round-robin (evalu.py:66-92).
    COLLECTIVE under multi-host: all processes must call it (and the
    consuming computation) at the same program point.
    """
    from zero_tpu.parallel.mesh import batch_sharding

    shardings = batch_sharding(batch, mesh, batch_axis)

    def put(x, s):
        import numpy as np
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s,
                                            lambda idx: x[idx])
    return jax.tree.map(put, batch, shardings)


def fetch_decode_output(tree):
    """Decode outputs -> host numpy on every host.

    Single-process: a plain device fetch (the arrays may be sharded over
    local devices; jax gathers). Multi-process: the outputs are sharded
    over hosts, so this is a collective all-gather -- every process must
    call it at the same point.
    """
    import numpy as np

    if jax.process_count() == 1:
        return jax.tree.map(np.asarray, tree)
    from jax.experimental import multihost_utils

    def fetch(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            if leaf.is_fully_replicated:
                return jax.device_get(leaf.addressable_data(0))
            return multihost_utils.process_allgather(leaf, tiled=True)
        return np.asarray(leaf)
    return jax.tree.map(fetch, tree)


def put_global_batch(batch, mesh, batch_axis: int = 0):
    """Host-local feature dict -> global sharded arrays.

    Single-process: a plain sharded device_put. Multi-process: each host
    contributes its local shard of the batch axis; the global batch is the
    concatenation across processes (pure data parallelism over hosts).
    """
    from zero_tpu.parallel.mesh import batch_sharding

    shardings = batch_sharding(batch, mesh, batch_axis)
    if jax.process_count() == 1:
        return jax.device_put(batch, shardings)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(s, x),
        batch, shardings)
