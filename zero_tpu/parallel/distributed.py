"""Multi-host (multi-process) training support.

The reference is strictly single-process/single-host (SURVEY §2.3: "no
multi-node support of any kind"). zero_tpu extends to multi-host SPMD the
JAX way: ``jax.distributed.initialize`` connects the processes, the mesh
spans all global devices, and each host feeds its own shard of the data-
parallel batch through ``jax.make_array_from_process_local_data`` -- GSPMD
inserts the cross-host collectives (ICI within a slice, DCN across).

Config knobs: dist_coordinator ("host:port", empty = single process),
dist_num_processes, dist_process_id. Multi-host batches must be
shape-identical across hosts, so the driver switches the dataset to fully
fixed shapes (pad_seq -> max_len, batch padded to the configured size).
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
    leaves that are not fully addressable -- cross-host-sharded state such
    as ZeRO-1 moments/EMA or ZeRO-3 params spanning the 'data' axis over
    hosts -- are all-gathered to every host as numpy arrays; fully
    replicated / host-local leaves pass through. COLLECTIVE: when
    process_count() > 1 every process must call this at the same program
    point, even if only the primary consumes the result (checkpoint
    writes, primary-host eval) -- a primary-only call deadlocks.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    def fetch(leaf):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            return multihost_utils.process_allgather(leaf, tiled=True)
        return leaf
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
