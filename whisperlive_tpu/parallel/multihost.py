"""Multi-host meshes: data parallelism over DCN, tensor parallelism on ICI.

The reference (collabora/WhisperLive) scales by running more threads on
one GPU — it has no multi-host story at all (SURVEY §5: TRT-LLM pinned to
world_size=1). This module is the TPU-native scale-out layer: N hosts
each driving their local slice of a pod, connected by
`jax.distributed`. Every process runs the SAME program over the SAME
global mesh; XLA routes the collectives so that

  * tensor-parallel ("model" axis) collectives stay on ICI — the
    (dp, tp) reshape in `parallel.mesh.make_mesh` keeps each tp group
    inside one process whenever tp divides the local device count,
    because `jax.devices()` orders devices process-major;
  * data-parallel ("data" axis) gradient/batch reductions cross hosts
    and ride DCN, where the all-reduce volume (one gradient pytree per
    step) tolerates the lower bandwidth.

Hosts feed their own shard of the global batch
(`local_batch_to_global`), and exactly one host writes checkpoints
(`save_checkpoint`). Verified end-to-end by tests/test_multihost.py:
two REAL processes (gloo-backed cpu collectives) train the same model a
single-process mesh trains, to the same loss.

Usage (same script on every host):

    from whisperlive_tpu.parallel import multihost
    multihost.init_multihost()            # or WL_COORDINATOR/... env vars
    sh = multihost.multihost_shardings(tp=4)
    ...
    batch = {k: multihost.local_batch_to_global(v, sh.batch_sharding(v.ndim))
             for k, v in local_batch.items()}
    state, loss = step(state, batch)      # identical on every host
    multihost.save_checkpoint(path, state, cfg)   # proc 0 writes
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np

from whisperlive_tpu.parallel.mesh import EngineShardings

logger = logging.getLogger(__name__)


def init_multihost(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Connect this process to the multi-host cluster.

    Arguments fall back to WL_COORDINATOR ("host:port" of process 0),
    WL_NUM_PROCS and WL_PROC_ID — set those three on every host and call
    with no arguments. A single-process configuration (or no
    coordinator) is a no-op returning False, so the same entry point
    serves laptops and pods. Must run before the first jax device query
    (jax.distributed requires an un-initialized backend)."""
    coordinator = coordinator or os.environ.get("WL_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("WL_NUM_PROCS", "1"))
    if process_id is None:
        process_id = int(os.environ.get("WL_PROC_ID", "0"))
    if not coordinator or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "multihost: process %d/%d via %s (%d local / %d global devices)",
        process_id, num_processes, coordinator,
        jax.local_device_count(), jax.device_count(),
    )
    return True


def is_primary() -> bool:
    """True on the one process that should write checkpoints/logs."""
    return jax.process_index() == 0


def multihost_shardings(
    tp: int = 1, dp: Optional[int] = None
) -> EngineShardings:
    """EngineShardings over ALL hosts' devices with host-local tp groups.

    tp must divide the local device count — a tp group that straddled
    hosts would put every per-layer all-reduce on DCN, which is exactly
    the layout the scaling playbook forbids (TP wants the fast ICI
    mesh). dp defaults to global_devices // tp and spans hosts."""
    local = jax.local_device_count()
    if tp > local or (tp > 0 and local % tp):
        raise ValueError(
            f"tp={tp} must divide the local device count ({local}): a "
            "cross-host tp group would run per-layer collectives on DCN"
        )
    return EngineShardings.create(tp=tp, dp=dp)


def local_batch_to_global(local_arr, sharding):
    """Assemble a globally-sharded array from this host's batch shard.

    Every host passes its own [local_b, ...] slice; the result is a
    jax.Array with global shape [local_b * n_processes, ...] laid out by
    `sharding` (batch axis 0 over "data"). No cross-host copy happens —
    each host's shard stays on its devices; only metadata is global."""
    n = jax.process_count()
    global_shape = (local_arr.shape[0] * n,) + tuple(local_arr.shape[1:])
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_arr), global_shape
    )


def barrier(name: str = "wl") -> None:
    """Block until every host reaches this point (DCN sync)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def fetch_replicated(x) -> np.ndarray:
    """Device->host fetch of a replicated/scalar value, same on all hosts."""
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def save_checkpoint(path: str, state, cfg) -> None:
    """Collective checkpoint: EVERY host calls this with the same state.

    orbax's save is itself a collective in multi-process jax (it
    barriers internally and understands sharded jax.Arrays — each host
    contributes its shards, the primary writes the manifest), so the
    right multi-host pattern is all-processes-call-save, NOT
    proc-0-only (a lone caller deadlocks orbax's internal
    sync_global_processes). training.save_checkpoint guards its
    metadata write to the primary process. The trailing barrier keeps
    readers from loading a directory another host is still writing."""
    from whisperlive_tpu import training

    training.save_checkpoint(path, state, cfg)
    barrier("ckpt-end")
