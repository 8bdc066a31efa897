"""Multi-host initialization + cross-host utilities.

The reference's launcher is ``accelerate launch`` spawning one process per
GPU (reference run.sh:1). On TPU pods the launcher is the platform (one
process per host, all devices visible after jax.distributed.initialize);
these helpers cover that plus the host-coordination bits orbax needs.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize jax.distributed when running multi-host. No-ops on a
    single host (including the single-chip dev tunnel) so the same entry
    point works everywhere."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_slice(global_batch: int):
    """This host's slice of a globally-sharded batch."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)


def barrier(name="barrier"):
    """Cross-host sync point (orbax uses its own; this is for user code)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
