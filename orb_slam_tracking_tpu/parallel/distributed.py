"""Multi-host process-group setup and global-array plumbing.

The reference is strictly single-process (SURVEY.md §5.8: no MPI/NCCL/
Gloo anywhere); the TPU-native scaling model is JAX's multi-controller
SPMD: every host runs the same program, ``jax.distributed.initialize``
forms the process group, ``jax.sharding.Mesh`` spans ALL processes'
devices, and XLA compiles the collectives (psum over ICI within a slice,
DCN across slices). No custom transport is written — these helpers only
standardize:

- ``initialize_from_env``: process-group bring-up from environment
  variables (coordinator address, process count/id), a no-op for
  single-process runs;
- ``global_mesh``: a 1-D mesh over every device in the job;
- ``make_global_array``: wrap each process's slice of a host array into
  one global sharded ``jax.Array`` (the multi-process analog of
  ``jax.device_put`` with a NamedSharding);
- ``replicate``: a fully-replicated global array.

Tested with a real 2-process CPU group in
``tests/test_distributed_multiprocess.py`` (SURVEY.md §4's prescription:
multi-host behavior must be testable without a pod).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_from_env", "global_mesh", "make_global_array", "replicate",
    "process_index", "process_count",
]


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Form the JAX process group from args or environment.

    Environment keys (standard JAX names): ``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``. Returns True when a
    multi-process group was initialized, False for single-process (no-op).
    Safe to call more than once (subsequent calls no-op).
    """
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0
    )
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1") or -1
    )
    if not coord or nproc <= 1:
        return False
    if jax._src.distributed.global_state.client is not None:  # already up
        return True
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def global_mesh(axis: str = "points") -> Mesh:
    """1-D mesh over every device of every process in the job."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def make_global_array(mesh: Mesh, axis: str, host_array: np.ndarray):
    """Build a global ``jax.Array`` sharded on dim 0 over ``axis`` from a
    host copy of the FULL array (every process passes the same full array;
    each keeps only its own slice device-side)."""
    sharding = NamedSharding(mesh, P(axis))
    n = host_array.shape[0]
    nshards = mesh.shape[axis]
    assert n % nshards == 0, (n, nshards)
    per = n // nshards
    device_to_index = {d: i for i, d in enumerate(mesh.devices.reshape(-1))}
    # rows owned by this process's devices, in mesh order
    addr = sorted(sharding.addressable_devices, key=lambda d: device_to_index[d])
    local = np.concatenate([
        host_array[device_to_index[d] * per: (device_to_index[d] + 1) * per]
        for d in addr
    ])
    return jax.make_array_from_process_local_data(
        sharding, local, host_array.shape
    )


def replicate(mesh: Mesh, host_array: np.ndarray):
    """Fully-replicated global array (camera blocks, K, masks)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(host_array, sharding)
    return jax.make_array_from_process_local_data(
        sharding, host_array, host_array.shape
    )
