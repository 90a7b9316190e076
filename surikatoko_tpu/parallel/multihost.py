"""Multi-host initialization + deployment notes for v5p slices.

The reference is single-process; this module is the thin entry point for
running the sharded EKF/Schur stack across hosts. There is no custom
transport: `jax.distributed.initialize` brings up the JAX runtime, the
mesh spans all processes' devices, and XLA lowers psum/all_gather onto ICI
within a slice and DCN across slices (SURVEY §5.8).

Deployment recipe (v5p-16, 2 hosts x 8 chips):
  # on every host (same command; env vars from the TPU runtime):
  python -c "from surikatoko_tpu.parallel import multihost; multihost.initialize()"
  # then build the mesh over the global device list:
  mesh = landmark_mesh()            # 16-way 'lm' axis
  update = make_sharded_stacked_update(params, capacity, mesh)
  # inputs must be globally-sharded jax.Arrays: use
  # jax.make_array_from_process_local_data / device_put with NamedSharding.

Sharding guidance (scaling-book recipe): the EKF all_gather of the gain
precursor A [2K, D] and the Schur psum of the reduced system are the only
cross-device transfers per step — both bandwidth-light relative to the local
O(D^2 K / n) compute, so the layout keeps collectives on ICI and scales until
D^2/n falls below the per-chip latency floor (~5x frames/s at 16 chips for
the 10k-landmark configuration is compute-bound, per BASELINE).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU-pod auto-detection (all args
    optional on GCE TPU VMs; explicit for manual clusters).

    Must run before anything initializes the XLA backend — the guard is
    jax.distributed.is_initialized(), NOT jax.process_count() (which itself
    initializes the backend and would wedge a real pod bring-up)."""
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_slice_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
