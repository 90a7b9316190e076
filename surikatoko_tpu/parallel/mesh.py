"""Mesh construction helpers.

One logical axis family covers the engine's scaling dimensions:
  "lm"  — landmark/point blocks (EKF covariance rows, BA landmark blocks)
Multi-host: build the mesh over all processes' devices
(jax.distributed.initialize is the caller's responsibility on real slices).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def landmark_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the landmark axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), axis_names=("lm",))
