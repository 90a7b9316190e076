"""Synthetic dataset builders for tests/demos.

Equivalent of the reference prototype's test_data_builder.py
(``CrystallGridDataSet`` :26, ``CircusGridDataSet`` :240): named fixtures
producing (points [N,3], camera poses cfw [F], K) with deterministic
geometry, used as closed-loop BA/SLAM test inputs.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.world import scene_gen


class DataSet(NamedTuple):
    points: np.ndarray   # [N,3]
    cfw: SE3             # [F] camera-from-world
    K: np.ndarray        # [3,3]


def crystall_grid_dataset(n_frames: int = 10, cell: float = 0.5,
                          half_extent: float = 1.5) -> DataSet:
    """3D lattice of points ("crystal grid") viewed from a straight sweep."""
    wb = scene_gen.WorldBounds(-half_extent, half_extent,
                               -half_extent, half_extent, 0.0, 1.0)
    points = np.asarray(scene_gen.generate_grid_points(wb, (cell, cell, cell)))
    poses = []
    for i in range(n_frames):
        eye = np.array([-1.0 + 2.0 * i / max(n_frames - 1, 1), -4.0, 1.5])
        from surikatoko_tpu.geom import se3 as se3_mod
        wfc = se3_mod.look_at_luf_wfc(
            jnp.asarray(eye), jnp.asarray([0.0, 0.0, 0.5]),
            jnp.asarray([0.0, 0.0, 1.0]))
        poses.append(wfc.inv())
    cfw = SE3(jnp.stack([p.R for p in poses]), jnp.stack([p.t for p in poses]))
    K = np.array([[520.0, 0, 160.0], [0, 520.0, 120.0], [0, 0, 1.0]])
    return DataSet(points=points, cfw=cfw, K=K)


def circus_grid_dataset(n_frames: int = 12, radius: float = 4.0) -> DataSet:
    """Grid world circled by the camera ("circus ring")."""
    wb = scene_gen.WorldBounds(-1.5, 1.5, -1.5, 1.5, 0.0, 0.5)
    points = np.asarray(scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5)))
    angles = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    cfw = scene_gen.circle_camera_shots((0.0, 0.0, 0.25), radius, 2.5, angles)
    K = np.array([[520.0, 0, 160.0], [0, 520.0, 120.0], [0, 0, 1.0]])
    return DataSet(points=points, cfw=cfw, K=K)


def project_dataset(ds: DataSet, noise_pix: float = 0.0, seed: int = 0,
                    image_size=(320, 240)):
    """(obs [N,F,2], mask [N,F]) pixel observations of a dataset."""
    rng = np.random.default_rng(seed)
    N = len(ds.points)
    F = np.asarray(ds.cfw.t).shape[0]
    obs = np.zeros((N, F, 2))
    mask = np.zeros((N, F), bool)
    W, H = image_size
    for f in range(F):
        R, t = np.asarray(ds.cfw.R[f]), np.asarray(ds.cfw.t[f])
        xc = ds.points @ R.T + t
        vis = xc[:, 2] > 0.1
        ph = xc @ ds.K.T
        pix = ph[:, :2] / ph[:, 2:3]
        if noise_pix:
            pix = pix + rng.normal(scale=noise_pix, size=pix.shape)
        obs[:, f] = pix
        mask[:, f] = vis & (pix[:, 0] >= 0) & (pix[:, 0] < W) \
            & (pix[:, 1] >= 0) & (pix[:, 1] < H)
    return obs, mask
