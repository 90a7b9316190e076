"""Fully on-device closed-loop scenario execution.

The host-driven runner (runner.py) matches the reference's architecture
(perception plug-in between frames); this module compiles the *entire*
closed loop — GT projection matcher, masked EKF update, health checks,
prediction — into one lax.scan program for throughput benchmarking and batch
evaluation sweeps (vmap over scenarios). The matcher here is the
DemoCornersMatcher's math on device: project GT points through GT poses,
gate by image bounds, add measurement noise from a folded-in PRNG.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from surikatoko_tpu.geom import camera as cam_mod
from surikatoko_tpu.models.monoslam import landmarks as lm_mod
from surikatoko_tpu.models.monoslam import predict as predict_mod
from surikatoko_tpu.models.monoslam import update as update_mod
from surikatoko_tpu.models.monoslam import health as health_mod
from surikatoko_tpu.models.monoslam.state import CAM_STATE_COMPS, MonoSlamParams, MonoSlamState


class DeviceScenario(NamedTuple):
    gt_cfw_R: jnp.ndarray    # [F,3,3] GT camera-from-tracker
    gt_cfw_t: jnp.ndarray    # [F,3]
    gt_points: jnp.ndarray   # [N,3] tracker-frame world points (N == capacity)
    image_size: jnp.ndarray  # [2]
    noise_std: jnp.ndarray   # detection noise


def _project_gt(params: MonoSlamParams, sc: DeviceScenario, f: jnp.ndarray,
                key: jax.Array) -> tuple[jnp.ndarray, jnp.ndarray]:
    R = sc.gt_cfw_R[f]
    t = sc.gt_cfw_t[f]
    xc = sc.gt_points @ R.T + t
    dist = params.dist if params.enable_distortion else None
    pix = cam_mod.project_camera_point(params.cam, dist, xc)
    noise = sc.noise_std * jax.random.normal(key, pix.shape, pix.dtype)
    pix = pix + noise
    w, h = sc.image_size[0], sc.image_size[1]
    vis = ((xc[:, 2] > 1e-6) & (pix[:, 0] >= 0) & (pix[:, 0] < w)
           & (pix[:, 1] >= 0) & (pix[:, 1] < h)
           & jnp.all(jnp.isfinite(pix), axis=-1))
    return pix, vis


def init_with_gt_landmarks(params: MonoSlamParams, sc: DeviceScenario,
                           state: MonoSlamState, key: jax.Array) -> MonoSlamState:
    """Bootstrap: add every visible GT point as a landmark at frame 0 with GT
    inverse depth (slot k <-> point k)."""
    pix, vis = _project_gt(params, sc, jnp.asarray(0), key)
    xc0 = sc.gt_points @ sc.gt_cfw_R[0].T + sc.gt_cfw_t[0]
    rho = 1.0 / jnp.maximum(jnp.linalg.norm(xc0, axis=-1), 1e-9)
    state, _ = lm_mod.add_landmarks(params, state, pix, vis, rho)
    return predict_mod.predict(params, state)


def make_scan_runner(params: MonoSlamParams, update_impl: int = 1):
    """Returns jitted (state, scenario, frame_indices [T], key) ->
    (state, per-frame residual norms [T]): T tracked frames as one scan."""

    def frame_body(sc: DeviceScenario, carry, f_and_key):
        state, = carry
        f, key = f_and_key
        obs, vis = _project_gt(params, sc, f, key)
        obs_mask = jnp.logical_and(vis, state.lm_active)
        if update_impl == 1:
            x, P, resid = update_mod.stacked_update(
                params, state.x, state.P, obs, obs_mask)
        else:
            x, P, resid, _, _ = update_mod.one_point_ransac_update(
                params, state.x, state.P, obs, obs_mask)
        P = health_mod.ensure_nonneg_variance(P)
        if params.sal_pnt_repres != 1:  # rho substitution is spherical-only
            x, _ = health_mod.substitute_negative_inv_rho(
                x, params.sal_pnt_negative_inv_rho_substitute, state.capacity)
        state = state._replace(x=x, P=P)
        # quat renorm + predict fused into one camera-stripe pass over P
        state = predict_mod.normalize_and_predict(params, state)
        err = jnp.sum(jnp.linalg.norm(resid, axis=-1)) / jnp.maximum(
            jnp.sum(obs_mask), 1)
        cam_pos = x[:3]
        return (state,), (err, cam_pos)

    @jax.jit
    def run(state: MonoSlamState, sc: DeviceScenario,
            frames: jnp.ndarray, key: jax.Array):
        keys = jax.random.split(key, frames.shape[0])
        (state,), (errs, cam_pos) = jax.lax.scan(
            functools.partial(frame_body, sc), (state,), (frames, keys))
        return state, errs, cam_pos

    return run


def build_oscillating_scenario(capacity: int = 32, dtype=None,
                               detection_noise_std: float = 0.5):
    """Scenario03-style DeviceScenario sized to `capacity` landmarks (grid
    world replicated+jittered if needed). Shared by bench.py and tests."""
    import numpy as np

    from surikatoko_tpu.geom.se3 import SE3
    from surikatoko_tpu.world import scene_gen
    from surikatoko_tpu.world.runner import gt_poses_in_tracker_frame

    dtype = dtype or jnp.float32
    wb = scene_gen.WorldBounds(0.0, 0.9, 0.0, 0.9, 0.0, 0.9001)
    points_world = np.asarray(scene_gen.generate_grid_points(
        wb, (0.3, 0.3, 0.3), 0.2))
    center = points_world.mean(axis=0)
    gt_cfw_world = scene_gen.oscillate_right_and_left(
        center + np.array([0, -2.0, 0]), center, (0, 0, 1),
        max_deviation=0.6, periods_count=2, shots_per_period=160,
        const_view_dir=True)
    gt_cfw = gt_poses_in_tracker_frame(gt_cfw_world)
    tfw = SE3(gt_cfw_world.R[0], gt_cfw_world.t[0])
    pts = points_world @ np.asarray(tfw.R).T + np.asarray(tfw.t)
    n = len(pts)
    if n < capacity:
        pts = np.concatenate([pts] * (capacity // n + 1))[:capacity]
        pts = pts + np.random.default_rng(0).normal(scale=0.02, size=pts.shape)
    else:
        pts = pts[:capacity]
    return DeviceScenario(
        gt_cfw_R=jnp.asarray(np.asarray(gt_cfw.R), dtype),
        gt_cfw_t=jnp.asarray(np.asarray(gt_cfw.t), dtype),
        gt_points=jnp.asarray(pts, dtype),
        image_size=jnp.asarray([320.0, 240.0], dtype),
        noise_std=jnp.asarray(detection_noise_std, dtype))
