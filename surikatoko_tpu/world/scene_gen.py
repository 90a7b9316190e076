"""Synthetic virtual worlds: grid point clouds and camera trajectories.

Equivalent of reference virt-world/scene-generator.cpp (circle :9, right-left
:57, oscillate :98, rotate :137, 3D look-at path :168) plus the demo-layer grid
world and rectangular path (demo-davison-mono-slam.cpp:84-180). Outputs are
stacked arrays: points [N,3] and camera poses as batched SE3 (cfw =
camera-from-world, the reference's ``inverse_orient_cam``).

These generators run at setup time (host), so they favor clarity over jit.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from surikatoko_tpu.geom import se3
from surikatoko_tpu.geom.se3 import SE3


class WorldBounds(NamedTuple):
    x_min: float
    x_max: float
    y_min: float
    y_max: float
    z_min: float
    z_max: float


def generate_grid_points(
    wb: WorldBounds,
    cell_size: tuple[float, float, float],
    z_ascent: float = 0.0,
    noise_std: float = 0.0,
    rng: np.random.Generator | None = None,
    dtype=None,
) -> jnp.ndarray:
    """Grid world with a cosine z-bump across x (reference GenerateWorldPoints,
    demo-davison-mono-slam.cpp:133-169). Returns [N,3]."""
    gap = 1e-8
    xs = np.arange(wb.x_min, wb.x_max + gap, cell_size[0])
    ys = np.arange(wb.y_min, wb.y_max + gap, cell_size[1])
    zs = np.arange(wb.z_min, wb.z_max + gap, cell_size[2])
    xmid = (wb.x_min + wb.x_max) / 2
    xlen = wb.x_max - wb.x_min
    pts = []
    for gz in zs:
        for gy in ys:
            for gx in xs:
                z_perc = np.cos((gx - xmid) / xlen * np.pi)
                p = np.array([gx, gy, gz + z_perc * z_ascent])
                if noise_std > 0 and rng is not None:
                    p += rng.normal(scale=noise_std, size=3)
                pts.append(p)
    return jnp.asarray(np.stack(pts), dtype=dtype or jnp.result_type(float))


def _stack_se3(transforms: list[SE3]) -> SE3:
    return SE3(
        jnp.stack([t.R for t in transforms]),
        jnp.stack([t.t for t in transforms]),
    )


def rectangular_path(
    wb: WorldBounds,
    steps_per_side_x: int,
    steps_per_side_y: int,
    eye_offset,
    center_offset,
    up,
) -> SE3:
    """Camera walks the perimeter of the world rectangle at z_min, eye/center
    offset from the perimeter point (reference demo-davison-mono-slam.cpp:84).
    Returns batched cfw poses [F]."""
    base = [
        np.array([wb.x_min, wb.y_min, wb.z_min]),
        np.array([wb.x_max, wb.y_min, wb.z_min]),
        np.array([wb.x_max, wb.y_max, wb.z_min]),
        np.array([wb.x_min, wb.y_max, wb.z_min]),
        np.array([wb.x_min, wb.y_min, wb.z_min]),
    ]
    steps = [steps_per_side_x, steps_per_side_y, steps_per_side_x, steps_per_side_y]
    eye_offset = np.asarray(eye_offset, float)
    center_offset = np.asarray(center_offset, float)
    up = jnp.asarray(up, jnp.result_type(float))
    poses = []
    for seg in range(4):
        b1, b2 = base[seg], base[seg + 1]
        step = (b2 - b1) / steps[seg]
        for i in range(steps[seg]):  # last point excluded: first of next segment
            cur = b1 + step * i
            wfc = se3.look_at_luf_wfc(
                jnp.asarray(cur + eye_offset), jnp.asarray(cur + center_offset), up)
            poses.append(wfc.inv())
    return _stack_se3(poses)


def oscillate_right_and_left(
    eye, center, up,
    max_deviation: float,
    periods_count: int,
    shots_per_period: int,
    const_view_dir: bool = True,
) -> SE3:
    """Camera slides sinusoidally along the axis orthogonal to the view
    direction (reference scene-generator.cpp:98-136). Scenario03 path."""
    eye = np.asarray(eye, float)
    center = np.asarray(center, float)
    upn = np.asarray(up, float)
    view = center - eye
    view = view / np.linalg.norm(view)
    right = np.cross(view, upn)
    right = right / np.linalg.norm(right)
    poses = []
    for i in range(periods_count * shots_per_period):
        w = 2 * np.pi / shots_per_period * i
        dev = np.sin(w) * max_deviation
        cur_eye = eye + right * dev
        cur_center = cur_eye + view if const_view_dir else center
        wfc = se3.look_at_luf_wfc(
            jnp.asarray(cur_eye), jnp.asarray(cur_center), jnp.asarray(upn))
        poses.append(wfc.inv())
    return _stack_se3(poses)


def circle_camera_shots(
    circle_center, circle_radius: float, ascent_z: float, rot_angles,
) -> SE3:
    """Cameras on a circle looking down at the center (reference
    scene-generator.cpp:9-56). Used by the BA circle-grid fixture. Camera ends
    x-right / y-bottom / z-forward like the reference."""
    cc = np.asarray(circle_center, float)
    poses = []
    for ang in np.asarray(rot_angles, float):
        shift = cc + np.array(
            [circle_radius * np.cos(ang), circle_radius * np.sin(ang), ascent_z])
        # eye at `shift`, looking at the circle center (which sits ascent_z below)
        eye = jnp.asarray(shift)
        center = jnp.asarray(cc)
        up = jnp.asarray([0.0, 0.0, 1.0])
        wfc = se3.look_at_luf_wfc(eye, center, up)
        poses.append(wfc.inv())
    return _stack_se3(poses)


def rotate_left_and_right(
    eye, up, min_ang: float, max_ang: float,
    periods_count: int, shots_per_period: int,
) -> SE3:
    """Camera fixed at eye, yawing sinusoidally between min/max angle
    (reference scene-generator.cpp:137-167)."""
    eye = np.asarray(eye, float)
    init_ang = (min_ang + max_ang) / 2
    half_fov = (max_ang - min_ang) / 2
    poses = []
    for i in range(periods_count * shots_per_period):
        w = 2 * np.pi / shots_per_period * i
        ang = init_ang + np.sin(w) * half_fov
        view = np.array([np.cos(ang), np.sin(ang), 0.0])
        wfc = se3.look_at_luf_wfc(
            jnp.asarray(eye), jnp.asarray(eye + view), jnp.asarray(up, float))
        poses.append(wfc.inv())
    return _stack_se3(poses)


def look_at_path(cam_poses: list[tuple], periods_count: int = 1) -> SE3:
    """Custom 3D path from (eye, center, up) triples (reference :168)."""
    poses = []
    for _ in range(periods_count):
        for eye, center, up in cam_poses:
            wfc = se3.look_at_luf_wfc(
                jnp.asarray(eye, jnp.result_type(float)),
                jnp.asarray(center, jnp.result_type(float)),
                jnp.asarray(up, jnp.result_type(float)))
            poses.append(wfc.inv())
    return _stack_se3(poses)


def initial_camera_motion(cfw0: SE3, cfw1: SE3, dt: float = 1.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Ground-truth initial (linear velocity in tracker frame, angular velocity
    in camera frame) from the first two poses (reference
    GetSyntheticCameraInitialMovement, demo-davison-mono-slam.cpp:171-200,
    which assumes dt=1 for virtual scenes)."""
    from surikatoko_tpu.geom import so3

    wfc0, wfc1 = cfw0.inv(), cfw1.inv()
    shift_world = wfc1.t - wfc0.t
    vel_tracker = (cfw0.R @ shift_world) / dt
    c0_from_c1 = se3.a_from_b(cfw0, cfw1)
    ang_vel = so3.log(c0_from_c1.R) / dt
    return vel_tracker, ang_vel
