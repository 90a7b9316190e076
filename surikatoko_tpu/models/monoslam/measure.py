"""Measurement model h(x): project spherical inverse-depth landmarks into the
current camera, batched over all slots, with autodiff Jacobian blocks.

Forward model (reference davison-mono-slam.cpp:2880-3035):
  m = dir(theta, phi)                               # unit ray in tracker frame
  hc_scaled = R_cfw @ (rho * (x_first - r) + m)     # A.21, valid at rho -> 0
  hd = distort(C - f * hc_scaled[:2]/hc_scaled[2])  # pixel

The observation Jacobian H[2m, 13+6K] of the reference
(``Deriv_H_by_estim_vars`` :3115) is block-sparse: each observation depends on
the 13 camera vars and its own 6 landmark vars. We never materialize the dense
H — update.py consumes the per-slot blocks [K,2,13] and [K,2,6] directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surikatoko_tpu.geom import camera as cam_mod
from surikatoko_tpu.geom import quat
from surikatoko_tpu.models.monoslam.state import (
    CAM_STATE_COMPS,
    REPRES_SPHERICAL,
    REPRES_XYZ,
    MonoSlamParams,
)


def landmark_camera_point_scaled(cam13: jnp.ndarray, lm6: jnp.ndarray,
                                 repres: int = REPRES_SPHERICAL) -> jnp.ndarray:
    """Landmark position in the camera frame; for the spherical representation
    it is scaled by inverse depth rho (finite at infinity, rho=0). Reference
    ``InternalSalientPointToCamera`` with scaled_by_inv_dist=true
    (davison-mono-slam.cpp:2880-2940); XYZ branch = the unscaled :2905-2913
    (a uniform scale does not change the projected pixel)."""
    r = cam13[0:3]
    q = cam13[3:7]
    R_wfc = quat.to_rotmat(q)
    if repres == REPRES_XYZ:
        v_world = lm6[0:3] - r
    else:
        first_cam = lm6[0:3]
        theta, phi, rho = lm6[3], lm6[4], lm6[5]
        m = cam_mod.dir_from_azim_elev(theta, phi)
        v_world = rho * (first_cam - r) + m
    return R_wfc.T @ v_world  # cfw = wfc^T


def project_landmark(params: MonoSlamParams, cam13: jnp.ndarray, lm6: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel of one landmark (reference ProjectInternalSalientPoint
    :2948)."""
    hc = landmark_camera_point_scaled(cam13, lm6, params.sal_pnt_repres)
    dist = params.dist if params.enable_distortion else None
    return cam_mod.project_camera_point(params.cam, dist, hc)


def landmark_world_pos(lm6: jnp.ndarray, substitute_rho: jnp.ndarray | None = None,
                       repres: int = REPRES_SPHERICAL) -> jnp.ndarray:
    """Euclidean 3D position of a landmark slot (reference
    ConvertXyzFromSphericalSalientPoint :405-415; identity for XYZ). For
    rho<=0 the spherical point is behind/at infinity; optionally substitute a
    small positive rho."""
    if repres == REPRES_XYZ:
        return lm6[0:3]
    rho = lm6[5]
    if substitute_rho is not None:
        rho = jnp.where(rho <= 0, substitute_rho, rho)
    m = cam_mod.dir_from_azim_elev(lm6[3], lm6[4])
    return lm6[0:3] + m / rho


def spherical_to_xyz_slot(lm6: jnp.ndarray) -> jnp.ndarray:
    """Spherical slot -> XYZ slot (position + zero padding); reference
    conversion davison-mono-slam.cpp:405-415."""
    pos = landmark_world_pos(lm6)
    return jnp.concatenate([pos, jnp.zeros((3,), lm6.dtype)])


def xyz_to_spherical_slot(lm6: jnp.ndarray, first_cam_pos: jnp.ndarray) -> jnp.ndarray:
    """XYZ slot -> spherical slot anchored at `first_cam_pos` (reference
    conversion davison-mono-slam.cpp:417-467)."""
    d = lm6[0:3] - first_cam_pos
    theta, phi = cam_mod.azim_elev_from_dir(d)
    rho = 1.0 / jnp.linalg.norm(d)
    return jnp.concatenate([first_cam_pos, jnp.stack([theta, phi, rho])])


def project_all(params: MonoSlamParams, x: jnp.ndarray) -> jnp.ndarray:
    """Predicted pixels for all K slots: [K, 2]."""
    cam13 = x[:CAM_STATE_COMPS]
    lms = x[CAM_STATE_COMPS:].reshape(-1, 6)
    return jax.vmap(lambda lm: project_landmark(params, cam13, lm))(lms)


def measurement_jacobians(
    params: MonoSlamParams, x: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(h [K,2], Hcam [K,2,13], Hlm [K,2,6]) for all slots at once.

    jax.jacfwd over the joint (cam13, lm6) arguments replaces the reference's
    ~500 lines of hand-written chain rule (Deriv_hd_by_cam_state_and_sal_pnt,
    davison-mono-slam.cpp:3067-3360); tests/test_monoslam_jacobians.py checks
    it against finite differences exactly the way the reference's debug flags
    did.
    """
    cam13 = x[:CAM_STATE_COMPS]
    lms = x[CAM_STATE_COMPS:].reshape(-1, 6)

    def h_fn(c, lm):
        return project_landmark(params, c, lm)

    h = jax.vmap(lambda lm: h_fn(cam13, lm))(lms)
    jac_fn = jax.jacfwd(h_fn, argnums=(0, 1))
    Hcam, Hlm = jax.vmap(lambda lm: jac_fn(cam13, lm))(lms)
    return h, Hcam, Hlm
