"""Landmark lifecycle: inverse-depth initialization, slot add/remove.

Reference mapping (davison-mono-slam.cpp):
  new_landmark_state  <- GetNewSphericalSalientPointState :2398 (A.58)
  new_landmark_covariance <- GetNewSphericalSalientPointCovar :2457 (A.67-A.79)
  add_landmarks       <- AddSalientPoint :2597 + AllocateAndInitState... :2322
  remove_landmarks    <- RemoveSalientPointsState :696

Add/remove never change array shapes: a free slot is claimed (mask flip +
scatter of the new state/covariance rows) or a live slot is zeroed. This
replaces the reference's conservativeResize O(n^2) copies (:2362,:778) with
O(n) row writes, and keeps everything jit-compatible.

The A.67-A.79 covariance of a new landmark is pure first-order propagation of
(camera pos+quat uncertainty, pixel noise, prior rho uncertainty) through the
init function — computed with jax.jacfwd instead of the reference's hand
derivation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surikatoko_tpu.geom import camera as cam_mod
from surikatoko_tpu.geom import quat
from surikatoko_tpu.models.monoslam.state import (
    CAM_STATE_COMPS,
    MonoSlamParams,
    MonoSlamState,
)

_N = CAM_STATE_COMPS


def new_landmark_state(params: MonoSlamParams, cam_pq7: jnp.ndarray,
                       pix: jnp.ndarray, inv_dist: jnp.ndarray) -> jnp.ndarray:
    """Landmark slot from the first observation (A.58): backproject the pixel,
    rotate into the tracker frame. Spherical: [first_cam_pos, theta, phi,
    rho], rho = prior (or GT) inverse distance. XYZ (reference
    SAL_PNT_REPRES=1): the point placed at distance 1/rho along the ray,
    padded to the 6-wide slot."""
    from surikatoko_tpu.models.monoslam.state import REPRES_XYZ

    r = cam_pq7[0:3]
    q = cam_pq7[3:7]
    dist = params.dist if params.enable_distortion else None
    hc = cam_mod.backproject_pixel(params.cam, dist, pix)
    hw = quat.to_rotmat(q) @ hc
    if params.sal_pnt_repres == REPRES_XYZ:
        m = hw / jnp.linalg.norm(hw)
        pos = r + m / inv_dist
        return jnp.concatenate([pos, jnp.zeros((3,), pos.dtype)])
    theta, phi = cam_mod.azim_elev_from_dir(hw)
    return jnp.concatenate([r, jnp.stack([theta, phi, inv_dist])])


def new_landmark_covariance(
    params: MonoSlamParams, x: jnp.ndarray, P: jnp.ndarray,
    pix: jnp.ndarray, inv_dist: jnp.ndarray, inv_dist_std: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(y [6], autocovar [6,6], cross-covar with all D vars [6,D]).

    y = g(cam_pq, pix, rho);  J_cam = dg/d(cam_pq) [6,7], J_pix = dg/dpix
    [6,2], J_rho = dg/drho [6]. Then (A.67-A.79):
      autocov = J_cam P77 J_cam^T + J_pix R J_pix^T + sigma_rho^2 J_rho J_rho^T
      cross   = J_cam P[0:7, :]
    (for spherical slots J_rho = e_rho exactly; for XYZ it spreads the depth
    prior along the viewing ray, the reference's :2457 XYZ branch)."""
    cam_pq = x[:7]
    g = lambda c, p, rho: new_landmark_state(params, c, p, rho)
    y = g(cam_pq, pix, inv_dist)
    J_cam, J_pix, J_rho = jax.jacfwd(g, argnums=(0, 1, 2))(cam_pq, pix, inv_dist)

    r_var = params.measurm_noise_var.astype(x.dtype)
    P77 = P[:7, :7]
    auto = J_cam @ P77 @ J_cam.T + r_var * (J_pix @ J_pix.T)
    auto = auto + (inv_dist_std.astype(x.dtype) ** 2) * jnp.outer(J_rho, J_rho)
    cross = J_cam @ P[:7, :]
    return y, auto, cross


def add_landmarks(
    params: MonoSlamParams,
    state: MonoSlamState,
    new_pix: jnp.ndarray,       # [M, 2] candidate first observations
    new_mask: jnp.ndarray,      # [M] bool
    gt_inv_dist: jnp.ndarray | None = None,  # [M] optional GT rho (virtual scenes)
) -> tuple[MonoSlamState, jnp.ndarray]:
    """Claim free slots for up to M new landmarks. Returns (state, slot_ids
    [M] int32, -1 where not added). Runs as a scan over candidates (M is
    small: the per-frame recruitment cap)."""
    Kcap = state.capacity
    dtype = state.x.dtype
    rho0 = params.sal_pnt_init_inv_dist
    rho_std = params.sal_pnt_init_inv_dist_std
    if gt_inv_dist is None:
        gt_inv_dist = jnp.full((new_pix.shape[0],), jnp.nan, dtype)

    def body(carry, inp):
        x, P, active, unobs, gen = carry
        pix, ok, rho_gt = inp
        free = jnp.logical_not(active)
        has_free = jnp.any(free)
        slot = jnp.argmax(free)  # first free slot
        do = jnp.logical_and(ok, has_free)

        rho = jnp.where(jnp.isnan(rho_gt), rho0, rho_gt).astype(dtype)
        # GT-initialized landmarks still carry the configured rho prior std
        y, auto, cross = new_landmark_covariance(params, x, P, pix, rho, rho_std)

        off = _N + slot * 6
        x_n = jax.lax.dynamic_update_slice(x, y, (off,))
        # scatter covariance rows/cols for the slot
        P_n = jax.lax.dynamic_update_slice(P, cross, (off, 0))
        P_n = jax.lax.dynamic_update_slice(P_n, cross.T, (0, off))
        P_n = jax.lax.dynamic_update_slice(P_n, auto, (off, off))

        x = jnp.where(do, x_n, x)
        P = jnp.where(do, P_n, P)
        active = jnp.where(do, active.at[slot].set(True), active)
        unobs = jnp.where(do, unobs.at[slot].set(0), unobs)
        gen = jnp.where(do, gen.at[slot].add(1), gen)
        out_slot = jnp.where(do, slot, -1).astype(jnp.int32)
        return (x, P, active, unobs, gen), out_slot

    carry0 = (state.x, state.P, state.lm_active, state.lm_unobserved, state.lm_generation)
    (x, P, active, unobs, gen), slots = jax.lax.scan(
        body, carry0, (new_pix, new_mask, gt_inv_dist))
    return state._replace(x=x, P=P, lm_active=active, lm_unobserved=unobs,
                          lm_generation=gen), slots


def remove_landmarks(state: MonoSlamState, remove_mask: jnp.ndarray) -> MonoSlamState:
    """Deactivate slots: zero their state and covariance rows/cols.

    The reference compacts by swap-to-back + conservativeResize (:696-786);
    with fixed slots we just zero — symmetry and PSD of the remaining
    covariance are untouched because removal only deletes information.
    """
    keep = jnp.logical_not(jnp.logical_and(remove_mask, state.lm_active))
    var_keep = jnp.concatenate([
        jnp.ones((_N,), bool),
        jnp.repeat(keep, 6),
    ]).astype(state.x.dtype)
    x = state.x * var_keep
    P = state.P * var_keep[:, None] * var_keep[None, :]
    active = jnp.logical_and(state.lm_active, keep)
    return state._replace(x=x, P=P, lm_active=active)
