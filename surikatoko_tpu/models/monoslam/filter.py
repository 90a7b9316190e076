"""MonoSlam filter orchestration: the ProcessFrame pipeline as one jitted step.

Reference: DavisonMonoSlam::ProcessFrame (davison-mono-slam.cpp:842-950).
The per-frame flow is identical, but perception is split out at the same seam
as the reference's ``CornersMatcherBase`` plug-in: the matcher runs *between*
steps against the predicted state, and hands (observations, masks, recruits)
to the pure jitted step:

  match (outside) -> update (1 of 4 impls) -> health/self-healing ->
  delete policy -> recruit new landmarks -> predict next frame

Held state is the *prediction* for the frame about to be processed, mirroring
the reference's predicted_estim_vars_. ``process_frame`` returns the new state
plus a stats slice (FrameStats) matching DavisonMonoSlamTrackerInternalsSlice
(davison-mono-slam.h:332-355).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from surikatoko_tpu.models.monoslam import health, landmarks, measure, update
from surikatoko_tpu.models.monoslam import state as state_mod
from surikatoko_tpu.models.monoslam.state import (
    CAM_STATE_COMPS,
    MonoSlamParams,
    MonoSlamState,
    init_state,
)

_N = CAM_STATE_COMPS

UPDATE_IMPLS = {
    1: "stacked",
    2: "one_observation",
    3: "one_component",
    4: "one_point_ransac",
}


class FrameStats(NamedTuple):
    """Per-frame observability slice (reference h:332-355 subset)."""

    frame_ind: jnp.ndarray
    obs_count: jnp.ndarray          # matched observations used
    new_count: jnp.ndarray          # landmarks recruited this frame
    deleted_count: jnp.ndarray      # landmarks removed this frame
    estimated_count: jnp.ndarray    # active landmarks after the frame
    meas_reproj_err: jnp.ndarray    # mean |resid| over matched, before update
    opt_reproj_err: jnp.ndarray     # mean |resid| after update
    cam_state: jnp.ndarray          # updated camera 13-vector
    cam_pos_cov: jnp.ndarray        # [3,3] camera position covariance
    ransac_low: jnp.ndarray
    ransac_high: jnp.ndarray
    new_slots: jnp.ndarray          # [M] slot id per recruit (-1 = not added)


class MonoSlamFilter:
    """Thin host-side wrapper holding params + static choices; all math in
    jitted pure functions keyed by (capacity, update_impl)."""

    def __init__(self, params: MonoSlamParams, capacity: int,
                 update_impl: int = 1, max_new_per_frame: int = 16):
        assert update_impl in UPDATE_IMPLS, update_impl
        self.params = params
        self.capacity = capacity
        self.update_impl = update_impl
        self.max_new_per_frame = max_new_per_frame
        self._step = jax.jit(
            functools.partial(_process_frame, params, update_impl))
        self._pix_unc = jax.jit(
            functools.partial(_predicted_pixel_uncertainty, params))

    def init_state(self, **kwargs) -> MonoSlamState:
        return init_state(self.capacity, **kwargs)

    def process_frame(self, state: MonoSlamState,
                      obs: jnp.ndarray, obs_mask: jnp.ndarray,
                      new_pix: jnp.ndarray, new_mask: jnp.ndarray,
                      new_gt_inv_dist: jnp.ndarray | None = None,
                      ) -> tuple[MonoSlamState, FrameStats]:
        if new_gt_inv_dist is None:
            new_gt_inv_dist = jnp.full((new_pix.shape[0],), jnp.nan, state.x.dtype)
        return self._step(state, obs, obs_mask, new_pix, new_mask, new_gt_inv_dist)

    def predicted_pixels(self, state: MonoSlamState) -> jnp.ndarray:
        return measure.project_all(self.params, state.x)

    def predicted_pixel_uncertainty(self, state: MonoSlamState
                                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(mean [K,2], cov [K,2,2]) of each slot's projected position under
        the predicted state, measurement noise included (reference
        GetSalientPointProjected2DPosWithUncertainty :3901, used for the NCC
        search ellipse)."""
        return self._pix_unc(state)


def format_state(state: MonoSlamState, max_landmarks: int = 16,
                 sal_pnt_repres: int = state_mod.REPRES_SPHERICAL) -> str:
    """Human-readable filter dump (reference DumpTrackerState,
    davison-mono-slam.cpp:2162-2267): camera state + per-landmark spherical
    state, Euclidean position and variance diagonal."""
    import numpy as np

    from surikatoko_tpu.models.monoslam import measure

    x = np.asarray(state.x)
    P = np.asarray(state.P)
    lines = [
        f"frame_ind={int(state.frame_ind)} active_landmarks="
        f"{int(np.sum(np.asarray(state.lm_active)))}/{state.capacity}",
        f"cam r=[{x[0]:+.4f} {x[1]:+.4f} {x[2]:+.4f}] "
        f"q=[{x[3]:+.4f} {x[4]:+.4f} {x[5]:+.4f} {x[6]:+.4f}]",
        f"    v=[{x[7]:+.4f} {x[8]:+.4f} {x[9]:+.4f}] "
        f"w=[{x[10]:+.4f} {x[11]:+.4f} {x[12]:+.4f}]",
        f"    pos var diag=[{P[0,0]:.3e} {P[1,1]:.3e} {P[2,2]:.3e}]",
    ]
    shown = 0
    for k in range(state.capacity):
        if not bool(state.lm_active[k]) or shown >= max_landmarks:
            continue
        off = _N + 6 * k
        lm = state.x[off:off + 6]
        pos = np.asarray(measure.landmark_world_pos(lm, repres=sal_pnt_repres))
        var = np.diag(P[off:off + 6, off:off + 6])
        lines.append(
            f"lm[{k}] gen={int(state.lm_generation[k])} "
            f"xyz=[{pos[0]:+.3f} {pos[1]:+.3f} {pos[2]:+.3f}] "
            f"rho={float(lm[5]):.4f} var_tr={var.sum():.3e} "
            f"unobs={int(state.lm_unobserved[k])}")
        shown += 1
    active_total = int(np.sum(np.asarray(state.lm_active)))
    if active_total > shown:
        lines.append(f"... and {active_total - shown} more landmarks")
    return "\n".join(lines)


def _predicted_pixel_uncertainty(params, state):
    h, Hcam, Hlm = measure.measurement_jacobians(params, state.x)
    A = update._hp(Hcam, Hlm, state.P)
    Kcap = state.capacity
    A_lm = A[:, :, _N:].reshape(Kcap, 2, Kcap, 6)
    own = jnp.einsum("kikd->kid", A_lm)
    S = (jnp.einsum("kid,kjd->kij", A[:, :, :_N], Hcam)
         + jnp.einsum("kid,kjd->kij", own, Hlm)
         + params.measurm_noise_var * jnp.eye(2, dtype=state.x.dtype))
    return h, S


def _process_frame(params: MonoSlamParams, update_impl: int,
                   state: MonoSlamState,
                   obs, obs_mask, new_pix, new_mask, new_gt_inv_dist
                   ) -> tuple[MonoSlamState, FrameStats]:
    from surikatoko_tpu.models.monoslam import predict as predict_mod

    dtype = state.x.dtype
    obs_mask = jnp.logical_and(obs_mask, state.lm_active)
    obs_count = jnp.sum(obs_mask.astype(jnp.int32))
    any_obs = obs_count > 0

    # ---- delete policy: long-unobserved landmarks (reference :799-840) ----
    unobs = jnp.where(obs_mask, 0, state.lm_unobserved + state.lm_active.astype(jnp.int32))
    stale = jnp.logical_and(
        params.max_undetected_frames > 0,
        unobs > params.max_undetected_frames)
    state = state._replace(lm_unobserved=unobs)

    # ---- measurement update (only if anything observed) ----
    x, P = state.x, state.P
    low = jnp.zeros((), jnp.int32)
    high = jnp.zeros((), jnp.int32)
    if update_impl == 1:
        x_u, P_u, resid = update.stacked_update(params, x, P, obs, obs_mask)
    elif update_impl == 2:
        x_u, P_u, resid = update.one_obs_update(params, x, P, obs, obs_mask)
    elif update_impl == 3:
        x_u, P_u, resid = update.one_component_update(params, x, P, obs, obs_mask)
    else:
        x_u, P_u, resid, low, high = update.one_point_ransac_update(
            params, x, P, obs, obs_mask)
    x = jnp.where(any_obs, x_u, x)
    P = jnp.where(any_obs, P_u, P)

    # ---- self-healing (reference :1118-1125) ----
    x, P = health.normalize_quat_and_covar(x, P)
    P = health.ensure_nonneg_variance(P)
    if params.sal_pnt_repres != state_mod.REPRES_XYZ:  # rho is spherical-only
        x, _ = health.substitute_negative_inv_rho(
            x, params.sal_pnt_negative_inv_rho_substitute, state.capacity)
    bad = health.bad_uncertainty_mask(
        x, P, state.capacity, params.sal_pnt_negative_inv_rho_substitute,
        params.sal_pnt_repres)
    bad = jnp.logical_and(bad, state.lm_active)
    remove = jnp.logical_or(stale, bad)
    deleted_count = jnp.sum(jnp.logical_and(remove, state.lm_active).astype(jnp.int32))
    state = landmarks.remove_landmarks(state._replace(x=x, P=P), remove)

    # ---- post-update residual (optimized reprojection error) ----
    h_after = measure.project_all(params, state.x)
    resid_after = (obs - h_after) * obs_mask[:, None].astype(dtype)
    obs_f = jnp.maximum(obs_count.astype(dtype), 1)
    meas_err = jnp.sum(jnp.linalg.norm(resid, axis=-1)) / obs_f
    opt_err = jnp.sum(jnp.linalg.norm(resid_after, axis=-1)) / obs_f

    # ---- recruit new landmarks (reference :923 -> :1812) ----
    state, _slots = landmarks.add_landmarks(
        params, state, new_pix, new_mask, new_gt_inv_dist)
    new_count = jnp.sum((_slots >= 0).astype(jnp.int32))

    cam_state = state.x[:_N]
    cam_pos_cov = state.P[:3, :3]
    estimated_count = jnp.sum(state.lm_active.astype(jnp.int32))

    # ---- predict next frame (reference :931) ----
    state = predict_mod.predict(params, state)
    state = state._replace(frame_ind=state.frame_ind + 1)

    stats = FrameStats(
        frame_ind=state.frame_ind - 1,
        obs_count=obs_count,
        new_count=new_count,
        deleted_count=deleted_count,
        estimated_count=estimated_count,
        meas_reproj_err=meas_err,
        opt_reproj_err=opt_err,
        cam_state=cam_state,
        cam_pos_cov=cam_pos_cov,
        ransac_low=low,
        ransac_high=high,
        new_slots=_slots,
    )
    return state, stats
