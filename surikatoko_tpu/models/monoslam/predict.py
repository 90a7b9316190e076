"""EKF prediction: constant-velocity SE(3) kinematics + covariance propagation.

Reference: PredictCameraMotionByKinematicModel (davison-mono-slam.cpp:583-638)
and PredictEstimVars (:639-694):
  r' = r + v dt;  q' = q (x) quat(w dt);  v' = v;  w' = w
  Pvv' = F Pvv F^T + G Q G^T;  Pvm' = F Pvm;  Pmm' = Pmm
F = d(cam')/d(cam) and G = d(cam')/d(noise) come from jax.jacfwd of the motion
model — replacing the reference's hand-derived Deriv_cam_state_by_cam_state /
Deriv_q3_by_w blocks (:3362-3560) and their debug finite-diff twins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surikatoko_tpu.geom import quat
from surikatoko_tpu.models.monoslam.state import (
    CAM_STATE_COMPS,
    MonoSlamParams,
    MonoSlamState,
)


def predict_camera(params: MonoSlamParams, cam13: jnp.ndarray,
                   noise6: jnp.ndarray | None = None) -> jnp.ndarray:
    """One step of the constant-velocity kinematic model. ``noise6`` is the
    process noise [dv(3), dw(3)] (impulse, applied as in the reference)."""
    r, q, v, w = cam13[0:3], cam13[3:7], cam13[7:10], cam13[10:13]
    dt = params.dt
    if noise6 is None:
        noise6 = jnp.zeros((6,), cam13.dtype)
    nv, nw = noise6[0:3], noise6[3:6]
    r_new = r + v * dt + nv * dt
    dq = quat.from_axis_angle(w * dt + nw * dt)
    q_new = quat.mult(q, dq)
    v_new = v + nv
    w_new = w + nw
    return jnp.concatenate([r_new, q_new, v_new, w_new])


def camera_transition_jacobians(params: MonoSlamParams, cam13: jnp.ndarray
                                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(F [13,13], G [13,6]) at the current camera state."""
    zero_noise = jnp.zeros((6,), cam13.dtype)
    F = jax.jacfwd(lambda c: predict_camera(params, c, zero_noise))(cam13)
    G = jax.jacfwd(lambda n: predict_camera(params, cam13, n))(zero_noise)
    return F, G


def predict(params: MonoSlamParams, state: MonoSlamState) -> MonoSlamState:
    """Predict step on the full masked state (block structure: only the
    camera block of x and the camera rows/cols of P change)."""
    n = CAM_STATE_COMPS
    cam13 = state.x[:n]
    new_cam = predict_camera(params, cam13)
    F, G = camera_transition_jacobians(params, cam13)

    P = state.P
    Q = params.process_noise_cov.astype(P.dtype)
    Pvv = F @ P[:n, :n] @ F.T + G @ Q @ G.T
    Pvm = F @ P[:n, n:]

    P_new = P.at[:n, :n].set(Pvv)
    P_new = P_new.at[:n, n:].set(Pvm)
    P_new = P_new.at[n:, :n].set(Pvm.T)
    # keep symmetry exact (reference fix_estim_vars_covar_symmetry_)
    P_new = 0.5 * (P_new + P_new.T)

    x_new = state.x.at[:n].set(new_cam)
    return state._replace(x=x_new, P=P_new)
