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


def camera_transition_jacobians_ad(params: MonoSlamParams, cam13: jnp.ndarray
                                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(F [13,13], G [13,6]) by jax.jacfwd — the autodiff oracle the analytic
    fast path is tested against (the reference's debug F/G finite-diff check,
    davison-mono-slam.cpp:654-667, made permanent)."""
    zero_noise = jnp.zeros((6,), cam13.dtype)
    F = jax.jacfwd(lambda c: predict_camera(params, c, zero_noise))(cam13)
    G = jax.jacfwd(lambda n: predict_camera(params, cam13, n))(zero_noise)
    return F, G


def _quat_left_mat(q: jnp.ndarray) -> jnp.ndarray:
    """L(q) with L(q) b = q (x) b."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        w, -x, -y, -z,
        x, w, -z, y,
        y, z, w, -x,
        z, -y, x, w,
    ]).reshape(4, 4)


def _quat_right_mat(q: jnp.ndarray) -> jnp.ndarray:
    """R(q) with R(q) a = a (x) q."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        w, -x, -y, -z,
        x, w, z, -y,
        y, -z, w, x,
        z, y, -x, w,
    ]).reshape(4, 4)


def _dquat_daxis_angle(u: jnp.ndarray) -> jnp.ndarray:
    """d(quat.from_axis_angle(u))/du as [4,3], with the same Taylor switch as
    from_axis_angle (reference Deriv_q3_by_w, davison-mono-slam.cpp:3362)."""
    theta2 = jnp.sum(u * u)
    theta = jnp.sqrt(theta2 + jnp.asarray(1e-24, u.dtype))
    half = 0.5 * theta
    small = theta2 < 1e-8
    s, c = jnp.sin(half), jnp.cos(half)
    k = jnp.where(small, 0.5 - theta2 / 48.0, s / theta)
    # dw/du = -(k/2) u ; dv_i/du_j = k delta_ij + u_i u_j (c/2 - k)/theta^2
    coeff = jnp.where(small, -1.0 / 24.0 + theta2 / 960.0,
                      (0.5 * c - k) / theta2)
    dw = -0.5 * k * u
    dv = k * jnp.eye(3, dtype=u.dtype) + coeff * jnp.outer(u, u)
    return jnp.concatenate([dw[None, :], dv], axis=0)


def camera_transition_jacobians(params: MonoSlamParams, cam13: jnp.ndarray
                                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(F [13,13], G [13,6]) at the current camera state, analytic.

    Only four blocks differ from identity/zero: dr'/dv = dt I,
    dq'/dq = RightMat(dq), dq'/dw = dq'/dnw = LeftMat(q) d(dq)/du dt, and the
    velocity pass-throughs. Building them in closed form replaces two jacfwd
    sweeps (~30 small ops each) with ~8 ops — predict runs every frame."""
    dtype = cam13.dtype
    dt = params.dt
    q = cam13[3:7]
    w = cam13[10:13]
    dq = quat.from_axis_angle(w * dt)
    dq_dw = (_quat_left_mat(q) @ _dquat_daxis_angle(w * dt)) * dt   # [4,3]

    F = jnp.eye(13, dtype=dtype)
    F = F.at[0:3, 7:10].set(dt * jnp.eye(3, dtype=dtype))
    F = F.at[3:7, 3:7].set(_quat_right_mat(dq))
    F = F.at[3:7, 10:13].set(dq_dw)

    G = jnp.zeros((13, 6), dtype)
    G = G.at[0:3, 0:3].set(dt * jnp.eye(3, dtype=dtype))
    G = G.at[3:7, 3:6].set(dq_dw)
    G = G.at[7:10, 0:3].set(jnp.eye(3, dtype=dtype))
    G = G.at[10:13, 3:6].set(jnp.eye(3, dtype=dtype))
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
    top = F @ P[:n, :]                       # [13,D] = [F Pvv | F Pvm]
    Pvv = top[:, :n] @ F.T + G @ Q @ G.T
    Pvm = top[:, n:]

    # only the camera block can lose symmetry (the landmark block is
    # untouched; the cross blocks are written from the same Pvm product), so
    # the symmetry fix (reference fix_estim_vars_covar_symmetry_) needs just
    # the 13x13 corner — not a full O(D^2) pass over P every frame
    P_new = P.at[:n, :].set(
        jnp.concatenate([0.5 * (Pvv + Pvv.T), Pvm], axis=1))
    P_new = P_new.at[n:, :n].set(Pvm.T)

    x_new = state.x.at[:n].set(new_cam)
    return state._replace(x=x_new, P=P_new)


def normalize_and_predict(params: MonoSlamParams, state: MonoSlamState
                          ) -> MonoSlamState:
    """Quaternion renormalization (health.normalize_quat_and_covar) composed
    with the kinematic predict as ONE camera-stripe transform of P.

    Both steps are congruences E(M) P E(M)^T with M touching only the 13
    camera variables, so their composition C = F J_q is applied in a single
    [13,D] stripe pipeline — one pass over P instead of two (the on-device
    closed loop runs this every frame; the host-driven filter keeps the
    separate steps because landmark add/remove happens between them).
    Numerically identical to the sequential composition (tested at 1e-12)."""
    n = CAM_STATE_COMPS
    x = state.x
    q = x[3:7]
    qn = jnp.linalg.norm(q)
    nq = q / qn
    # d(q/|q|)/dq = (I - n n^T)/|q|
    Jq = (jnp.eye(4, dtype=x.dtype) - jnp.outer(nq, nq)) / qn

    x1 = x.at[3:7].set(nq)
    cam13 = x1[:n]
    new_cam = predict_camera(params, cam13)
    F, G = camera_transition_jacobians(params, cam13)
    C = F.at[:, 3:7].set(F[:, 3:7] @ Jq)           # F @ embed(Jq)

    P = state.P
    Q = params.process_noise_cov.astype(P.dtype)
    top = C @ P[:n, :]                             # [13,D]
    Pvv = top[:, :n] @ C.T + G @ Q @ G.T
    P_new = P.at[:n, :].set(
        jnp.concatenate([0.5 * (Pvv + Pvv.T), top[:, n:]], axis=1))
    P_new = P_new.at[n:, :n].set(top[:, n:].T)

    x_new = x1.at[:n].set(new_cam)
    return state._replace(x=x_new, P=P_new)
