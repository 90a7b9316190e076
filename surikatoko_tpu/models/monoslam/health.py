"""Filter-health mechanisms: the reference's self-healing toolbox (SURVEY §5.3).

Reference mapping (davison-mono-slam.cpp):
  normalize_quat_and_covar  <- NormalizeCameraOrientationQuaternionAndCovariances :1652
  ensure_nonneg_variance    <- EnsureNonnegativeStateVariance :1739
  substitute_negative_inv_rho <- :1713-1737
  symmetrize                <- FixSymmetricMat :4308
  check_state               <- CheckCameraAndSalientPointsCovs :514
  bad-ellipsoid removal mask <- RemoveSalientPointsWithNonextractableUncertEllipsoid :542
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surikatoko_tpu.geom import ellipse as ell_mod
from surikatoko_tpu.models.monoslam.state import CAM_STATE_COMPS, MonoSlamState

_N = CAM_STATE_COMPS


def normalize_quat_and_covar(x: jnp.ndarray, P: jnp.ndarray
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Renormalize the camera quaternion and propagate the normalization
    Jacobian into the covariance: P <- J P J^T where J is identity except the
    4x4 d(q/|q|)/dq block."""
    q = x[3:7]
    norm_fn = lambda qq: qq / jnp.linalg.norm(qq)
    Jq = jax.jacfwd(norm_fn)(q)                    # [4,4]
    x_new = x.at[3:7].set(norm_fn(q))
    # P <- J P J^T exploiting J = I + E (E nonzero only on the quat block);
    # only the 4-wide quat stripe changes, so instead of a full O(D^2)
    # symmetrize we write the column stripe as the exact transpose of the row
    # stripe (and symmetrize the tiny 4x4 corner where both were applied)
    rows = Jq @ P[3:7, :]                      # [4,D] = (J P)[3:7,:]
    corner = rows[:, 3:7] @ Jq.T               # [4,4]
    corner = 0.5 * (corner + corner.T)
    P_new = P.at[3:7, :].set(rows)
    P_new = P_new.at[:, 3:7].set(rows.T)
    P_new = P_new.at[3:7, 3:7].set(corner)
    return x_new, P_new


def ensure_nonneg_variance(P: jnp.ndarray) -> jnp.ndarray:
    """Zero the rows/cols of any state variable with negative variance
    (numerical defense; reference :1739-1756)."""
    bad = jnp.diag(P) < 0
    keep = jnp.logical_not(bad).astype(P.dtype)
    return P * keep[:, None] * keep[None, :]


def substitute_negative_inv_rho(x: jnp.ndarray, substitute: jnp.ndarray,
                                capacity: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Replace negative inverse depths with a small positive value; returns
    (x', count substituted). Reference flag sal_pnt_negative_inv_rho_substitute
    (davison-mono-slam.h:474)."""
    lms = x[_N:].reshape(capacity, 6)
    neg = lms[:, 5] < 0
    lms = lms.at[:, 5].set(jnp.where(neg, substitute, lms[:, 5]))
    return x.at[_N:].set(lms.reshape(-1)), jnp.sum(neg.astype(jnp.int32))


def symmetrize(P: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (P + P.T)


def landmark_pos_covariances(x: jnp.ndarray, P: jnp.ndarray, capacity: int,
                             substitute_rho: jnp.ndarray,
                             repres: int = 2) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(pos [K,3], cov [K,3,3]) of each landmark's Euclidean position by
    first-order propagation through the spherical->XYZ map (reference
    GetSalientPoint3DPosWithUncertaintyNew :3889; identity map for XYZ
    slots)."""
    from surikatoko_tpu.models.monoslam import measure

    lms = x[_N:].reshape(capacity, 6)

    def one(slot_lm, slot_cov):
        f = lambda lm: measure.landmark_world_pos(lm, substitute_rho, repres)
        pos = f(slot_lm)
        J = jax.jacfwd(f)(slot_lm)
        return pos, J @ slot_cov @ J.T

    covs6 = jax.vmap(
        lambda k: jax.lax.dynamic_slice(P, (_N + k * 6, _N + k * 6), (6, 6))
    )(jnp.arange(capacity))
    return jax.vmap(one)(lms, covs6)


def bad_uncertainty_mask(x: jnp.ndarray, P: jnp.ndarray, capacity: int,
                         substitute_rho: jnp.ndarray,
                         repres: int = 2) -> jnp.ndarray:
    """True for landmarks whose 3D uncertainty ellipsoid is non-extractable
    (non-PSD / non-finite propagated covariance) — candidates for removal.

    Positive-definiteness via Sylvester's criterion (three leading minors)
    instead of eigendecomposition: closed-form and ~10x cheaper than the K
    batched 3x3 eigh calls on TPU (hot: runs every frame)."""
    _, covs = landmark_pos_covariances(x, P, capacity, substitute_rho, repres)
    a, b, c = covs[:, 0, 0], covs[:, 0, 1], covs[:, 0, 2]
    d, e, f = covs[:, 1, 1], covs[:, 1, 2], covs[:, 2, 2]
    det2 = a * d - b * b
    det3 = (a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c))
    finite = jnp.all(jnp.isfinite(covs.reshape(capacity, -1)), axis=-1)
    pd = (a > 0) & (det2 > 0) & (det3 > 0)
    return jnp.logical_not(jnp.logical_and(finite, pd))


def reset_camera_to_gt(state: MonoSlamState, gt_cam13: jnp.ndarray,
                       pos_std: float = 0.0, q_comp_std: float = 0.0,
                       vel_std: float = 0.0, ang_vel_std: float = 0.0
                       ) -> MonoSlamState:
    """Manual recovery — the reference's 'u' hotkey
    (SetEstimStateAndCovarToGroundTruth, davison-mono-slam.cpp:2117-2140):
    snap the camera state to ground truth, zero the camera-landmark
    cross-covariance, and reinitialize the camera covariance diagonal."""
    x = state.x.at[:_N].set(gt_cam13.astype(state.x.dtype))
    P = state.P
    P = P.at[:_N, :].set(0.0)
    P = P.at[:, :_N].set(0.0)
    diag = jnp.concatenate([
        jnp.full((3,), pos_std**2), jnp.full((4,), q_comp_std**2),
        jnp.full((3,), vel_std**2), jnp.full((3,), ang_vel_std**2),
    ]).astype(P.dtype)
    P = P.at[jnp.arange(_N), jnp.arange(_N)].set(diag)
    return state._replace(x=x, P=P)


def check_state(state: MonoSlamState, atol: float = 1e-3) -> jnp.ndarray:
    """Cheap invariant check (quat unity, nonneg diag): scalar bool."""
    q_ok = jnp.abs(jnp.linalg.norm(state.x[3:7]) - 1.0) < atol
    diag_ok = jnp.all(jnp.diag(state.P) >= -atol)
    return jnp.logical_and(q_ok, diag_ok)
