"""Fused EKF frame step: stacked update + variance clamp + quaternion
renormalization + kinematic predict as ONE covariance transform.

The sequential pipeline (device_runner.frame_body) materializes the [D,D]
covariance four times per frame:

  P1 = P - B^T B                      (stacked_update downdate)
  P2 = P1 * keep keep^T               (health.ensure_nonneg_variance)
  P3 = W P2 W^T + G Q G^T             (predict.normalize_and_predict)

All three are congruences: the nonneg mask is a *diagonal* congruence
(P * k k^T == diag(k) P diag(k) elementwise-exactly), so the composition
collapses algebraically with V = W diag(keep):

  P+ = V (P - B^T B) V^T + GQG = V P V^T - (B V^T)^T (B V^T) + GQG

and keep itself needs only diag(P1) = diag(P) - colsum(B^2) — no P1.
V differs from identity only on the 13 camera rows (W's predict/renorm block)
and the diagonal (keep), so V P V^T is one elementwise mask pass plus a
[13,D] stripe matmul, and the final downdate-with-epilogue writes P+ once:
~2 HBM round-trips over P instead of ~4 (measured -20% frame time at K=96
on a v5e chip). Numerically identical to the sequential pipeline up to
matmul reassociation (tests/test_fused_step.py checks 1e-12 on f64).

Reference mapping (davison-mono-slam.cpp): this one function covers the
per-frame sequence :1114 (P -= K S K^T), :1739 (EnsureNonnegativeStateVariance),
:1652 (NormalizeCameraOrientationQuaternionAndCovariances), :1713 (negative
inverse-depth substitution) and :639 (PredictEstimVars) — fused, not skipped.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from surikatoko_tpu.models.monoslam import predict as predict_mod
from surikatoko_tpu.models.monoslam import update as update_mod
from surikatoko_tpu.models.monoslam.state import (
    CAM_STATE_COMPS,
    REPRES_SPHERICAL,
    MonoSlamParams,
)

_N = CAM_STATE_COMPS


def camera_epilogue(params: MonoSlamParams, x1: jnp.ndarray, Kcap: int
                    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """State-side epilogue of a frame: negative-inverse-depth substitution
    (davison-mono-slam.cpp:1713), quaternion renormalization with its
    covariance Jacobian folded in (:1652), and the kinematic predict (:583).
    Returns (x_next, Cp, G) where Cp is W's 13x13 camera block (transition
    Jacobian with the renorm Jacobian folded) and G the noise injector.
    Shared by the single-chip fused step and the landmark-sharded one
    (parallel/sharded_ekf.make_sharded_fused_step)."""
    dtype = x1.dtype
    if params.sal_pnt_repres == REPRES_SPHERICAL:
        from surikatoko_tpu.models.monoslam import health as health_mod
        x1s, _ = health_mod.substitute_negative_inv_rho(
            x1, params.sal_pnt_negative_inv_rho_substitute, Kcap)
    else:
        x1s = x1
    q = x1s[3:7]
    qn = jnp.linalg.norm(q)
    nq = q / qn
    Jq = (jnp.eye(4, dtype=dtype) - jnp.outer(nq, nq)) / qn
    x2 = x1s.at[3:7].set(nq)
    cam13 = x2[:_N]
    new_cam = predict_mod.predict_camera(params, cam13)
    F, G = predict_mod.camera_transition_jacobians(params, cam13)
    Cp = F.at[:, 3:7].set(F[:, 3:7] @ Jq)               # W's 13x13 block
    x_next = x2.at[:_N].set(new_cam)
    return x_next, Cp, G


def fused_update_health_predict(
    params: MonoSlamParams, x: jnp.ndarray, P: jnp.ndarray,
    obs: jnp.ndarray, obs_mask: jnp.ndarray,
    *, precomputed: tuple | None = None,
    deactivate_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One frame of the closed loop with update_impl=1.

    Returns (x_next, P_next, resid [K,2], x_post_update [D]) where
    (x_next, P_next) are *predicted* for the next frame and x_post_update is
    the updated-but-not-yet-predicted state (what the sequential pipeline
    reports per frame).

    ``precomputed`` optionally carries (h [K,2], A_un [2K,D], T_un [2K,2K])
    — the UNMASKED predicted pixels, A_un = H P and T_un = H P H^T evaluated
    at this same ``x``. The imageseq loop already builds these for the
    NCC search-ellipse prediction (reference
    GetSalientPointProjected2DPosWithUncertainty :3901), and masking is a
    row/col scaling: masked A2 = M A_un, masked S2 = M T_un M + R. Passing
    them in removes a duplicate Jacobian evaluation and a duplicate
    [2K,D]@[D,D] matmul per frame (identical numerics: masked rows of A_un
    are exact zeros either way).
    """
    dtype = x.dtype
    Kcap = obs_mask.shape[0]
    r_var = params.measurm_noise_var.astype(dtype)

    if precomputed is None:
        # --- stacked update pieces (update.stacked_update :977-1114) ---
        h, Hcam, Hlm = update_mod._masked_jacobians(params, x, obs_mask)
        resid = (obs - h) * obs_mask[:, None].astype(dtype)
        A2 = update_mod.hp_auto(Hcam, Hlm, P)           # [2K, D] = H P
        S2 = (update_mod.aht_auto(A2, Hcam, Hlm)
              + r_var * jnp.eye(2 * Kcap, dtype=dtype))
    else:
        h, A_un, T_un = precomputed
        resid = (obs - h) * obs_mask[:, None].astype(dtype)
        m2 = jnp.repeat(obs_mask, 2).astype(dtype)      # [2K] row mask
        A2 = A_un * m2[:, None]
        S2 = (T_un * (m2[:, None] * m2[None, :])
              + r_var * jnp.eye(2 * Kcap, dtype=dtype))
    C = jnp.linalg.cholesky(S2)
    # one trsm for both the whitened gain and the whitened residual (the
    # 2Kx2K triangular solve is latency-bound; batching the RHS is free)
    By = solve_triangular(
        C, jnp.concatenate([A2, resid.reshape(2 * Kcap, 1)], axis=1),
        lower=True)
    B, y = By[:, :-1], By[:, -1]                        # [2K,D], [2K]
    x1 = x + B.T @ y

    # --- keep mask from diag(P - B^T B), no P1 materialization.
    # deactivate_mask (optional, [K] bool) folds landmark REMOVAL (the
    # reference's delete-unobserved policy, davison-mono-slam.cpp:799-840)
    # into the same diagonal congruence — removal costs nothing extra. ---
    keep = ((jnp.diag(P) - jnp.sum(B * B, axis=0)) >= 0).astype(dtype)
    if deactivate_mask is not None:
        keep_lm = jnp.repeat(jnp.logical_not(deactivate_mask), 6).astype(dtype)
        keep = keep.at[_N:].mul(keep_lm)
        lm_zero = jnp.repeat(deactivate_mask, 6)
        x1 = jnp.where(jnp.concatenate(
            [jnp.zeros((_N,), bool), lm_zero]), 0.0, x1)
    kc, km = keep[:_N], keep[_N:]

    x_next, Cp, G = camera_epilogue(params, x1, Kcap)

    # --- fused covariance: P+ = V P V^T - (B V^T)^T (B V^T) + GQG ---
    Ac = Cp * kc[None, :]                               # W diag(keep) cam block
    # B V^T: columns scaled by keep; first 13 columns hit by Ac^T
    B2 = jnp.concatenate([B[:, :_N] @ Ac.T, B[:, _N:] * km[None, :]], axis=1)
    # V P V^T stripe pieces
    top_all = Ac @ P[:_N, :]                            # [13,D] = Ac P[:13,:]
    Q = params.process_noise_cov.astype(dtype)
    corner = top_all[:, :_N] @ Ac.T + G @ Q @ G.T       # Ac P11 Ac^T + GQG
    corner = 0.5 * (corner + corner.T)
    top = jnp.concatenate([corner, top_all[:, _N:] * km[None, :]], axis=1)
    bottom_right = P[_N:, _N:] * (km[:, None] * km[None, :])
    bottom = jnp.concatenate([top[:, _N:].T, bottom_right], axis=1)
    Pw = jnp.concatenate([top, bottom], axis=0)         # V P V^T + GQG embed
    P_next = Pw - B2.T @ B2                             # epilogue-fused write
    if params.covar_diag_inflation is not None:
        # per-frame diagonal inflation: counters the slow PSD loss of f32
        # downdates (measured: the 1536-dim innovation goes indefinite by
        # ~2e-5 of its scale after ~120 chained K=768 frames). Statistically
        # a tiny extra process noise on every variable; the reference's f64
        # never needed it. Only variables with live (positive) variance
        # inflate — deactivated slots and the zero-covariance gauge anchor
        # stay exactly zero.
        infl = params.covar_diag_inflation.astype(dtype)
        d = jnp.arange(P_next.shape[0])
        dg = jnp.diag(P_next)
        P_next = P_next.at[d, d].add(jnp.where(dg > 0, infl * keep, 0.0))

    return x_next, P_next, resid, x1
