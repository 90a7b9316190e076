"""Relative-motion and depth estimation kernels for incremental SfM.

Reference multi-view-factorization.cpp:
  find_relative_motion_multi_points <- FindRelativeMotionMultiPoints :107
    (3N x 12 system A [c1 (x) skew(c2) | skew(c2)/depth] via Kronecker
     product, smallest right singular vector, then ProjectOntoSO3 :78 =
     MASKS formulas 8.41-8.43 with the cbrt(det) scale on T)
  estimate_point_depth <- Estimate3DPointDepthFromFrames :223 (MASKS 8.44)

Inputs are *normalized homogeneous* image coordinates [x, y, 1] (calibrated
camera, "meters"). Everything is masked/batched: rows for invalid
correspondences are zeroed, vmap over tracks for depth estimation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surikatoko_tpu.geom import so3
from surikatoko_tpu.geom.se3 import SE3


def find_relative_motion_multi_points(
    c1: jnp.ndarray,        # [N,3] normalized coords in anchor frame
    c2: jnp.ndarray,        # [N,3] normalized coords in target frame
    depths_anchor: jnp.ndarray,  # [N] depth of each point in the anchor frame
    mask: jnp.ndarray,      # [N] valid correspondences
) -> tuple[SE3, jnp.ndarray]:
    """(target_from_anchor SE3, ok). Builds the masked 3N x 12 system
      [c1_k * skew(c2) | skew(c2)/depth] [vec(R); T] = 0,
    takes the smallest right singular vector, and projects the 3x3 block onto
    SO(3) with the matched scale for T."""
    dtype = c1.dtype
    c2_skew = so3.skew(c2)                                     # [N,3,3]
    m = mask.astype(dtype)[:, None, None]
    # Kronecker: columns 3*k..3*k+2 = c1[k] * skew(c2)
    A_R = jnp.einsum("nk,nab->nakb", c1, c2_skew).reshape(-1, 9)
    alpha = (1.0 / depths_anchor)[:, None, None]
    A_T = (alpha * c2_skew).reshape(-1, 3)
    A = jnp.concatenate([A_R.reshape(c1.shape[0], 3, 9) * m,
                         A_T.reshape(c1.shape[0], 3, 3) * m], axis=-1)
    A = A.reshape(-1, 12)

    _, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    r_and_t = Vt[-1]
    # r_and_t[0:9] holds R stacked column-major (the reference's Eigen Map):
    # columns are r[0:3], r[3:6], r[6:9]
    R_noisy = jnp.stack([r_and_t[0:3], r_and_t[3:6], r_and_t[6:9]], axis=1)
    T_noisy = r_and_t[9:12]

    # ProjectOntoSO3 (MASKS 8.41-8.43)
    U, S, Vt2 = jnp.linalg.svd(R_noisy)
    det_S = jnp.prod(S)
    no_guts = U @ Vt2
    sign = jnp.where(jnp.linalg.det(no_guts) < 0, -1.0, 1.0).astype(dtype)
    R_valid = sign * no_guts
    s_scale = sign / jnp.cbrt(det_S)
    T_valid = s_scale * T_noisy
    ok = jnp.logical_and(jnp.abs(det_S) > 1e-20,
                         jnp.all(jnp.isfinite(R_valid)) & jnp.all(jnp.isfinite(T_valid)))
    return SE3(R_valid, T_valid), ok


def refine_pose_pnp(
    points_w: jnp.ndarray,   # [N,3] known 3D points (world/anchor frame)
    obs_norm: jnp.ndarray,   # [N,3] normalized homogeneous observations
    mask: jnp.ndarray,       # [N]
    R0: jnp.ndarray, t0: jnp.ndarray,   # initial cfw guess
    iters: int = 10,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton 3D-2D pose refinement (6-dof cfw), returns (R, t, rms).

    This is an improvement over the reference, whose SVD-12 localizer is
    noise-fragile by its own admission ("this algo ... is unreliable",
    multi-view-factorization.cpp:121): the linear estimate seeds a few GN
    iterations on the reprojection residual, restoring noise robustness.
    """
    dtype = points_w.dtype
    m = mask.astype(dtype)

    def residuals(w, dt, R, t):
        Rn = so3.exp(w) @ R
        tn = t + dt
        xc = points_w @ Rn.T + tn
        r = xc[:, :2] / xc[:, 2:3] - obs_norm[:, :2]
        return r * m[:, None]

    def gn_step(carry, _):
        R, t = carry
        z = jnp.zeros(3, dtype)
        r = residuals(z, z, R, t).reshape(-1)
        Jw, Jt = jax.jacfwd(lambda w, dt: residuals(w, dt, R, t).reshape(-1),
                            argnums=(0, 1))(z, z)
        J = jnp.concatenate([Jw, Jt], axis=1)                  # [2N, 6]
        H = J.T @ J + 1e-12 * jnp.eye(6, dtype=dtype)
        g = J.T @ r
        d = jnp.linalg.solve(H, -g)
        return (so3.exp(d[:3]) @ R, t + d[3:]), None

    (R, t), _ = jax.lax.scan(gn_step, (R0, t0), None, length=iters)
    z = jnp.zeros(3, dtype)
    r = residuals(z, z, R, t)
    rms = jnp.sqrt(jnp.sum(r * r) / jnp.maximum(jnp.sum(m), 1.0))
    return R, t, rms


def refine_point_gn(
    x0: jnp.ndarray,         # [3] initial world point
    obs_norm: jnp.ndarray,   # [M,3] normalized homogeneous observations
    R: jnp.ndarray,          # [M,3,3] cfw rotations of the observing frames
    t: jnp.ndarray,          # [M,3]
    mask: jnp.ndarray,       # [M]
    iters: int = 5,
) -> jnp.ndarray:
    """Gauss-Newton polish of one 3D point against all its observations.

    The linear MASKS-8.44 depth (estimate_point_depth, the reference's
    Estimate3DPointDepthFromFrames, multi-view-factorization.cpp:223) is an
    errors-in-variables estimator: measurement noise enters the denominator
    squared, so depths are systematically over-estimated and an incremental
    run inflates in scale frame over frame. A few GN iterations on the true
    reprojection residual remove the bias. Masked rows contribute zero."""
    dtype = x0.dtype
    m = mask.astype(dtype)

    def residual(X):
        xc = jnp.einsum("mij,j->mi", R, X) + t
        z = xc[:, 2:3]
        zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        return ((xc[:, :2] / zsafe - obs_norm[:, :2]) * m[:, None]).reshape(-1)

    def gn_step(X, _):
        r = residual(X)
        J = jax.jacfwd(residual)(X)
        H = J.T @ J + 1e-12 * jnp.eye(3, dtype=dtype)
        d = jnp.linalg.solve(H, -(J.T @ r))
        d = jnp.where(jnp.all(jnp.isfinite(d)), d, jnp.zeros(3, dtype))
        return X + d, None

    X, _ = jax.lax.scan(gn_step, x0, None, length=iters)
    return X


def estimate_point_depth(
    x_base: jnp.ndarray,     # [3] normalized coords in the track's base frame
    xs: jnp.ndarray,         # [F,3] normalized coords in other frames
    R_fb: jnp.ndarray,       # [F,3,3] frame-from-base rotations
    T_fb: jnp.ndarray,       # [F,3]
    mask: jnp.ndarray,       # [F] frames where the track is observed (excl. base)
) -> jnp.ndarray:
    """Depth of the point in its base frame (MASKS 8.44):
      alpha = -sum <skew(xi) Ti, skew(xi) Ri x1> / sum |skew(xi) Ti|^2
      depth = 1/alpha."""
    xi_skew = so3.skew(xs)
    h1 = jnp.einsum("fab,fb->fa", xi_skew, T_fb)
    h2 = jnp.einsum("fab,fbc,c->fa", xi_skew, R_fb, x_base)
    m = mask.astype(x_base.dtype)
    num = jnp.sum(jnp.sum(h1 * h2, axis=-1) * m)
    den = jnp.sum(jnp.sum(h1 * h1, axis=-1) * m)
    alpha = -num / jnp.where(den == 0, 1.0, den)
    return 1.0 / jnp.where(alpha == 0, jnp.inf, alpha)
