"""SO(3) utilities: skew, exp (Rodrigues), log, Gram-Schmidt re-orthonormalization.

Equivalent of reference obs-geom.cpp:512-604 (skew/Rodrigues/log) and
lin-alg.cpp:6-27 (orthonormalization). Taylor-safe near θ=0 and θ=π.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix [w]_x with [w]_x v = w × v."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [z, -wz, wy, wz, z, -wx, -wy, wx, z], axis=-1
    ).reshape(w.shape[:-1] + (3, 3))


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: rotation matrix for rotation vector w (angle = |w|).

    Differentiable at w=0 (the usual linearization point): the sqrt is
    sanitized *before* use so no NaN can leak through the unused jnp.where
    branch under autodiff.
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < 1e-12
    theta2_safe = jnp.where(small, 1.0, theta2)   # sanitized for BOTH primal
    theta = jnp.sqrt(theta2_safe)                 # and cotangent paths
    K = skew(w)
    K2 = K @ K
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * K2


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector of R (inverse Rodrigues), safe at θ≈0 and θ≈π.

    Uses the quaternion route which is numerically stable at both ends.
    """
    from surikatoko_tpu.geom import quat

    return quat.to_axis_angle(quat.from_rotmat(R))


def rotmat_about_axis(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation by `angle` about unit `axis` (reference RotMat(axis, ang))."""
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    return exp(axis * angle[..., None] if jnp.ndim(angle) else axis * angle)


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a drifting matrix back onto SO(3) (reference lin-alg.cpp:6-27
    uses Gram-Schmidt; we use the optimal polar projection via SVD)."""
    u, _, vt = jnp.linalg.svd(R)
    det = jnp.linalg.det(u @ vt)
    # flip the last singular vector if needed to stay in SO(3), not O(3)
    fix = jnp.ones(R.shape[:-2] + (3,), dtype=R.dtype).at[..., 2].set(det)
    return (u * fix[..., None, :]) @ vt


def project_onto_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation to arbitrary 3x3 M (MASKS eq. 8.41-8.44; reference
    multi-view-factorization.cpp:78)."""
    return orthonormalize(M)
