"""Quaternion ops, scalar-first convention q = [w, x, y, z].

Behavioral parity with the reference quaternion layer (suriko quat.h:10-41,
quat.cpp): Hamilton product, axis-angle round-trips, rotation-matrix
conversion. All functions are jit/vmap/grad-safe, with Taylor expansions near
the zero-rotation singularity instead of branches.
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-12


def mult(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b (both scalar-first [w,x,y,z])."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def inv(q: jnp.ndarray) -> jnp.ndarray:
    return conj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def from_axis_angle(w: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion for rotation vector ``w`` (angle = |w|).

    Taylor-safe at |w| → 0:  sin(θ/2)/θ → 1/2 − θ²/48.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _SMALL**2)
    half = 0.5 * theta
    # k = sin(theta/2)/theta, smooth through zero
    small = theta2 < 1e-8
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    cw = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return jnp.concatenate([cw[..., None], k[..., None] * w], axis=-1)


def to_axis_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector from unit quaternion (inverse of :func:`from_axis_angle`).

    Differentiable at the identity rotation: the |qv| -> 0 singularity is
    handled with sanitized branches (sqrt/atan2 never see zero on the
    cotangent path), because pose-graph/filter residuals routinely sit
    exactly at identity."""
    qw = q[..., 0]
    qv = q[..., 1:]
    # force qw >= 0 (angle in [0, pi]) by sign flip
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qw = qw * sign
    qv = qv * sign[..., None]
    s2 = jnp.sum(qv * qv, axis=-1)
    small = s2 < 1e-12
    s2_safe = jnp.where(small, 1.0, s2)      # sanitized for value AND grad
    sin_half = jnp.sqrt(s2_safe)
    half = jnp.arctan2(sin_half, qw)
    k_large = 2.0 * half / sin_half
    # theta = 2 atan(|qv|/qw):  w = qv * (2/qw) (1 - |qv|^2/(3 qw^2)) + O(th^5)
    qw_safe = jnp.maximum(qw, 1e-12)
    k_small = (2.0 / qw_safe) * (1.0 - s2 / (3.0 * qw_safe * qw_safe))
    k = jnp.where(small, k_small, k_large)
    return k[..., None] * qv


def to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix of unit quaternion (batched over leading dims)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def from_rotmat(R: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion from rotation matrix (Shepperd's branchless variant).

    Builds all four candidate quaternions and picks the best-conditioned one
    with a one-hot select — jit-safe, no control flow.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # candidate 0: trace-dominant
    s0 = safe(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], axis=-1)
    s1 = safe(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], axis=-1)
    s2 = safe(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], axis=-1)
    s3 = safe(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, best[..., None, None].astype(jnp.int32) * jnp.ones_like(qs[..., :1, :], dtype=jnp.int32), axis=-2)[..., 0, :]
    return normalize(q)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by unit quaternion q (q v q*)."""
    qv = q[..., 1:]
    qw = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)
