"""Auto-calibration via the image of the absolute conic (IAC).

Capability match for the reference prototype's auto-calibration block
(py_proto/suriko/mvg.py:2848-3120). Two classical routes, both linear in the
IAC omega = K^-T K^-1 followed by Cholesky extraction of K:

* :func:`calibrate_from_homographies` — Zhang's method: each plane
  homography H = K [r1 r2 t] gives two constraints
  h1^T w h2 = 0 and h1^T w h1 = h2^T w h2 (>= 3 views for full 5-dof K).
* :func:`calibrate_from_rotation_homographies` — a rotating camera: the
  infinite homography H ~ K R K^-1 preserves the IAC, w = H^-T w H^-1,
  giving linear constraints per view.

All solvers are masked/batched and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _vij(H: jnp.ndarray, i: int, j: int) -> jnp.ndarray:
    """Zhang's v_ij row: constraint h_i^T w h_j in terms of the 6-vector
    w = [w11, w12, w22, w13, w23, w33]."""
    h_i = H[:, i]
    h_j = H[:, j]
    return jnp.stack([
        h_i[0] * h_j[0],
        h_i[0] * h_j[1] + h_i[1] * h_j[0],
        h_i[1] * h_j[1],
        h_i[2] * h_j[0] + h_i[0] * h_j[2],
        h_i[2] * h_j[1] + h_i[1] * h_j[2],
        h_i[2] * h_j[2],
    ])


def _omega_to_K(w6: jnp.ndarray) -> jnp.ndarray:
    """Recover K (upper triangular, K[2,2]=1) from the IAC 6-vector via
    Cholesky of omega = K^-T K^-1."""
    W = jnp.asarray([
        [w6[0], w6[1], w6[3]],
        [w6[1], w6[2], w6[4]],
        [w6[3], w6[4], w6[5]],
    ])
    # scale sign so W is positive definite
    W = W * jnp.sign(w6[0])
    W = W / W[2, 2] * 1.0
    L = jnp.linalg.cholesky(W)        # W = L L^T with L lower triangular
    Kinv = L.T                        # K^-1 = L^T (upper triangular)
    K = jnp.linalg.inv(Kinv)
    return K / K[2, 2]


def calibrate_from_homographies(Hs: jnp.ndarray,
                                mask: jnp.ndarray | None = None
                                ) -> jnp.ndarray:
    """K [3,3] from >=3 plane homographies [M,3,3] (Zhang). Masked views
    contribute zero rows."""
    M = Hs.shape[0]
    if mask is None:
        mask = jnp.ones((M,), bool)

    def rows(H):
        v12 = _vij(H, 0, 1)
        v11 = _vij(H, 0, 0)
        v22 = _vij(H, 1, 1)
        return jnp.stack([v12, v11 - v22])

    A = jax.vmap(rows)(Hs) * mask[:, None, None].astype(Hs.dtype)
    A = A.reshape(2 * M, 6)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return _omega_to_K(Vt[-1])


def calibrate_from_rotation_homographies(Hs: jnp.ndarray,
                                         mask: jnp.ndarray | None = None,
                                         ) -> jnp.ndarray:
    """K from infinite homographies of a rotating camera: H_i ~ K R_i K^-1.

    Uses the dual form: the dual IAC w* = K K^T satisfies w* = H w* H^T.
    Each view gives 6 linear equations on the symmetric w* (with H scaled to
    det(H)=1 so the similarity is norm-preserving)."""
    M = Hs.shape[0]
    if mask is None:
        mask = jnp.ones((M,), bool)

    idx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]

    def rows(H):
        Hn = H / jnp.cbrt(jnp.linalg.det(H))

        def constraint(w6):
            W = jnp.asarray([
                [w6[0], w6[1], w6[2]],
                [w6[1], w6[3], w6[4]],
                [w6[2], w6[4], w6[5]],
            ])
            R = Hn @ W @ Hn.T - W
            return jnp.stack([R[a, b] for a, b in idx])

        return jax.jacfwd(constraint)(jnp.zeros(6, H.dtype))

    A = jax.vmap(rows)(Hs) * mask[:, None, None].astype(Hs.dtype)
    A = A.reshape(6 * M, 6)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    w6 = Vt[-1]
    Wd = jnp.asarray([
        [w6[0], w6[1], w6[2]],
        [w6[1], w6[3], w6[4]],
        [w6[2], w6[4], w6[5]],
    ])
    Wd = Wd * jnp.sign(w6[0])
    Wd = Wd / Wd[2, 2]
    # w* = K K^T -> K from Cholesky (upper-triangular convention)
    # K K^T = U U^T with U upper triangular: use the reversed-Cholesky trick
    Pr = jnp.asarray([[0.0, 0, 1], [0, 1, 0], [1, 0, 0]], Hs.dtype)
    Lp = jnp.linalg.cholesky(Pr @ Wd @ Pr)
    U = Pr @ Lp @ Pr
    K = U
    return K / K[2, 2]
