"""Similarity alignment (Umeyama) + ATE — accuracy metrics that are fair
under the monocular gauge freedom (global similarity) that BA/SLAM solutions
carry. Used by demos/tests to compare reconstructions to ground truth; the
BASELINE "within reference ATE bound" criterion is evaluated with this.
"""

from __future__ import annotations

import jax.numpy as jnp


def umeyama_similarity(src: jnp.ndarray, dst: jnp.ndarray
                       ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Best (s, R, t) with dst ~ s R src + t in least squares. [N,3] inputs."""
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / src.shape[0]
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, d], cov.dtype))
    R = U @ D @ Vt
    var_s = jnp.mean(jnp.sum(sc * sc, axis=1))
    s = jnp.sum(S * jnp.asarray([1.0, 1.0, d], cov.dtype)) / var_s
    t = mu_d - s * (R @ mu_s)
    return s, R, t


def apply_similarity(s, R, t, x: jnp.ndarray) -> jnp.ndarray:
    return s * (x @ R.T) + t


def aligned_rmse(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """RMSE after optimal similarity alignment (ATE for trajectories)."""
    s, R, t = umeyama_similarity(src, dst)
    d = apply_similarity(s, R, t, src) - dst
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=1)))
