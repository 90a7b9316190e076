"""Sampling from covariance matrices and Monte-Carlo uncertainty propagation.

Equivalent of reference rand-stuff.h:19-130: transform white noise through the
covariance eigenbasis, estimate sample covariance, and propagate uncertainty
through an arbitrary nonlinear function by simulation — the cross-check the
reference uses to validate its Jacobian-based propagation
(davison-mono-slam.cpp:4035-4068). Here it validates jax.jacfwd propagation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def sample_from_covariance(key: jax.Array, mean: jnp.ndarray, cov: jnp.ndarray,
                           n: int) -> jnp.ndarray:
    """Draw n samples ~ N(mean, cov) via the symmetric eigenbasis transform."""
    vals, vecs = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(vals, 0.0))
    white = jax.random.normal(key, (n, mean.shape[-1]), dtype=mean.dtype)
    return mean + (white * scale) @ vecs.T


def calc_covar_mat(samples: jnp.ndarray) -> jnp.ndarray:
    """Sample covariance of rows (reference CalcCovarMat, rand-stuff.h:49)."""
    mean = jnp.mean(samples, axis=0)
    centered = samples - mean
    return centered.T @ centered / (samples.shape[0] - 1)


def propagate_uncertainty_mc(
    key: jax.Array,
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    n: int = 10_000,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Monte-Carlo estimate of (E[f(x)], Cov[f(x)]) for x ~ N(mean, cov)
    (reference PropagateUncertaintyUsingSimulation, rand-stuff.h:96-130)."""
    xs = sample_from_covariance(key, mean, cov, n)
    ys = jax.vmap(fn)(xs)
    return jnp.mean(ys, axis=0), calc_covar_mat(ys)


def propagate_uncertainty_jacobian(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    mean: jnp.ndarray,
    cov: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """First-order propagation: (f(mean), J cov J^T) with J = jacfwd(fn)."""
    y = fn(mean)
    J = jax.jacfwd(fn)(mean)
    return y, J @ cov @ J.T
