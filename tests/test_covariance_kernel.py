"""Blocked symmetric downdate kernel parity (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.ops.covariance import symmetric_downdate


@pytest.mark.parametrize("D,m", [(589, 192), (300, 64), (256, 32)])
def test_downdate_matches_xla(rng, D, m):
    A = rng.normal(size=(D, D)) * 0.1
    P = jnp.asarray(A @ A.T, jnp.float32)
    M = jnp.asarray(rng.normal(size=(m, D)) * 0.05, jnp.float32)
    want = np.asarray(P) - np.asarray(M).T @ np.asarray(M)
    got = symmetric_downdate(P, M, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
    # exact symmetry by construction
    assert bool(jnp.all(got == got.T))


def test_downdate_posterior_stays_psd(rng):
    """EKF-shaped use: P - M^T M with M = S^-1/2 A keeps PSD."""
    D, m = 128, 16
    A = rng.normal(size=(D, D))
    P = jnp.asarray(A @ A.T + 10 * np.eye(D), jnp.float32)
    H = rng.normal(size=(m, D)) * 0.1
    S = H @ np.asarray(P) @ H.T + np.eye(m)
    L = np.linalg.cholesky(S)
    M = jnp.asarray(np.linalg.solve(L, H @ np.asarray(P)), jnp.float32)
    out = symmetric_downdate(P, M, interpret=True)
    evals = np.linalg.eigvalsh(np.asarray(out, np.float64))
    assert evals.min() > -1e-2
