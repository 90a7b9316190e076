"""Streaming stats + Monte-Carlo vs Jacobian uncertainty propagation (the
reference's de-facto correctness methodology, rand-stuff.h:96)."""

import jax
import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.utils import rand, stats


def test_mean_std_streaming(rng):
    xs = rng.normal(loc=3.0, scale=2.0, size=500)
    s = stats.mean_std_init(jnp.float64)
    for x in xs:
        s = stats.mean_std_update(s, x)
    mean, std = stats.mean_std_result(s)
    np.testing.assert_allclose(mean, xs.mean(), atol=1e-9)
    np.testing.assert_allclose(std, xs.std(ddof=1), atol=1e-9)


def test_sample_covariance_recovered(key):
    cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    mean = jnp.array([1.0, -1.0])
    samples = rand.sample_from_covariance(key, mean, cov, 200_000)
    np.testing.assert_allclose(jnp.mean(samples, axis=0), mean, atol=2e-2)
    np.testing.assert_allclose(rand.calc_covar_mat(samples), cov, atol=3e-2)


def test_mc_vs_jacobian_propagation(key):
    # mildly nonlinear map; MC and first-order propagation should agree
    def fn(x):
        return jnp.array([x[0] + 0.1 * x[1] ** 2, jnp.sin(x[1]) + x[0] * 0.2])

    mean = jnp.array([0.5, 0.3])
    cov = jnp.diag(jnp.array([1e-4, 4e-4]))
    _, cov_mc = rand.propagate_uncertainty_mc(key, fn, mean, cov, n=200_000)
    _, cov_jac = rand.propagate_uncertainty_jacobian(fn, mean, cov)
    np.testing.assert_allclose(cov_mc, cov_jac, rtol=0.05, atol=1e-8)


def test_gauss_jordan_mit_pivoting_case():
    # the reference prototype's test fixture (py_proto/suriko/
    # test_gauss_jordan.py:7-14): augmented 4x5 system needing pivoting
    from surikatoko_tpu.utils import la

    m = jnp.array([[0.02, 0.01, 0, 0], [1, 2, 1, 0],
                   [0, 1, 2, 1], [0, 0, 100, 200]], jnp.float64)
    b = jnp.array([0.02, 1, 4, 800], jnp.float64)
    aug = jnp.hstack([m, b[:, None]])
    rref, ok = la.gauss_jordan(aug)
    assert bool(ok)
    np.testing.assert_allclose(rref[:, 4], [1, 0, 0, 4], atol=1e-12)
    np.testing.assert_allclose(rref[:, :4], jnp.eye(4), atol=1e-12)


def test_gauss_jordan_detects_singular():
    # wikipedia's dependent-rows example (reference test_gauss_jordan.py:16)
    from surikatoko_tpu.utils import la

    aug = jnp.array([[1, 3, 1, 9], [1, 1, -1, 1], [3, 11, 5, 35]], jnp.float64)
    _, ok = la.gauss_jordan(aug)
    assert not bool(ok)


def test_gauss_jordan_matches_solve(rng):
    from surikatoko_tpu.utils import la

    a = jnp.asarray(rng.normal(size=(7, 7)))
    b = jnp.asarray(rng.normal(size=(7, 2)))
    rref, ok = jax.jit(la.gauss_jordan)(jnp.hstack([a, b]))
    assert bool(ok)
    np.testing.assert_allclose(rref[:, 7:], jnp.linalg.solve(a, b), atol=1e-9)
