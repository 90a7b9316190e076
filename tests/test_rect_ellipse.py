"""Rect intersection table (port of reference test-geom.cpp:37-62) and
covariance->ellipse extraction checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import ellipse, rect

# (rect A, rect B, expected intersection) — mirrors the reference's
# parameterized 12-case table style for overlap/touch/disjoint/containment.
CASES = [
    ((0, 0, 4, 4), (2, 2, 4, 4), (2, 2, 2, 2)),          # partial overlap
    ((0, 0, 4, 4), (1, 1, 2, 2), (1, 1, 2, 2)),          # B inside A
    ((1, 1, 2, 2), (0, 0, 4, 4), (1, 1, 2, 2)),          # A inside B
    ((0, 0, 2, 2), (2, 0, 2, 2), (2, 0, 0, 2)),          # touching edge
    ((0, 0, 2, 2), (3, 3, 2, 2), None),                  # disjoint
    ((0, 0, 2, 2), (2, 2, 2, 2), (2, 2, 0, 0)),          # touching corner
    ((0, 0, 4, 2), (1, -1, 2, 6), (1, 0, 2, 2)),         # cross shape
    ((0, 0, 4, 4), (0, 0, 4, 4), (0, 0, 4, 4)),          # identical
    ((-2, -2, 2, 2), (-1.5, -1.5, 1, 1), (-1.5, -1.5, 1, 1)),  # negative coords
    ((0, 0, 0, 0), (0, 0, 4, 4), (0, 0, 0, 0)),          # empty A
]


@pytest.mark.parametrize("a,b,expected", CASES)
def test_intersect(a, b, expected):
    ra, rb = rect.make(*a), rect.make(*b)
    inter = rect.intersect(ra, rb)
    if expected is None:
        assert bool(rect.is_empty(inter))
    else:
        exp = np.asarray(expected, dtype=float)
        np.testing.assert_allclose(inter, exp, atol=1e-12)


def test_deflate_center_contains():
    r = rect.make(0, 0, 10, 10)
    d = rect.deflate(r, 2, 3)
    np.testing.assert_allclose(d, [2, 3, 6, 4])
    np.testing.assert_allclose(rect.center(r), [5, 5])
    assert bool(rect.contains(r, jnp.array([5.0, 5.0])))
    assert not bool(rect.contains(r, jnp.array([10.0, 5.0])))


def test_centered():
    r = rect.centered(jnp.array([5.0, 5.0]), 4, 2)
    np.testing.assert_allclose(r, [3, 4, 4, 2])


def test_ellipse_axis_aligned():
    cov = jnp.diag(jnp.array([4.0, 1.0]))
    e = ellipse.ellipse_from_covariance(cov, jnp.zeros(2), confidence=0.95)
    chi2 = float(ellipse.chi_square_quantile_2dof(0.95))
    np.testing.assert_allclose(sorted(np.asarray(e.semi_axes), reverse=True),
                               [np.sqrt(4 * chi2), np.sqrt(1 * chi2)], atol=1e-9)
    np.testing.assert_allclose(abs(np.asarray(e.R)), np.eye(2), atol=1e-9)


def test_ellipse_rotation_recovers_principal_axes(rng):
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    cov = R @ np.diag([9.0, 1.0]) @ R.T
    e = ellipse.ellipse_from_covariance(jnp.asarray(cov), jnp.zeros(2), 0.95)
    # major axis direction is ±R[:,0]
    major = np.asarray(e.R)[:, 0]
    cosang = abs(np.dot(major, R[:, 0]))
    np.testing.assert_allclose(cosang, 1.0, atol=1e-9)


def test_chi_square_quantiles():
    # known values: chi2(0.95; 2)=5.991, chi2(0.95; 3)=7.815
    np.testing.assert_allclose(ellipse.chi_square_quantile_2dof(0.95), 5.9915, atol=1e-3)
    # Wilson-Hilferty approximation is good to ~0.5% relative
    np.testing.assert_allclose(ellipse.chi_square_quantile_3dof(0.95), 7.8147, rtol=1e-2)


def test_ellipsoid_extractable():
    good = jnp.diag(jnp.array([1.0, 2.0, 3.0]))
    bad = jnp.diag(jnp.array([1.0, -0.1, 3.0]))
    assert bool(ellipse.is_ellipsoid_extractable(good))
    assert not bool(ellipse.is_ellipsoid_extractable(bad))


def test_ellipse_bounds():
    cov = jnp.diag(jnp.array([4.0, 1.0]))
    e = ellipse.ellipse_from_covariance(cov, jnp.array([10.0, 20.0]), 0.95)
    b = ellipse.ellipse_bounds(e)
    chi2 = float(ellipse.chi_square_quantile_2dof(0.95))
    np.testing.assert_allclose(
        b, [10 - 2 * np.sqrt(chi2), 20 - np.sqrt(chi2), 4 * np.sqrt(chi2), 2 * np.sqrt(chi2)],
        atol=1e-9)
