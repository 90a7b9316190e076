"""Hartley-Sturm optimal correspondence correction."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import so3
from surikatoko_tpu.models.sfm import mvg
from surikatoko_tpu.models.sfm.optimal_triangulation import (
    correct_correspondence, correct_correspondences_batch)

from test_mvg import two_view_scene


def epipolar_resid(F, x1, x2):
    h1 = np.append(np.asarray(x1), 1.0)
    h2 = np.append(np.asarray(x2), 1.0)
    return abs(h2 @ np.asarray(F) @ h1)


def test_corrected_points_satisfy_epipolar_exactly(rng):
    x1, x2, R, t, _ = two_view_scene(rng, n=20)
    E = jnp.asarray(np.asarray(so3.skew(t)) @ np.asarray(R))
    # perturb observations off the epipolar surface
    x1n = x1 + jnp.asarray(rng.normal(scale=2e-3, size=x1.shape))
    x2n = x2 + jnp.asarray(rng.normal(scale=2e-3, size=x2.shape))
    x1c, x2c = correct_correspondences_batch(E, x1n, x2n)
    for i in range(20):
        before = epipolar_resid(E, x1n[i], x2n[i])
        after = epipolar_resid(E, x1c[i], x2c[i])
        assert after < 1e-10, (i, before, after)


def test_correction_is_small_and_near_optimal(rng):
    x1, x2, R, t, _ = two_view_scene(rng, n=20)
    E = jnp.asarray(np.asarray(so3.skew(t)) @ np.asarray(R))
    noise = 2e-3
    x1n = x1 + jnp.asarray(rng.normal(scale=noise, size=x1.shape))
    x2n = x2 + jnp.asarray(rng.normal(scale=noise, size=x2.shape))
    x1c, x2c = correct_correspondences_batch(E, x1n, x2n)
    move = np.linalg.norm(np.asarray(x1c - x1n), axis=1) + \
        np.linalg.norm(np.asarray(x2c - x2n), axis=1)
    # corrections are on the order of the injected noise, never wild
    assert move.max() < 10 * noise
    # corrected points are closer to the true projections than the noisy ones
    d_before = np.linalg.norm(np.asarray(x1n - x1), axis=1)
    d_after = np.linalg.norm(np.asarray(x1c - x1), axis=1)
    assert d_after.mean() <= d_before.mean() * 1.05


def test_already_consistent_pair_unchanged(rng):
    x1, x2, R, t, _ = two_view_scene(rng, n=4)
    E = jnp.asarray(np.asarray(so3.skew(t)) @ np.asarray(R))
    x1c, x2c = correct_correspondence(E, x1[0], x2[0])
    np.testing.assert_allclose(x1c, x1[0], atol=1e-6)
    np.testing.assert_allclose(x2c, x2[0], atol=1e-6)
