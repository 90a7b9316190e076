"""Minimal 5-point essential solver: exact recovery, constraint residuals,
RANSAC integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import so3
from surikatoko_tpu.models.sfm import mvg
from surikatoko_tpu.models.sfm.five_point import (
    five_point_best, five_point_essential)

from test_mvg import two_view_scene


def test_five_point_recovers_gt(rng):
    x1, x2, R_gt, t_gt, _ = two_view_scene(rng, n=5)
    Es, valid = five_point_essential(x1, x2)
    E_gt = np.asarray(so3.skew(t_gt)) @ np.asarray(R_gt)
    E_gt = E_gt / np.linalg.norm(E_gt)
    errs = []
    for i in range(10):
        if not bool(valid[i]):
            continue
        E = np.asarray(Es[i])
        errs.append(min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max()))
    assert errs and min(errs) < 1e-6, errs


def test_five_point_solutions_satisfy_constraints(rng):
    x1, x2, *_ = two_view_scene(rng, n=5)
    Es, valid = five_point_essential(x1, x2)
    X1 = np.concatenate([np.asarray(x1), np.ones((5, 1))], axis=1)
    X2 = np.concatenate([np.asarray(x2), np.ones((5, 1))], axis=1)
    for i in range(10):
        if not bool(valid[i]):
            continue
        E = np.asarray(Es[i])
        # epipolar on the 5 minimal points
        epi = np.abs(np.einsum("ni,ij,nj->n", X2, E, X1)).max()
        assert epi < 1e-6, epi
        # essential-manifold constraints
        EEt = E @ E.T
        trace_c = np.abs(2 * EEt @ E - np.trace(EEt) * E).max()
        assert np.abs(np.linalg.det(E)) < 1e-6
        assert trace_c < 1e-5, trace_c


def test_five_point_best_with_support(rng):
    x1, x2, R_gt, t_gt, _ = two_view_scene(rng, n=30)
    E = five_point_best(x1[:5], x2[:5], x1, x2, jnp.ones(30, bool))
    d = mvg.sampson_distance_sq(E, x1, x2)
    assert float(jnp.max(d)) < 1e-10
    R, t = mvg.decompose_essential_best(E, x1, x2, jnp.ones(30, bool))
    np.testing.assert_allclose(R, R_gt, atol=1e-5)
    np.testing.assert_allclose(t, t_gt, atol=1e-5)


def test_five_point_in_ransac(rng, key):
    """5-point as the minimal RANSAC kernel with outliers."""
    from surikatoko_tpu.models.sfm import ransac
    x1, x2, *_ = two_view_scene(rng, n=50)
    x2_bad = np.asarray(x2).copy()
    out = rng.choice(50, size=15, replace=False)
    x2_bad[out] += rng.uniform(0.1, 0.4, size=(15, 2))
    x2_bad = jnp.asarray(x2_bad)
    mask_all = jnp.ones(50, bool)

    fit = lambda idx: five_point_best(x1[idx], x2_bad[idx], x1, x2_bad, mask_all)
    resid = lambda E: mvg.sampson_distance_sq(E, x1, x2_bad)
    res = ransac.ransac(key, 50, 5, fit, resid, threshold=(2.0 / 500.0) ** 2,
                        iterations=48)
    inl = np.asarray(res.inliers)
    assert not inl[out].any()
    assert inl.sum() >= 33
