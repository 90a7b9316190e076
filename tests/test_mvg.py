"""Two-view geometry: homography/fundamental/essential estimators, Sampson,
RANSAC — behavior coverage of the reference prototype's mvg toolbox."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import so3
from surikatoko_tpu.models.sfm import mvg, ransac


def two_view_scene(rng, n=40, planar=False):
    """Synthetic calibrated two-view scene. Returns (x1n, x2n [N,2] normalized
    coords, R, t (unit), points)."""
    if planar:
        # points on plane z = 2 + 0.3x + 0.1y  => n^T X = d form
        xy = rng.uniform(-1, 1, size=(n, 2))
        z = 2.0 + 0.3 * xy[:, 0] + 0.1 * xy[:, 1]
        X = np.concatenate([xy, z[:, None]], axis=1)
    else:
        X = rng.uniform(-1, 1, size=(n, 3)) + np.array([0, 0, 3.0])
    R = np.asarray(so3.exp(jnp.asarray([0.05, -0.12, 0.03])))
    t = np.array([0.4, -0.1, 0.15])
    t_unit = t / np.linalg.norm(t)
    X2 = X @ R.T + t
    x1 = X[:, :2] / X[:, 2:3]
    x2 = X2[:, :2] / X2[:, 2:3]
    return (jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(R),
            jnp.asarray(t_unit), X)


def test_homography_dlt_exact(rng):
    x1, x2, R, t, X = two_view_scene(rng, planar=True)
    mask = jnp.ones(x1.shape[0], bool)
    H = mvg.homography_dlt(x1, x2, mask)
    x1h = np.concatenate([np.asarray(x1), np.ones((len(x1), 1))], axis=1)
    proj = x1h @ np.asarray(H).T
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(proj, x2, atol=1e-8)


def test_homography_decomposition_recovers_pose(rng):
    x1, x2, R_gt, t_gt, X = two_view_scene(rng, planar=True)
    mask = jnp.ones(x1.shape[0], bool)
    H = mvg.homography_dlt(x1, x2, mask)
    Rs, ts, ns = mvg.decompose_homography_calibrated(H)
    # at least one candidate matches the GT rotation
    errs = [float(jnp.linalg.norm(Rs[i] - R_gt)) for i in range(4)]
    assert min(errs) < 1e-3, errs
    # and its translation direction matches up to scale
    i = int(np.argmin(errs))
    td = np.asarray(ts[i])
    td = td / np.linalg.norm(td)
    assert min(np.linalg.norm(td - np.asarray(t_gt)),
               np.linalg.norm(td + np.asarray(t_gt))) < 1e-2


def test_fundamental_8point_epipolar_constraint(rng):
    x1, x2, *_ = two_view_scene(rng)
    mask = jnp.ones(x1.shape[0], bool)
    F = mvg.fundamental_8point(x1, x2, mask)
    d = mvg.sampson_distance_sq(F, x1, x2)
    assert float(jnp.max(d)) < 1e-12
    # rank 2
    assert float(jnp.linalg.svd(F)[1][2]) < 1e-10


def test_fundamental_7point_contains_solution(rng):
    x1, x2, *_ = two_view_scene(rng, n=7)
    Fs = mvg.fundamental_7point(x1, x2)
    best = min(float(jnp.max(mvg.sampson_distance_sq(Fs[i], x1, x2)))
               for i in range(3))
    assert best < 1e-10


def test_essential_decomposition_cheirality(rng):
    x1, x2, R_gt, t_gt, _ = two_view_scene(rng)
    mask = jnp.ones(x1.shape[0], bool)
    E = mvg.essential_8point(x1, x2, mask)
    R, t = mvg.decompose_essential_best(E, x1, x2, mask)
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    np.testing.assert_allclose(t, t_gt, atol=1e-6)


def test_relative_pose_noisy_with_refinement(rng):
    x1, x2, R_gt, t_gt, _ = two_view_scene(rng, n=100)
    noise = 0.5 / 500.0  # half-pixel at f=500
    x1n = x1 + jnp.asarray(rng.normal(scale=noise, size=x1.shape))
    x2n = x2 + jnp.asarray(rng.normal(scale=noise, size=x2.shape))
    mask = jnp.ones(100, bool)
    pose = mvg.relative_pose_from_correspondences(x1n, x2n, mask, refine=True)
    ang = np.degrees(np.arccos(np.clip((np.trace(np.asarray(pose.R) @ np.asarray(R_gt).T) - 1) / 2, -1, 1)))
    t_err = min(np.linalg.norm(np.asarray(pose.t) - np.asarray(t_gt)),
                np.linalg.norm(np.asarray(pose.t) + np.asarray(t_gt)))
    assert ang < 0.5, ang
    assert t_err < 0.05, t_err


def test_sampson_distance_zero_on_epipolar(rng):
    x1, x2, R, t, _ = two_view_scene(rng)
    E = jnp.asarray(np.asarray(so3.skew(t)) @ np.asarray(R))
    d = mvg.sampson_distance_sq(E, x1, x2)
    assert float(jnp.max(d)) < 1e-14


def test_ransac_fundamental_with_outliers(rng, key):
    x1, x2, *_ = two_view_scene(rng, n=60)
    x2_bad = np.asarray(x2).copy()
    out_idx = rng.choice(60, size=18, replace=False)
    x2_bad[out_idx] += rng.uniform(0.1, 0.5, size=(18, 2))
    x2_bad = jnp.asarray(x2_bad)

    fit = lambda idx: mvg.fundamental_8point(
        x1[idx], x2_bad[idx], jnp.ones(8, bool))
    resid = lambda F: mvg.sampson_distance_sq(F, x1, x2_bad)
    iters = ransac.ransac_iterations_count(0.999, 0.3, 8)
    res = ransac.ransac(key, 60, 8, fit, resid, threshold=(2.0 / 500.0) ** 2,
                        iterations=max(iters, 64))
    inl = np.asarray(res.inliers)
    assert not inl[out_idx].any()          # no outlier admitted
    assert inl.sum() >= 38                 # most true inliers kept


def test_ransac_iterations_count():
    # known value: p=0.99, eps=0.5, s=8 -> ~1177
    n = ransac.ransac_iterations_count(0.99, 0.5, 8)
    assert 1100 < n < 1250
