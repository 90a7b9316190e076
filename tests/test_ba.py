"""Bundle adjustment: normalization round-trip (port of
BAKanataniTest.NormalizationSimple, test-bundle-adj-kanatani.cpp:22-128),
Schur-vs-naive solver identity (reference cross-check :788-797), derivative
finite-diff checks, and the circle-grid noise-recovery convergence demo
(demo-bundle-adj-circle-grid.cpp) as a test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import so3
from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.models.ba import (
    BAProblem, BundleAdjustment, TermCriteria, make_problem,
    normalize_scene, revert_normalization, check_world_is_normalized,
    reproj_error,
)
from surikatoko_tpu.models.ba import derivs, schur
from surikatoko_tpu.models.ba.problem import project_f0, residuals
from surikatoko_tpu.world import scene_gen


def circle_grid_problem(noise_pnt=0.0, noise_rot=0.0, f0=1.0, rng=None,
                        n_angles=4):
    """Synthetic circle-grid world: grid points viewed from cameras on a
    circle (the reference's BA fixture)."""
    wb = scene_gen.WorldBounds(-2.0, 2.0, -0.5, 0.5, 0.0, 0.5)
    points = np.asarray(scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5), 0.0))
    # cameras on a circle around the grid center, elevated, looking inward
    angles = np.linspace(np.pi / 2 - 0.6, np.pi / 2 + 0.6, n_angles)
    cfw = scene_gen.circle_camera_shots((0.0, 0.0, 0.25), 4.0, 3.0, angles)
    K = np.array([[520.0, 0, 160.0], [0, 520.0, 120.0], [0, 0, 1.0]])
    Kf0 = K.copy()
    Kf0[:2] /= f0
    # observations = exact projections
    obs = np.zeros((len(points), len(angles), 2))
    mask = np.zeros((len(points), len(angles)), bool)
    for j in range(len(angles)):
        Rj, tj = np.asarray(cfw.R[j]), np.asarray(cfw.t[j])
        xc = points @ Rj.T + tj
        ok = xc[:, 2] > 0.1
        proj = (xc @ Kf0.T)
        pix = proj[:, :2] / proj[:, 2:3] * f0
        obs[:, j] = pix
        mask[:, j] = ok & (np.abs(pix[:, 0] - 160) < 400) & (np.abs(pix[:, 1] - 120) < 400)
    # corrupt
    rng = rng or np.random.default_rng(7)
    pts_bad = points + (rng.normal(scale=noise_pnt, size=points.shape) if noise_pnt else 0)
    R_bad = np.array(cfw.R)  # writable copy
    if noise_rot:
        for j in range(1, len(angles)):  # keep frame 0 exact (gauge anchor)
            R_bad[j] = np.asarray(so3.exp(jnp.asarray(rng.normal(scale=noise_rot, size=3)))) @ R_bad[j]
    assert mask.sum() > 0.8 * mask.size, "fixture: most points must be visible"
    cfw_bad = SE3(jnp.asarray(R_bad), cfw.t)
    return make_problem(pts_bad, cfw_bad, Kf0, obs, mask, f0), points, cfw


def test_normalization_roundtrip():
    p, _, _ = circle_grid_problem()
    err0 = float(reproj_error(p))
    p_norm, ns = normalize_scene(p)
    assert check_world_is_normalized(p_norm)
    # reprojection error is invariant under the similarity gauge change
    np.testing.assert_allclose(float(reproj_error(p_norm)), err0, atol=1e-8)
    p_back = revert_normalization(p_norm, ns)
    np.testing.assert_allclose(p_back.points, p.points, atol=1e-9)
    np.testing.assert_allclose(p_back.cfw_R, p.cfw_R, atol=1e-10)
    np.testing.assert_allclose(p_back.cfw_t, p.cfw_t, atol=1e-10)


def test_gauss_newton_gradient_vs_autodiff():
    """Block gradient (gp, gf) must equal d(0.5*err)/d(vars) by autodiff of
    the scalar error."""
    p, _, _ = circle_grid_problem(noise_pnt=0.05, noise_rot=0.02)
    blocks = derivs.compute_blocks(p, fix_gauge=False)

    grad_pts = jax.grad(
        lambda pts: 0.5 * reproj_error(p._replace(points=pts)))(p.points)
    np.testing.assert_allclose(blocks.gp, grad_pts, rtol=1e-7, atol=1e-10)

    # frame grad: autodiff the error through the local increment u at 0
    def err_of_u(u):
        p2 = derivs.apply_corrections(p, jnp.zeros_like(p.points), u)
        return 0.5 * reproj_error(p2)

    gf_auto = jax.grad(err_of_u)(jnp.zeros((p.n_frames, 10), p.points.dtype))
    np.testing.assert_allclose(blocks.gf, gf_auto, rtol=1e-6, atol=1e-10)


def test_schur_matches_naive_dense():
    p, _, _ = circle_grid_problem(noise_pnt=0.05, noise_rot=0.02)
    blocks = derivs.compute_blocks(p)
    for factor in (1e-4, 1.0, 100.0):
        dX1, du1, ok1 = schur.solve_corrections_schur(blocks, factor)
        dX2, du2, ok2 = schur.solve_corrections_naive(blocks, factor)
        assert bool(ok1) and bool(ok2)
        np.testing.assert_allclose(dX1, dX2, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(du1, du2, rtol=1e-6, atol=1e-9)


def test_gauge_fixed_vars_get_zero_corrections():
    p, _, _ = circle_grid_problem(noise_pnt=0.05, noise_rot=0.02)
    blocks = derivs.compute_blocks(p)
    _, du, _ = schur.solve_corrections_schur(blocks, 1e-4)
    # frame 0: T and W pinned
    np.testing.assert_allclose(du[0, 4:], 0.0, atol=1e-12)
    # frame 1: T[unity=1] pinned
    np.testing.assert_allclose(du[1, 5], 0.0, atol=1e-12)
    assert abs(float(du[1, 4])) >= 0  # others free


def test_ba_recovers_from_point_noise():
    """Circle-grid noise recovery: corrupt points, BA restores reprojection
    error to ~zero (reference demo-bundle-adj-circle-grid)."""
    p, gt_points, _ = circle_grid_problem(noise_pnt=0.03)
    err_before = float(reproj_error(p))
    ba = BundleAdjustment()
    ok, p_opt = ba.compute_inplace(
        p, TermCriteria(allowed_reproj_err_rel_change=1e-12))
    err_after = float(reproj_error(p_opt))
    assert err_after < err_before * 1e-6, (err_before, err_after, ba.stop_reason)
    assert ok


def test_ba_recovers_from_rotation_noise():
    p, gt_points, gt_cfw = circle_grid_problem(noise_pnt=0.01, noise_rot=0.01)
    err_before = float(reproj_error(p))
    ba = BundleAdjustment()
    ok, p_opt = ba.compute_inplace(
        p, TermCriteria(allowed_reproj_err_rel_change=1e-12))
    err_after = float(reproj_error(p_opt))
    assert err_after < err_before * 1e-5, (err_before, err_after, ba.stop_reason)


def test_ba_noop_on_exact_data():
    """On exact data the error is already ~0; LM stops immediately."""
    p, _, _ = circle_grid_problem()
    assert float(reproj_error(p)) < 1e-16
    ba = BundleAdjustment()
    ok, p_opt = ba.compute_inplace(
        p, TermCriteria(allowed_reproj_err_rel_change=1e-10))
    assert float(reproj_error(p_opt)) < 1e-10


def test_f0_scaling_consistency():
    """Same geometry at f0=1 and f0=600: errors relate by f0^2."""
    p1, _, _ = circle_grid_problem(noise_pnt=0.02, f0=1.0)
    p600, _, _ = circle_grid_problem(noise_pnt=0.02, f0=600.0)
    e1 = float(reproj_error(p1))
    e600 = float(reproj_error(p600))
    np.testing.assert_allclose(e600 * 600.0**2, e1, rtol=1e-6)
