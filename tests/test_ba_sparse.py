"""Sparse (padded-track) BA parity vs the dense path, and a medium-scale
smoke of the scatter-add Schur reduction."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.models.ba import derivs, schur, sparse
from surikatoko_tpu.models.ba.problem import reproj_error as dense_err

from test_ba import circle_grid_problem


@pytest.fixture
def problems():
    pd, _, _ = circle_grid_problem(noise_pnt=0.05, noise_rot=0.02)
    ps = sparse.from_dense(pd)
    return pd, ps


def test_sparse_reproj_error_matches_dense(problems):
    pd, ps = problems
    np.testing.assert_allclose(float(sparse.reproj_error(ps)),
                               float(dense_err(pd)), rtol=1e-12)


def test_sparse_blocks_match_dense(problems):
    pd, ps = problems
    bd = derivs.compute_blocks(pd)
    bs = sparse.compute_blocks(ps)
    np.testing.assert_allclose(bs.E, bd.E, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(bs.G, bd.G, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(bs.gp, bd.gp, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(bs.gf, bd.gf, rtol=1e-9, atol=1e-12)


def test_sparse_schur_matches_dense(problems):
    pd, ps = problems
    bd = derivs.compute_blocks(pd)
    bs = sparse.compute_blocks(ps)
    dX_d, du_d, ok_d = schur.solve_corrections_schur(bd, 1e-4)
    dX_s, du_s, ok_s = sparse.solve_corrections_schur_sparse(
        ps, bs, 1e-4, point_chunk=16)
    assert bool(ok_d) and bool(ok_s)
    np.testing.assert_allclose(du_s, du_d, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(dX_s, dX_d, rtol=1e-7, atol=1e-10)


def test_sparse_lm_iteration_decreases_error(problems):
    _, ps = problems
    err0 = float(sparse.reproj_error(ps))
    bs = sparse.compute_blocks(ps)
    dX, du, ok = sparse.solve_corrections_schur_sparse(ps, bs, 1e-4)
    ps2 = sparse.apply_corrections(ps, dX, du)
    assert float(sparse.reproj_error(ps2)) < err0


def test_sparse_medium_scale_smoke(rng):
    """800 points x 40 frames, track length 8 — the scatter path at a size
    where a dense grid would already be wasteful."""
    from surikatoko_tpu.world import test_data_builder as tdb
    Np, F, L = 800, 40, 8
    pts = rng.uniform(-2, 2, size=(Np, 3)) + np.array([0, 0, 4.0])
    K = np.array([[500.0, 0, 160.0], [0, 500.0, 120.0], [0, 0, 1.0]])
    angles = np.linspace(0, 2 * np.pi, F, endpoint=False)
    from surikatoko_tpu.world import scene_gen
    cfw = scene_gen.circle_camera_shots((0, 0, 4.0), 8.0, 2.0, angles)
    obs = np.zeros((Np, L, 2))
    fidx = np.zeros((Np, L), np.int32)
    mask = np.zeros((Np, L), bool)
    for i in range(Np):
        start = rng.integers(0, F)
        frames = [(start + k) % F for k in range(L)]
        for l, f in enumerate(frames):
            R, t = np.asarray(cfw.R[f]), np.asarray(cfw.t[f])
            xc = R @ pts[i] + t
            if xc[2] < 0.5:
                continue
            ph = K @ xc
            obs[i, l] = ph[:2] / ph[2] + rng.normal(scale=0.3, size=2)
            fidx[i, l] = f
            mask[i, l] = True
    ps = sparse.BAProblemSparse(
        points=jnp.asarray(pts + rng.normal(scale=0.02, size=pts.shape)),
        cfw_R=jnp.asarray(np.asarray(cfw.R)), cfw_t=jnp.asarray(np.asarray(cfw.t)),
        K=jnp.broadcast_to(jnp.asarray(K), (F, 3, 3)),
        obs=jnp.asarray(obs), frame_idx=jnp.asarray(fidx),
        obs_mask=jnp.asarray(mask), f0=jnp.asarray(1.0))
    err0 = float(sparse.reproj_error(ps))
    for it in range(3):
        bs = sparse.compute_blocks(ps)
        dX, du, ok = sparse.solve_corrections_schur_sparse(ps, bs, 1e-4)
        assert bool(ok)
        ps2 = sparse.apply_corrections(ps, dX, du)
        if float(sparse.reproj_error(ps2)) < float(sparse.reproj_error(ps)):
            ps = ps2
    assert float(sparse.reproj_error(ps)) < err0 * 0.05


def test_sparse_lm_driver(problems):
    """SparseBundleAdjustment converges on the circle-grid problem."""
    from surikatoko_tpu.models.ba import SparseBundleAdjustment, TermCriteria
    from surikatoko_tpu.models.ba import normalize as norm_mod
    _, ps = problems
    # normalize gauge first (driver operates on the normalized world)
    from surikatoko_tpu.models.ba.problem import BAProblem
    import jax.numpy as jnp
    dummy = BAProblem(points=ps.points, cfw_R=ps.cfw_R, cfw_t=ps.cfw_t, K=ps.K,
                      obs=jnp.zeros((1, ps.n_frames, 2), ps.points.dtype),
                      obs_mask=jnp.zeros((1, ps.n_frames), bool), f0=ps.f0)
    dnorm, _ = norm_mod.normalize_scene(dummy)
    ps_n = ps._replace(points=dnorm.points, cfw_R=dnorm.cfw_R, cfw_t=dnorm.cfw_t)
    err0 = float(sparse.reproj_error(ps_n))
    ba = SparseBundleAdjustment(point_chunk=16)
    ok, ps_opt = ba.compute(ps_n, TermCriteria(allowed_reproj_err_rel_change=1e-10))
    err1 = float(sparse.reproj_error(ps_opt))
    assert err1 < err0 * 1e-4, (err0, err1, ba.stop_reason)


def test_sparse_lm_driver_distributed(problems):
    from surikatoko_tpu.models.ba import SparseBundleAdjustment, TermCriteria
    from surikatoko_tpu.parallel import landmark_mesh
    ps = _padded_problem_for_mesh(problems)
    err0 = float(sparse.reproj_error(ps))
    ba = SparseBundleAdjustment(point_chunk=8, mesh=landmark_mesh(8))
    ok, ps_opt = ba.compute(ps, TermCriteria(allowed_reproj_err_rel_change=1e-10,
                                             max_iters=30))
    err1 = float(sparse.reproj_error(ps_opt))
    assert err1 < err0 * 1e-3, (err0, err1, ba.stop_reason)


def _padded_problem_for_mesh(problems):
    import jax.numpy as jnp
    _, ps = problems
    Np = ps.n_points
    pad = (-Np) % 8
    if pad:
        ps = ps._replace(
            points=jnp.concatenate([ps.points, jnp.ones((pad, 3), ps.points.dtype)]),
            obs=jnp.concatenate([ps.obs, jnp.zeros((pad,) + ps.obs.shape[1:], ps.obs.dtype)]),
            frame_idx=jnp.concatenate([ps.frame_idx, jnp.zeros((pad, ps.track_len), jnp.int32)]),
            obs_mask=jnp.concatenate([ps.obs_mask, jnp.zeros((pad, ps.track_len), bool)]),
        )
    return ps


def test_sparse_pinned_frame_parity_with_dense(problems):
    """pin_frames produces identical corrections in the sparse and dense
    solvers, and exactly zero pose correction for the pinned frame."""
    pd, ps = problems
    pin = (2,)
    bd = derivs.compute_blocks(pd, pin_frames=pin)
    bs = sparse.compute_blocks(ps, pin_frames=pin)
    dX_d, du_d, ok_d = schur.solve_corrections_schur(bd, 1e-4, pin_frames=pin)
    dX_s, du_s, ok_s = sparse.solve_corrections_schur_sparse(
        ps, bs, 1e-4, point_chunk=16, pin_frames=pin)
    assert bool(ok_d) and bool(ok_s)
    np.testing.assert_allclose(np.asarray(du_d[2, 4:]), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(du_s[2, 4:]), 0.0, atol=1e-14)
    np.testing.assert_allclose(du_s, du_d, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(dX_s, dX_d, rtol=1e-7, atol=1e-10)
