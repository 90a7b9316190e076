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


def _local_track_problem(rng, Np=600, F=48, L=8, noise=0.02):
    """Tracks over L CONSECUTIVE frames with no wrap-around — the
    frame-local observation structure the banded reduction exploits."""
    from surikatoko_tpu.world import scene_gen
    pts = rng.uniform(-2, 2, size=(Np, 3)) + np.array([0, 0, 4.0])
    K = np.array([[500.0, 0, 160.0], [0, 500.0, 120.0], [0, 0, 1.0]])
    angles = np.linspace(0, 2 * np.pi, F, endpoint=False)
    cfw = scene_gen.circle_camera_shots((0, 0, 4.0), 8.0, 2.0, angles)
    obs = np.zeros((Np, L, 2))
    fidx = np.zeros((Np, L), np.int32)
    mask = np.zeros((Np, L), bool)
    for i in range(Np):
        start = int(rng.integers(0, F - L + 1))
        for l in range(L):
            f = start + l
            R, t = np.asarray(cfw.R[f]), np.asarray(cfw.t[f])
            xc = R @ pts[i] + t
            if xc[2] < 0.5:
                continue
            ph = K @ xc
            obs[i, l] = ph[:2] / ph[2] + rng.normal(scale=0.3, size=2)
            fidx[i, l] = f
            mask[i, l] = True
    return sparse.BAProblemSparse(
        points=jnp.asarray(pts + rng.normal(scale=noise, size=pts.shape)),
        cfw_R=jnp.asarray(np.asarray(cfw.R)),
        cfw_t=jnp.asarray(np.asarray(cfw.t)),
        K=jnp.broadcast_to(jnp.asarray(K), (F, 3, 3)),
        obs=jnp.asarray(obs), frame_idx=jnp.asarray(fidx),
        obs_mask=jnp.asarray(mask), f0=jnp.asarray(1.0))


def test_banded_schur_matches_full(rng):
    """The banded Gram reduction (points sorted by first observed frame,
    per-chunk W-frame windows) must reproduce the full-F solve."""
    ps = _local_track_problem(rng)
    bs = sparse.compute_blocks(ps)
    plan = sparse.plan_bands(ps.frame_idx, ps.obs_mask,
                             point_chunk=64, n_frames=ps.n_frames)
    assert plan is not None and plan.band_width < ps.n_frames, plan
    dX_f, du_f, ok_f = sparse.solve_corrections_schur_sparse(
        ps, bs, 1e-4, point_chunk=64)
    dX_b, du_b, ok_b = sparse.solve_corrections_schur_banded(
        ps, bs, 1e-4, plan)
    assert bool(ok_f) and bool(ok_b)
    np.testing.assert_allclose(np.asarray(du_b), np.asarray(du_f),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dX_b), np.asarray(dX_f),
                               rtol=1e-7, atol=1e-10)


def test_plan_bands_shrinks_degenerate_chunks(rng):
    """Regression (VERDICT r4 item 3): with point_chunk ~ Np a single chunk
    spans nearly all frames (W ~ F) and the banded gathers cost MORE than
    the full-width strips they replace (measured 4-5x slower at W/F=0.93,
    analysis/profile_mvf_final_ba.py). The planner must shrink chunks until
    the band is genuinely narrow — or refuse so the caller uses the
    full-width solver — never emit a W ~ F plan."""
    ps = _local_track_problem(rng, Np=640, F=140, L=8)
    plan = sparse.plan_bands(ps.frame_idx, ps.obs_mask,
                             point_chunk=640, n_frames=ps.n_frames)
    assert plan is not None        # local tracks: shrinking must succeed
    assert plan.band_width < 0.8 * ps.n_frames, plan
    assert plan.point_chunk < 640  # it got there by shrinking the chunks
    # and the shrunk plan still reproduces the full-width solve
    bs = sparse.compute_blocks(ps)
    dX_f, du_f, ok_f = sparse.solve_corrections_schur_sparse(
        ps, bs, 1e-4, point_chunk=256)
    dX_b, du_b, ok_b = sparse.solve_corrections_schur_banded(
        ps, bs, 1e-4, plan)
    assert bool(ok_f) and bool(ok_b)
    np.testing.assert_allclose(np.asarray(du_b), np.asarray(du_f),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dX_b), np.asarray(dX_f),
                               rtol=1e-7, atol=1e-10)


def test_banded_overflow_group_matches_full(rng):
    """A minority of wrap-around tracks (observing both frame 0 and frame
    F-1, like loop closures) goes to the overflow tail processed by
    full-width chunks — the combined solve must still match the full
    solver exactly."""
    ps = _local_track_problem(rng, Np=256, F=24, L=6)
    fidx = np.asarray(ps.frame_idx).copy()
    mask = np.asarray(ps.obs_mask).copy()
    obs = np.asarray(ps.obs).copy()
    K = np.asarray(ps.K[0])
    # every 4th point additionally observed in the LAST frame (wide span)
    for i in range(0, 256, 4):
        R, t = np.asarray(ps.cfw_R[23]), np.asarray(ps.cfw_t[23])
        xc = R @ np.asarray(ps.points[i]) + t
        if xc[2] < 0.5:
            continue
        ph = K @ xc
        fidx[i, -1] = 23
        obs[i, -1] = ph[:2] / ph[2]
        mask[i, -1] = True
        fidx[i, 0] = 0
    ps = ps._replace(frame_idx=jnp.asarray(fidx), obs=jnp.asarray(obs),
                     obs_mask=jnp.asarray(mask))
    plan = sparse.plan_bands(fidx, mask, point_chunk=32, n_frames=24)
    assert plan is not None and plan.band_width < 24, plan
    assert plan.n_banded_chunks >= 1
    assert plan.ext_idx.shape[0] > plan.n_banded_chunks * plan.point_chunk, \
        "expected a nonempty overflow group"
    bs = sparse.compute_blocks(ps)
    dX_f, du_f, ok_f = sparse.solve_corrections_schur_sparse(
        ps, bs, 1e-4, point_chunk=32)
    dX_b, du_b, ok_b = sparse.solve_corrections_schur_banded(
        ps, bs, 1e-4, plan)
    assert bool(ok_f) and bool(ok_b)
    np.testing.assert_allclose(np.asarray(du_b), np.asarray(du_f),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dX_b), np.asarray(dX_f),
                               rtol=1e-7, atol=1e-10)


def test_banded_plan_refuses_nonlocal_problems(rng):
    """When most tracks span the whole frame range there is no band to
    exploit — plan_bands must refuse so the driver keeps the full solver."""
    ps = _local_track_problem(rng, Np=64, F=24, L=6)
    fidx = np.asarray(ps.frame_idx).copy()
    mask = np.asarray(ps.obs_mask).copy()
    fidx[:, -1] = 23     # every point observes the last frame too
    fidx[:, 0] = 0
    mask[:, -1] = True
    mask[:, 0] = True
    plan = sparse.plan_bands(fidx, mask, point_chunk=16, n_frames=24)
    assert plan is None


def test_sparse_lm_driver_banded_matches_unbanded(rng):
    """SparseBundleAdjustment(band=True) takes the same LM path as
    band=False on a frame-local problem."""
    from surikatoko_tpu.models.ba import SparseBundleAdjustment, TermCriteria
    ps = _local_track_problem(rng, noise=0.05)
    term = TermCriteria(allowed_reproj_err_rel_change=1e-12, max_iters=10)
    ba_f = SparseBundleAdjustment(point_chunk=64, band=False)
    ok_f, p_f = ba_f.compute(ps, term)
    ba_b = SparseBundleAdjustment(point_chunk=64, band=True)
    ba_b._plan_band(ps)                 # plan runs; check it chose banding
    assert ba_b._band_sig is not None, "banding should be active here"
    ok_b, p_b = ba_b.compute(ps, term)
    assert (ok_f, ba_f.stop_reason, ba_f.iterations) == \
           (ok_b, ba_b.stop_reason, ba_b.iterations)
    np.testing.assert_allclose(float(sparse.reproj_error(p_b)),
                               float(sparse.reproj_error(p_f)), rtol=1e-8)
