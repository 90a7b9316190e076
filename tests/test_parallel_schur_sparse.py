"""Distributed sparse Schur parity vs the single-device sparse solver."""

import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.models.ba import sparse
from surikatoko_tpu.parallel import landmark_mesh
from surikatoko_tpu.parallel.sharded_schur import make_sharded_sparse_schur_solver

from test_ba import circle_grid_problem


def _padded_sparse(mult=8):
    pd, _, _ = circle_grid_problem(noise_pnt=0.05, noise_rot=0.02)
    ps = sparse.from_dense(pd)
    Np = ps.n_points
    pad = (-Np) % mult
    if pad:
        ps = ps._replace(
            points=jnp.concatenate([ps.points, jnp.ones((pad, 3), ps.points.dtype)]),
            obs=jnp.concatenate([ps.obs, jnp.zeros((pad,) + ps.obs.shape[1:], ps.obs.dtype)]),
            frame_idx=jnp.concatenate([ps.frame_idx, jnp.zeros((pad, ps.track_len), jnp.int32)]),
            obs_mask=jnp.concatenate([ps.obs_mask, jnp.zeros((pad, ps.track_len), bool)]),
        )
    return ps


def test_sharded_sparse_schur_matches_single_device():
    ps = _padded_sparse()
    blocks = sparse.compute_blocks(ps)
    ref_dX, ref_du, ref_ok = sparse.solve_corrections_schur_sparse(
        ps, blocks, 1e-4, point_chunk=16)
    assert bool(ref_ok)
    for n in (2, 8):
        solver = make_sharded_sparse_schur_solver(
            ps.n_points, ps.n_frames, ps.track_len, landmark_mesh(n),
            point_chunk=8)
        dX, du, ok = solver(ps, blocks, 1e-4)
        assert bool(ok)
        np.testing.assert_allclose(du, ref_du, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(dX, ref_dX, rtol=1e-8, atol=1e-12)


def test_sharded_banded_schur_matches_single_device():
    """Per-shard banded reduction (plan_bands_sharded) must match the
    single-device full solver on a frame-local problem."""
    from test_ba_sparse import _local_track_problem

    rng = np.random.default_rng(3)
    ps = _local_track_problem(rng, Np=512, F=48, L=8)
    blocks = sparse.compute_blocks(ps)
    ref_dX, ref_du, ref_ok = sparse.solve_corrections_schur_sparse(
        ps, blocks, 1e-4, point_chunk=64)
    assert bool(ref_ok)
    for n in (2, 8):
        plan = sparse.plan_bands_sharded(
            ps.frame_idx, ps.obs_mask, n, 32, ps.n_frames)
        assert plan is not None and plan.band_width < ps.n_frames
        solver = make_sharded_sparse_schur_solver(
            ps.n_points, ps.n_frames, ps.track_len, landmark_mesh(n),
            point_chunk=32, band_plan=plan)
        dX, du, ok = solver(ps, blocks, 1e-4)
        assert bool(ok)
        np.testing.assert_allclose(du, ref_du, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(dX, ref_dX, rtol=1e-8, atol=1e-12)


def test_sharded_lm_driver_uses_banding_on_local_problem():
    """SparseBundleAdjustment(mesh=..., band=True) plans per-shard banding
    and still reproduces the unbanded distributed result."""
    from test_ba_sparse import _local_track_problem
    from surikatoko_tpu.models.ba import SparseBundleAdjustment, TermCriteria

    rng = np.random.default_rng(4)
    ps = _local_track_problem(rng, Np=512, F=48, L=8, noise=0.05)
    term = TermCriteria(allowed_reproj_err_rel_change=1e-12, max_iters=8)
    ba_u = SparseBundleAdjustment(point_chunk=32, mesh=landmark_mesh(8),
                                  band=False)
    ok_u, p_u = ba_u.compute(ps, term)
    ba_b = SparseBundleAdjustment(point_chunk=32, mesh=landmark_mesh(8),
                                  band=True)
    ok_b, p_b = ba_b.compute(ps, term)
    assert getattr(ba_b, "_mesh_band_plan", None) is not None, \
        "banding should be active here"
    assert (ok_u, ba_u.stop_reason, ba_u.iterations) == \
           (ok_b, ba_b.stop_reason, ba_b.iterations)
    np.testing.assert_allclose(float(sparse.reproj_error(p_b)),
                               float(sparse.reproj_error(p_u)), rtol=1e-8)
