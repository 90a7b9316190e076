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
