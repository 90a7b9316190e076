"""Distributed Schur solve parity vs the single-device solver (and hence,
transitively, vs the naive dense solve)."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.models.ba import derivs, schur
from surikatoko_tpu.parallel import landmark_mesh
from surikatoko_tpu.parallel.sharded_schur import (
    make_sharded_ba_step, make_sharded_schur_solver)
from surikatoko_tpu.models.ba.problem import reproj_error

from test_ba import circle_grid_problem


def _padded_problem():
    """circle-grid problem with Np padded to a multiple of 8."""
    p, _, _ = circle_grid_problem(noise_pnt=0.05, noise_rot=0.02)
    Np = p.n_points
    pad = (-Np) % 8
    if pad:
        p = p._replace(
            points=jnp.concatenate([p.points, jnp.ones((pad, 3), p.points.dtype)]),
            obs=jnp.concatenate([p.obs, jnp.zeros((pad,) + p.obs.shape[1:], p.obs.dtype)]),
            obs_mask=jnp.concatenate([p.obs_mask, jnp.zeros((pad, p.n_frames), bool)]),
        )
    return p


def test_sharded_schur_matches_single_device():
    p = _padded_problem()
    blocks = derivs.compute_blocks(p)
    ref_dX, ref_du, ref_ok = schur.solve_corrections_schur(blocks, 1e-4)
    assert bool(ref_ok)
    for n in (2, 8):
        mesh = landmark_mesh(n)
        solver = make_sharded_schur_solver(p.n_points, p.n_frames, mesh)
        dX, du, ok = solver(blocks, 1e-4)
        assert bool(ok)
        np.testing.assert_allclose(du, ref_du, rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(dX, ref_dX, rtol=1e-8, atol=1e-12)


def test_sharded_ba_step_decreases_error():
    p = _padded_problem()
    mesh = landmark_mesh(8)
    step = make_sharded_ba_step(p.n_points, p.n_frames, mesh)
    err0 = float(reproj_error(p))
    p1, ok = step(p, 1e-4)
    assert bool(ok)
    assert float(reproj_error(p1)) < err0
