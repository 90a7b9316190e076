"""Sharded-vs-single-device EKF parity on an 8-device virtual CPU mesh — the
distributed analog of the reference's Schur-vs-naive numeric identity check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import make_params
from surikatoko_tpu.models.monoslam import measure, update
from surikatoko_tpu.models.monoslam.state import CAM_STATE_COMPS as N
from surikatoko_tpu.parallel import landmark_mesh
from surikatoko_tpu.parallel.sharded_ekf import make_sharded_stacked_update

K = 16
D = N + 6 * K


@pytest.fixture
def params():
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    dist = camera.MikhailDistortion(jnp.float64(0.06), jnp.float64(0.01))
    return make_params(cam, dist, dt=1.0)


def rand_problem(rng):
    x = np.zeros(D)
    x[0:3] = rng.normal(scale=0.1, size=3)
    q = rng.normal(size=4)
    x[3:7] = q / np.linalg.norm(q)
    x[7:13] = rng.normal(scale=0.05, size=6)
    for k in range(K):
        off = N + 6 * k
        x[off:off + 3] = rng.normal(scale=0.1, size=3)
        x[off + 3] = rng.normal(scale=0.3)
        x[off + 4] = rng.normal(scale=0.2)
        x[off + 5] = abs(rng.normal(scale=0.3)) + 0.05
    A = rng.normal(size=(D, D)) * 0.01
    P = A @ A.T
    return jnp.asarray(x), jnp.asarray(P)


def test_sharded_update_matches_single_device(params, rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    x, P = rand_problem(rng)
    obs_mask = jnp.asarray(rng.uniform(size=K) < 0.8)
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=1.0, size=(K, 2)))

    x1, P1, r1 = update.stacked_update(params, x, P, obs, obs_mask)

    mesh = landmark_mesh(8)
    sharded = make_sharded_stacked_update(params, K, mesh)
    x2, P2, r2 = sharded(x, P, obs, obs_mask)

    np.testing.assert_allclose(x2, x1, atol=1e-10)
    np.testing.assert_allclose(P2, P1, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r2).reshape(K, 2),
                               np.asarray(r1), atol=1e-12)


def test_sharded_update_mesh_sizes(params, rng):
    """Same numbers on 2, 4, 8 devices."""
    x, P = rand_problem(rng)
    obs_mask = jnp.ones(K, bool)
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=0.5, size=(K, 2)))
    ref = update.stacked_update(params, x, P, obs, obs_mask)
    for n in (2, 4, 8):
        sharded = make_sharded_stacked_update(params, K, landmark_mesh(n))
        x2, P2, _ = sharded(x, P, obs, obs_mask)
        np.testing.assert_allclose(x2, ref[0], atol=1e-10)
        np.testing.assert_allclose(P2, ref[1], atol=1e-10)
