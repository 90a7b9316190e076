"""Sharded FUSED frame step (update + health + predict as one congruence)
vs the single-device fused step, on the virtual CPU mesh — the whole
closed-loop frame body distributed, not just the update (VERDICT r1 item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import make_params, measure
from surikatoko_tpu.models.monoslam.fused_step import fused_update_health_predict
from surikatoko_tpu.parallel import landmark_mesh
from surikatoko_tpu.parallel.sharded_ekf import make_sharded_fused_step

from tests.test_parallel_ekf import K, rand_problem


@pytest.fixture
def params():
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    dist = camera.MikhailDistortion(jnp.float64(0.06), jnp.float64(0.01))
    return make_params(cam, dist, dt=1.0,
                       process_noise_lin_veloc_std=0.075,
                       process_noise_ang_veloc_std=0.01)


def test_sharded_fused_step_matches_single(params, rng):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    x, P = rand_problem(rng)
    obs_mask = jnp.asarray(rng.uniform(size=K) < 0.8)
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=1.0, size=(K, 2)))

    x1, P1, r1, xm1 = fused_update_health_predict(params, x, P, obs, obs_mask)

    step = make_sharded_fused_step(params, K, landmark_mesh(8))
    x2, P2, r2, xm2 = step(x, P, obs, obs_mask)

    np.testing.assert_allclose(x2, x1, atol=1e-10)
    np.testing.assert_allclose(P2, P1, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r2).reshape(K, 2),
                               np.asarray(r1), atol=1e-12)
    np.testing.assert_allclose(xm2, xm1, atol=1e-10)
    # Gram construction: exactly symmetric with no repair pass
    np.testing.assert_array_equal(np.asarray(P2), np.asarray(P2).T)


def test_sharded_fused_step_matches_single_with_inflation(rng):
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0, covar_diag_inflation=1e-4)
    x, P = rand_problem(rng)
    obs_mask = jnp.ones(K, bool)
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=0.5, size=(K, 2)))
    ref = fused_update_health_predict(params, x, P, obs, obs_mask)
    step = make_sharded_fused_step(params, K, landmark_mesh(4))
    x2, P2, _, _ = step(x, P, obs, obs_mask)
    np.testing.assert_allclose(x2, ref[0], atol=1e-10)
    np.testing.assert_allclose(P2, ref[1], atol=1e-10)


def test_sharded_fused_step_mesh_sizes(params, rng):
    x, P = rand_problem(rng)
    obs_mask = jnp.ones(K, bool)
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=0.5, size=(K, 2)))
    ref = fused_update_health_predict(params, x, P, obs, obs_mask)
    for n in (2, 4, 8):
        step = make_sharded_fused_step(params, K, landmark_mesh(n))
        x2, P2, _, _ = step(x, P, obs, obs_mask)
        np.testing.assert_allclose(x2, ref[0], atol=1e-10)
        np.testing.assert_allclose(P2, ref[1], atol=1e-10)


def test_sharded_fused_step_scan_compatible(params, rng):
    """The sharded fused step closes over its mesh and runs inside lax.scan —
    the scan-compatible multi-frame form the closed loop uses."""
    x, P = rand_problem(rng)
    obs_mask = jnp.ones(K, bool)
    step = make_sharded_fused_step(params, K, landmark_mesh(8))

    h0 = measure.project_all(params, x)
    obs_seq = jnp.asarray(
        h0[None] + rng.normal(scale=0.5, size=(5, K, 2)))

    def body(carry, obs):
        x, P = carry
        x2, P2, resid, _ = step(x, P, obs, obs_mask)
        return (x2, P2), jnp.sum(resid * resid)

    (xf, Pf), costs = jax.lax.scan(body, (x, P), obs_seq)

    # host-loop reference with the single-device fused step
    xs, Ps = x, P
    for t in range(5):
        xs, Ps, _, _ = fused_update_health_predict(
            params, xs, Ps, obs_seq[t], obs_mask)
    np.testing.assert_allclose(xf, xs, atol=1e-9)
    np.testing.assert_allclose(Pf, Ps, atol=1e-9)
    assert bool(jnp.all(jnp.isfinite(costs)))
