"""Jacobian validation: autodiff vs finite differences — the reference's
debug-only checks (davison-mono-slam.cpp:654-667, :3099-3112) as permanent
tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import make_params
from surikatoko_tpu.models.monoslam import measure, predict
from surikatoko_tpu.models.monoslam.state import CAM_STATE_COMPS as N


@pytest.fixture
def params():
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    dist = camera.MikhailDistortion(jnp.float64(0.06), jnp.float64(0.01))
    return make_params(cam, dist, dt=1.0)


def rand_state(rng, n_lm=4):
    x = np.zeros(N + 6 * n_lm)
    x[0:3] = rng.normal(scale=0.1, size=3)
    q = rng.normal(size=4)
    x[3:7] = q / np.linalg.norm(q)
    x[7:13] = rng.normal(scale=0.05, size=6)
    for k in range(n_lm):
        off = N + 6 * k
        x[off:off + 3] = rng.normal(scale=0.1, size=3)
        x[off + 3] = rng.normal(scale=0.3)
        x[off + 4] = rng.normal(scale=0.2)
        x[off + 5] = abs(rng.normal(scale=0.3)) + 0.05
    return jnp.asarray(x)


def finite_diff(f, x, eps=1e-7):
    x = np.asarray(x, float)
    y0 = np.asarray(f(jnp.asarray(x)))
    J = np.zeros(y0.shape + x.shape)
    for i in range(x.size):
        xp = x.copy()
        xp[i] += eps
        J[..., i] = (np.asarray(f(jnp.asarray(xp))) - y0) / eps
    return J


def test_measurement_jacobian_vs_finite_diff(params, rng):
    x = rand_state(rng)
    h, Hcam, Hlm = measure.measurement_jacobians(params, x)
    for k in range(4):
        lm = x[N + 6 * k: N + 6 * k + 6]
        Jc = finite_diff(lambda c: measure.project_landmark(params, c, lm), x[:N])
        Jl = finite_diff(lambda l: measure.project_landmark(params, x[:N], l), lm)
        np.testing.assert_allclose(Hcam[k], Jc, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(Hlm[k], Jl, rtol=1e-4, atol=1e-4)


def test_transition_jacobians_vs_finite_diff(params, rng):
    x = rand_state(rng, n_lm=0)
    F, G = predict.camera_transition_jacobians(params, x[:N])
    Ffd = finite_diff(lambda c: predict.predict_camera(params, c), x[:N])
    np.testing.assert_allclose(F, Ffd, atol=1e-6)
    zero = jnp.zeros(6, x.dtype)
    Gfd = finite_diff(lambda n: predict.predict_camera(params, x[:N], n), zero)
    np.testing.assert_allclose(G, Gfd, atol=1e-6)


def test_projection_at_infinity_is_finite(params):
    """rho=0 (point at infinity) must project and differentiate cleanly —
    the scaled-by-inverse-depth formulation exists exactly for this."""
    cam13 = jnp.asarray([0.0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    lm = jnp.asarray([0.0, 0, 0, 0.1, 0.05, 0.0])  # rho = 0
    h = measure.project_landmark(params, cam13, lm)
    assert np.all(np.isfinite(np.asarray(h)))
    J = jax.jacfwd(lambda l: measure.project_landmark(params, cam13, l))(lm)
    assert np.all(np.isfinite(np.asarray(J)))


def test_landmark_world_pos_roundtrip(params, rng):
    """spherical landmark at known world point projects back to it."""
    from surikatoko_tpu.geom import camera as cm
    p_w = jnp.asarray([0.3, -0.2, 1.5])
    first_cam = jnp.zeros(3)
    d = p_w - first_cam
    theta, phi = cm.azim_elev_from_dir(d)
    rho = 1.0 / jnp.linalg.norm(d)
    lm = jnp.concatenate([first_cam, jnp.stack([theta, phi, rho])])
    np.testing.assert_allclose(measure.landmark_world_pos(lm), p_w, atol=1e-12)
