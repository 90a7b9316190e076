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


def test_analytic_jacobians_match_autodiff(params, rng):
    """The hand-derived batched chain rule (measure.batched_jacobians) against
    jax.jacfwd — the analytic-fast-path twin of the reference's hand-written
    Deriv_hd_by_cam_state_and_sal_pnt vs finite-diff debug check."""
    for repres in (1, 2):
        cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                     (0.01, 0.01))
        for dist in (None, camera.MikhailDistortion(jnp.float64(0.06),
                                                    jnp.float64(0.01))):
            p = make_params(cam, dist, dt=1.0, sal_pnt_repres=repres)
            x = rand_state(rng)
            if repres == 1:  # XYZ slots: position + zero padding
                xs = np.asarray(x).copy()
                for k in range(4):
                    off = N + 6 * k
                    xs[off:off + 3] = np.asarray(
                        measure.landmark_world_pos(x[off:off + 6]))
                    xs[off + 3:off + 6] = 0.0
                x = jnp.asarray(xs)
            h1, Hc1, Hl1 = measure.measurement_jacobians(p, x)
            h2, Hc2, Hl2 = measure.measurement_jacobians_ad(p, x)
            np.testing.assert_allclose(h1, h2, rtol=0, atol=1e-12)
            np.testing.assert_allclose(Hc1, Hc2, rtol=1e-9, atol=1e-9)
            np.testing.assert_allclose(Hl1, Hl2, rtol=1e-9, atol=1e-9)


def test_analytic_transition_jacobians_match_autodiff(params, rng):
    for scale in (1.0, 1e-3, 1e-6, 0.0):
        c = np.zeros(13)
        c[0:3] = rng.normal(size=3)
        q = rng.normal(size=4)
        c[3:7] = q / np.linalg.norm(q)
        c[7:10] = rng.normal(size=3)
        c[10:13] = rng.normal(size=3) * scale
        c = jnp.asarray(c)
        F1, G1 = predict.camera_transition_jacobians(params, c)
        F2, G2 = predict.camera_transition_jacobians_ad(params, c)
        np.testing.assert_allclose(F1, F2, atol=1e-12)
        np.testing.assert_allclose(G1, G2, atol=1e-12)
