"""Update-strategy correctness: block-sparse masked updates vs naive dense
EKF formulas (the reference's Schur-vs-naive cross-check pattern,
bundle-adj-kanatani.cpp:788), plus landmark add/remove covariance checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import make_params, init_state
from surikatoko_tpu.models.monoslam import landmarks, measure, update
from surikatoko_tpu.models.monoslam.state import CAM_STATE_COMPS as N
from surikatoko_tpu.utils import rand as rand_mod

K = 6
D = N + 6 * K


@pytest.fixture
def params():
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    dist = camera.MikhailDistortion(jnp.float64(0.06), jnp.float64(0.01))
    return make_params(cam, dist, dt=1.0)


@pytest.fixture
def state_xP(rng):
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


def naive_dense_update(params, x, P, obs, obs_mask):
    Hfull = jax.jacfwd(lambda xx: measure.project_all(params, xx))(x)
    h0 = measure.project_all(params, x)
    m = np.asarray(obs_mask).astype(float)[:, None, None]
    H = (np.asarray(Hfull) * m).reshape(2 * K, D)
    R = np.eye(2 * K) * float(params.measurm_noise_var)
    resid = (np.asarray(obs - h0) * m[:, :, 0]).reshape(-1)
    S = H @ np.asarray(P) @ H.T + R
    Kg = np.asarray(P) @ H.T @ np.linalg.inv(S)
    return np.asarray(x) + Kg @ resid, np.asarray(P) - Kg @ S @ Kg.T


def test_stacked_update_matches_naive_dense(params, state_xP, rng):
    x, P = state_xP
    obs_mask = jnp.asarray([True, True, False, True, False, True])
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=1.0, size=(K, 2)))
    x1, P1, _ = update.stacked_update(params, x, P, obs, obs_mask)
    x2, P2 = naive_dense_update(params, x, P, obs, obs_mask)
    np.testing.assert_allclose(x1, x2, atol=1e-12)
    np.testing.assert_allclose(P1, P2, atol=1e-12)


def test_blocked_hp_aht_match_dense(rng):
    """The grouped block-diagonal H application (hp_blocked/aht_blocked, the
    large-K fast path that never materializes the [2K,6K] zero blocks) must
    reproduce the dense products exactly up to reassociation, for every
    group size the auto heuristic can pick."""
    Kb, D = 256, 13 + 6 * 256
    Hcam = jnp.asarray(rng.normal(size=(Kb, 2, 13)))
    Hlm = jnp.asarray(rng.normal(size=(Kb, 2, 6)))
    M = rng.normal(size=(D, D))
    P = jnp.asarray(M @ M.T)
    Hd = update._dense_h(Hcam, Hlm)
    A_ref = Hd @ P
    T_ref = A_ref @ Hd.T
    assert update._h_group(Kb) > 0          # heuristic engages at this size
    for g in (32, 64, 128):
        A = update.hp_blocked(Hcam, Hlm, P, g)
        np.testing.assert_allclose(A, A_ref, rtol=1e-11, atol=1e-8)
        np.testing.assert_allclose(update.aht_blocked(A, Hcam, Hlm, g),
                                   T_ref, rtol=1e-11, atol=1e-8)
    # sizes the grouping can't tile fall back to dense
    assert update._h_group(96) == 0 and update._h_group(360) == 0


def test_masked_slots_are_untouched_in_gain(params, state_xP, rng):
    """A fully-masked update must be a no-op."""
    x, P = state_xP
    obs = jnp.asarray(rng.normal(size=(K, 2)) * 100)
    none = jnp.zeros(K, bool)
    x1, P1, _ = update.stacked_update(params, x, P, obs, none)
    np.testing.assert_allclose(x1, x, atol=1e-12)
    np.testing.assert_allclose(P1, P, atol=1e-12)


def test_sequential_updates_approximate_stacked(params, state_xP, rng):
    """Rank-2 sequential and rank-1 component updates converge to the stacked
    result for small residuals (they relinearize, so only approximately)."""
    x, P = state_xP
    obs_mask = jnp.ones(K, bool)
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=0.1, size=(K, 2)))
    xs, Ps, _ = update.stacked_update(params, x, P, obs, obs_mask)
    xo, Po, _ = update.one_obs_update(params, x, P, obs, obs_mask)
    xc, Pc, _ = update.one_component_update(params, x, P, obs, obs_mask)
    np.testing.assert_allclose(xo, xs, atol=1e-4)
    np.testing.assert_allclose(xc, xs, atol=1e-4)
    np.testing.assert_allclose(Po, Ps, atol=1e-5)
    np.testing.assert_allclose(Pc, Ps, atol=1e-5)


def test_update_reduces_uncertainty(params, state_xP, rng):
    x, P = state_xP
    obs_mask = jnp.ones(K, bool)
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=0.5, size=(K, 2)))
    _, P1, _ = update.stacked_update(params, x, P, obs, obs_mask)
    assert float(jnp.trace(P1)) < float(jnp.trace(P))
    # posterior stays symmetric PSD
    evals = np.linalg.eigvalsh(np.asarray(P1))
    assert evals.min() > -1e-12


def test_ransac_rejects_gross_outlier(params, state_xP, rng):
    """Inject one wildly wrong match: 1-pt RANSAC must exclude it from both
    stages while the plain stacked update is dragged off."""
    x, P = state_xP
    obs_mask = jnp.ones(K, bool)
    h0 = measure.project_all(params, x)
    obs = h0 + jnp.asarray(rng.normal(scale=0.3, size=(K, 2)))
    obs = obs.at[2].add(jnp.asarray([150.0, -120.0]))  # gross mismatch

    xr, Pr, _, low, high = update.one_point_ransac_update(params, x, P, obs, obs_mask)
    assert int(low) + int(high) <= K - 1   # outlier not used
    assert int(low) >= 2

    xs, _, _ = update.stacked_update(params, x, P, obs, obs_mask)
    h_r = measure.project_all(params, xr)
    h_s = measure.project_all(params, xs)
    # RANSAC result stays consistent with the inlier observations
    inl = np.arange(K) != 2
    err_r = np.linalg.norm(np.asarray(obs - h_r)[inl])
    err_s = np.linalg.norm(np.asarray(obs - h_s)[inl])
    assert err_r < err_s


def test_new_landmark_covariance_vs_monte_carlo(params, key, rng):
    """A.67-A.79 first-order covariance of a new landmark agrees with MC
    propagation through the init function (reference validates the same way
    via PropagateUncertaintyUsingSimulation)."""
    state = init_state(4, cam_pos_std=0.01, cam_orient_q_comp_std=0.005,
                       dtype=jnp.float64)
    x, P = state.x, state.P
    pix = jnp.asarray([140.0, 100.0])
    rho0 = params.sal_pnt_init_inv_dist
    rho_std = jnp.asarray(0.0)  # isolate cam+pixel uncertainty
    y, auto, cross = landmarks.new_landmark_covariance(params, x, P, pix, rho0, rho_std)

    # MC: sample cam(7) ~ P77 and pixel ~ R, push through init
    cov_in = np.zeros((9, 9))
    cov_in[:7, :7] = np.asarray(P[:7, :7])
    cov_in[7:, 7:] = np.eye(2) * float(params.measurm_noise_var)
    mean_in = jnp.concatenate([x[:7], pix])

    def g(v):
        return landmarks.new_landmark_state(params, v[:7], v[7:9], rho0)

    _, cov_mc = rand_mod.propagate_uncertainty_mc(
        key, g, mean_in, jnp.asarray(cov_in), n=200_000)
    np.testing.assert_allclose(auto, cov_mc, rtol=0.05, atol=2e-6)


def test_add_remove_landmarks(params):
    state = init_state(4, dtype=jnp.float64)
    pix = jnp.asarray([[100.0, 100.0], [200.0, 150.0], [0.0, 0.0]])
    mask = jnp.asarray([True, True, False])
    state2, slots = landmarks.add_landmarks(params, state, pix, mask)
    assert list(np.asarray(slots)) == [0, 1, -1]
    assert np.asarray(state2.lm_active).tolist() == [True, True, False, False]
    # slot state is the inverse-depth init of its pixel
    y0 = landmarks.new_landmark_state(params, state.x[:7], pix[0],
                                      params.sal_pnt_init_inv_dist)
    np.testing.assert_allclose(state2.x[N:N + 6], y0, atol=1e-12)
    # remove slot 0: rows zeroed, slot freed, slot 1 untouched
    state3 = landmarks.remove_landmarks(state2, jnp.asarray([True, False, False, False]))
    assert np.asarray(state3.lm_active).tolist() == [False, True, False, False]
    np.testing.assert_allclose(state3.x[N:N + 6], 0.0)
    np.testing.assert_allclose(state3.P[N:N + 6, :], 0.0)
    np.testing.assert_allclose(state3.x[N + 6:N + 12], state2.x[N + 6:N + 12])
    # freed slot is reusable and bumps generation
    state4, slots4 = landmarks.add_landmarks(
        params, state3, pix[:1], jnp.asarray([True]))
    assert int(slots4[0]) == 0
    assert int(state4.lm_generation[0]) == 2


def test_fused_normalize_and_predict_matches_sequential(params, state_xP):
    """predict.normalize_and_predict (one camera-stripe pass, used by the
    on-device loop) == health.normalize_quat_and_covar then predict.predict."""
    from surikatoko_tpu.models.monoslam import health, init_state
    from surikatoko_tpu.models.monoslam import predict as predict_mod

    x, P = state_xP
    # de-normalize the quaternion slightly so the renorm actually acts
    x = x.at[3:7].multiply(1.01)
    st = init_state(K)
    st = st._replace(x=x, P=P,
                     lm_active=jnp.ones((K,), bool))

    xs, Ps = health.normalize_quat_and_covar(x, P)
    seq = predict_mod.predict(params, st._replace(x=xs, P=Ps))
    fused = predict_mod.normalize_and_predict(params, st)

    np.testing.assert_allclose(fused.x, seq.x, atol=1e-12)
    np.testing.assert_allclose(fused.P, seq.P, atol=1e-12)
