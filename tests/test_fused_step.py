"""Fused frame step (update+clamp+renorm+predict as one congruence) must be
numerically identical to the sequential pipeline it replaces — the same
"fused vs modular" parity discipline as the reference's Schur-vs-naive debug
checks (bundle-adj-kanatani.cpp:788-797), applied to fused_step.py."""

import jax
import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import (
    fused_step, health, make_params, init_state, predict, update)
from surikatoko_tpu.world.device_runner import (
    build_oscillating_scenario, init_with_gt_landmarks, _project_gt)


def _setup(capacity=16, dtype=jnp.float64, repres=2):
    sc = build_oscillating_scenario(capacity=capacity, dtype=dtype)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01), dtype=dtype)
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01,
                         sal_pnt_repres=repres, dtype=dtype)
    state = init_state(capacity, dtype=dtype)
    state = init_with_gt_landmarks(params, sc, state, jax.random.PRNGKey(0))
    obs, vis = _project_gt(params, sc, jnp.asarray(1), jax.random.PRNGKey(1))
    obs_mask = jnp.logical_and(vis, state.lm_active)
    return params, state, obs, obs_mask


def _sequential(params, state, obs, obs_mask):
    x, P, resid = update.stacked_update(params, state.x, state.P, obs, obs_mask)
    P = health.ensure_nonneg_variance(P)
    if params.sal_pnt_repres != 1:
        x, _ = health.substitute_negative_inv_rho(
            x, params.sal_pnt_negative_inv_rho_substitute, state.capacity)
    st = predict.normalize_and_predict(params, state._replace(x=x, P=P))
    return st.x, st.P, resid, x


def test_fused_matches_sequential():
    params, state, obs, obs_mask = _setup()
    xs, Ps, rs, xus = _sequential(params, state, obs, obs_mask)
    xf, Pf, rf, xuf = fused_step.fused_update_health_predict(
        params, state.x, state.P, obs, obs_mask)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rs), atol=1e-12)
    np.testing.assert_allclose(np.asarray(xuf), np.asarray(xus), atol=1e-12)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xs), atol=1e-11)
    np.testing.assert_allclose(np.asarray(Pf), np.asarray(Ps),
                               rtol=1e-9, atol=1e-12)


def test_fused_matches_sequential_xyz():
    params, state, obs, obs_mask = _setup(repres=1)
    xs, Ps, _, _ = _sequential(params, state, obs, obs_mask)
    xf, Pf, _, _ = fused_step.fused_update_health_predict(
        params, state.x, state.P, obs, obs_mask)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xs), atol=1e-11)
    np.testing.assert_allclose(np.asarray(Pf), np.asarray(Ps),
                               rtol=1e-9, atol=1e-12)


def test_fused_keep_mask_parity():
    """Inject negative variances so ensure_nonneg_variance actually fires and
    the fused keep-mask congruence must zero the same rows/cols."""
    params, state, obs, obs_mask = _setup()
    D = state.x.shape[0]
    P = state.P
    for idx in (2, 20, D - 1):  # a camera var and two landmark vars
        P = P.at[idx, idx].set(-1e-6)
    state = state._replace(P=P)

    xs, Ps, _, _ = _sequential(params, state, obs, obs_mask)
    xf, Pf, _, _ = fused_step.fused_update_health_predict(
        params, state.x, state.P, obs, obs_mask)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xs), atol=1e-11)
    np.testing.assert_allclose(np.asarray(Pf), np.asarray(Ps),
                               rtol=1e-9, atol=1e-12)


def test_fused_negative_rho_substitution_parity():
    params, state, obs, obs_mask = _setup()
    # force one landmark's inverse depth negative
    from surikatoko_tpu.models.monoslam.state import CAM_STATE_COMPS
    x = state.x.at[CAM_STATE_COMPS + 5].set(-0.05)
    state = state._replace(x=x)
    xs, Ps, _, xus = _sequential(params, state, obs, obs_mask)
    xf, Pf, _, xuf = fused_step.fused_update_health_predict(
        params, state.x, state.P, obs, obs_mask)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xs), atol=1e-11)


def test_fused_precomputed_path_identical():
    """The precomputed (h, A_un, T_un) entry point (used by the imageseq loop,
    which shares these with the NCC search-ellipse prediction) must produce
    bitwise-identical results to the self-computing path: masking is an exact
    0/1 row/col scaling."""
    from surikatoko_tpu.models.monoslam import measure
    from surikatoko_tpu.models.monoslam.update import _dense_h

    params, state, obs, obs_mask = _setup()
    # drop some observations so masking actually differs from identity
    obs_mask = obs_mask.at[3].set(False).at[7].set(False)

    h, Hcam, Hlm = measure.measurement_jacobians(params, state.x)
    H_un = _dense_h(Hcam, Hlm)
    A_un = H_un @ state.P
    T_un = A_un @ H_un.T

    x1, P1, r1, xu1 = fused_step.fused_update_health_predict(
        params, state.x, state.P, obs, obs_mask)
    x2, P2, r2, xu2 = fused_step.fused_update_health_predict(
        params, state.x, state.P, obs, obs_mask,
        precomputed=(h, A_un, T_un))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-13)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2),
                               rtol=1e-12, atol=1e-14)


def test_fused_symmetry_exact():
    """The fused P+ must be exactly symmetric by construction (no repair
    pass), like the Gram-form downdate it extends."""
    params, state, obs, obs_mask = _setup(dtype=jnp.float32)
    _, Pf, _, _ = fused_step.fused_update_health_predict(
        params, state.x, state.P, obs, obs_mask)
    Pf = np.asarray(Pf)
    np.testing.assert_array_equal(Pf, Pf.T)
