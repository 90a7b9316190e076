"""XYZ salient-point representation (reference SAL_PNT_REPRES=1 compile-time
variant, davison-mono-slam.h:39): padded 6-wide slots sharing every kernel
with the spherical representation, dispatched by the static
params.sal_pnt_repres switch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import camera
from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.models.monoslam import make_params, init_state
from surikatoko_tpu.models.monoslam import landmarks, measure
from surikatoko_tpu.models.monoslam.state import REPRES_SPHERICAL, REPRES_XYZ
from surikatoko_tpu.world.device_runner import (
    build_oscillating_scenario, init_with_gt_landmarks, make_scan_runner)


def _params(repres, dtype=jnp.float64):
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01),
                                 dtype=dtype)
    return make_params(cam, None, dt=1.0,
                       process_noise_lin_veloc_std=0.075,
                       process_noise_ang_veloc_std=0.01,
                       sal_pnt_repres=repres, dtype=dtype)


def test_slot_conversion_roundtrip(rng):
    for _ in range(5):
        first_cam = jnp.asarray(rng.normal(size=3))
        pos = jnp.asarray(first_cam + rng.normal(size=3) + jnp.asarray([0, 0, 3.0]))
        xyz_slot = jnp.concatenate([pos, jnp.zeros(3)])
        sph = measure.xyz_to_spherical_slot(xyz_slot, first_cam)
        np.testing.assert_allclose(
            measure.landmark_world_pos(sph), pos, atol=1e-12)
        back = measure.spherical_to_xyz_slot(sph)
        np.testing.assert_allclose(back[:3], pos, atol=1e-12)


def test_projection_parity_between_representations(rng):
    """The same physical point projects to the same pixel under both
    representations (XYZ slot vs spherical slot anchored anywhere)."""
    p_xyz = _params(REPRES_XYZ)
    p_sph = _params(REPRES_SPHERICAL)
    for _ in range(5):
        cam13 = jnp.concatenate([
            jnp.asarray(rng.normal(scale=0.3, size=3)),
            jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(6)])
        pos = jnp.asarray(rng.normal(size=3) + jnp.asarray([0, 0, 4.0]))
        anchor = jnp.asarray(rng.normal(scale=0.2, size=3))
        xyz_slot = jnp.concatenate([pos, jnp.zeros(3)])
        sph_slot = measure.xyz_to_spherical_slot(xyz_slot, anchor)
        pix_xyz = measure.project_landmark(p_xyz, cam13, xyz_slot)
        pix_sph = measure.project_landmark(p_sph, cam13, sph_slot)
        np.testing.assert_allclose(pix_xyz, pix_sph, atol=1e-9)


def test_new_landmark_init_places_point_on_ray():
    params = _params(REPRES_XYZ)
    cam_pq = jnp.concatenate([jnp.asarray([0.1, -0.2, 0.3]),
                              jnp.asarray([1.0, 0, 0, 0])])
    pix = jnp.asarray([170.0, 110.0])
    inv_dist = jnp.asarray(0.25)
    slot = landmarks.new_landmark_state(params, cam_pq, pix, inv_dist)
    # padded comps zero; point at distance 1/rho from the camera
    np.testing.assert_allclose(slot[3:], 0.0)
    d = float(jnp.linalg.norm(slot[:3] - cam_pq[:3]))
    np.testing.assert_allclose(d, 4.0, rtol=1e-10)
    # reprojects exactly to the originating pixel
    cam13 = jnp.concatenate([cam_pq, jnp.zeros(6)])
    np.testing.assert_allclose(
        measure.project_landmark(params, cam13, slot), pix, atol=1e-8)


def test_new_landmark_covariance_spreads_depth_along_ray():
    """sigma_rho propagates into XYZ position uncertainty along the viewing
    ray (reference GetNewSalientPointCovar XYZ branch :2457)."""
    params = _params(REPRES_XYZ)
    D = 13 + 6 * 4
    x = jnp.zeros(D).at[3].set(1.0)
    P = jnp.zeros((D, D))
    pix = jnp.asarray([160.0, 120.0])  # principal point -> ray = +z
    y, auto, cross = landmarks.new_landmark_covariance(
        params, x, P, pix, jnp.asarray(0.5), jnp.asarray(0.1))
    # depth prior dominates the z variance: dpos/drho = -m/rho^2, |.| = 4
    np.testing.assert_allclose(float(auto[2, 2]), 0.1**2 * 16.0, rtol=1e-6)
    # padded comps carry no uncertainty
    np.testing.assert_allclose(np.asarray(auto[3:, :]), 0.0, atol=1e-12)


def test_xyz_closed_loop_tracks():
    """Full scenario03-style closed loop with the XYZ representation."""
    dtype = jnp.float64
    sc = build_oscillating_scenario(capacity=32, dtype=dtype)
    params = _params(REPRES_XYZ, dtype)
    state = init_state(32, dtype=dtype)
    state = init_with_gt_landmarks(params, sc, state, jax.random.PRNGKey(0))
    assert int(jnp.sum(state.lm_active)) >= 16
    # padded comps stay zero with zero covariance
    lms = np.asarray(state.x[13:]).reshape(-1, 6)
    np.testing.assert_allclose(lms[:, 3:], 0.0, atol=1e-12)

    run = make_scan_runner(params, update_impl=1)
    frames = jnp.arange(1, 61)
    state, errs, _, cam_pos = run(state, sc, frames, jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(errs)))
    assert float(jnp.mean(errs[10:])) < 3.0
    gt_pos = np.stack([np.asarray(SE3(sc.gt_cfw_R[f], sc.gt_cfw_t[f]).inv().t)
                       for f in range(1, 61)])
    err = np.linalg.norm(np.asarray(cam_pos) - gt_pos, axis=1)
    assert err.max() < 0.5, err.max()


@pytest.mark.parametrize("impl", [2, 4])
def test_xyz_other_update_impls_track(impl):
    """XYZ representation through the sequential (2) and 1-pt RANSAC (4)
    update strategies — the measurement-model dispatch is shared, but the
    scan/vmap paths exercise different slicing."""
    from surikatoko_tpu.models.monoslam import update as update_mod

    dtype = jnp.float64
    sc = build_oscillating_scenario(capacity=16, dtype=dtype)
    params = _params(REPRES_XYZ, dtype)
    state = init_state(16, dtype=dtype)
    state = init_with_gt_landmarks(params, sc, state, jax.random.PRNGKey(0))

    from surikatoko_tpu.models.monoslam import predict as predict_mod
    from surikatoko_tpu.world.device_runner import _project_gt
    errs = []
    for f in range(1, 11):
        obs, vis = _project_gt(params, sc, jnp.asarray(f), jax.random.PRNGKey(f))
        mask = jnp.logical_and(vis, state.lm_active)
        if impl == 2:
            x, P, resid = update_mod.one_obs_update(
                params, state.x, state.P, obs, mask)
        else:
            x, P, resid, _, _ = update_mod.one_point_ransac_update(
                params, state.x, state.P, obs, mask)
        assert bool(jnp.all(jnp.isfinite(x))) and bool(jnp.all(jnp.isfinite(P)))
        errs.append(float(jnp.sum(jnp.linalg.norm(resid, axis=-1))
                          / jnp.maximum(jnp.sum(mask), 1)))
        state = predict_mod.predict(params, state._replace(x=x, P=P))
    # residuals settle to the detection-noise level once velocity is learned
    assert np.mean(errs[3:]) < 3.0, errs
