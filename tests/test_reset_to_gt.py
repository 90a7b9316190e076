"""Full reset-to-GT recovery ('u' hotkey) with BOTH covariance reinit
strategies (reference SetEstimStateAndCovarToGroundTruth
davison-mono-slam.cpp:2117-2140, impls :2015 and :2049)."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.models.monoslam import health, landmarks
from surikatoko_tpu.models.monoslam.state import CAM_STATE_COMPS as N

from tests.test_monoslam_closed_loop import scenario03


def _drifted_setup(n_coast=12):
    """Track 10 frames, then coast blind (suppressed observations) so the
    state drifts and the covariance inflates — the situation 'u' rescues."""
    from surikatoko_tpu.world.runner import run_scenario

    res = scenario03(n_frames=10)
    # reuse the scenario03 internals by re-running with suppression
    return res


@pytest.mark.parametrize("impl", [1, 2])
def test_reset_to_gt_recovers_tracking(impl):
    from surikatoko_tpu.geom import quat as quat_mod
    from surikatoko_tpu.geom.se3 import SE3
    from surikatoko_tpu.world.runner import run_scenario

    # build the scenario objects directly (scenario03 helper hides them)
    import tests.test_monoslam_closed_loop as cl
    from surikatoko_tpu.world import scene_gen
    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.models.monoslam import MonoSlamFilter, make_params
    from surikatoko_tpu.world.demo_matcher import DemoCornersMatcher
    from surikatoko_tpu.world.runner import gt_poses_in_tracker_frame

    wb = scene_gen.WorldBounds(0.0, 0.6, 0.0, 0.6, 0.0, 0.6001)
    points_world = scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5), 0.2)
    center = np.array([0.3, 0.3, 0.3])
    gt_cfw_world = scene_gen.oscillate_right_and_left(
        center + np.array([0, -1.5, 0]), center, (0, 0, 1), 0.6, 2, 160, True)
    gt_cfw = gt_poses_in_tracker_frame(gt_cfw_world)
    tfw = SE3(gt_cfw_world.R[0], gt_cfw_world.t[0])
    pts = np.asarray(jnp.einsum(
        "ij,nj->ni", tfw.R, jnp.asarray(points_world)) + tfw.t)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01)
    tracker = MonoSlamFilter(params, capacity=32, update_impl=1)
    matcher = DemoCornersMatcher(tracker, gt_cfw, pts, seed=1,
                                 detection_noise_std=0.5)
    res = run_scenario(tracker, matcher, gt_cfw, n_frames=10)
    state = res.state

    # blind coast -> drift
    matcher.suppress_observations = True
    for f in range(10, 22):
        obs, m = matcher.match_salient_points(state, f)
        npix, nm, rho, _ = matcher.recruit_new_salient_points(state, f, m)
        state, _ = tracker.process_frame(state, obs, m, npix, nm, rho)
    matcher.suppress_observations = False
    f_reset = 22
    wfc = SE3(gt_cfw.R[f_reset], gt_cfw.t[f_reset]).inv()
    drift = float(jnp.linalg.norm(state.x[:3] - wfc.t))
    assert drift > 0.01, drift          # there IS something to rescue

    gt13 = jnp.concatenate([
        jnp.asarray(wfc.t), jnp.asarray(quat_mod.from_rotmat(wfc.R)),
        jnp.zeros(6, state.x.dtype)])
    gt_pix, gt_rho, slot_mask = matcher.gt_state_for_reset(state, f_reset)
    state = health.reset_state_to_gt(
        params, state, gt13, jnp.asarray(gt_pix), jnp.asarray(gt_rho),
        jnp.asarray(slot_mask), impl=impl,
        cam_pos_std=1e-4, cam_q_comp_std=1e-4,
        cam_vel_std=0.05, cam_ang_vel_std=0.01,
        sal_pnt_first_cam_pos_std=1e-4, sal_pnt_azimuth_std=1e-3,
        sal_pnt_elevation_std=1e-3, sal_pnt_inv_dist_std=0.1)

    # camera snapped to GT, covariance finite and PSD-ish
    assert float(jnp.linalg.norm(state.x[:3] - wfc.t)) < 1e-9
    assert bool(jnp.all(jnp.isfinite(state.P)))
    assert bool(jnp.all(jnp.diag(state.P) >= 0))
    np.testing.assert_allclose(np.asarray(state.P), np.asarray(state.P).T,
                               atol=1e-12)

    # tracking resumes: error within envelope after a few frames
    errs = []
    for f in range(f_reset, f_reset + 12):
        obs, m = matcher.match_salient_points(state, f)
        npix, nm, rho, fids = matcher.recruit_new_salient_points(state, f, m)
        state, stats = tracker.process_frame(state, obs, m, npix, nm, rho)
        matcher.on_landmarks_added(np.asarray(stats.new_slots), fids, state)
        matcher.sync_removed(state)
        wfc_f = SE3(gt_cfw.R[f], gt_cfw.t[f]).inv()
        errs.append(float(jnp.linalg.norm(
            jnp.asarray(stats.cam_state[:3]) - wfc_f.t)))
    assert errs[-1] < 0.05, errs


def test_reset_impl2_matches_add_landmarks_covariance(rng):
    """impl=2's per-landmark covariance equals what add_landmarks would
    produce on a fresh state (the reference's 'like in AddNewSalientPoint'
    construction) when slots fill in order."""
    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.models.monoslam import make_params, init_state

    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0)
    K = 6
    st = init_state(K)
    gt13 = jnp.concatenate([
        jnp.asarray([0.1, -0.2, 0.05]),
        jnp.asarray([1.0, 0.0, 0.0, 0.0]),
        jnp.zeros(6)])
    pix = jnp.asarray(rng.uniform((40, 40), (280, 200), size=(K, 2)))
    rho = jnp.asarray(rng.uniform(0.3, 0.9, size=K))
    mask = jnp.ones(K, bool)

    st_reset = health.reset_state_to_gt(
        params, st, gt13, pix, rho, mask, impl=2)

    st_add = init_state(K)
    st_add = st_add._replace(x=st_add.x.at[:N].set(gt13))
    st_add, _ = landmarks.add_landmarks(params, st_add, pix, mask, rho)

    np.testing.assert_allclose(np.asarray(st_reset.x), np.asarray(st_add.x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(st_reset.P), np.asarray(st_add.P),
                               atol=1e-12)


def test_reset_impl1_diagonal_blocks():
    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.models.monoslam import make_params, init_state

    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0)
    K = 4
    st = init_state(K)
    gt13 = jnp.concatenate([jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]),
                            jnp.zeros(6)])
    pix = jnp.full((K, 2), 120.0)
    rho = jnp.full((K,), 0.5)
    mask = jnp.asarray([True, False, True, True])
    st2 = health.reset_state_to_gt(
        params, st, gt13, pix, rho, mask, impl=1,
        cam_pos_std=0.01, sal_pnt_first_cam_pos_std=0.02,
        sal_pnt_azimuth_std=0.03, sal_pnt_elevation_std=0.04,
        sal_pnt_inv_dist_std=0.05)
    P = np.asarray(st2.P)
    # correlations ignored: strictly diagonal
    np.testing.assert_allclose(P, np.diag(np.diag(P)), atol=0)
    off = N + 0 * 6
    np.testing.assert_allclose(
        np.diag(P)[off:off + 6],
        [0.02**2, 0.02**2, 0.02**2, 0.03**2, 0.04**2, 0.05**2])
    # masked-out slot stays zero and inactive
    off1 = N + 1 * 6
    assert np.all(np.diag(P)[off1:off1 + 6] == 0)
    assert not bool(st2.lm_active[1])
