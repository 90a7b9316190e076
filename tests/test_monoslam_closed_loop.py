"""Closed-loop EKF acceptance on the virtual scenarios: estimation error within
the 3-sigma envelope (the reference's correctness criterion,
davison-mono-slam.cpp:1781-1807 + matlab/check_tracker_logs.m)."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import camera
from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.models.monoslam import MonoSlamFilter, make_params
from surikatoko_tpu.world import scene_gen
from surikatoko_tpu.world.demo_matcher import DemoCornersMatcher
from surikatoko_tpu.world.runner import gt_poses_in_tracker_frame, run_scenario


def scenario03(n_frames=60, detection_noise=0.5, impl=1, capacity=32,
               drop_prob=0.0):
    wb = scene_gen.WorldBounds(0.0, 0.6, 0.0, 0.6, 0.0, 0.6001)
    points_world = scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5), 0.2)
    center = np.array([0.3, 0.3, 0.3])
    gt_cfw_world = scene_gen.oscillate_right_and_left(
        center + np.array([0, -1.5, 0]), center, (0, 0, 1),
        max_deviation=0.6, periods_count=2, shots_per_period=160,
        const_view_dir=True)
    gt_cfw = gt_poses_in_tracker_frame(gt_cfw_world)
    tfw = SE3(gt_cfw_world.R[0], gt_cfw_world.t[0])
    points_tracker = np.asarray(
        jnp.einsum("ij,nj->ni", tfw.R, jnp.asarray(points_world)) + tfw.t)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01,
                         measurm_noise_std_pix=1.0)
    tracker = MonoSlamFilter(params, capacity=capacity, update_impl=impl)
    matcher = DemoCornersMatcher(tracker, gt_cfw, points_tracker, seed=1,
                                 detection_noise_std=detection_noise,
                                 match_drop_prob=drop_prob)
    return run_scenario(tracker, matcher, gt_cfw, n_frames=n_frames)


@pytest.mark.parametrize("impl", [1, 2, 3])
def test_scenario03_within_sigma_envelope(impl):
    res = scenario03(n_frames=40, impl=impl)
    sig = np.array([np.sqrt(np.trace(np.asarray(s.cam_pos_cov))) for s in res.stats])
    within = res.cam_pos_err <= 3 * sig + 1e-9
    assert within.all(), f"err {res.cam_pos_err} vs 3sig {3 * sig}"
    assert res.cam_pos_err.max() < 0.2  # meters, scene scale ~1.5m


def test_scenario03_ransac_tracks():
    res = scenario03(n_frames=40, impl=4)
    assert res.cam_pos_err.max() < 0.4
    assert int(res.stats[-1].estimated_count) == 8  # all 8 world points tracked
    # RANSAC consensus accounting: low+high <= obs
    for s in res.stats[5:]:
        assert int(s.ransac_low) + int(s.ransac_high) <= int(s.obs_count)


def test_scenario03_residual_matches_noise_level():
    """Post-update reprojection residual should be at the detection-noise
    scale (reference criterion: residual std ~ measurement noise)."""
    res = scenario03(n_frames=40, detection_noise=0.5)
    errs = [float(s.opt_reproj_err) for s in res.stats[10:]]
    assert 0.05 < np.mean(errs) < 1.5


def test_scenario03_with_dropped_matches():
    """Fault injection: 30% of matches randomly dropped (reference
    match_blob_prob_) — filter must keep tracking."""
    res = scenario03(n_frames=40, drop_prob=0.3)
    sig = np.array([np.sqrt(np.trace(np.asarray(s.cam_pos_cov))) for s in res.stats])
    assert (res.cam_pos_err <= 3 * sig + 1e-9).all()


def test_observation_suppression_grows_uncertainty():
    """The 's' hotkey fault injection: with observations suppressed the
    filter coasts on the motion model and covariance grows monotonically."""
    wb = scene_gen.WorldBounds(0.0, 0.6, 0.0, 0.6, 0.0, 0.6001)
    points_world = scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5), 0.2)
    center = np.array([0.3, 0.3, 0.3])
    gt_cfw_world = scene_gen.oscillate_right_and_left(
        center + np.array([0, -1.5, 0]), center, (0, 0, 1), 0.6, 2, 160, True)
    gt_cfw = gt_poses_in_tracker_frame(gt_cfw_world)
    tfw = SE3(gt_cfw_world.R[0], gt_cfw_world.t[0])
    pts = np.asarray(jnp.einsum("ij,nj->ni", tfw.R, jnp.asarray(points_world)) + tfw.t)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    params = make_params(cam, None, dt=1.0, process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01)
    tracker = MonoSlamFilter(params, capacity=32, update_impl=1)
    matcher = DemoCornersMatcher(tracker, gt_cfw, pts, seed=1)
    res = run_scenario(tracker, matcher, gt_cfw, n_frames=10)
    matcher.suppress_observations = True
    sigmas = []
    state = res.state
    for f in range(10, 20):
        obs, obs_mask = matcher.match_salient_points(state, f)
        new_pix, new_mask, gt_rho, frag_ids = matcher.recruit_new_salient_points(
            state, f, obs_mask)
        state, stats = tracker.process_frame(state, obs, obs_mask, new_pix,
                                             new_mask, gt_rho)
        assert int(stats.obs_count) == 0
        sigmas.append(float(np.trace(np.asarray(stats.cam_pos_cov))))
    assert all(b > a for a, b in zip(sigmas, sigmas[1:]))


def test_scenario01_rectangular_path_tracks():
    wb = scene_gen.WorldBounds(-1.5, 1.5, -1.5, -0.4, 0.0, 0.0001)
    points_world = scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5), 0.0)
    gt_cfw_world = scene_gen.rectangular_path(wb, 10, 10, (3, -2, 7), (0, 0, 0), (0, 0, 1))
    gt_cfw = gt_poses_in_tracker_frame(gt_cfw_world)
    tfw = SE3(gt_cfw_world.R[0], gt_cfw_world.t[0])
    pts = np.asarray(jnp.einsum("ij,nj->ni", tfw.R, jnp.asarray(points_world)) + tfw.t)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    dist = camera.MikhailDistortion(jnp.float64(0.06), jnp.float64(0.01))
    params = make_params(cam, dist, dt=1.0, process_noise_lin_veloc_std=0.15,
                         process_noise_ang_veloc_std=0.01)
    tracker = MonoSlamFilter(params, capacity=32, update_impl=1)
    matcher = DemoCornersMatcher(tracker, gt_cfw, pts, seed=1)
    res = run_scenario(tracker, matcher, gt_cfw, n_frames=15)
    # noiseless + GT-depth init: drift stays small through the first corner
    assert res.cam_pos_err.max() < 0.35
    assert float(res.stats[-1].opt_reproj_err) < 0.5
