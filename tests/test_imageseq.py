"""Closed-loop EKF on a RENDERED synthetic image sequence — the real-image
perception path (detector + ellipse-gated NCC + EKF), the equivalent of the
reference's demo-monoslam-imageseq scenario with synthetic imagery."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import camera
from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.models.monoslam import MonoSlamFilter, make_params
from surikatoko_tpu.vision.matcher import (
    ImageTemplCornersMatcher, KltCornersMatcher)
from surikatoko_tpu.world import scene_gen
from surikatoko_tpu.world.runner import (
    gt_poses_in_tracker_frame, run_image_sequence,
    run_image_sequence_pipelined)


def render_world(points_tracker, cfw: SE3, cam, frame, size=(240, 320),
                 sigma=1.8, seed=0):
    """Project 3D points through the GT camera and splat gaussian blobs."""
    H, W = size
    R = np.asarray(cfw.R[frame])
    t = np.asarray(cfw.t[frame])
    xc = points_tracker @ R.T + t
    vis = xc[:, 2] > 1e-6
    pix = np.asarray(camera.project_camera_point(cam, None, jnp.asarray(xc)))
    rng = np.random.default_rng(seed)  # static background texture
    img = rng.uniform(20, 60, size=(H, W))
    ys, xs = np.mgrid[0:H, 0:W]
    for k in np.nonzero(vis)[0]:
        x, y = pix[k]
        if -10 < x < W + 10 and -10 < y < H + 10:
            img += 170.0 * np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2 * sigma**2))
    return np.clip(img, 0, 255).astype(np.float32)


@pytest.mark.slow
def test_imageseq_closed_loop():
    wb = scene_gen.WorldBounds(0.0, 0.6, 0.0, 0.6, 0.0, 0.6001)
    points_world = np.asarray(scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5), 0.2))
    center = np.array([0.3, 0.3, 0.3])
    gt_cfw_world = scene_gen.oscillate_right_and_left(
        center + np.array([0, -1.5, 0]), center, (0, 0, 1),
        max_deviation=0.3, periods_count=1, shots_per_period=120,
        const_view_dir=True)
    gt_cfw = gt_poses_in_tracker_frame(gt_cfw_world)
    tfw = SE3(gt_cfw_world.R[0], gt_cfw_world.t[0])
    pts = np.asarray(points_world @ np.asarray(tfw.R).T + np.asarray(tfw.t))

    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.02,
                         process_noise_ang_veloc_std=0.005,
                         measurm_noise_std_pix=1.0,
                         sal_pnt_init_inv_dist=0.6,
                         sal_pnt_init_inv_dist_std=0.6)
    tracker = MonoSlamFilter(params, capacity=24, update_impl=1)
    matcher = ImageTemplCornersMatcher(
        tracker, templ_width=15, search_radius=10, min_corr_coeff=0.6,
        detector_max_corners=24, min_distance_new_to_tracked=15.0)

    n_frames = 30
    images = [render_world(pts, gt_cfw, cam, f) for f in range(n_frames)]
    state, stats = run_image_sequence(tracker, matcher, images)

    # landmarks recruited and consistently matched
    assert int(stats[0].new_count) >= 5
    matched_late = [int(s.obs_count) for s in stats[10:]]
    assert np.mean(matched_late) >= 4, matched_late
    # filter remains healthy and tracks the oscillation within bounds
    pos_err = []
    for f, s in enumerate(stats):
        cfw_f = SE3(gt_cfw.R[f], gt_cfw.t[f])
        gt_pos = np.asarray(cfw_f.inv().t)
        pos_err.append(np.linalg.norm(np.asarray(s.cam_state[:3]) - gt_pos))
    # monocular scale is only weakly observable from blob init; require
    # bounded drift rather than metric accuracy
    assert np.max(pos_err) < 0.5, np.max(pos_err)
    assert np.all(np.isfinite(np.asarray(state.x)))


@pytest.mark.parametrize("matcher_cls", [ImageTemplCornersMatcher,
                                         KltCornersMatcher])
def test_pipelined_loop_matches_sequential(matcher_cls):
    """run_image_sequence_pipelined reorders the host schedule to overlap
    perception with the device EKF step — the results must stay bitwise
    identical to the sequential loop (same ops, same order of consumption)."""
    wb = scene_gen.WorldBounds(0.0, 0.6, 0.0, 0.6, 0.0, 0.6001)
    points_world = np.asarray(
        scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5), 0.3))
    center = np.array([0.3, 0.3, 0.3])
    gt_cfw_world = scene_gen.oscillate_right_and_left(
        center + np.array([0, -1.5, 0]), center, (0, 0, 1),
        max_deviation=0.3, periods_count=1, shots_per_period=60,
        const_view_dir=True)
    gt_cfw = gt_poses_in_tracker_frame(gt_cfw_world)
    tfw = SE3(gt_cfw_world.R[0], gt_cfw_world.t[0])
    pts = np.asarray(points_world @ np.asarray(tfw.R).T + np.asarray(tfw.t))

    cam = camera.make_intrinsics((160, 120), (80.0, 60.0), 1.95, (0.02, 0.02))
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.02,
                         process_noise_ang_veloc_std=0.005,
                         measurm_noise_std_pix=1.0,
                         sal_pnt_init_inv_dist=0.6,
                         sal_pnt_init_inv_dist_std=0.6)
    images = [render_world(pts, gt_cfw, cam, f, size=(120, 160))
              for f in range(10)]

    def run(runner_fn):
        tracker = MonoSlamFilter(params, capacity=12, update_impl=1)
        kwargs = dict(templ_width=11, detector_max_corners=12,
                      min_distance_new_to_tracked=12.0)
        if matcher_cls is ImageTemplCornersMatcher:
            kwargs.update(search_radius=8, min_corr_coeff=0.6)
        else:
            kwargs.update(klt_levels=2, klt_win=5)
        matcher = matcher_cls(tracker, **kwargs)
        return runner_fn(tracker, matcher, images)

    st_seq, stats_seq = run(run_image_sequence)
    st_pipe, stats_pipe = run(run_image_sequence_pipelined)

    assert np.array_equal(np.asarray(st_seq.x), np.asarray(st_pipe.x))
    assert np.array_equal(np.asarray(st_seq.P), np.asarray(st_pipe.P))
    assert np.array_equal(np.asarray(st_seq.lm_active),
                          np.asarray(st_pipe.lm_active))
    assert len(stats_seq) == len(stats_pipe) == len(images)
    for a, b in zip(stats_seq, stats_pipe):
        assert int(a.obs_count) == int(b.obs_count)
        assert int(a.new_count) == int(b.new_count)
    # the loop actually recruited and tracked something (not vacuous parity)
    assert int(stats_seq[0].new_count) >= 4
    assert np.mean([int(s.obs_count) for s in stats_seq[3:]]) >= 3


@pytest.mark.slow
def test_imageseq_closed_loop_klt_matcher():
    """Same rendered scenario through the KLT (pyramidal LK) matcher seam."""
    wb = scene_gen.WorldBounds(0.0, 0.6, 0.0, 0.6, 0.0, 0.6001)
    points_world = np.asarray(scene_gen.generate_grid_points(wb, (0.5, 0.5, 0.5), 0.2))
    center = np.array([0.3, 0.3, 0.3])
    gt_cfw_world = scene_gen.oscillate_right_and_left(
        center + np.array([0, -1.5, 0]), center, (0, 0, 1),
        max_deviation=0.3, periods_count=1, shots_per_period=120,
        const_view_dir=True)
    gt_cfw = gt_poses_in_tracker_frame(gt_cfw_world)
    tfw = SE3(gt_cfw_world.R[0], gt_cfw_world.t[0])
    pts = np.asarray(points_world @ np.asarray(tfw.R).T + np.asarray(tfw.t))

    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95, (0.01, 0.01))
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.02,
                         process_noise_ang_veloc_std=0.005,
                         measurm_noise_std_pix=1.0,
                         sal_pnt_init_inv_dist=0.6,
                         sal_pnt_init_inv_dist_std=0.6)
    tracker = MonoSlamFilter(params, capacity=24, update_impl=1)
    matcher = KltCornersMatcher(
        tracker, templ_width=15, detector_max_corners=24,
        min_distance_new_to_tracked=15.0, klt_levels=2, klt_win=6)

    n_frames = 30
    images = [render_world(pts, gt_cfw, cam, f) for f in range(n_frames)]
    state, stats = run_image_sequence(tracker, matcher, images)

    assert int(stats[0].new_count) >= 5
    matched_late = [int(s.obs_count) for s in stats[10:]]
    assert np.mean(matched_late) >= 4, matched_late
    pos_err = []
    for f, s in enumerate(stats):
        cfw_f = SE3(gt_cfw.R[f], gt_cfw.t[f])
        gt_pos = np.asarray(cfw_f.inv().t)
        pos_err.append(np.linalg.norm(np.asarray(s.cam_state[:3]) - gt_pos))
    assert np.max(pos_err) < 0.5, np.max(pos_err)
    assert np.all(np.isfinite(np.asarray(state.x)))
