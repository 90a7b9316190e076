"""Multi-view factorization: kernel exactness (relative motion, MASKS-8.44
depth) and closed-loop incremental reconstruction with BA triggering."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.models.mvf import (
    MultiViewFactorizer, TrackStore,
    find_relative_motion_multi_points, estimate_point_depth)
from surikatoko_tpu.world import scene_gen

K = np.array([[520.0, 0, 160.0], [0, 520.0, 120.0], [0, 0, 1.0]])
K_INV = np.linalg.inv(K)


def make_world(frames=12, noise_pix=0.0, seed=0):
    wb = scene_gen.WorldBounds(-1.5, 1.5, -1.5, 1.5, 0.0, 0.2)
    points = np.asarray(scene_gen.generate_grid_points(wb, (0.4, 0.4, 0.4), 0.1))
    gt_cfw = scene_gen.rectangular_path(wb, frames // 4 + 1, frames // 4 + 1,
                                        (3, -2, 5), (0, 0, 0), (0, 0, 1))
    return points, gt_cfw


def project(points, gt_cfw, f, noise=0.0, rng=None):
    R, t = np.asarray(gt_cfw.R[f]), np.asarray(gt_cfw.t[f])
    xc = points @ R.T + t
    vis = xc[:, 2] > 1e-6
    ph = xc @ K.T
    pix = ph[:, :2] / ph[:, 2:3]
    if noise and rng is not None:
        pix = pix + rng.normal(scale=noise, size=pix.shape)
    vis &= (pix[:, 0] >= 0) & (pix[:, 0] < 320) & (pix[:, 1] >= 0) & (pix[:, 1] < 240)
    return pix, vis


def test_relative_motion_exact(rng):
    points, gt_cfw = make_world()
    R0, t0 = np.asarray(gt_cfw.R[0]), np.asarray(gt_cfw.t[0])
    R2, t2 = np.asarray(gt_cfw.R[2]), np.asarray(gt_cfw.t[2])
    xc0 = points @ R0.T + t0
    xc2 = points @ R2.T + t2
    rel, ok = find_relative_motion_multi_points(
        jnp.asarray(xc0 / xc0[:, 2:3]), jnp.asarray(xc2 / xc2[:, 2:3]),
        jnp.asarray(xc0[:, 2]), jnp.ones(len(points), bool))
    assert bool(ok)
    R_gt = R2 @ R0.T
    t_gt = t2 - R_gt @ t0
    np.testing.assert_allclose(rel.R, R_gt, atol=1e-10)
    np.testing.assert_allclose(rel.t, t_gt, atol=1e-9)


def test_relative_motion_masked_rows_ignored(rng):
    points, gt_cfw = make_world()
    R0, t0 = np.asarray(gt_cfw.R[0]), np.asarray(gt_cfw.t[0])
    R2, t2 = np.asarray(gt_cfw.R[2]), np.asarray(gt_cfw.t[2])
    xc0 = points @ R0.T + t0
    xc2 = points @ R2.T + t2
    c2 = xc2 / xc2[:, 2:3]
    c2_bad = c2.copy()
    c2_bad[:5] = rng.normal(size=(5, 3))  # garbage in masked-out rows
    mask = np.ones(len(points), bool)
    mask[:5] = False
    rel, ok = find_relative_motion_multi_points(
        jnp.asarray(xc0 / xc0[:, 2:3]), jnp.asarray(c2_bad),
        jnp.asarray(xc0[:, 2]), jnp.asarray(mask))
    np.testing.assert_allclose(rel.R, R2 @ R0.T, atol=1e-10)


def test_depth_estimation_exact():
    points, gt_cfw = make_world()
    R0, t0 = np.asarray(gt_cfw.R[0]), np.asarray(gt_cfw.t[0])
    tid = 7
    xs, Rfb, Tfb = [], [], []
    for f in (1, 2, 3):
        Rf, tf = np.asarray(gt_cfw.R[f]), np.asarray(gt_cfw.t[f])
        R_fb = Rf @ R0.T
        xc = Rf @ points[tid] + tf
        xs.append(xc / xc[2])
        Rfb.append(R_fb)
        Tfb.append(tf - R_fb @ t0)
    x0 = R0 @ points[tid] + t0
    depth = estimate_point_depth(
        jnp.asarray(x0 / x0[2]), jnp.asarray(np.stack(xs)),
        jnp.asarray(np.stack(Rfb)), jnp.asarray(np.stack(Tfb)),
        jnp.ones(3, bool))
    np.testing.assert_allclose(float(depth), x0[2], rtol=1e-12)


def test_triangulation_parallax_gate():
    """Near-parallel-ray tracks must be withheld from the map until their
    observing-camera spread clears min_parallax_ratio (the depth-noise
    amplification gate added for the at-scale orbit); wide-baseline tracks
    reconstruct exactly."""
    pt = np.array([0.3, -0.2, 5.0])

    def build(baseline):
        ts = TrackStore(max_tracks=4, max_frames=2)
        mvf = MultiViewFactorizer(track_store=ts, K=K,
                                  ba_trigger_reproj_err=float("inf"))
        for f, tx in enumerate((0.0, baseline)):
            R = np.eye(3)
            t = np.array([-tx, 0.0, 0.0])   # cfw: camera at (tx, 0, 0)
            mvf.add_known_frame(SE3(jnp.asarray(R), jnp.asarray(t)))
            xc = R @ pt + t
            pix = (K @ (xc / xc[2]))[:2]
            ts.add_corner(0, f, pix, K_INV)
        return mvf

    # baseline/depth = 1e-4/5 << 0.02 -> gated out
    assert build(1e-4)._triangulate_tracks([0], 1) == {}
    # baseline/depth = 1.0/5 >> 0.02 -> reconstructed exactly
    out = build(1.0)._triangulate_tracks([0], 1)
    np.testing.assert_allclose(out[0], pt, atol=1e-9)


def run_mvf(frames=10, noise_pix=0.0, seed=0, **kw):
    rng = np.random.default_rng(seed)
    points, gt_cfw = make_world(frames)
    n_frames = min(frames, gt_cfw.t.shape[0])
    ts = TrackStore(max_tracks=len(points), max_frames=n_frames)
    mvf = MultiViewFactorizer(
        track_store=ts, K=K,
        gt_cfw_fun=lambda f: SE3(gt_cfw.R[f], gt_cfw.t[f]),
        gt_point_fun=lambda tid: points[tid], **kw)
    for f in range(n_frames):
        pix, vis = project(points, gt_cfw, f, noise_pix, rng)
        for tid in np.nonzero(vis)[0]:
            ts.add_corner(int(tid), f, pix[tid], K_INV)
        if f < 2:
            mvf.add_known_frame(SE3(gt_cfw.R[f], gt_cfw.t[f]))
            for tid in np.nonzero(vis)[0]:
                mvf.set_known_point(int(tid), points[tid])
        else:
            assert mvf.integrate_new_frame_corners()
    return mvf, points, gt_cfw, n_frames


def test_mvf_closed_loop_exact():
    from surikatoko_tpu.geom.align import aligned_rmse
    mvf, points, gt_cfw, n_frames = run_mvf(frames=10)
    tids = sorted(mvf.point_coords)
    est = np.stack([mvf.point_coords[t] for t in tids])
    ate = float(aligned_rmse(jnp.asarray(est), jnp.asarray(points[tids])))
    assert ate < 1e-4, ate
    assert len(tids) > 40


def test_mvf_closed_loop_noisy():
    from surikatoko_tpu.geom.align import aligned_rmse
    mvf, points, gt_cfw, n_frames = run_mvf(frames=10, noise_pix=0.3, seed=3)
    tids = sorted(mvf.point_coords)
    est = np.stack([mvf.point_coords[t] for t in tids])
    ate = float(aligned_rmse(jnp.asarray(est), jnp.asarray(points[tids])))
    assert ate < 0.1, ate
    assert mvf.ba_runs >= 1  # noise forces the BA trigger


def test_mvf_fake_switches():
    """fake_localization / fake_mapping substitute GT (reference debug
    switches) — reconstruction must stay near-exact."""
    mvf, points, _, _ = run_mvf(frames=8, fake_localization=True,
                                fake_mapping=True,
                                ba_trigger_reproj_err=1e12)
    for tid, xyz in mvf.point_coords.items():
        np.testing.assert_allclose(xyz, points[tid], atol=1e-9)


@pytest.mark.slow
def test_mvf_pose_graph_loop_closure():
    """BA keeps the map locally consistent but cannot observe global drift
    (gauge anchored only by the two bootstrap frames); a loop-closure edge
    through the pose graph corrects it. Closure measurements come from GT
    relative poses — the stand-in for a reliable loop detector."""
    mvf, points, gt_cfw, n_frames = run_mvf(frames=12, noise_pix=1.5, seed=5)

    gt_pos = np.stack([
        -np.asarray(gt_cfw.R[f]).T @ np.asarray(gt_cfw.t[f])
        for f in range(n_frames)])
    est_pos = np.stack([-R.T @ t for R, t in zip(mvf.cam_cfw_R, mvf.cam_cfw_t)])
    perr = np.linalg.norm(est_pos - gt_pos, axis=1)
    drift_before = float(np.sqrt(np.mean(perr ** 2)))
    end_before = float(perr[-1])
    assert end_before > 0.1, end_before    # there IS drift to correct

    closures = []
    for j in (0, 1):
        i = n_frames - 1
        Ri, ti = np.asarray(gt_cfw.R[i]), np.asarray(gt_cfw.t[i])
        Rj, tj = np.asarray(gt_cfw.R[j]), np.asarray(gt_cfw.t[j])
        rel_R = Rj @ Ri.T
        closures.append((i, j, SE3(rel_R, tj - rel_R @ ti), 3.0))
    # run_ba=True re-polishes with the closure frames PINNED: unconstrained
    # BA would relax the poses back to the drifted odometry optimum
    # (reprojection alone cannot see a pose-graph-only closure)
    mvf.apply_pose_graph(closures, run_ba=True)

    est_pos2 = np.stack([-R.T @ t for R, t in zip(mvf.cam_cfw_R, mvf.cam_cfw_t)])
    perr2 = np.linalg.norm(est_pos2 - gt_pos, axis=1)
    drift_after = float(np.sqrt(np.mean(perr2 ** 2)))
    end_after = float(perr2[-1])
    assert end_after < 0.2 * end_before, (end_before, end_after)
    assert drift_after < 0.5 * drift_before, (drift_before, drift_after)
    # rotations stay orthonormal after the correction
    for R in mvf.cam_cfw_R:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)


def test_ba_pinned_frames_stay_fixed(rng):
    """Fixed-keyframe BA: pinned poses don't move while the rest optimize."""
    from surikatoko_tpu.models.ba import BundleAdjustment, TermCriteria
    from surikatoko_tpu.models.ba.problem import make_problem, reproj_error

    points, gt_cfw = make_world(frames=8)
    n_f = 6
    pix = np.zeros((len(points), n_f, 2))
    mask = np.zeros((len(points), n_f), bool)
    for f in range(n_f):
        p, v = project(points, gt_cfw, f, 0.5, rng)
        pix[:, f] = p
        mask[:, f] = v
    # corrupt the points and middle poses
    pts0 = points + rng.normal(scale=0.05, size=points.shape)
    R = np.stack([np.asarray(gt_cfw.R[f]) for f in range(n_f)])
    t = np.stack([np.asarray(gt_cfw.t[f]) for f in range(n_f)])
    from surikatoko_tpu.geom import so3
    for f in range(2, n_f - 1):        # frames 0,1 = gauge; last will be pinned
        R[f] = np.asarray(so3.exp(jnp.asarray(rng.normal(scale=0.01, size=3)))) @ R[f]
        t[f] = t[f] + rng.normal(scale=0.03, size=3)
    p = make_problem(pts0, SE3(jnp.asarray(R), jnp.asarray(t)), K, pix, mask, f0=1.0)

    last = n_f - 1
    ba = BundleAdjustment(optimize_intrinsics=False, pin_frames=(last,))
    err0 = float(reproj_error(p))
    ok, p_opt = ba.compute_inplace(
        p, TermCriteria(allowed_reproj_err_rel_change=1e-8))
    err1 = float(reproj_error(p_opt))
    assert err1 < 0.2 * err0, (err0, err1)
    # pinned frame exactly unchanged; corrupted frames moved
    np.testing.assert_allclose(np.asarray(p_opt.cfw_R[last]), R[last], atol=1e-9)
    np.testing.assert_allclose(np.asarray(p_opt.cfw_t[last]), t[last], atol=1e-9)
    assert np.abs(np.asarray(p_opt.cfw_t[3]) - t[3]).max() > 1e-4


def test_mvf_measure_relative_pose_matches_gt():
    mvf, points, gt_cfw, n_frames = run_mvf(frames=10, noise_pix=0.0)
    rel, n_common = mvf.measure_relative_pose(2, 7)
    assert rel is not None and n_common >= 6
    Ri, ti = np.asarray(gt_cfw.R[2]), np.asarray(gt_cfw.t[2])
    Rj, tj = np.asarray(gt_cfw.R[7]), np.asarray(gt_cfw.t[7])
    np.testing.assert_allclose(rel.R, Rj @ Ri.T, atol=1e-6)
    np.testing.assert_allclose(rel.t, tj - (Rj @ Ri.T) @ ti, atol=1e-6)
