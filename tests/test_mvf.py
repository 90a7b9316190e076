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
