"""Sparse-native MVF: the track store emits BAProblemSparse directly and the
incremental pipeline can bundle-adjust through the (optionally distributed)
banded sparse Schur solver. Parity vs the small-problem dense path at sizes
where both run (the reference has only the dense path,
multi-view-factorization.cpp:255-397 + bundle-adj-kanatani.cpp:1771)."""

import numpy as np
import jax.numpy as jnp
import pytest

from surikatoko_tpu.geom.align import aligned_rmse
from surikatoko_tpu.models.ba import sparse as ba_sparse
from surikatoko_tpu.parallel import landmark_mesh

from tests.test_mvf import run_mvf


def _map_and_traj(mvf):
    tids = sorted(mvf.point_coords)
    pts = np.stack([mvf.point_coords[t] for t in tids])
    pos = np.stack([-R.T @ t for R, t in zip(mvf.cam_cfw_R, mvf.cam_cfw_t)])
    return tids, pts, pos


def test_sparse_problem_matches_dense_grid():
    """The padded-track emission and the dense grid describe the same
    observations: identical reprojection error and identical per-cell obs."""
    mvf, points, gt_cfw, n_frames = run_mvf(frames=10, noise_pix=0.3, seed=3)
    tids_d, pd = mvf._dense_problem()
    tids_s, ps = mvf._sparse_problem()
    assert tids_d == tids_s
    from surikatoko_tpu.models.ba.problem import reproj_error as dense_err
    np.testing.assert_allclose(float(dense_err(pd)),
                               float(ba_sparse.reproj_error(ps)), rtol=1e-12)
    # scatter the sparse triple back into a grid: must match the dense grid
    obs = np.asarray(ps.obs)
    fidx = np.asarray(ps.frame_idx)
    msk = np.asarray(ps.obs_mask)
    grid = np.zeros((len(tids_s), n_frames, 2))
    gm = np.zeros((len(tids_s), n_frames), bool)
    for i in range(len(tids_s)):
        for l in range(msk.shape[1]):
            if msk[i, l]:
                gm[i, fidx[i, l]] = True
                grid[i, fidx[i, l]] = obs[i, l]
    np.testing.assert_array_equal(gm, np.asarray(pd.obs_mask))
    np.testing.assert_allclose(grid * gm[..., None], np.asarray(pd.obs) * gm[..., None])


def test_mvf_sparse_ba_matches_dense_ba():
    """Forcing the sparse BA backend reproduces the dense-backend
    reconstruction (same LM schedule, same Schur math in track-major form)."""
    mvf_d, points, _, _ = run_mvf(frames=10, noise_pix=0.3, seed=3,
                                  use_sparse_ba=False)
    mvf_s, _, _, _ = run_mvf(frames=10, noise_pix=0.3, seed=3,
                             use_sparse_ba=True)
    assert mvf_d.ba_runs >= 1 and mvf_s.ba_runs == mvf_d.ba_runs
    assert mvf_s.last_ba_sparse and not mvf_d.last_ba_sparse
    tids_d, pts_d, pos_d = _map_and_traj(mvf_d)
    tids_s, pts_s, pos_s = _map_and_traj(mvf_s)
    assert tids_d == tids_s
    np.testing.assert_allclose(pts_s, pts_d, atol=5e-5)
    np.testing.assert_allclose(pos_s, pos_d, atol=5e-5)
    # both land on the GT map
    gt_ate = float(aligned_rmse(jnp.asarray(pts_s),
                                jnp.asarray(points[tids_s])))
    assert gt_ate < 0.1, gt_ate


def test_mvf_sparse_ba_distributed_matches_local():
    """Same run with the sparse BA sharded over the 8-device virtual mesh:
    the distributed Schur solve is numerically the same solve."""
    mvf_l, _, _, _ = run_mvf(frames=10, noise_pix=0.3, seed=3,
                             use_sparse_ba=True)
    mvf_m, _, _, _ = run_mvf(frames=10, noise_pix=0.3, seed=3,
                             use_sparse_ba=True, ba_mesh=landmark_mesh(8),
                             ba_point_chunk=32)
    tids_l, pts_l, pos_l = _map_and_traj(mvf_l)
    tids_m, pts_m, pos_m = _map_and_traj(mvf_m)
    assert tids_l == tids_m
    np.testing.assert_allclose(pts_m, pts_l, atol=1e-6)
    np.testing.assert_allclose(pos_m, pos_l, atol=1e-6)


def test_mvf_auto_switches_to_sparse_above_threshold():
    """use_sparse_ba=None: the backend flips on the Np*F dense-cell count."""
    mvf, _, _, _ = run_mvf(frames=10, noise_pix=0.3, seed=3,
                           sparse_ba_threshold=10)      # tiny -> sparse
    assert mvf.ba_runs >= 1 and mvf.last_ba_sparse
    mvf2, _, _, _ = run_mvf(frames=10, noise_pix=0.3, seed=3,
                            sparse_ba_threshold=10**9)  # huge -> dense
    assert mvf2.ba_runs >= 1 and not mvf2.last_ba_sparse


@pytest.mark.slow
def test_mvf_incremental_at_moderate_scale():
    """Incremental MVF through hundreds of tracks with a bounded track
    length (the at-scale memory shape: obs is O(#observations)) and the
    banded sparse BA engaged. CPU-sized stand-in for the 10k x 500 demo
    (demos/demo_mvf_at_scale.py runs the real thing)."""
    from tests.test_mvf import K, K_INV
    from surikatoko_tpu.geom.se3 import SE3
    from surikatoko_tpu.models.mvf import MultiViewFactorizer, TrackStore

    rng = np.random.default_rng(0)
    n_frames, n_pts, L = 40, 600, 10
    # ring of points, camera orbiting: frame-local visibility windows
    ang = rng.uniform(0, 2 * np.pi, n_pts)
    pts = np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang),
                    rng.uniform(0, 1.0, n_pts)], axis=1)
    from surikatoko_tpu.geom import se3 as se3_mod
    Rs, ts_ = [], []
    for a in np.linspace(0, 2 * np.pi, n_frames, endpoint=False):
        eye = np.array([6.0 * np.cos(a), 6.0 * np.sin(a), 0.5])
        wfc = se3_mod.look_at_luf_wfc(
            jnp.asarray(eye), jnp.asarray([0.0, 0, 0.5]),
            jnp.asarray([0.0, 0, 1]))
        cfw = wfc.inv()
        Rs.append(np.asarray(cfw.R))
        ts_.append(np.asarray(cfw.t))
    facing = (ang / (2 * np.pi) * n_frames).astype(int)

    ts = TrackStore(max_tracks=n_pts, max_frames=n_frames, max_track_len=L)
    mvf = MultiViewFactorizer(
        track_store=ts, K=K, use_sparse_ba=True, ba_max_iters=10,
        ba_term_rel_change=None,
        ba_trigger_reproj_err=1e9)      # BA on our own schedule below
    for f in range(n_frames):
        Rf, tf = Rs[f], ts_[f]
        for tid in range(n_pts):
            if not ((facing[tid] - f) % n_frames < L):
                continue
            xc = Rf @ pts[tid] + tf
            if xc[2] < 0.5:
                continue
            ph = K @ xc
            pix = ph[:2] / ph[2] + rng.normal(scale=0.3, size=2)
            ts.add_corner(tid, f, pix, K_INV)
        if f < 2:
            mvf.add_known_frame(SE3(jnp.asarray(Rf), jnp.asarray(tf)))
            for tid in ts.tracks_in_frame(f):
                mvf.set_known_point(int(tid), pts[tid])
        else:
            mvf.integrate_new_frame_corners()
            if (f + 1) % 5 == 0:
                # sliding-window local BA: one compiled program, drift stays
                # bounded while the global problem grows
                mvf.run_windowed_ba(window=16, point_bucket=256)
    assert len(mvf.point_coords) > 0.8 * n_pts
    mvf._run_ba()
    assert mvf.last_ba_sparse
    tids, est, pos = _map_and_traj(mvf)
    ate = float(aligned_rmse(jnp.asarray(est), jnp.asarray(pts[tids])))
    assert ate < 0.1, ate
