"""Incremental multi-view factorizer: the per-frame integration pipeline.

Reference MultiViewIterativeFactorizer::IntegrateNewFrameCorners
(multi-view-factorization.cpp:255-397):
  1. matcher supplies new-frame corners (track continuation + new tracks)
  2. anchor = earlier frame sharing most tracks (FindAnchorFrame :40)
  3. relative motion target<-anchor from the depths of the shared points
  4. triangulate not-yet-reconstructed tracks seen in >=2 frames (MASKS 8.44)
  5. reprojection error; bundle-adjust if above threshold (:378-394)

Track storage is fixed-capacity masked arrays (max_tracks x max_frames of
normalized homogeneous coords); the host drives frame-by-frame while kernels
(anchor count, relative motion, batched depth, BA) run on device.
fake_localization / fake_mapping switches mirror the reference demo's
GT-substitution debugging aids.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.models.ba import BundleAdjustment, TermCriteria
from surikatoko_tpu.models.ba.problem import make_problem, reproj_error
from surikatoko_tpu.models.mvf import relative_motion as rm


class TrackStore:
    """Fixed-capacity corner-track repository. Like the reference CornerData
    (multi-view-factorization.h), each corner carries both the raw pixel
    (used by BA/reproj-error, pixel K at f0=1) and the normalized homogeneous
    camera coordinate (used by relative motion and depth estimation)."""

    def __init__(self, max_tracks: int, max_frames: int):
        self.coords = np.zeros((max_tracks, max_frames, 3))   # normalized [x,y,1]
        self.pixels = np.zeros((max_tracks, max_frames, 2))
        self.mask = np.zeros((max_tracks, max_frames), bool)
        self.n_tracks = 0
        self.max_frames = max_frames

    def add_corner(self, track_id: int, frame_ind: int, pix, K_inv) -> None:
        if track_id >= self.n_tracks:
            self.n_tracks = track_id + 1
        pix = np.asarray(pix, float)[:2]
        h = np.asarray(K_inv) @ np.array([pix[0], pix[1], 1.0])
        self.pixels[track_id, frame_ind] = pix
        self.coords[track_id, frame_ind] = h / h[2]
        self.mask[track_id, frame_ind] = True

    def tracks_in_frame(self, frame_ind: int) -> np.ndarray:
        return np.nonzero(self.mask[: self.n_tracks, frame_ind])[0]


@dataclass
class MultiViewFactorizer:
    track_store: TrackStore
    K: np.ndarray                       # shared 3x3 intrinsics (f0=1 units)
    ba_trigger_reproj_err: float = 1e-3
    ba_term_rel_change: float = 1e-3
    refine_localization: bool = True   # GN-PnP polish of the SVD-12 estimate
    fake_localization: bool = False
    fake_mapping: bool = False
    gt_cfw_fun: Optional[Callable[[int], SE3]] = None
    gt_point_fun: Optional[Callable[[int], np.ndarray]] = None
    # state
    cam_cfw_R: list = field(default_factory=list)
    cam_cfw_t: list = field(default_factory=list)
    point_coords: dict = field(default_factory=dict)   # track_id -> xyz
    ba_runs: int = field(default=0)

    def frames_count(self) -> int:
        return len(self.cam_cfw_R)

    # ---- bootstrap (the demo's "well_known_frames": first 2 frames carry GT
    # pose and GT points, demo-multi-view-factorization.cpp:528-600) ----
    def add_known_frame(self, cfw: SE3) -> None:
        self.cam_cfw_R.append(np.asarray(cfw.R))
        self.cam_cfw_t.append(np.asarray(cfw.t))

    def set_known_point(self, track_id: int, xyz) -> None:
        self.point_coords[int(track_id)] = np.asarray(xyz, float)

    # ---- reference FindAnchorFrame :40 ----
    def find_anchor_frame(self, new_frame: int) -> tuple[int, np.ndarray]:
        ts = self.track_store
        cur = ts.mask[: ts.n_tracks, new_frame]
        reconstructed = np.zeros(ts.n_tracks, bool)
        for tid in self.point_coords:
            reconstructed[tid] = True
        counts = [
            int(np.sum(cur & ts.mask[: ts.n_tracks, f] & reconstructed))
            for f in range(new_frame)
        ]
        anchor = int(np.argmax(counts)) if counts else 0
        common = np.nonzero(cur & ts.mask[: ts.n_tracks, anchor] & reconstructed)[0]
        return anchor, common

    def integrate_new_frame_corners(self) -> bool:
        """Assumes the matcher already wrote this frame's corners into the
        track store. Returns False if the frame couldn't be integrated."""
        new_frame = self.frames_count()
        ts = self.track_store
        if new_frame < 2:
            raise RuntimeError(
                "bootstrap the first two frames with add_known_frame() first")

        anchor, common = self.find_anchor_frame(new_frame)
        if len(common) == 0:
            return False

        # depths of common (already reconstructed) points in the anchor frame
        Ra, ta = self.cam_cfw_R[anchor], self.cam_cfw_t[anchor]
        pts = np.stack([self.point_coords[t] for t in common])
        depths = (pts @ Ra.T + ta)[:, 2]

        c1 = jnp.asarray(ts.coords[common, anchor])
        c2 = jnp.asarray(ts.coords[common, new_frame])
        rel, ok = rm.find_relative_motion_multi_points(
            c1, c2, jnp.asarray(depths), jnp.ones(len(common), bool))
        if not bool(ok):
            return False

        if self.fake_localization and self.gt_cfw_fun is not None:
            gt = self.gt_cfw_fun(new_frame)
            self.cam_cfw_R.append(np.asarray(gt.R))
            self.cam_cfw_t.append(np.asarray(gt.t))
        else:
            R_new = np.asarray(rel.R) @ Ra
            t_new = np.asarray(rel.R) @ ta + np.asarray(rel.t)
            if self.refine_localization:
                # GN-PnP polish from the better of {SVD estimate, previous
                # frame's pose} — the SVD-12 localizer alone is noise-fragile
                obs = jnp.asarray(ts.coords[common, new_frame])
                pts_j = jnp.asarray(pts)
                msk = jnp.ones(len(common), bool)
                best = None
                for R_i, t_i in ((R_new, t_new),
                                 (self.cam_cfw_R[-1], self.cam_cfw_t[-1])):
                    R_r, t_r, rms = rm.refine_pose_pnp(
                        pts_j, obs, msk, jnp.asarray(R_i), jnp.asarray(t_i))
                    if best is None or float(rms) < best[2]:
                        best = (np.asarray(R_r), np.asarray(t_r), float(rms))
                R_new, t_new = best[0], best[1]
            self.cam_cfw_R.append(R_new)
            self.cam_cfw_t.append(t_new)

        # triangulate tracks seen in this frame that aren't reconstructed yet
        self._reconstruct_new_tracks(new_frame)

        # BA trigger
        err = self._reproj_error()
        if err > self.ba_trigger_reproj_err:
            self._run_ba()
        return True

    def _triangulate_track(self, tid: int, upto_frame: int) -> Optional[np.ndarray]:
        """MASKS-8.44 depth of one track from all its observations up to (and
        including) `upto_frame`, under the current camera poses."""
        ts = self.track_store
        frames = np.nonzero(ts.mask[tid, : upto_frame + 1])[0]
        if len(frames) <= 1:
            return None
        base = int(frames[0])
        others = frames[1:]
        Rb, tb = self.cam_cfw_R[base], self.cam_cfw_t[base]
        R_fb = np.stack([self.cam_cfw_R[f] @ Rb.T for f in others])
        T_fb = np.stack([
            self.cam_cfw_t[f] - R_fb[i] @ tb for i, f in enumerate(others)])
        depth = float(rm.estimate_point_depth(
            jnp.asarray(ts.coords[tid, base]),
            jnp.asarray(ts.coords[tid, others]),
            jnp.asarray(R_fb), jnp.asarray(T_fb),
            jnp.ones(len(others), bool)))
        if not np.isfinite(depth) or depth <= 0:
            return None
        x_base = ts.coords[tid, base] * depth
        return Rb.T @ (x_base - tb)

    def _reconstruct_new_tracks(self, new_frame: int) -> None:
        ts = self.track_store
        for tid in ts.tracks_in_frame(new_frame):
            if tid in self.point_coords:
                continue
            x_world = self._triangulate_track(int(tid), new_frame)
            if x_world is None:
                continue
            if self.fake_mapping and self.gt_point_fun is not None:
                x_world = np.asarray(self.gt_point_fun(int(tid)))
            self.point_coords[int(tid)] = x_world

    def _ba_problem(self):
        tids = sorted(self.point_coords)
        ts = self.track_store
        n_f = self.frames_count()
        pts = np.stack([self.point_coords[t] for t in tids])
        obs = ts.pixels[tids][:, :n_f]
        mask = ts.mask[tids][:, :n_f]
        cfw = SE3(jnp.asarray(np.stack(self.cam_cfw_R)),
                  jnp.asarray(np.stack(self.cam_cfw_t)))
        return tids, make_problem(pts, cfw, self.K, obs, mask, f0=1.0)

    def _reproj_error(self) -> float:
        if len(self.point_coords) == 0 or self.frames_count() < 2:
            return 0.0
        _, p = self._ba_problem()
        return float(reproj_error(p))

    # ---- pose-graph loop closure (north-star addition; the reference's MVF
    # only chains odometry and re-runs BA, multi-view-factorization.cpp:255) --
    def measure_relative_pose(self, i: int, j: int, min_common: int = 6
                              ) -> tuple[Optional[SE3], int]:
        """Independent measurement of the camera-j-from-camera-i transform
        from tracks seen in both frames (depths from the reconstructed map in
        frame i) — the same SVD-12 solver used for odometry, applied to a
        non-adjacent candidate loop pair. Returns (rel, #common) with rel
        None when support is too thin."""
        ts = self.track_store
        both = ts.mask[: ts.n_tracks, i] & ts.mask[: ts.n_tracks, j]
        common = [t for t in np.nonzero(both)[0] if int(t) in self.point_coords]
        if len(common) < min_common:
            return None, len(common)
        Ri, ti = self.cam_cfw_R[i], self.cam_cfw_t[i]
        pts = np.stack([self.point_coords[int(t)] for t in common])
        depths = (pts @ Ri.T + ti)[:, 2]
        rel, ok = rm.find_relative_motion_multi_points(
            jnp.asarray(ts.coords[common, i]), jnp.asarray(ts.coords[common, j]),
            jnp.asarray(depths), jnp.ones(len(common), bool))
        if not bool(ok):
            return None, len(common)
        return SE3(np.asarray(rel.R), np.asarray(rel.t)), len(common)

    def apply_pose_graph(self, loop_closures, *, odometry_weight: float = 1.0,
                         iters: int = 20, run_ba: bool = False) -> None:
        """Correct accumulated drift with SE(3) pose-graph optimization
        (models/posegraph.py): odometry edges from the current consecutive
        relative poses, plus `loop_closures` = [(i, j, rel_cj_from_ci: SE3,
        weight)]. The map is re-triangulated from the corrected poses — that
        is the least-squares structure-only refit, so the correction sticks.

        `run_ba=True` re-runs bundle adjustment afterwards with the closure
        frames PINNED (fixed-keyframe BA). Reprojection error alone is blind
        to a pose-graph-only closure — unconstrained BA would relax the poses
        back toward the drifted odometry optimum — so the frames that carry
        closure information are frozen while the rest re-polish against the
        observations."""
        from surikatoko_tpu.models.posegraph import (
            make_pose_graph, optimize_pose_graph)

        n = self.frames_count()
        # world-from-camera poses (the pose-graph's T)
        R_w = np.stack([R.T for R in self.cam_cfw_R])
        t_w = np.stack([-R.T @ t for R, t in zip(self.cam_cfw_R, self.cam_cfw_t)])

        edges = []
        for k in range(n - 1):
            rel_R = R_w[k].T @ R_w[k + 1]
            rel_t = R_w[k].T @ (t_w[k + 1] - t_w[k])
            edges.append((k, k + 1, rel_R, rel_t, odometry_weight))
        for (i, j, rel, w) in loop_closures:
            # rel maps cam-i coords to cam-j coords; T_i^-1 T_j = rel^-1
            Zr = np.asarray(rel.R).T
            edges.append((i, j, Zr, -Zr @ np.asarray(rel.t), w))

        g = make_pose_graph(R_w, t_w, edges)
        g = optimize_pose_graph(g, iters=iters)
        R_w = np.asarray(g.R)
        t_w = np.asarray(g.t)
        for f in range(n):
            self.cam_cfw_R[f] = R_w[f].T
            self.cam_cfw_t[f] = -R_w[f].T @ t_w[f]

        # re-triangulate the whole map under the corrected poses
        for tid in list(self.point_coords):
            x_world = self._triangulate_track(int(tid), n - 1)
            if x_world is not None:
                self.point_coords[tid] = x_world

        if run_ba:
            pins = sorted({int(i) for (i, j, _, _) in loop_closures}
                          | {int(j) for (i, j, _, _) in loop_closures})
            self._run_ba(pin_frames=tuple(pins))

    def _run_ba(self, pin_frames: tuple = ()) -> None:
        tids, p = self._ba_problem()
        ba = BundleAdjustment(optimize_intrinsics=False, pin_frames=pin_frames)
        ok, p_opt = ba.compute_inplace(
            p, TermCriteria(allowed_reproj_err_rel_change=self.ba_term_rel_change))
        self.ba_runs += 1
        if not ok:
            return
        for i, t in enumerate(tids):
            self.point_coords[t] = np.asarray(p_opt.points[i])
        for f in range(self.frames_count()):
            self.cam_cfw_R[f] = np.asarray(p_opt.cfw_R[f])
            self.cam_cfw_t[f] = np.asarray(p_opt.cfw_t[f])
