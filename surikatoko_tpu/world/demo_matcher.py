"""Fake perception backend for virtual scenes: projects ground-truth 3D points
through the ground-truth camera, with configurable fault injection.

Equivalent of the reference's ``DemoCornersMatcher``
(demo-davison-mono-slam.cpp:226-424): the strategy seam that lets the whole
EKF run closed-loop against known truth. Fault injection knobs match the
reference: detection noise std (:287-297), match drop probability (:326-332),
cap on new landmarks per frame (:361-371), GT inverse depth for perfect
initialization (:418), and observation suppression (the 's' hotkey —
"camera covered with a blanket").

Host-side stateful object (slot->fragment bookkeeping), math on device.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from surikatoko_tpu.geom import camera as cam_mod
from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.models.monoslam.filter import MonoSlamFilter
from surikatoko_tpu.models.monoslam.state import MonoSlamState


class DemoCornersMatcher:
    def __init__(
        self,
        tracker: MonoSlamFilter,
        gt_cfw: SE3,                 # [F] GT camera-from-tracker poses
        gt_points: np.ndarray,       # [N,3] GT points in the tracker frame
        image_size: tuple[int, int] = (320, 240),
        *,
        detection_noise_std: float = 0.0,
        match_drop_prob: float = 0.0,
        max_new_per_frame: int | None = None,
        max_new_in_first_frame: int | None = None,
        provide_gt_inv_depth: bool = True,
        seed: int = 0,
    ):
        self.tracker = tracker
        self.gt_cfw = gt_cfw
        self.gt_points = np.asarray(gt_points, float)
        self.image_size = image_size
        self.detection_noise_std = detection_noise_std
        self.match_drop_prob = match_drop_prob
        self.max_new = max_new_per_frame or tracker.max_new_per_frame
        # reference monoslam_max_new_blobs_in_first_frame (default 7) vs
        # _per_frame (default 1): the bootstrap frame gets a larger budget
        self.max_new_first = (max_new_in_first_frame
                              if max_new_in_first_frame is not None
                              else self.max_new)
        self.provide_gt_inv_depth = provide_gt_inv_depth
        self.rng = np.random.default_rng(seed)
        self.suppress_observations = False   # the 's' hotkey fault injection
        # slot -> fragment id (-1 = free); fragment -> slot
        self.slot_to_frag = np.full(tracker.capacity, -1, np.int64)
        self.frag_to_slot = np.full(len(self.gt_points), -1, np.int64)

    # ---- internals -------------------------------------------------------
    def _project_frame(self, frame_ind: int) -> tuple[np.ndarray, np.ndarray]:
        """(pixels [N,2], visible [N]) of all GT points in the GT camera."""
        R = np.asarray(self.gt_cfw.R[frame_ind])
        t = np.asarray(self.gt_cfw.t[frame_ind])
        x_cam = self.gt_points @ R.T + t
        in_front = x_cam[:, 2] > 1e-6
        params = self.tracker.params
        dist = params.dist if params.enable_distortion else None
        pix = np.asarray(cam_mod.project_camera_point(
            params.cam, dist, jnp.asarray(x_cam)))
        w, h = self.image_size
        inside = (pix[:, 0] >= 0) & (pix[:, 0] < w) & (pix[:, 1] >= 0) & (pix[:, 1] < h)
        return pix, in_front & inside & np.isfinite(pix).all(axis=1)

    def _gt_inv_depth(self, frag_ids: np.ndarray, frame_ind: int) -> np.ndarray:
        R = np.asarray(self.gt_cfw.R[frame_ind])
        t = np.asarray(self.gt_cfw.t[frame_ind])
        x_cam = self.gt_points[frag_ids] @ R.T + t
        d = np.linalg.norm(x_cam, axis=-1)
        return 1.0 / np.maximum(d, 1e-12)

    # ---- the CornersMatcherBase interface --------------------------------
    def match_salient_points(self, state: MonoSlamState, frame_ind: int
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(obs [K,2], obs_mask [K]) for currently tracked slots."""
        K = self.tracker.capacity
        obs = np.zeros((K, 2))
        mask = np.zeros(K, bool)
        if self.suppress_observations:
            return jnp.asarray(obs), jnp.asarray(mask)
        pix, visible = self._project_frame(frame_ind)
        active = np.asarray(state.lm_active)
        for slot in np.nonzero(active)[0]:
            frag = self.slot_to_frag[slot]
            if frag < 0 or not visible[frag]:
                continue
            if self.match_drop_prob > 0 and self.rng.uniform() < self.match_drop_prob:
                continue
            p = pix[frag]
            if self.detection_noise_std > 0:
                p = p + self.rng.normal(scale=self.detection_noise_std, size=2)
            obs[slot] = p
            mask[slot] = True
        return jnp.asarray(obs), jnp.asarray(mask)

    def recruit_new_salient_points(
        self, state: MonoSlamState, frame_ind: int, obs_mask
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, np.ndarray]:
        """(new_pix [M,2], new_mask [M], gt_inv_dist [M], frag_ids [M]).

        Picks visible GT fragments not yet tracked, up to the per-frame cap
        (first-frame cap on frame 0) and free-slot budget. The returned
        arrays are padded to the LARGER of the two caps so jit signatures
        stay stable."""
        M = max(self.max_new, self.max_new_first)
        cap = self.max_new_first if frame_ind == 0 else self.max_new
        new_pix = np.zeros((M, 2))
        new_mask = np.zeros(M, bool)
        gt_rho = np.full(M, np.nan)
        frag_out = np.full(M, -1, np.int64)
        if self.suppress_observations:
            return (jnp.asarray(new_pix), jnp.asarray(new_mask),
                    jnp.asarray(gt_rho), frag_out)

        pix, visible = self._project_frame(frame_ind)
        free_slots = int(np.sum(~np.asarray(state.lm_active)))
        budget = min(cap, free_slots)
        candidates = np.nonzero(visible & (self.frag_to_slot < 0))[0]
        chosen = candidates[:budget]
        if len(chosen) and self.provide_gt_inv_depth:
            gt_rho[: len(chosen)] = self._gt_inv_depth(chosen, frame_ind)
        if self.detection_noise_std > 0 and len(chosen):
            noise = self.rng.normal(scale=self.detection_noise_std,
                                    size=(len(chosen), 2))
        else:
            noise = 0.0
        new_pix[: len(chosen)] = pix[chosen] + noise
        new_mask[: len(chosen)] = True
        frag_out[: len(chosen)] = chosen
        return (jnp.asarray(new_pix), jnp.asarray(new_mask),
                jnp.asarray(gt_rho), frag_out)

    def gt_state_for_reset(self, state: MonoSlamState, frame_ind: int
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(gt_pix [K,2], gt_rho [K], slot_mask [K]) for
        health.reset_state_to_gt — the GT projection and inverse distance of
        every tracked slot at `frame_ind`, regardless of image visibility
        (the reference's gt_sal_pnt_in_camera_fun,
        demo-davison-mono-slam.cpp:1540-1552, supplies camera-frame
        direction+distance the same way)."""
        K = self.tracker.capacity
        pix = np.zeros((K, 2))
        rho = np.full(K, 1.0)
        mask = np.zeros(K, bool)
        all_pix, _ = self._project_frame(frame_ind)
        active = np.asarray(state.lm_active)
        for slot in np.nonzero(active)[0]:
            frag = self.slot_to_frag[slot]
            if frag < 0:
                continue
            pix[slot] = all_pix[frag]
            rho[slot] = self._gt_inv_depth(np.asarray([frag]), frame_ind)[0]
            mask[slot] = True
        return pix, rho, mask

    def on_landmarks_added(self, slots: np.ndarray, frag_ids: np.ndarray,
                           state: MonoSlamState) -> None:
        """Record slot assignment after filter.add (slots from add_landmarks)."""
        for s, f in zip(np.asarray(slots), frag_ids):
            if s >= 0 and f >= 0:
                self.slot_to_frag[s] = f
                self.frag_to_slot[f] = s

    def sync_removed(self, state: MonoSlamState) -> None:
        """Release bookkeeping for slots the filter deactivated."""
        active = np.asarray(state.lm_active)
        for slot in np.nonzero(~active & (self.slot_to_frag >= 0))[0]:
            frag = self.slot_to_frag[slot]
            self.slot_to_frag[slot] = -1
            if frag >= 0:
                self.frag_to_slot[frag] = -1
