"""Oxford dinosaur dataset: loader + high-fidelity synthetic stand-in.

The reference expects the VGG files (not shipped in the repo —
testdata/oxfvisgeom/README.md): ``dinosaur/dinoPs_as_mat108x4.txt`` (36
stacked 3x4 P-matrices) and ``dinosaur/viff.xy`` (4983 rows x 72 cols of
(x,y) per frame, -1 = unobserved). ``load_dino_problem`` reproduces the
reference demo's pipeline (demo-bundle-adj-dinosaur.cpp): decompose P ->
(K, pose), f0-scale K, triangulate each track from its observing frames,
and assemble the BA problem.

``synthetic_dino_problem`` is the documented fallback (SURVEY §4: "the actual
dino matrices are NOT in the repo — needs a downloader or a synthetic
stand-in"): a dino-scale turntable scene (36 cameras in a ring, thousands of
points on a noisy cylindrical body, partial visibility) with the same shapes
and f0 convention.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from surikatoko_tpu.geom import se3, triangulate
from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.io.mat_io import read_matrix_from_file
from surikatoko_tpu.models.ba.problem import BAProblem, make_problem


def load_dino_problem(testdata_dir: str, f0: float = 600.0,
                      max_points: int | None = None) -> BAProblem:
    P_rows, obs, mask = _parse_dino_files(testdata_dir, max_points)
    n_frames = P_rows.shape[0] // 3
    return build_problem_from_proj_mats(
        P_rows.reshape(n_frames, 3, 4), obs, mask, f0)


def load_dino_problem_sparse(testdata_dir: str, f0: float = 600.0,
                             max_points: int | None = None):
    """Same parse/decompose/triangulate path as :func:`load_dino_problem`,
    but assembled as the track-major sparse problem the device LM is fast
    on: the real viff.xy tracks average ~3.6 observations over 36 frames,
    so the dense [Np, 36] grid (what BundleAdjustment iterates) is ~10%
    occupied — exactly the sparse store's case (VERDICT r4 item 5, which
    measured the dense path 22x slower per LM iteration than the sparse
    one on a LARGER problem). Returns (BAProblemSparse, frame_idx_host,
    track_mask_host) — the host arrays feed
    SparseBundleAdjustment.set_plan_inputs so the banding planner never
    fetches device arrays through the tunnel."""
    from surikatoko_tpu.models.ba import sparse as sp

    P_rows, obs, mask = _parse_dino_files(testdata_dir, max_points)
    n_frames = P_rows.shape[0] // 3
    dense = build_problem_from_proj_mats(
        P_rows.reshape(n_frames, 3, 4), obs, mask, f0)
    obs_s, fidx, tmask = sp.dense_obs_to_tracks(obs, mask)
    dtype = dense.points.dtype
    p_sp = sp.BAProblemSparse(
        points=dense.points, cfw_R=dense.cfw_R, cfw_t=dense.cfw_t,
        K=dense.K, obs=jnp.asarray(obs_s, dtype),
        frame_idx=jnp.asarray(fidx), obs_mask=jnp.asarray(tmask),
        f0=dense.f0)
    return p_sp, fidx, tmask


def _parse_dino_files(testdata_dir: str, max_points: int | None = None
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    pdir = os.path.join(testdata_dir, "oxfvisgeom", "dinosaur")
    P_rows = read_matrix_from_file(os.path.join(pdir, "dinoPs_as_mat108x4.txt"))
    viff = read_matrix_from_file(os.path.join(pdir, "viff.xy"))
    n_frames = P_rows.shape[0] // 3
    assert viff.shape[1] == 2 * n_frames, (viff.shape, n_frames)

    obs = viff.reshape(-1, n_frames, 2)
    mask = ~np.any(obs == -1, axis=-1)
    keep = mask.sum(axis=1) >= 2          # need >=2 views to triangulate
    obs, mask = obs[keep], mask[keep]
    if max_points is not None:
        obs, mask = obs[:max_points], mask[:max_points]
    return P_rows, obs, mask


def build_problem_from_proj_mats(Ps: np.ndarray, obs: np.ndarray,
                                 mask: np.ndarray, f0: float) -> BAProblem:
    """Decompose P-matrices, f0-scale K, triangulate tracks; the reference
    demo's setup path (demo-bundle-adj-dinosaur.cpp:140-200)."""
    n_frames = Ps.shape[0]
    num_stab = np.diag([1.0 / f0, 1.0 / f0, 1.0])
    Ks, cfw_Rs, cfw_ts, P_f0 = [], [], [], []
    for j in range(n_frames):
        _, K, wfc = triangulate.decompose_proj_mat(jnp.asarray(Ps[j]))
        Knew = num_stab @ np.asarray(K)
        Knew[0, 1] = 0.0                   # zero_cam_intrinsic_mat_01
        cfw = wfc.inv()
        Ks.append(Knew)
        cfw_Rs.append(np.asarray(cfw.R))
        cfw_ts.append(np.asarray(cfw.t))
        P_f0.append(Knew @ np.concatenate(
            [np.asarray(cfw.R), np.asarray(cfw.t)[:, None]], axis=1))

    P_f0 = jnp.asarray(np.stack(P_f0))
    points = triangulate.triangulate_points_batch(
        P_f0, jnp.asarray(obs), f0, jnp.asarray(mask))
    cfw = SE3(jnp.asarray(np.stack(cfw_Rs)), jnp.asarray(np.stack(cfw_ts)))
    return make_problem(np.asarray(points), cfw, np.stack(Ks), obs, mask, f0)


def synthetic_dino_raw(n_frames: int = 36, n_points: int = 1024,
                       noise_pix: float = 0.5, visibility: float = 0.3,
                       seed: int = 0, vary_track_len: bool = False
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray]:
    """Raw turntable scene with dino-like statistics: (Ps [F,3,4],
    obs [N,F,2], mask [N,F], gt_points [N,3]) — the pre-file-format data,
    shared by :func:`synthetic_dino_problem` and :func:`write_dino_files`.

    ``vary_track_len`` draws each track's visible arc from [2, F/3]
    (the real viff.xy's short-track distribution) instead of a fixed arc.
    """
    rng = np.random.default_rng(seed)
    # body: noisy cylinder, radius ~0.5, height 1
    ang = rng.uniform(0, 2 * np.pi, n_points)
    rad = 0.5 + rng.normal(scale=0.08, size=n_points)
    z = rng.uniform(0, 1.0, n_points)
    pts = np.stack([rad * np.cos(ang), rad * np.sin(ang), z], axis=1)

    K = np.array([[3300.0, 0, 360.0], [0, 3300.0, 288.0], [0, 0, 1.0]])
    cam_angles = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    Ps, cfw_Rs, cfw_ts = [], [], []
    for a in cam_angles:
        eye = np.array([6.0 * np.cos(a), 6.0 * np.sin(a), 1.8])
        wfc = se3.look_at_luf_wfc(jnp.asarray(eye), jnp.asarray([0.0, 0, 0.5]),
                                  jnp.asarray([0.0, 0, 1.0]))
        cfw = wfc.inv()
        cfw_Rs.append(np.asarray(cfw.R))
        cfw_ts.append(np.asarray(cfw.t))
        Ps.append(K @ np.concatenate(
            [np.asarray(cfw.R), np.asarray(cfw.t)[:, None]], axis=1))

    # observations: each point seen from a contiguous arc of cameras (the
    # turntable occlusion pattern), with pixel noise
    obs = np.zeros((n_points, n_frames, 2))
    mask = np.zeros((n_points, n_frames), bool)
    arc_fixed = max(2, int(visibility * n_frames))
    for i in range(n_points):
        arc = (int(rng.integers(2, max(3, n_frames // 3)))
               if vary_track_len else arc_fixed)
        facing = np.arctan2(pts[i, 1], pts[i, 0])
        start = int((facing / (2 * np.pi)) * n_frames) % n_frames
        frames = [(start + k) % n_frames for k in range(arc)]
        for j in frames:
            xc = cfw_Rs[j] @ pts[i] + cfw_ts[j]
            if xc[2] <= 0.1:
                continue
            ph = K @ xc
            pix = ph[:2] / ph[2] + rng.normal(scale=noise_pix, size=2)
            obs[i, j] = pix
            mask[i, j] = True
    return np.stack(Ps), obs, mask, pts


def synthetic_dino_problem(n_frames: int = 36, n_points: int = 1024,
                           f0: float = 600.0, noise_pix: float = 0.5,
                           visibility: float = 0.3, seed: int = 0) -> tuple[BAProblem, np.ndarray]:
    """Turntable scene with dino-like statistics. Returns (problem with
    triangulated-from-noisy-corners initialization, GT points)."""
    Ps, obs, mask, pts = synthetic_dino_raw(
        n_frames, n_points, noise_pix, visibility, seed)
    return build_problem_from_proj_mats(Ps, obs, mask, f0), pts


GT_SIDECAR = "dino_gt_points.txt"


def write_dino_files(out_dir: str, Ps: np.ndarray, obs: np.ndarray,
                     mask: np.ndarray, gt_points: np.ndarray | None = None
                     ) -> str:
    """Write a scene in the REAL VGG dino file formats so the full-size run
    exercises the same parse path as the actual dataset
    (demo-bundle-adj-dinosaur.cpp:97-116):

    - ``dinoPs_as_mat108x4.txt``: the F projection matrices stacked to a
      [3F, 4] text matrix;
    - ``viff.xy``: [N, 2F] with (x, y) per frame and ``-1.000000`` holes
      for unobserved entries;
    - optional GT sidecar (NOT part of the real format; consumed for map-ATE
      reporting when present).

    Returns the ``oxfvisgeom/dinosaur`` directory it wrote into.
    """
    pdir = os.path.join(out_dir, "oxfvisgeom", "dinosaur")
    os.makedirs(pdir, exist_ok=True)
    n_frames = Ps.shape[0]
    with open(os.path.join(pdir, "dinoPs_as_mat108x4.txt"), "w") as f:
        for row in Ps.reshape(3 * n_frames, 4):
            f.write(" ".join(f"{v:.10e}" for v in row) + "\n")
    holes = np.where(mask[:, :, None], obs, -1.0)
    with open(os.path.join(pdir, "viff.xy"), "w") as f:
        for row in holes.reshape(-1, 2 * n_frames):
            f.write("  ".join(f"{v:.6f}" for v in row) + "\n")
    if gt_points is not None:
        with open(os.path.join(pdir, GT_SIDECAR), "w") as f:
            for row in gt_points:
                f.write(" ".join(f"{v:.10e}" for v in row) + "\n")
    return pdir


def load_gt_points(testdata_dir: str) -> np.ndarray | None:
    """GT sidecar of a synthesized full-scale scene (None for real data)."""
    path = os.path.join(testdata_dir, "oxfvisgeom", "dinosaur", GT_SIDECAR)
    if not os.path.exists(path):
        return None
    return read_matrix_from_file(path)
