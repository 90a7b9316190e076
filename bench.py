"""Benchmark: MonoSlam EKF frames/sec/chip on the scenario03 closed loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: the reference implies a 30 fps real-time target on host CPU
(dT=1/30 s, demo-monoslam-imageseq.json; SURVEY §6) — vs_baseline = fps/30.

The whole closed loop (GT-projecting matcher, stacked masked update over a
full 96-landmark set, health checks, prediction) runs on-device as one
lax.scan over frames (world/device_runner.py) — no host round-trips inside
the measurement; the oscillating camera makes residuals/covariances evolve
like the real scenario, so this is tracking throughput, not a matmul loop.

Extra keys recorded alongside the headline number:
  ate_rmse               similarity-aligned trajectory ATE of the measured
                         run (BASELINE accuracy metric)
  imageseq_*_k768        real-perception loop (render + Pallas NCC + per-
                         frame Shi-Tomasi RECRUITMENT + delete policy +
                         fused EKF) at the ~1k-landmark regime with
                         steady-state landmark churn (BASELINE configs[3]);
                         fps / ATE / matched / recruited / active / slot-
                         generation keys
  imageseq_ate_norecruit_k768  no-recruit control on the SAME wide world:
                         recruitment must track strictly better (asserted,
                         along with an absolute churned-ATE bound < 0.25 —
                         r4's "churn costs 2.5x" compared different worlds)
  sharded_pallas_*       the landmark-sharded imageseq runner (recruit +
                         delete + Pallas NCC under shard_map) executed on
                         the REAL chip via a 1-device mesh at K=768 and
                         compared to the single-device runner — proves the
                         multi-chip program compiles + matches on TPU
                         (virtual-CPU parity tests cannot exercise Pallas)
  imageseq_hostloop_*    the reference's actual operating mode end-to-end:
                         synthetic 320x240 PGMs through the real encoder ->
                         native prefetching frame loader -> Shi-Tomasi
                         recruit + NCC match -> EKF via the pipelined host
                         loop (demo-davison-mono-slam.cpp:1699-1729)
  unmitigated_f32_*      control: the same loop with the f32 conditioning
                         mitigations OFF, run past the ~120-frame failure
                         horizon — must degrade (the reason the mitigations
                         exist, re-measured every round; the degradation
                         MODE is chaotic across code perturbations — some
                         rounds collapse tracking via stale landmarks
                         (637 -> 139 matches), some go outright non-finite
                         (first_bad_frame 267 this round) — the control
                         asserts only that SOME failure mode fires)
  ncc_pallas_maxdiff     on-device Pallas-vs-XLA NCC parity (max |corr diff|
                         over matched slots of one rendered frame)
  schur_pct_of_ceiling   full-width 10k x 500 sparse Schur solve as % of the
                         chip's measured f32-accumulation matmul ceiling
                         (BASELINE north-star: >= 60)
  ba_iters_per_s         FULL-LM iteration rate at 10k x 500 via the one-
                         dispatch device LM: blocks + damped solves (incl.
                         rejected trials, ba_trials_per_s) + err evals +
                         apply (BASELINE "BA iters/sec")
  ba_solve_blocks_per_s  kernel-level rate (derivative rebuild + one damped
                         banded solve only)
  dino_ba_iters_per_s    device-loop LM rate on the reference's full dino
                         shape (36 frames x 4983 tracks, real-format
                         synthetic through io/dino.py's parse path) on the
                         track-major SPARSE store (the real tracks average
                         ~3.6 obs / 36 frames; full-width Schur, band=False
                         — at F=36 the reduced system is 360x360 and the
                         wrap-around turntable tracks would defeat banding)
  dino_map_ate           its converged map ATE vs GT
  mvf_*                  MVF at-scale closed loop (incremental SfM +
                         windowed/global BA + oracle-free Sim(3) closure)
                         at a reduced-but-representative size.
                         mvf_end_to_end_fps counts TOTAL pipeline
                         wall-clock incl. triggered BA (the reference's
                         per-frame cost includes its triggered BA);
                         _steady replaces each BA run with its per-run
                         median (the 2-3 one-off jit compiles that
                         dominate at reduced size amortize on long runs).
                         mvf_ba_iters_per_s_in_pipeline is best-of-2 warm
                         reps: r4's 0.477 was the first-after-compile call
                         paying one-off tunnel costs (real warm rate ~50/s)
"""

from __future__ import annotations

import json
import sys
import time

_T0 = time.time()


def _progress(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr,
          flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    # EKF covariance math needs true f32 accumulation on the MXU: the bf16
    # default destroys the innovation Cholesky after ~50 chained updates.
    jax.config.update("jax_default_matmul_precision", "highest")

    from surikatoko_tpu.world.device_runner import (
        build_oscillating_scenario as build_device_scenario)
    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.models.monoslam import make_params, init_state
    from surikatoko_tpu.world.device_runner import (
        init_with_gt_landmarks, make_scan_runner)

    import os
    # BENCH_SMOKE=1: tiny shapes for a CPU correctness pass of every section
    smoke = os.environ.get("BENCH_SMOKE", "") == "1"

    capacity = 32 if smoke else 96
    dtype = jnp.float32
    sc = build_device_scenario(capacity=capacity, dtype=dtype)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01), dtype=dtype)
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01, dtype=dtype)
    state = init_state(capacity, dtype=dtype)
    # jit the bootstrap: eager ops each cost a full round-trip through the
    # remote tunnel (measured ~7 min of pure dispatch latency otherwise)
    _progress("init landmarks (jitted)")
    state = jax.jit(lambda st, key: init_with_gt_landmarks(
        params, sc, st, key))(state, jax.random.PRNGKey(0))
    run = make_scan_runner(params, update_impl=1)

    F = int(sc.gt_cfw_R.shape[0])
    CHUNK = 30 if smoke else 300   # large chunks amortize the per-dispatch
    frames0 = jnp.arange(1, 1 + CHUNK)   # latency of the remote TPU tunnel

    # warmup / compile
    _progress("compiling scenario03 scan runner")
    st, errs, _nm, cam_pos = run(state, sc, frames0, jax.random.PRNGKey(1))
    jax.block_until_ready(st)
    assert bool(jnp.all(jnp.isfinite(errs))), "non-finite residuals in bench"

    # trajectory ATE of the warmup chunk (similarity-aligned, the BASELINE
    # accuracy metric): estimated camera positions vs GT wfc positions
    from surikatoko_tpu.geom.align import aligned_rmse
    gt_pos = -jnp.einsum("fji,fj->fi", sc.gt_cfw_R[frames0],
                         sc.gt_cfw_t[frames0])
    ate = float(aligned_rmse(cam_pos, gt_pos))

    # fetch round-trip of the remote tunnel (block_until_ready does not
    # reliably block on remote execution; a scalar host fetch does — its
    # ~25ms round-trip is measured here and subtracted from the run)
    tiny = jax.jit(lambda v: jnp.sum(v))
    _ = float(tiny(st.x))
    rtts = []
    for r in range(5):
        t0 = time.perf_counter()
        _ = float(tiny(st.x * (1.0 + r)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]

    _progress("timing scenario03")
    n_chunks = 6
    ts = []
    for r in range(3):             # median of 3 runs rides out transients
        # perturbation must exceed f32 eps (~1.19e-7): the remote tunnel
        # memoizes identical (executable, args) executions, and 1+1e-9
        # rounds to exactly 1.0f (advisor finding, round 2)
        cur = st._replace(x=st.x * (1.0 + 1e-6 * (r + 1)))
        jax.block_until_ready(cur.x)
        t0 = time.perf_counter()
        for c in range(n_chunks):
            lo = 1 + ((c + 1) * CHUNK) % (F - CHUNK - 1)
            cur, errs, _, _ = run(cur, sc, jnp.arange(lo, lo + CHUNK),
                               jax.random.PRNGKey(c + 2 + 7 * r))
        _ = float(jnp.sum(cur.x))  # forces completion of the whole chain
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] - rtt

    fps = n_chunks * CHUNK / dt

    # ---- the ~1k-landmark regime with REAL perception AND the full landmark
    # LIFECYCLE (BASELINE configs[3] + VERDICT r3 item 1): render ->
    # ellipse-gated Pallas NCC -> per-frame Shi-Tomasi recruitment into freed
    # slots -> fused EKF with the delete-unobserved policy, K=768, 640x480.
    # The world holds MORE splats (1024) than the filter has slots and the
    # camera sweep (max_deviation=1.0) carries points in/out of view, so the
    # measured loop runs steady-state add+delete churn like the reference
    # hot path (RecruitNewSalientPoints, davison-mono-slam.cpp:923) — not a
    # no-churn bootstrap filter. ----
    from surikatoko_tpu.world.device_runner import (
        build_imageseq_scenario, init_imageseq, make_imageseq_scan_runner)

    _progress("building K=768 churned imageseq scenario")
    K_big = 48 if smoke else 768
    cam_big = camera.make_intrinsics((640, 480), (320.0, 240.0), 1.95,
                                     (0.005, 0.005), dtype=dtype)
    # f32 conditioning policy (max_undetected_frames + covar_diag_inflation).
    # History: the 2026-08-19 code went indefinite after ~120 chained K=768
    # frames without them. Re-measured 2026-08-21 on current code (Gram-form
    # downdates + exact-symmetry congruences landed since): the unmitigated
    # filter now stays finite/PSD for 960+ frames — what the mitigations are
    # measurably load-bearing for TODAY is TRACKING quality (stale
    # never-deleted landmarks collapse matching 637 -> 139 by ~800 frames;
    # the unmitigated_f32_* control keys re-measure this every round)
    params_big = make_params(cam_big, None, dt=1.0,
                             process_noise_lin_veloc_std=0.075,
                             process_noise_ang_veloc_std=0.01,
                             sal_pnt_init_inv_dist=0.5,
                             sal_pnt_init_inv_dist_std=0.5,
                             max_undetected_frames=30,
                             covar_diag_inflation=1e-6, dtype=dtype)
    # "wide" world: 1024 DISTINCT points over a strip wider than the FOV, so
    # the max_deviation=1.0 sweep genuinely carries points in/out of view
    # and the recruit/delete lifecycle turns slots over
    sc_big = build_imageseq_scenario(capacity=K_big, dtype=dtype,
                                     image_size=(640, 480),
                                     n_points=64 if smoke else 1024,
                                     bg_cell=48, max_deviation=0.8,
                                     world="wide")
    st_big = init_state(K_big, dtype=dtype)
    st_big, templates = jax.jit(lambda st: init_imageseq(
        params_big, sc_big, st, 15))(st_big)
    # recruit depth prior + subpixel decision, RE-MEASURED at this exact
    # config after the round-5 detector-exactness fix perturbed the recruit
    # set (analysis/measure_churn_accuracy.py, 2026-08-21, on-chip):
    #   prior depth            ATE 0.2337 @ 90.0 fps
    #   prior + subpixel       ATE 0.2535 @ 89.5 fps
    #   LOCAL depth            ATE 0.2299 @ 91.7 fps   <- bench config
    #   local + subpixel       ATE 0.2309 @ 91.4 fps
    # The spatially-local neighbourhood depth prior (median rho of the 8
    # nearest tracked slots) wins outright; subpixel refinement — now
    # near-free via surface reads — moves ATE within the config's
    # code-perturbation noise (+-0.02) and stays OFF here (its parity is
    # pinned on-chip by ncc_subpix_center_maxdiff below).
    run_big = make_imageseq_scan_runner(params_big, templ_width=15,
                                        recruit=True, recruit_max=12,
                                        detector_corners=64,
                                        recruit_depth="local",
                                        use_pallas=not smoke)
    CH_BIG = 20 if smoke else 120
    fr_big = jnp.arange(1, 1 + CH_BIG)
    _progress("compiling K=768 churned imageseq runner")
    # warm INTO the churn regime (deletions start at max_undetected_frames);
    # all reps then time the SAME frame window from the same warmed state
    # (the oscillation is periodic over 320 frames — indices stay in range)
    st_w, tm_w, _out1 = run_big(st_big, templates, sc_big, fr_big)
    _ = float(jnp.sum(st_w.x))                    # force completion
    ts_big = []
    fr_timed = jnp.arange(1 + CH_BIG, 1 + 2 * CH_BIG)
    for r in range(3):                            # median rides out transients
        t0 = time.perf_counter()
        st2, tm2, (err_b, n_b, pos_b, nrec_b, nact_b) = run_big(
            st_w._replace(x=st_w.x * (1.0 + 1e-6 * (r + 1))),
            tm_w, sc_big, fr_timed)
        _ = float(jnp.sum(st2.x))
        ts_big.append(time.perf_counter() - t0)
    dt_big = sorted(ts_big)[1] - rtt
    fps_big = CH_BIG / dt_big
    gt_pos_b = -jnp.einsum("fji,fj->fi", sc_big.gt_cfw_R[fr_timed],
                           sc_big.gt_cfw_t[fr_timed])
    ate_big = float(aligned_rmse(pos_b, gt_pos_b))
    n_match_med = int(jnp.median(n_b))
    recruited_total = int(jnp.sum(nrec_b))
    active_med = int(jnp.median(nact_b))
    gen_max = int(jnp.max(st2.lm_generation))

    # ---- no-recruit CONTROL on the SAME world + bound (VERDICT r4 item 2:
    # the churned ATE had no bound and no same-world comparison — r4's
    # "0.216 vs 0.087 no-churn" compared DIFFERENT worlds). Measured
    # 2026-08-21: recruit 0.216 / no-recruit 0.270 (delete on) / 0.263
    # (frozen set) — on the wide-sweep world recruitment IMPROVES accuracy;
    # both claims are asserted every round. ----
    _progress("no-recruit control on the same wide world")
    st_c = init_state(K_big, dtype=dtype)
    st_c, tmpl_c = jax.jit(lambda st: init_imageseq(
        params_big, sc_big, st, 15))(st_c)
    run_ctl = make_imageseq_scan_runner(params_big, templ_width=15,
                                        use_pallas=not smoke)
    st_cw, (_, _, _) = run_ctl(st_c, tmpl_c, sc_big, fr_big)
    _ = float(jnp.sum(st_cw.x))
    st_c2, (_, n_ctl_b, pos_ctl) = run_ctl(st_cw, tmpl_c, sc_big, fr_timed)
    _ = float(jnp.sum(st_c2.x))
    ate_norecruit = float(aligned_rmse(pos_ctl, gt_pos_b))
    if not smoke:
        assert ate_big < 0.25, f"churned ATE bound violated: {ate_big}"
        assert ate_big < ate_norecruit, (
            f"recruitment stopped helping: {ate_big} vs {ate_norecruit}")

    # ---- unmitigated-f32 control (VERDICT r3 item 4): the SAME loop with
    # the conditioning mitigations off, run far past the mitigated
    # benchmark's horizon. Degradation today (re-measured 2026-08-21) is
    # TRACKING collapse from stale never-deleted landmarks (matched 637 ->
    # 139 by ~800 frames), not PSD loss — the historical indefiniteness is
    # still checked (first_bad/min_diag) but no longer reproduces on the
    # current Gram-form/exact-symmetry congruences. ----
    _progress("unmitigated-f32 control (mitigations off, 800 frames)")
    params_unmit = make_params(cam_big, None, dt=1.0,
                               process_noise_lin_veloc_std=0.075,
                               process_noise_ang_veloc_std=0.01,
                               sal_pnt_init_inv_dist=0.5,
                               sal_pnt_init_inv_dist_std=0.5,
                               dtype=dtype)   # no deletion, no inflation
    st_u = init_state(K_big, dtype=dtype)
    st_u, tmpl_u = jax.jit(lambda st: init_imageseq(
        params_unmit, sc_big, st, 15))(st_u)
    run_u = make_imageseq_scan_runner(params_unmit, templ_width=15,
                                      use_pallas=not smoke)
    first_bad = -1
    pos_chunks = []
    n_chunks_u = []
    # the oscillation is periodic over 2x160 frames: cycling the two
    # half-period windows runs the unmitigated filter far past the
    # mitigated benchmark's horizon with continuous camera motion
    n_ctl = 1 if smoke else 6
    for c in range(n_ctl):
        # half-period windows 0..159 / 160..319: a +1 offset would index
        # frame 320 of the 320-pose scenario (gather clamps silently)
        lo = (c % 2) * 160
        st_u, (err_u, n_u, pos_u) = run_u(
            st_u, tmpl_u, sc_big,
            jnp.arange(lo, lo + (CH_BIG if smoke else 160)))
        pos_chunks.append(pos_u)
        n_chunks_u.append(n_u)
    pos_u = jnp.concatenate(pos_chunks)
    # matched over the LAST FULL period (two half-period chunks): the
    # matched count is phase-dependent, so a single chunk misleads
    matched_late = int(jnp.median(jnp.concatenate(n_chunks_u[-2:])))
    bad_u = jnp.logical_not(jnp.all(jnp.isfinite(pos_u), axis=-1))
    if bool(jnp.any(bad_u)):
        first_bad = int(jnp.argmax(bad_u)) + 1
    dg_u = jnp.diag(st_u.P)
    min_diag_u = float(jnp.min(jnp.where(jnp.isfinite(dg_u), dg_u, -jnp.inf)))
    # degraded = historical hard failures (non-finite / indefinite) OR the
    # measurable one on current code: tracking erosion from stale
    # never-deleted landmarks (>=15% of the mitigated loop's matches lost;
    # at wider sweeps the same mechanism collapses matching outright —
    # 637 -> 139 measured at max_deviation=1.0)
    unmit_degraded = bool(first_bad >= 0 or min_diag_u < 0
                          or not bool(jnp.all(jnp.isfinite(st_u.x)))
                          or matched_late < n_match_med * 17 // 20)
    if not smoke:
        # the conditioning policy's justification: without it, SOME failure
        # mode fires (the mode itself is chaotic across code revisions —
        # PSD loss, non-finite states, or stale-landmark tracking collapse)
        assert unmit_degraded, "unmitigated control no longer degrades"

    # ---- sharded imageseq runner ON THE REAL CHIP (VERDICT r4 item 7):
    # a 1-device "lm" mesh executes the full shard_map composition —
    # distributed render psum, Pallas NCC INSIDE shard_map, recruit +
    # delete + sharded fused congruence — at the benchmark K, proving the
    # multi-chip program compiles and matches the single-device runner on
    # TPU hardware (the virtual-CPU parity tests can't exercise Pallas) ----
    _progress("sharded runner (1-device mesh, Pallas under shard_map, K=768)")
    from surikatoko_tpu.parallel import landmark_mesh
    from surikatoko_tpu.parallel.sharded_imageseq import (
        make_sharded_imageseq_runner)
    fr_sh = jnp.arange(1, 9)
    run_sh = make_sharded_imageseq_runner(
        params_big, K_big, landmark_mesh(1), templ_width=15,
        use_pallas=not smoke, recruit=True, recruit_max=12,
        detector_corners=64, recruit_depth="local")
    x_sh, P_sh, tm_sh, act_sh, _u_sh, gen_sh, (
        err_sh, n_sh, pos_sh, nrec_sh, nact_sh) = run_sh(
        st_big.x, st_big.P, templates, st_big.lm_active,
        st_big.lm_unobserved, st_big.lm_generation, sc_big, fr_sh)
    st_1, tm_1, (err_1, n_1, pos_1, nrec_1, nact_1) = run_big(
        st_big, templates, sc_big, fr_sh)
    sharded_matched_absdiff = int(jnp.max(jnp.abs(n_sh - n_1)))
    sharded_pos_maxdiff = float(jnp.max(jnp.abs(pos_sh - pos_1)))
    assert bool(jnp.all(jnp.isfinite(err_sh))), "sharded-on-chip diverged"
    assert sharded_matched_absdiff <= 5, (
        f"sharded vs single matched counts diverged: {n_sh} vs {n_1}")

    # ---- host-driven REAL-IMAGE loop (VERDICT r4 item 8): the reference's
    # actual operating mode is decode-from-disk -> matcher plug-in -> filter
    # (demo-davison-mono-slam.cpp:1699-1729). Write a synthetic 320x240 PGM
    # sequence through the real encoder (vision/picture.save_picture), read
    # it back through the native prefetching frame loader, and run the
    # pipelined host loop (Shi-Tomasi recruit + NCC match + EKF) end-to-end
    # — the decode -> upload -> NCC -> EKF seam the per-round artifact never
    # exercised before. ----
    _progress("host-driven imageseq loop (PGM encode -> decode -> NCC -> EKF)")
    import tempfile as _tf
    from surikatoko_tpu.geom.se3 import SE3
    from surikatoko_tpu.io.frame_loader import FrameLoader
    from surikatoko_tpu.models.monoslam import MonoSlamFilter
    from surikatoko_tpu.vision.matcher import ImageTemplCornersMatcher
    from surikatoko_tpu.vision.picture import save_picture
    from surikatoko_tpu.world import scene_gen
    from surikatoko_tpu.world.runner import (
        gt_poses_in_tracker_frame, init_tracker_state_from_gt,
        run_image_sequence_pipelined)

    wb_h = scene_gen.WorldBounds(0.0, 0.6, 0.0, 0.6, 0.0, 0.6001)
    pts_world_h = np.asarray(
        scene_gen.generate_grid_points(wb_h, (0.5, 0.5, 0.5), 0.2))
    center_h = np.array([0.3, 0.3, 0.3])
    n_host = 24 if smoke else 200
    gt_cfw_world_h = scene_gen.oscillate_right_and_left(
        center_h + np.array([0, -1.5, 0]), center_h, (0, 0, 1),
        max_deviation=0.3, periods_count=2,
        shots_per_period=100, const_view_dir=True)   # smoke plays a prefix
    gt_cfw_h = gt_poses_in_tracker_frame(gt_cfw_world_h)
    tfw_h = SE3(gt_cfw_world_h.R[0], gt_cfw_world_h.t[0])
    pts_h = np.asarray(pts_world_h @ np.asarray(tfw_h.R).T
                       + np.asarray(tfw_h.t))
    cam_h = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                   (0.01, 0.01))
    params_h = make_params(cam_h, None, dt=1.0,
                           process_noise_lin_veloc_std=0.02,
                           process_noise_ang_veloc_std=0.005,
                           measurm_noise_std_pix=1.0,
                           sal_pnt_init_inv_dist=0.6,
                           sal_pnt_init_inv_dist_std=0.6, dtype=dtype)

    def _render_host(f):
        # vectorized host splat render (same world/blob model as the tests)
        H, W = 240, 320
        R = np.asarray(gt_cfw_h.R[f])
        t = np.asarray(gt_cfw_h.t[f])
        xc = pts_h @ R.T + t
        vis = xc[:, 2] > 1e-6
        pix = np.asarray(camera.project_camera_point(
            cam_h, None, jnp.asarray(xc)))
        rng_h = np.random.default_rng(0)
        img = rng_h.uniform(20, 60, size=(H, W))
        ys, xs = np.mgrid[0:H, 0:W]
        for k in np.nonzero(vis)[0]:
            x, y = pix[k]
            if -10 < x < W + 10 and -10 < y < H + 10:
                img += 170.0 * np.exp(
                    -((xs - x) ** 2 + (ys - y) ** 2) / (2 * 1.8 ** 2))
        return np.clip(img, 0, 255).astype(np.uint8)

    with _tf.TemporaryDirectory() as td_h:
        with jax.default_device(jax.devices("cpu")[0]):
            # pin projection math to local CPU: 200 eager tunnel dispatches
            # would add minutes of pure latency
            for f in range(n_host):
                save_picture(os.path.join(td_h, f"{f:06d}.pgm"),
                             _render_host(f))

        def run_hostloop(rep):
            tracker = MonoSlamFilter(params_h, capacity=48, update_impl=1)
            matcher = ImageTemplCornersMatcher(
                tracker, templ_width=15, search_radius=10,
                min_corr_coeff=0.6, detector_max_corners=48,
                min_distance_new_to_tracked=15.0)
            # seed GT initial velocity (reference perfect-init-vel switch);
            # the tiny rep-dependent perturbation defeats the tunnel's
            # (executable, args) memoization across reps
            st0 = init_tracker_state_from_gt(tracker, gt_cfw_h)
            st0 = st0._replace(x=st0.x.at[7:10].add(1e-6 * rep))
            with FrameLoader(td_h, prefetch_depth=4) as fl:
                frames_iter = (np.asarray(img, np.float32)
                               for _, img in fl)
                st, stats = run_image_sequence_pipelined(
                    tracker, matcher, frames_iter, st0)
            _ = float(jnp.sum(st.x))           # force completion
            return st, stats

        run_hostloop(0)                        # compile warm
        ts_h = []
        stats_h = None
        for r in (1, 2):
            t0 = time.perf_counter()
            _st_h, stats_h = run_hostloop(r)
            ts_h.append(time.perf_counter() - t0)
        hostloop_fps = n_host / (min(ts_h) - rtt)
    pos_est_h = np.stack([np.asarray(s.cam_state[:3]) for s in stats_h])
    gt_pos_h = -np.einsum("fji,fj->fi", np.asarray(gt_cfw_h.R),
                          np.asarray(gt_cfw_h.t))[:n_host]
    hostloop_ate = float(aligned_rmse(jnp.asarray(pos_est_h),
                                      jnp.asarray(gt_pos_h)))
    hostloop_matched = int(np.median(
        [int(np.asarray(s.obs_count)) for s in stats_h]))

    # ---- on-device Pallas NCC parity vs the XLA conv path (one frame) ----
    _progress("pallas-vs-xla NCC parity")
    from surikatoko_tpu.world.device_runner import render_frame
    from surikatoko_tpu.models.monoslam import measure
    from surikatoko_tpu.ops.ncc import ncc_search
    import functools as _ft
    img = render_frame(params_big, sc_big, jnp.asarray(1))
    h, _, _ = measure.measurement_jacobians(params_big, st_big.x)
    search = lambda use_p, subpix=False: jax.jit(_ft.partial(
        ncc_search, search_radius=7, min_corr_coeff=0.6,
        use_pallas=use_p, subpixel=subpix))(img, h, templates,
                                            st_big.lm_active)
    # the Pallas kernel is TPU-only; the smoke pass compares XLA vs itself
    rp, rx = search(not smoke), search(False)
    both = jnp.logical_and(rp.matched, rx.matched)
    pallas_maxdiff = float(jnp.max(jnp.where(
        both, jnp.abs(rp.best_corr - rx.best_corr), 0.0)))
    center_agree = float(jnp.mean(jnp.where(
        both, jnp.all(rp.best_center == rx.best_center, axis=-1), True)))
    # subpixel parity ON-CHIP: the Pallas kernel's surface-sourced neighbour
    # emission (round 5) must refine to the same float centers as the XLA
    # conv-surface gather (interpret-mode parity can't exercise the real
    # Mosaic lowering)
    rps, rxs = search(not smoke, True), search(False, True)
    both_s = jnp.logical_and(rps.matched, rxs.matched)
    subpix_center_maxdiff = float(jnp.max(jnp.where(
        both_s[:, None], jnp.abs(rps.best_center - rxs.best_center), 0.0)))

    # ---- at-scale sparse Schur BA: % of roofline + LM iters/s ----
    # (driver-captured versions of the analysis/roofline_schur.py numbers:
    # the BASELINE north-star asks >=60% of the measured ceiling for the
    # Schur solve and quotes "BA iters/sec" as the dino/at-scale metric)
    import functools
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "analysis"))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "demos"))
    from roofline_schur import _time_compiled
    from demo_ba_at_scale import build_problem
    from surikatoko_tpu.models.ba import sparse as sp

    reps = 3
    _progress("matmul ceiling (f32 accumulation)")
    n_mm, k_mm = (512, 2) if smoke else (4096, 8)
    b_mm = jax.random.normal(jax.random.PRNGKey(1), (n_mm, n_mm), dtype)
    a_mm = jax.random.normal(jax.random.PRNGKey(0), (n_mm, n_mm), dtype)

    def chain(x, y):
        def body(c, _):
            return y @ c * 1e-3, None
        out, _ = jax.lax.scan(body, x, None, length=k_mm)
        return out

    t_mm = _time_compiled(chain, lambda r: (a_mm * (1.0 + 0.01 * r), b_mm),
                          reps)
    ceiling = 2.0 * k_mm * n_mm ** 3 / t_mm

    _progress("building 10k x 500 sparse BA problem")
    NP_BA, F_BA, L_BA, PC = ((2048, 64, 8, 256) if smoke
                             else (10_000, 500, 12, 2048))
    ps, fidx_host, mask_host = build_problem(
        NP_BA, F_BA, L_BA, noise_pix=0.5, seed=0, dtype=dtype,
        return_host_inputs=True)
    blocks = jax.jit(sp.compute_blocks)(ps)
    jax.block_until_ready(blocks.E)
    hf = jnp.asarray(1e-4, dtype)

    _progress("timing full-width Schur solve (pct of ceiling)")
    solve_full = functools.partial(
        sp.solve_corrections_schur_sparse, point_chunk=PC)
    t_solve = _time_compiled(
        solve_full, lambda r: (ps, blocks, hf * (1.0 + 1e-6 * r)), reps)
    # analytic FLOPs (see analysis/roofline_schur.py:179-194): Gram strips
    # + reduced Cholesky; XLA cost_analysis undercounts fori_loop bodies
    nF = 10 * F_BA
    n_chunks = -(-NP_BA // PC)
    f_solve = (n_chunks * 2.0 * (3 * PC) * nF ** 2
               + nF ** 3 / 3.0 + 2.0 * nF ** 2)
    schur_pct = 100.0 * (f_solve / t_solve) / ceiling

    _progress("timing banded blocks+solve kernel rate")
    plan = sp.plan_bands(fidx_host, mask_host, PC, ps.n_frames)
    solve_band = functools.partial(sp.solve_corrections_schur_banded,
                                   plan=plan)
    t_band = _time_compiled(
        solve_band, lambda r: (ps, blocks, hf * (1.0 + 1e-6 * r)), reps)
    t_blocks = _time_compiled(
        sp.compute_blocks,
        lambda r: (ps._replace(points=ps.points * (1.0 + 1e-6 * r)),), reps)
    # kernel-level rate: derivative rebuild + ONE damped banded solve only
    # (no err eval / apply / damping retries) — kept as its own key;
    # ba_iters_per_s below is the honest full-LM number (VERDICT r3 item 6)
    ba_solve_blocks_per_s = 1.0 / (t_band + t_blocks)

    # ---- honest full-LM iteration rate: the one-dispatch device LM
    # (blocks + damped solves incl. rejected trials + err evals + apply +
    # rollback bookkeeping) on the same 10k x 500 problem — what BASELINE
    # means by "BA iters/sec" ----
    _progress("timing full-LM BA iteration rate (device loop)")
    from surikatoko_tpu.models.ba import SparseBundleAdjustment, TermCriteria
    ba_full = SparseBundleAdjustment(optimize_intrinsics=False,
                                     point_chunk=PC, device_loop=True)
    ba_full.set_plan_inputs(fidx_host, mask_host)
    term_fixed = TermCriteria(allowed_reproj_err_rel_change=None,
                              max_iters=3 if smoke else 8)
    ok_w, _p_w = ba_full.compute(ps, term_fixed)          # compile + warm
    t0 = time.perf_counter()
    ok_t, _p_t = ba_full.compute(
        ps._replace(points=ps.points * (1.0 + 1e-6)), term_fixed)
    t_lm = time.perf_counter() - t0 - rtt
    ba_iters_per_s = ba_full.iterations / max(t_lm, 1e-9)
    ba_trials_per_s = ba_full.trials / max(t_lm, 1e-9)

    # ---- dino-scale BA (BASELINE names dino explicitly): the reference's
    # full 36x4983 shape (demo-bundle-adj-dinosaur.cpp:97,:116) as the
    # real-format synthetic through the REAL parse path (io/dino.py),
    # f32 on-chip, device-loop LM ----
    _progress("dino 36x4983 full-shape BA (real-format parse path, sparse LM)")
    import tempfile
    from surikatoko_tpu.io import dino as dino_mod
    n_dino = 500 if smoke else 4983
    Ps_d, obs_d, mask_d, gt_d = dino_mod.synthetic_dino_raw(
        n_frames=36, n_points=n_dino, vary_track_len=True)
    keep_d = mask_d.sum(axis=1) >= 2
    with tempfile.TemporaryDirectory() as td:
        dino_mod.write_dino_files(td, Ps_d, obs_d[keep_d], mask_d[keep_d],
                                  gt_points=gt_d[keep_d])
        # track-major sparse store: the real dino tracks average ~3.6 obs
        # over 36 frames (dense grid ~10% occupied) — exactly the sparse
        # LM's case. The dense path stays as a parity test
        # (tests/test_io_fixtures.py::test_load_dino_problem_sparse_...)
        p_dino, fidx_d, tmask_d = dino_mod.load_dino_problem_sparse(
            td, f0=600.0)
        gt_dino = dino_mod.load_gt_points(td)
    ba_dino = SparseBundleAdjustment(device_loop=True, band=False,
                                     point_chunk=1024)
    ba_dino.set_plan_inputs(fidx_d, tmask_d)
    term_dino = TermCriteria(allowed_reproj_err_rel_change=None,
                             max_iters=3 if smoke else 8)
    ok_d, p_d1 = ba_dino.compute_inplace(p_dino, term_dino)   # compile+warm
    t0 = time.perf_counter()
    ok_d, _ = ba_dino.compute_inplace(
        p_dino._replace(points=p_dino.points * (1.0 + 1e-6)), term_dino)
    t_dino = time.perf_counter() - t0 - rtt
    dino_ba_iters_per_s = ba_dino.iterations / max(t_dino, 1e-9)
    # converge (reference stop criterion) from the warmed state for the map
    ok_d2, p_d2 = ba_dino.compute_inplace(p_d1, TermCriteria(
        allowed_reproj_err_rel_change=4.56e-8, max_iters=40))
    dino_map_ate = float(aligned_rmse(p_d2.points, jnp.asarray(
        gt_dino, p_d2.points.dtype)))

    # ---- MVF at-scale closed loop as a driver artifact (VERDICT r3 item
    # 2): reduced-but-representative size; the full 10k x 512 README run
    # uses the same code path (demos/demo_mvf_at_scale.py) ----
    _progress("MVF at-scale closed loop (reduced size)")
    import contextlib
    from demo_mvf_at_scale import make_args, run_at_scale
    with contextlib.redirect_stdout(sys.stderr):
        # the demo narrates per-stage progress on stdout; bench's stdout
        # contract is ONE JSON line
        mvf_res = run_at_scale(make_args(
            points=300 if smoke else 2048,
            frames=40 if smoke else 128,
            revisit_frames=8 if smoke else 12,
            window_ba_every=8 if smoke else 5,
            global_ba_every=20 if smoke else 32,
            ba_iters=3 if smoke else 5,
            final_polish_iters=10 if smoke else 30,
            f32=True))

    print(json.dumps({
        "metric": "monoslam_scenario03_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
        "ate_rmse": round(ate, 6),
        "imageseq_fps_k768": round(fps_big, 2),
        "imageseq_ate_rmse_k768": round(ate_big, 6),
        "imageseq_matched_med_k768": n_match_med,
        "imageseq_recruited_total": recruited_total,
        "imageseq_active_med": active_med,
        "imageseq_gen_max": gen_max,
        "imageseq_ate_norecruit_k768": round(ate_norecruit, 6),
        "sharded_pallas_matched_absdiff": sharded_matched_absdiff,
        "sharded_pallas_pos_maxdiff": round(sharded_pos_maxdiff, 8),
        "imageseq_hostloop_fps": round(hostloop_fps, 2),
        "imageseq_hostloop_ate": round(hostloop_ate, 6),
        "imageseq_hostloop_matched_med": hostloop_matched,
        "unmitigated_f32_degraded": unmit_degraded,
        "unmitigated_f32_first_bad_frame": first_bad,
        "unmitigated_f32_min_diag_P": min_diag_u,
        "unmitigated_f32_matched_late": matched_late,
        "ncc_pallas_maxdiff": pallas_maxdiff,
        "ncc_pallas_center_agreement": round(center_agree, 4),
        "ncc_subpix_center_maxdiff": round(subpix_center_maxdiff, 6),
        "schur_pct_of_ceiling": round(schur_pct, 1),
        "ba_iters_per_s": round(ba_iters_per_s, 2),
        "ba_trials_per_s": round(ba_trials_per_s, 2),
        "ba_solve_blocks_per_s": round(ba_solve_blocks_per_s, 2),
        "dino_ba_iters_per_s": round(dino_ba_iters_per_s, 2),
        "dino_map_ate": round(dino_map_ate, 6),
        "mvf_at_scale_fps": mvf_res["frames_per_s_integration"],
        "mvf_end_to_end_fps": mvf_res["frames_per_s_end_to_end"],
        "mvf_end_to_end_fps_steady": mvf_res["frames_per_s_end_to_end_steady"],
        "mvf_ba_iters_per_s_in_pipeline": mvf_res["value"],
        "mvf_final_ate": mvf_res["traj_ate_rmse"],
        "mvf_map_ate": mvf_res["map_ate_rmse"],
        "mvf_ate_pre_closure": mvf_res["traj_ate_pre_closure"],
        "mvf_loop_closed": mvf_res["loop_closed"],
        "mvf_closure_pairs_total": mvf_res["closure_pairs_total"],
        "mvf_closure_pairs_correct": mvf_res["closure_pairs_correct"],
        "mvf_closure_inliers": mvf_res["closure_inliers"],
        "matmul_ceiling_tflops": round(ceiling / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
