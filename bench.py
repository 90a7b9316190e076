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
  imageseq_fps_k768      real-perception loop (render + Pallas NCC + EKF) at
                         the ~1k-landmark regime (BASELINE configs[3])
  imageseq_ate_rmse_k768 its trajectory ATE
  ncc_pallas_maxdiff     on-device Pallas-vs-XLA NCC parity (max |corr diff|
                         over matched slots of one rendered frame)
  schur_pct_of_ceiling   full-width 10k x 500 sparse Schur solve as % of the
                         chip's measured f32-accumulation matmul ceiling
                         (BASELINE north-star: >= 60)
  ba_iters_per_s         banded-Schur LM iteration rate (derivative rebuild +
                         damped solve) at 10k x 500 (BASELINE "BA iters/sec")
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

    capacity = 96
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
    CHUNK = 300   # large chunks amortize the per-dispatch latency of the
    frames0 = jnp.arange(1, 1 + CHUNK)   # remote TPU tunnel (~tens of ms)

    # warmup / compile
    _progress("compiling scenario03 scan runner")
    st, errs, cam_pos = run(state, sc, frames0, jax.random.PRNGKey(1))
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
            cur, errs, _ = run(cur, sc, jnp.arange(lo, lo + CHUNK),
                               jax.random.PRNGKey(c + 2 + 7 * r))
        _ = float(jnp.sum(cur.x))  # forces completion of the whole chain
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] - rtt

    fps = n_chunks * CHUNK / dt

    # ---- the ~1k-landmark regime with REAL perception (BASELINE configs[3]):
    # render -> ellipse-gated Pallas NCC -> fused EKF, K=768, 640x480 ----
    from surikatoko_tpu.world.device_runner import (
        build_imageseq_scenario, init_imageseq, make_imageseq_scan_runner)

    _progress("building K=768 imageseq scenario")
    K_big = 768
    cam_big = camera.make_intrinsics((640, 480), (320.0, 240.0), 1.95,
                                     (0.005, 0.005), dtype=dtype)
    # max_undetected_frames + covar_diag_inflation: without them the f32
    # innovation goes indefinite after ~120 chained K=768 frames (stale
    # landmark blocks inflate unboundedly) — measured 2026-08-19
    params_big = make_params(cam_big, None, dt=1.0,
                             process_noise_lin_veloc_std=0.075,
                             process_noise_ang_veloc_std=0.01,
                             max_undetected_frames=60,
                             covar_diag_inflation=1e-6, dtype=dtype)
    sc_big = build_imageseq_scenario(capacity=K_big, dtype=dtype,
                                     image_size=(640, 480))
    st_big = init_state(K_big, dtype=dtype)
    st_big, templates = jax.jit(lambda st: init_imageseq(
        params_big, sc_big, st, 15))(st_big)
    run_big = make_imageseq_scan_runner(params_big, templ_width=15)
    CH_BIG = 120
    fr_big = jnp.arange(1, 1 + CH_BIG)
    _progress("compiling K=768 imageseq runner")
    st1, (err_b, n_b, pos_b) = run_big(st_big, templates, sc_big, fr_big)
    _ = float(jnp.sum(st1.x))                     # force completion
    ts_big = []
    for r in range(3):                            # median rides out transients
        t0 = time.perf_counter()
        st2, (err_b, n_b, pos_b) = run_big(
            st_big._replace(x=st_big.x * (1.0 + 1e-6 * (r + 1))),
            templates, sc_big, fr_big)
        _ = float(jnp.sum(st2.x))
        ts_big.append(time.perf_counter() - t0)
    dt_big = sorted(ts_big)[1] - rtt
    fps_big = CH_BIG / dt_big
    gt_pos_b = -jnp.einsum("fji,fj->fi", sc_big.gt_cfw_R[fr_big],
                           sc_big.gt_cfw_t[fr_big])
    ate_big = float(aligned_rmse(pos_b, gt_pos_b))
    n_match_med = int(jnp.median(n_b))

    # ---- on-device Pallas NCC parity vs the XLA conv path (one frame) ----
    _progress("pallas-vs-xla NCC parity")
    from surikatoko_tpu.world.device_runner import render_frame
    from surikatoko_tpu.models.monoslam import measure
    from surikatoko_tpu.ops.ncc import ncc_search
    import functools as _ft
    img = render_frame(params_big, sc_big, jnp.asarray(1))
    h, _, _ = measure.measurement_jacobians(params_big, st_big.x)
    search = lambda use_p: jax.jit(_ft.partial(
        ncc_search, search_radius=7, min_corr_coeff=0.6,
        use_pallas=use_p))(img, h, templates, st_big.lm_active)
    rp, rx = search(True), search(False)
    both = jnp.logical_and(rp.matched, rx.matched)
    pallas_maxdiff = float(jnp.max(jnp.where(
        both, jnp.abs(rp.best_corr - rx.best_corr), 0.0)))
    center_agree = float(jnp.mean(jnp.where(
        both, jnp.all(rp.best_center == rx.best_center, axis=-1), True)))

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
    # BENCH_SMOKE=1: tiny shapes for a CPU correctness pass of this section
    smoke = os.environ.get("BENCH_SMOKE", "") == "1"
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
    ps = build_problem(NP_BA, F_BA, L_BA, noise_pix=0.5, seed=0, dtype=dtype)
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

    _progress("timing banded BA iteration rate")
    plan = sp.plan_bands(ps.frame_idx, ps.obs_mask, PC, ps.n_frames)
    solve_band = functools.partial(sp.solve_corrections_schur_banded,
                                   plan=plan)
    t_band = _time_compiled(
        solve_band, lambda r: (ps, blocks, hf * (1.0 + 1e-6 * r)), reps)
    t_blocks = _time_compiled(
        sp.compute_blocks,
        lambda r: (ps._replace(points=ps.points * (1.0 + 1e-6 * r)),), reps)
    ba_iters_per_s = 1.0 / (t_band + t_blocks)

    print(json.dumps({
        "metric": "monoslam_scenario03_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
        "ate_rmse": round(ate, 6),
        "imageseq_fps_k768": round(fps_big, 2),
        "imageseq_ate_rmse_k768": round(ate_big, 6),
        "imageseq_matched_med_k768": n_match_med,
        "ncc_pallas_maxdiff": pallas_maxdiff,
        "ncc_pallas_center_agreement": round(center_agree, 4),
        "schur_pct_of_ceiling": round(schur_pct, 1),
        "ba_iters_per_s": round(ba_iters_per_s, 2),
        "matmul_ceiling_tflops": round(ceiling / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
