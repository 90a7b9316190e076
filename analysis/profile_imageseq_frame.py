"""Stage profile of the K-landmark imageseq frame (bench.py `imageseq_fps_k768`
hot path): render -> Jacobians -> A = H P -> T = A H^T -> search-ellipse
extraction -> Pallas NCC -> fused update+health+predict, each stage timed as
its own lax.scan on the current backend (TPU by default).

The at-scale breakdown in docs/SCALING.md §2b comes from this script.

    python analysis/profile_imageseq_frame.py [--capacity 768] [--iters 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=768)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.models.monoslam import (fused_step, make_params,
                                                init_state, measure, update)
    from surikatoko_tpu.ops.ncc import ncc_search
    from surikatoko_tpu.world.device_runner import (
        build_imageseq_scenario, init_imageseq, make_imageseq_scan_runner,
        render_frame)

    Kcap = args.capacity
    dtype = jnp.float32
    cam = camera.make_intrinsics((640, 480), (320.0, 240.0), 1.95,
                                 (0.005, 0.005), dtype=dtype)
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01,
                         max_undetected_frames=60,
                         covar_diag_inflation=1e-6, dtype=dtype)
    sc = build_imageseq_scenario(capacity=Kcap, dtype=dtype,
                                 image_size=(640, 480))
    state = init_state(Kcap, dtype=dtype)
    state, templates = jax.jit(lambda s: init_imageseq(params, sc, s, 15))(
        state)

    N = args.iters

    tiny = jax.jit(lambda v: jnp.sum(v))
    _ = float(tiny(state.x))
    rtts = []
    for r in range(5):
        t0 = time.perf_counter()
        _ = float(tiny(state.x * (1.0 + r)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]
    print(f"fetch rtt {rtt * 1e3:.1f} ms; K={Kcap} D={state.x.shape[0]} "
          f"N={N} iters/scan")

    def timed(name, body, init):
        @jax.jit
        def run(init):
            out = jax.lax.scan(lambda c, _: (body(c), None), init,
                               None, length=N)[0]
            return jnp.sum(out[0]) + jnp.sum(out[1][:8])
        _ = float(run(init))
        ts = []
        for r in range(3):
            # perturbation above f32 eps: the tunnel memoizes identical
            # (executable, args) executions
            fresh = (init[0] * (1.0 + 1e-6 * (r + 1)), init[1])
            jax.block_until_ready(fresh)
            t0 = time.perf_counter()
            _ = float(run(fresh))
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1] - rtt
        print(f"{name:36s} {dt / N * 1e3:9.3f} ms/iter", flush=True)
        return dt / N

    # Pallas NCC is TPU-only; the XLA conv path is bit-tested against it
    use_pallas = jax.default_backend() != "cpu"

    # ---- FULL frame (reference point) ----
    run_full = make_imageseq_scan_runner(params, templ_width=15,
                                         use_pallas=use_pallas)
    frames = jnp.arange(1, 1 + N)
    st1, _ = run_full(state, templates, sc, frames)
    _ = float(jnp.sum(st1.x))
    ts = []
    for r in range(3):
        st2 = state._replace(x=state.x * (1.0 + 1e-6 * (r + 1)))
        jax.block_until_ready(st2.x)
        t0 = time.perf_counter()
        st3, _ = run_full(st2, templates, sc, frames)
        _ = float(jnp.sum(st3.x))
        ts.append(time.perf_counter() - t0)
    full_ms = (sorted(ts)[1] - rtt) / N
    print(f"{'FULL imageseq frame_body':36s} {full_ms * 1e3:9.3f} ms/iter",
          flush=True)

    x, P = state.x, state.P
    f1 = jnp.asarray(1)

    # frozen per-stage inputs (computed once at the init state)
    img0 = jax.jit(lambda: render_frame(params, sc, f1))()
    h0, Hcam0, Hlm0 = jax.jit(
        lambda xx: measure.measurement_jacobians(params, xx))(x)
    A0 = jax.jit(lambda PP: update.hp_auto(Hcam0, Hlm0, PP))(P)
    T0 = jax.jit(lambda: update.aht_auto(A0, Hcam0, Hlm0))()
    eye2 = jnp.eye(2, dtype=dtype)

    timed("scan floor (P pass-through)",
          lambda c: (c[0] + 1e-30, c[1] * 1.0), (x, P))

    def render_only(c):
        img = render_frame(params, sc, f1)
        return c[0].at[0].add(img[0, 0] * 1e-20), c[1]
    timed("  render_frame 640x480", render_only, (x, P))

    def jac_only(c):
        h, Hcam, Hlm = measure.measurement_jacobians(params, c[0])
        return c[0] + (h.sum() + Hcam.sum() + Hlm.sum()) * 1e-20, c[1]
    timed("  jacobians", jac_only, (x, P))

    def a_only(c):
        A = update.hp_auto(Hcam0, Hlm0, c[1])
        return c[0].at[:13].add(A[0, :13] * 1e-20), c[1]
    timed("  A = H P", a_only, (x, P))

    def t_only(c):
        T = update.aht_auto(A0 + c[0][0] * 1e-30, Hcam0, Hlm0)
        return c[0].at[:13].add(T[0, :13] * 1e-20), c[1]
    timed("  T = A H^T", t_only, (x, P))

    def ellipse_only(c):
        T_blocks = (T0 + c[0][0] * 1e-30).reshape(Kcap, 2, Kcap, 2)
        S2 = (jnp.einsum("kikj->kij", T_blocks)
              + params.measurm_noise_var * eye2)
        det = S2[:, 0, 0] * S2[:, 1, 1] - S2[:, 0, 1] * S2[:, 1, 0]
        det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        sigma_inv = (jnp.stack([
            jnp.stack([S2[:, 1, 1], -S2[:, 0, 1]], -1),
            jnp.stack([-S2[:, 1, 0], S2[:, 0, 0]], -1)], -2)
            / det[:, None, None])
        return c[0].at[:13].add(sigma_inv.reshape(-1)[:13] * 1e-20), c[1]
    timed("  2x2 ellipse extraction", ellipse_only, (x, P))

    sigma_inv0 = jax.jit(lambda: jnp.broadcast_to(
        jnp.linalg.inv(4.0 * eye2), (Kcap, 2, 2)))()

    def ncc_only(c):
        res = ncc_search(
            img0 + c[0][0] * 1e-30, h0, templates, state.lm_active,
            search_radius=7, min_corr_coeff=0.6, sigma_inv=sigma_inv0,
            chi2_gate=5.99146, use_pallas=use_pallas)
        return c[0].at[:2].add(res.best_center[0] * 1e-20), c[1]
    timed("  ncc_search" + (" (pallas)" if use_pallas else " (xla)"),
          ncc_only, (x, P))

    obs0 = h0
    mask0 = state.lm_active

    def fused_only(c):
        x2, P2, resid, _ = fused_step.fused_update_health_predict(
            params, c[0], c[1], obs0, mask0,
            precomputed=(h0, A0, T0),
            deactivate_mask=jnp.zeros((Kcap,), bool))
        return x2, P2 * 0 + c[1]
    timed("  fused update+health+predict", fused_only, (x, P))

    # ---- recruit stages (the round-4 lifecycle additions) ----
    from surikatoko_tpu.vision import features

    def detect_only(c):
        xy, ok = features.detect_corners(
            img0 + c[0][0] * 1e-30, max_corners=64, nms_radius=5,
            border=15, quality_level=0.05)
        return c[0].at[:2].add(xy[0] * 1e-20), c[1]
    timed("  detect_corners (recruit)", detect_only, (x, P))

    cand0 = jnp.broadcast_to(jnp.asarray([50.0, 50.0], dtype), (12, 2))
    valid0 = jnp.ones((12,), bool)
    free0 = jnp.zeros((Kcap,), bool).at[:16].set(True)

    def recruit_only(c):
        x2, P2, resid, _, slots = (
            fused_step.fused_update_health_recruit_predict(
                params, c[0], c[1], obs0, mask0, cand0, valid0, free0,
                precomputed=(h0, A0, T0),
                deactivate_mask=jnp.zeros((Kcap,), bool)))
        return x2, P2 * 0 + c[1]
    timed("  fused update + RECRUIT(12) + predict", recruit_only, (x, P))


if __name__ == "__main__":
    main()
