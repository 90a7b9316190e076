"""Isolate the churned-imageseq bench regressions (round 4): times the
K=768 imageseq runner across scenario/recruit configurations on the real
chip, counts recruitment, and runs the unmitigated-f32 control on the
round-3 scenario long enough to (not) reproduce the documented failure.

  python analysis/profile_churn.py            # TPU (default env)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.models.monoslam import make_params, init_state
    from surikatoko_tpu.world.device_runner import (
        build_imageseq_scenario, init_imageseq, make_imageseq_scan_runner)

    dtype = jnp.float32
    K = 768
    cam = camera.make_intrinsics((640, 480), (320.0, 240.0), 1.95,
                                 (0.005, 0.005), dtype=dtype)

    def mk_params(mit=True):
        kw = dict(max_undetected_frames=30, covar_diag_inflation=1e-6) \
            if mit else {}
        return make_params(cam, None, dt=1.0,
                           process_noise_lin_veloc_std=0.075,
                           process_noise_ang_veloc_std=0.01,
                           sal_pnt_init_inv_dist=0.5,
                           sal_pnt_init_inv_dist_std=0.5,
                           dtype=dtype, **kw)

    def run_cfg(tag, sc_kw, recruit, frames_lo, n_frames=120, mit=True,
                **run_kw):
        params = mk_params(mit)
        sc = build_imageseq_scenario(capacity=K, dtype=dtype,
                                     image_size=(640, 480), **sc_kw)
        st = init_state(K, dtype=dtype)
        boot = run_kw.pop("max_bootstrap", None)
        st, tm = jax.jit(lambda s: init_imageseq(
            params, sc, s, 15, max_bootstrap=boot))(st)
        run = make_imageseq_scan_runner(params, templ_width=15,
                                        recruit=recruit, **run_kw)
        # warm on the first window, then time the NEXT window from the
        # warmed state (reps perturb the state; re-running the SAME frames
        # from an evolved state would desynchronize filter and imagery and
        # make the matched counts meaningless)
        fr_warm = jnp.arange(frames_lo, frames_lo + n_frames)
        fr = fr_warm + n_frames
        t0 = time.time()
        out = run(st, tm, sc, fr_warm)
        if recruit:
            st2, tm2, _ = out
        else:
            st2, _ = out
            tm2 = tm
        _ = float(jnp.sum(st2.x))
        t_compile = time.time() - t0
        ts = []
        for r in range(2):
            t0 = time.time()
            out = run(st2._replace(x=st2.x * (1.0 + 1e-6 * (r + 1))),
                      tm2, sc, fr)
            if recruit:
                st3, _, (err, n, pos, nrec, nact) = out
            else:
                st3, (err, n, pos) = out
            _ = float(jnp.sum(st3.x))
            ts.append(time.time() - t0)
        dt = min(ts)
        extra = ""
        if recruit:
            extra = (f" recruited={int(jnp.sum(nrec))}"
                     f" active_med={int(jnp.median(nact))}")
        finite = bool(jnp.all(jnp.isfinite(st3.x)))
        mind = float(jnp.min(jnp.diag(st3.P)))
        print(f"{tag}: {n_frames/dt:.1f} fps (compile+1st {t_compile:.0f}s)"
              f" matched_med={int(jnp.median(n))}{extra}"
              f" finite={finite} min_diag={mind:.2e}", flush=True)
        return st3

    # a) round-3 config, no recruit (the 116-fps reference point)
    run_cfg("r3-config no-recruit", {}, False, 1)
    # b) new churn scenario, no recruit (isolates scenario cost)
    churn_kw = dict(n_points=1024, bg_cell=48, max_deviation=1.0)
    run_cfg("churn-sc no-recruit", churn_kw, False, 1, max_bootstrap=700)
    # c) churn scenario + recruit, current bench settings
    run_cfg("churn-sc recruit c24", churn_kw, True, 1, max_bootstrap=700,
            recruit_max=8, detector_corners=24)
    # d) churn + recruit, larger candidate budget
    run_cfg("churn-sc recruit c64", churn_kw, True, 1, max_bootstrap=700,
            recruit_max=12, detector_corners=64)

    # e) unmitigated control on the ROUND-3 scenario, 300 frames
    params_u = mk_params(mit=False)
    sc_u = build_imageseq_scenario(capacity=K, dtype=dtype,
                                   image_size=(640, 480))
    st_u = init_state(K, dtype=dtype)
    st_u, tm_u = jax.jit(lambda s: init_imageseq(params_u, sc_u, s, 15))(st_u)
    run_u = make_imageseq_scan_runner(params_u, templ_width=15)
    for c in range(3):
        fr = jnp.arange(1 + 100 * c, 101 + 100 * c)
        st_u, (err_u, n_u, pos_u) = run_u(st_u, tm_u, sc_u, fr)
        finite = bool(jnp.all(jnp.isfinite(pos_u)))
        mind = float(jnp.min(jnp.diag(st_u.P)))
        print(f"unmitigated r3-config frames {100*(c+1)}: finite={finite} "
              f"min_diag={mind:.3e} "
              f"matched_med={int(jnp.median(n_u))}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
