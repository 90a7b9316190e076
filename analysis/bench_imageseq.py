"""On-device imageseq closed-loop throughput (render + Pallas NCC + EKF).

The README's "real-perception imageseq loop" number comes from here. Run on
TPU (default env):  python analysis/bench_imageseq.py [--capacity 96]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=96)
    ap.add_argument("--chunk", type=int, default=300)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--no_pallas", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.models.monoslam import make_params, init_state
    from surikatoko_tpu.world.device_runner import (
        build_imageseq_scenario, init_imageseq, make_imageseq_scan_runner)

    dtype = jnp.float32
    sc = build_imageseq_scenario(capacity=args.capacity, dtype=dtype)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01), dtype=dtype)
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01, dtype=dtype)
    state = init_state(args.capacity, dtype=dtype)
    templ_width = 15
    state, templates = init_imageseq(params, sc, state, templ_width)
    run = make_imageseq_scan_runner(params, templ_width=templ_width,
                                    use_pallas=not args.no_pallas)

    F = int(sc.gt_cfw_R.shape[0])
    st, (err, n, _) = run(state, templates, sc, jnp.arange(1, 1 + args.chunk))
    jax.block_until_ready(st)
    assert bool(jnp.all(jnp.isfinite(err))), "non-finite residuals"
    print(f"warmup: matched min={int(jnp.min(n))} max={int(jnp.max(n))} "
          f"err last={float(err[-1]):.3f}px")

    # scalar-fetch round-trip (block_until_ready does not reliably block on
    # the remote tunnel; a host fetch does), subtracted from the run
    tiny = jax.jit(lambda v: jnp.sum(v))
    _ = float(tiny(st.x))
    rtts = []
    for r in range(5):
        t0 = time.perf_counter()
        _ = float(tiny(st.x * (1.0 + r)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[2]

    ts = []
    for r in range(3):             # median of 3 runs rides out transients
        cur = st._replace(x=st.x * (1.0 + 1e-9 * (r + 1)))
        jax.block_until_ready(cur.x)
        t0 = time.perf_counter()
        for c in range(args.chunks):
            lo = 1 + ((c + 1) * args.chunk) % (F - args.chunk - 1)
            cur, out = run(cur, templates, sc,
                           jnp.arange(lo, lo + args.chunk))
        _ = float(jnp.sum(cur.x))  # forces completion of the whole chain
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[1] - rtt
    fps = args.chunks * args.chunk / dt
    print(f"imageseq on-device loop: {fps:.1f} frames/s "
          f"(K={args.capacity}, pallas={not args.no_pallas})")


if __name__ == "__main__":
    main()
