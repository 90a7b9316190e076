"""Benchmark: MonoSlam EKF frames/sec/chip on a scenario03-sized problem.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference implies a 30 fps real-time target on host CPU for the
Davison sequence (dT=1/30 s, demo-monoslam-imageseq.json; SURVEY §6) —
vs_baseline = fps / 30.

Runs on the default JAX platform (the real TPU chip under the driver); the
whole frame step (predict + stacked update over a full landmark set +
health checks) is one jitted program, measured steady-state.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from surikatoko_tpu.models.monoslam.filter import _process_frame
    from __graft_entry__ import _make_problem

    capacity = 96           # production-ish landmark set (imageseq scale)
    dtype = jnp.float32
    params, state, obs, obs_mask = _make_problem(capacity, dtype)
    new_pix = jnp.zeros((8, 2), dtype)
    new_mask = jnp.zeros((8,), bool)
    new_rho = jnp.full((8,), jnp.nan, dtype)

    step = jax.jit(functools.partial(_process_frame, params, 1))

    # warmup / compile
    st, stats = step(state, obs, obs_mask, new_pix, new_mask, new_rho)
    jax.block_until_ready(st)

    # steady-state: chain the state like the real tracker does
    n_iter = 200
    t0 = time.perf_counter()
    cur = st
    for _ in range(n_iter):
        cur, _ = step(cur, obs, obs_mask, new_pix, new_mask, new_rho)
    jax.block_until_ready(cur)
    dt = time.perf_counter() - t0

    fps = n_iter / dt
    print(json.dumps({
        "metric": "monoslam_ekf_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
