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

    # EKF covariance math needs true f32 accumulation: the TPU default
    # (bf16 matmul inputs) destroys the innovation Cholesky after ~50 chained
    # updates. "highest" = f32 via bf16x6 passes on the MXU.
    jax.config.update("jax_default_matmul_precision", "highest")

    from surikatoko_tpu.models.monoslam.filter import _process_frame
    from __graft_entry__ import _make_problem

    capacity = 96           # production-ish landmark set (imageseq scale)
    dtype = jnp.float32
    params, state, obs, obs_mask = _make_problem(capacity, dtype)
    new_pix = jnp.zeros((8, 2), dtype)
    new_mask = jnp.zeros((8,), bool)
    new_rho = jnp.full((8,), jnp.nan, dtype)

    step = functools.partial(_process_frame, params, 1)

    # on-device frame loop: lax.scan chains CHUNK frame steps in one program
    # (the steady-state tracking loop; host dispatch amortized away)
    CHUNK = 50

    @jax.jit
    def run_chunk(st):
        def body(s, _):
            s, stats = step(s, obs, obs_mask, new_pix, new_mask, new_rho)
            return s, stats.opt_reproj_err
        return jax.lax.scan(body, st, None, length=CHUNK)

    st, errs = run_chunk(state)   # warmup / compile
    jax.block_until_ready(st)
    assert bool(jnp.all(jnp.isfinite(errs))), "non-finite residuals in bench"

    n_chunks = 8
    t0 = time.perf_counter()
    cur = st
    for _ in range(n_chunks):
        cur, _ = run_chunk(cur)
    jax.block_until_ready(cur)
    dt = time.perf_counter() - t0

    fps = n_chunks * CHUNK / dt
    print(json.dumps({
        "metric": "monoslam_ekf_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
