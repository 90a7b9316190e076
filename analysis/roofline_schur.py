"""Roofline measurement for the Schur-complement BA solve (BASELINE.md
north-star: distributed Schur >= 60% of roofline).

Methodology (single chip; the distributed kernel is the same per-shard code
plus one psum of the [10F,10F] reduced system):

1. Measure the chip's dense-matmul ceiling at the SAME matmul precision the
   solver runs under ("highest", i.e. f32 accumulation) — that empirical
   ceiling IS the roofline for this workload; quoting the bf16 spec number
   would be dishonest for an f32 solver.
2. Time the jitted sparse Schur solve (solve_corrections_schur_sparse) at the
   at-scale configuration (10k points x 500 frames, L=12), steady-state.
3. FLOPs for the solve are analytic (the Gram-form reduction matmuls + the
   reduced Cholesky; XLA's cost_analysis undercounts fori_loop bodies);
   FLOPs for the GN blocks come from XLA's cost model.
4. Report achieved TFLOP/s and % of the measured ceiling for both, i.e. how
   close the reference's "Ft.E.F is a hot spot"
   (bundle-adj-kanatani.cpp:1888) runs to this chip's speed of light.

Timing on the remote-attached TPU is subtle: see _time_compiled (execution
memoization + non-blocking block_until_ready both produce bogus numbers if
handled naively).

Run on TPU (default env):  python analysis/roofline_schur.py
CPU smoke:  env -u PYTHONPATH JAX_PLATFORMS=cpu python analysis/roofline_schur.py --points 2048 --frames 64 --reps 2
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


_RTT = None


def _measure_rtt(reps: int = 10) -> float:
    """Per-call host<->device round-trip of a trivial jitted scalar fetch
    (the remote-TPU tunnel adds ~25 ms; subtracted from every timing)."""
    global _RTT
    if _RTT is None:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda v: jnp.sum(v))
        x = jnp.ones((8,), jnp.float32)
        _ = float(f(x))
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            _ = float(f(x * (1.0 + r)))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        _RTT = ts[len(ts) // 2]
    return _RTT


def _time_compiled(fn, make_args, reps: int) -> float:
    """Median wall-clock seconds of a jitted pytree-returning fn (warmup
    excluded), measured robustly against the remote-TPU tunnel:

    - make_args(r) must return FRESH argument values per rep — the tunnel
      memoizes identical (executable, args) executions, so timing the same
      call twice measures a cache hit (microseconds), not the kernel;
    - jax.block_until_ready does NOT reliably block on remote execution, so
      fn is wrapped to also return a scalar checksum that is fetched to host
      (forcing completion); the separately-measured fetch round-trip is
      subtracted."""
    import jax
    import jax.numpy as jnp

    rtt = _measure_rtt()

    @jax.jit
    def fn_ck(*a):
        out = fn(*a)
        leaves = [jnp.sum(x) for x in jax.tree.leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                            jnp.floating)]
        return sum(leaves[:4])     # checksum depends on the outputs

    _ = float(fn_ck(*make_args(reps)))          # compile + warmup
    ts = []
    for r in range(reps):
        args = make_args(r)
        jax.block_until_ready(jax.device_put(args))
        time.sleep(0.01)                        # let the device queue drain
        t0 = time.perf_counter()
        _ = float(fn_ck(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return max(ts[len(ts) // 2] - rtt, 1e-9)


def _flops_of(fn, *args) -> float:
    """XLA cost-model FLOPs (valid only for loop-free programs)."""
    import jax
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):   # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=10_000)
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--track_len", type=int, default=12)
    ap.add_argument("--point_chunk", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--matmul_n", type=int, default=8192)
    ap.add_argument("--matmul_k", type=int, default=8,
                    help="chained matmuls per ceiling measurement (amortizes "
                         "dispatch latency)")
    ap.add_argument("--band", action="store_true",
                    help="measure the banded reduction (sparse.plan_bands)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    dtype = jnp.float32

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "demos"))
    from demo_ba_at_scale import build_problem
    from surikatoko_tpu.models.ba import sparse as sp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")

    # --- 1. empirical matmul ceiling at the solver's precision ---
    n, K = args.matmul_n, args.matmul_k
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), dtype)
    a0 = jax.random.normal(jax.random.PRNGKey(0), (n, n), dtype)

    @jax.jit
    def chain(x, y):
        def body(c, _):
            return y @ c * 1e-3, None   # scale keeps values finite
        out, _ = jax.lax.scan(body, x, None, length=K)
        return out

    t_mm = _time_compiled(chain, lambda r: (a0 * (1.0 + 0.01 * r), b),
                          args.reps)
    ceiling = 2.0 * K * n ** 3 / t_mm
    print(f"matmul ceiling ({K}x {n}x{n} f32-acc): {ceiling/1e12:.2f} "
          f"TFLOP/s ({t_mm*1e3:.2f} ms)")

    # --- 2. the at-scale sparse Schur solve ---
    ps = build_problem(args.points, args.frames, args.track_len,
                       noise_pix=0.5, seed=0, dtype=dtype)
    blocks = jax.jit(sp.compute_blocks)(ps)
    jax.block_until_ready(blocks.E)
    hf = jnp.asarray(1e-4, dtype)

    if args.band:
        plan = sp.plan_bands(ps.frame_idx, ps.obs_mask,
                             args.point_chunk, ps.n_frames)
        assert plan is not None, "banding not applicable to this problem"
        Wb, nb = plan.band_width, plan.n_banded_chunks
        no = ((plan.ext_idx.shape[0] - nb * plan.point_chunk)
              // plan.overflow_chunk)
        print(f"banded: W={Wb} of {ps.n_frames} frames, {nb} banded + "
              f"{no} overflow chunks (pc_ovf={plan.overflow_chunk})")
        solve = functools.partial(
            sp.solve_corrections_schur_banded, plan=plan)
    else:
        solve = functools.partial(
            sp.solve_corrections_schur_sparse, point_chunk=args.point_chunk)
    t_solve = _time_compiled(
        solve, lambda r: (ps, blocks, hf * (1.0 + 1e-6 * r)), args.reps)
    # analytic FLOPs (XLA's cost_analysis counts a fori_loop body once):
    # Gram reduction = n_chunks MXU products [10W,3pc]@[3pc,10W] (W = band
    # width, or F unbanded), plus the reduced-system Cholesky (10F)^3/3;
    # everything else is O(Np L) small.
    Np, F, L = ps.n_points, ps.n_frames, ps.track_len
    pc = args.point_chunk
    n_chunks = -(-Np // pc)
    nF = 10 * F
    if args.band:
        gram = (nb * 2.0 * (3 * pc) * (10 * Wb) ** 2     # banded strips
                + no * 2.0 * (3 * plan.overflow_chunk) * nF ** 2)  # overflow
    else:
        gram = n_chunks * 2.0 * (3 * pc) * nF ** 2       # B^T B strips
    f_solve = (gram
               + nF ** 3 / 3.0                           # cho_factor
               + 2.0 * nF ** 2)                          # cho_solve

    # --- 3. GN blocks (derivative rebuild — the other per-iteration cost) ---
    t_blocks = _time_compiled(
        sp.compute_blocks,
        lambda r: (ps._replace(points=ps.points * (1.0 + 1e-6 * r)),),
        args.reps)
    f_blocks = _flops_of(sp.compute_blocks, ps)

    eff_solve = f_solve / t_solve
    eff_blocks = f_blocks / t_blocks
    print(f"schur solve : {t_solve*1e3:8.2f} ms  {f_solve/1e9:8.2f} GFLOP  "
          f"-> {eff_solve/1e12:.2f} TFLOP/s  ({100*eff_solve/ceiling:.1f}% "
          f"of ceiling)")
    print(f"GN blocks   : {t_blocks*1e3:8.2f} ms  {f_blocks/1e9:8.2f} GFLOP  "
          f"-> {eff_blocks/1e12:.2f} TFLOP/s  ({100*eff_blocks/ceiling:.1f}% "
          f"of ceiling)")
    per_iter = t_solve + t_blocks
    print(f"LM iteration (blocks+solve): {per_iter*1e3:.2f} ms "
          f"-> {1.0/per_iter:.2f} iters/s")
    if args.band:
        # banding trades FLOPs for speed: %-of-ceiling is not the headline
        # metric here (fewer FLOPs at similar overheads), iteration rate is
        print(json.dumps({
            "metric": "sparse_schur_banded_lm_iters_per_sec",
            "value": round(1.0 / per_iter, 2),
            "unit": "iters/s",
            "vs_baseline": round((1.0 / per_iter) / 3.8, 2),
        }))
    else:
        print(json.dumps({
            "metric": "sparse_schur_pct_of_matmul_ceiling",
            "value": round(100 * eff_solve / ceiling, 1),
            "unit": "%",
            "vs_baseline": round((eff_solve / ceiling) / 0.60, 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
