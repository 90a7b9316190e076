"""f32-vs-f64 accuracy pin at the large-K EKF regime (VERDICT round 2,
weak #2 / next-round #2): the TPU filter runs f32 with conditioning
mitigations (covar_diag_inflation + delete-unobserved), the reference runs
clean f64 (rt-config.h:42, davison-mono-slam.cpp) — this test measures both
on the SAME K=768 imageseq scenario and pins the f32 penalty.

dtype selection must happen before JAX initializes and the suite's conftest
already enabled x64, so each configuration runs in its own subprocess
(analysis/precision_large_k.py, the same harness that produced the measured
120-frame imageseq numbers in docs/SCALING.md).

The suite pin uses ``--mode ekf`` (the GT-projecting matcher loop): the
question under test is the chained f32 covariance congruence at D=4621, and
the imageseq mode's CPU NCC-conv dominates a CPU run's wall-clock while its
math is dtype-trivial (the Pallas/XLA NCC parity is pinned separately in
bench). The pin: f32-with-mitigations ATE <= 2x f64 ATE + an absolute floor
(over a short horizon both ATEs are small and a bare ratio would be
noise-dominated).
"""

import json
import os
import subprocess
import sys

import pytest

_REPO = os.path.join(os.path.dirname(__file__), "..")
_SCRIPT = os.path.join(_REPO, "analysis", "precision_large_k.py")

_FRAMES = 32


def _run(dtype: str, mitigations: bool, frames: int = _FRAMES) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, _SCRIPT, "--dtype", dtype, "--mode", "ekf",
           "--capacity", "768", "--frames", str(frames),
           "--chunk", str(min(frames, 60))]
    if mitigations:
        cmd.append("--mitigations")
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=1800)
    assert out.returncode == 0, f"precision run failed:\n{out.stderr[-3000:]}"
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_f32_ate_within_2x_of_f64_at_k768():
    r64 = _run("f64", mitigations=False)
    r32 = _run("f32", mitigations=True)
    assert r64["finite"] and r32["finite"]
    # the filter must actually track (not coast on the motion model)
    assert r64["matched_med"] > 500 and r32["matched_med"] > 500
    # the pin: mitigated f32 stays within 2x of clean f64, floored at the
    # detection-noise scale (0.5 px noise -> ~1e-2 map-unit ATE jitter)
    assert r32["ate_rmse"] <= 2.0 * r64["ate_rmse"] + 0.02, (r32, r64)


@pytest.mark.slow
def test_f32_ate_within_2x_of_f64_at_k768_120frames():
    """The documented f32 failure horizon is ~120 chained K=768 frames
    (bench.py, CLAUDE.md numerics policy) — the 32-frame pin above stops
    short of it; this one covers it (VERDICT r3 item 4).

    The SRK_SLOW_PRECISION env gate is GONE (VERDICT r4 item 6: a pin
    nobody executes pins nothing) — the slow lane runs this (~12 min of
    subprocess runs). Measured 2026-08-21 (this harness, 120 frames,
    K=768): f64 ATE vs mitigated-f32 ATE recorded in docs/SCALING.md;
    the UNMITIGATED degradation control additionally runs every round on
    real TPU as bench.py's unmitigated_f32_* keys."""
    r64 = _run("f64", mitigations=False, frames=120)
    r32 = _run("f32", mitigations=True, frames=120)
    assert r64["finite"] and r32["finite"]
    assert r64["matched_med"] > 500 and r32["matched_med"] > 500
    assert r32["ate_rmse"] <= 2.0 * r64["ate_rmse"] + 0.02, (r32, r64)
