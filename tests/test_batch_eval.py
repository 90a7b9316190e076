"""Data-parallel evaluation sweeps: the whole closed-loop tracker vmapped
over scenario instances (noise seeds) — the batch-eval axis from SURVEY §2.5
(the reference can only run scenarios one process at a time)."""

import jax
import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import make_params, init_state
from surikatoko_tpu.world.device_runner import (
    init_with_gt_landmarks, make_scan_runner)

from test_device_runner import build_device_scenario


def test_vmap_over_noise_seeds():
    dtype = jnp.float64
    cap = 16
    sc = build_device_scenario(capacity=cap, dtype=dtype)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01), dtype=dtype)
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01, dtype=dtype)
    state0 = init_state(cap, dtype=dtype)
    state0 = init_with_gt_landmarks(params, sc, state0, jax.random.PRNGKey(0))
    run = make_scan_runner(params, update_impl=1)
    frames = jnp.arange(1, 21)

    B = 6
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    batched = jax.vmap(lambda k: run(state0, sc, frames, k))
    states, errs, _, cam_pos = batched(keys)

    assert errs.shape == (B, 20)
    assert bool(jnp.all(jnp.isfinite(errs)))
    # different seeds -> different residual histories, same qualitative level
    assert float(jnp.std(errs[:, -1])) > 0
    assert float(jnp.max(jnp.mean(errs, axis=1))) < 3.0
    # each instance's final state differs (independent noise streams)
    x_final = np.asarray(states.x)
    assert np.std(x_final[:, 0]) > 0
