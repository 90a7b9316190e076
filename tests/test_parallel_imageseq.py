"""Sharded imageseq closed loop (distributed render + local NCC + sharded
fused EKF, parallel/sharded_imageseq.py) vs the single-device scan runner —
the flagship perception pipeline's multi-chip twin must match it exactly
(VERDICT r3 item 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import camera
from surikatoko_tpu.models.monoslam import make_params, init_state
from surikatoko_tpu.parallel import landmark_mesh
from surikatoko_tpu.parallel.sharded_imageseq import (
    make_sharded_imageseq_runner)
from surikatoko_tpu.world import device_runner as dr


def _setup(capacity=16, dtype=jnp.float64):
    sc = dr.build_imageseq_scenario(capacity=capacity, dtype=dtype)
    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01), dtype=dtype)
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.075,
                         process_noise_ang_veloc_std=0.01,
                         max_undetected_frames=4, dtype=dtype)
    st = init_state(capacity, dtype=dtype)
    st, templates = dr.init_imageseq(params, sc, st, 15)
    return params, sc, st, templates


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_imageseq_matches_single(n_dev):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    params, sc, st, templates = _setup()
    frames = jnp.arange(1, 13)

    run1 = dr.make_imageseq_scan_runner(params, templ_width=15,
                                        use_pallas=False)
    st1, (err1, n1, pos1) = run1(st, templates, sc, frames)

    runp = make_sharded_imageseq_runner(params, st.capacity,
                                        landmark_mesh(n_dev),
                                        templ_width=15, use_pallas=False)
    x2, P2, active2, unobs2, (err2, n2, pos2) = runp(
        st.x, st.P, templates, st.lm_active, st.lm_unobserved, sc, frames)

    # discrete perception decisions must agree exactly
    np.testing.assert_array_equal(np.asarray(n2), np.asarray(n1))
    np.testing.assert_array_equal(np.asarray(active2),
                                  np.asarray(st1.lm_active))
    np.testing.assert_array_equal(np.asarray(unobs2),
                                  np.asarray(st1.lm_unobserved))
    # continuous state matches at the sharded-fused tolerance
    np.testing.assert_allclose(np.asarray(err2), np.asarray(err1),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(pos2), np.asarray(pos1),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(st1.x), atol=1e-9)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(st1.P),
                               rtol=1e-7, atol=1e-10)


def test_sharded_imageseq_delete_policy_fires():
    """The run must exercise the delete-unobserved fold (otherwise the
    parity above proves less than it claims): force a splat to vanish by
    deactivating its template, and check the slot is dropped identically
    in both runners."""
    params, sc, st, templates = _setup()
    # kill slot 3's template so NCC never matches it again
    templates = templates.at[3].set(0.0)
    frames = jnp.arange(1, 9)

    run1 = dr.make_imageseq_scan_runner(params, templ_width=15,
                                        use_pallas=False)
    st1, _ = run1(st, templates, sc, frames)
    assert not bool(st1.lm_active[3])      # dropped after 4 unmatched frames

    runp = make_sharded_imageseq_runner(params, st.capacity,
                                        landmark_mesh(8),
                                        templ_width=15, use_pallas=False)
    x2, P2, active2, _, _ = runp(
        st.x, st.P, templates, st.lm_active, st.lm_unobserved, sc, frames)
    np.testing.assert_array_equal(np.asarray(active2),
                                  np.asarray(st1.lm_active))
    # the dropped slot's covariance rows are zeroed on every shard
    off = 13 + 3 * 6
    assert float(jnp.max(jnp.abs(P2[off:off + 6, :]))) == 0.0
    np.testing.assert_allclose(np.asarray(P2), np.asarray(st1.P),
                               rtol=1e-7, atol=1e-10)
