"""SO(3)/SE(3) coverage; port of reference test-obs-geom.cpp:18-72 scenarios."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import se3, so3


def test_skew_cross(rng):
    a = jnp.asarray(rng.normal(size=3))
    b = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(so3.skew(a) @ b, jnp.cross(a, b), atol=1e-12)


@pytest.mark.parametrize("angle", [0.0, 1e-9, 0.3, np.pi / 2, np.pi - 1e-7])
def test_exp_log_roundtrip(angle):
    axis = np.array([0.3, -0.6, 0.9])
    axis /= np.linalg.norm(axis)
    w = jnp.asarray(axis * angle)
    R = so3.exp(w)
    # rotation matrix orthogonality
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
    w2 = so3.log(R)
    np.testing.assert_allclose(w2, w, atol=1e-7)


def test_exp_matches_rodrigues_formula(rng):
    w = jnp.asarray(rng.normal(size=3))
    theta = float(jnp.linalg.norm(w))
    K = so3.skew(w / theta)
    R_expected = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
    np.testing.assert_allclose(so3.exp(w), R_expected, atol=1e-12)


def test_orthonormalize_fixes_drift(rng):
    R = np.asarray(so3.exp(jnp.asarray(rng.normal(size=3))))
    drifted = R + rng.normal(size=(3, 3)) * 1e-3
    fixed = so3.orthonormalize(jnp.asarray(drifted))
    np.testing.assert_allclose(fixed @ fixed.T, np.eye(3), atol=1e-12)
    assert np.linalg.norm(fixed - R) < 5e-3


def test_se3_compose_inverse(rng):
    a = se3.SE3(so3.exp(jnp.asarray(rng.normal(size=3))), jnp.asarray(rng.normal(size=3)))
    b = se3.SE3(so3.exp(jnp.asarray(rng.normal(size=3))), jnp.asarray(rng.normal(size=3)))
    x = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(a.compose(b).apply(x), a.apply(b.apply(x)), atol=1e-12)
    np.testing.assert_allclose(a.inv().apply(a.apply(x)), x, atol=1e-12)


def test_a_from_b(rng):
    a = se3.SE3(so3.exp(jnp.asarray(rng.normal(size=3))), jnp.asarray(rng.normal(size=3)))
    b = se3.SE3(so3.exp(jnp.asarray(rng.normal(size=3))), jnp.asarray(rng.normal(size=3)))
    x = jnp.asarray(rng.normal(size=3))
    # a_from_b maps B-frame coords to A-frame coords
    x_b = b.apply(x)  # world->B? b is B-from-world here
    np.testing.assert_allclose(se3.a_from_b(a, b).apply(x_b), a.apply(x), atol=1e-12)


def test_look_at_luf():
    eye = jnp.array([0.0, -2.0, 0.0])
    center = jnp.array([0.0, 0.0, 0.0])
    up = jnp.array([0.0, 0.0, 1.0])
    wfc = se3.look_at_luf_wfc(eye, center, up)
    # forward (col 2) points from eye to center
    np.testing.assert_allclose(wfc.R[:, 2], jnp.array([0.0, 1.0, 0.0]), atol=1e-12)
    # up (col 1) matches up
    np.testing.assert_allclose(wfc.R[:, 1], up, atol=1e-12)
    # rotation is special orthogonal
    np.testing.assert_allclose(wfc.R @ wfc.R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(wfc.R), 1.0, atol=1e-12)
    # center projects onto the optical axis in front of the camera
    c_cam = wfc.inv().apply(center)
    np.testing.assert_allclose(c_cam, jnp.array([0.0, 0.0, 2.0]), atol=1e-12)
