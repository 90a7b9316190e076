"""Quaternion round-trips; port of the reference gtest coverage
(suriko-test/test-quaternion.cpp:20-105) plus randomized identities."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import quat, so3


def rand_unit_quat(rng, n=1):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_mult_identity():
    qid = jnp.array([1.0, 0, 0, 0])
    q = jnp.array([0.5, 0.5, 0.5, 0.5])
    np.testing.assert_allclose(quat.mult(qid, q), q, atol=1e-12)
    np.testing.assert_allclose(quat.mult(q, qid), q, atol=1e-12)


def test_mult_matches_rotmat_composition(rng):
    a = jnp.asarray(rand_unit_quat(rng)[0])
    b = jnp.asarray(rand_unit_quat(rng)[0])
    Rab = quat.to_rotmat(quat.mult(a, b))
    np.testing.assert_allclose(Rab, quat.to_rotmat(a) @ quat.to_rotmat(b), atol=1e-12)


def test_axis_angle_roundtrip(rng):
    # keep |w| < pi: beyond that the axis-angle chart wraps and the
    # round-trip returns the equivalent rotation with angle in [0, pi]
    w = rng.normal(size=(16, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(1e-3, 3.1, size=(16, 1))
    w = jnp.asarray(w)
    q = quat.from_axis_angle(w)
    w2 = quat.to_axis_angle(q)
    np.testing.assert_allclose(w2, w, atol=1e-9)


def test_axis_angle_small_angle():
    w = jnp.array([1e-10, -2e-10, 3e-10])
    q = quat.from_axis_angle(w)
    np.testing.assert_allclose(q[0], 1.0, atol=1e-15)
    np.testing.assert_allclose(quat.to_axis_angle(q), w, atol=1e-15)


def test_rotmat_roundtrip(rng):
    qs = jnp.asarray(rand_unit_quat(rng, 32))
    R = quat.to_rotmat(qs)
    q2 = quat.from_rotmat(R)
    # q and -q encode the same rotation
    sign = jnp.sign(jnp.sum(q2 * qs, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, qs, atol=1e-9)


@pytest.mark.parametrize("angle", [0.0, 1e-8, 0.1, np.pi / 2, np.pi - 1e-6, np.pi])
def test_rotmat_roundtrip_edge_angles(angle):
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = jnp.asarray(axis * angle)
    R = so3.exp(w)
    q = quat.from_rotmat(R)
    np.testing.assert_allclose(quat.to_rotmat(q), R, atol=1e-8)


def test_rotate_matches_rotmat(rng):
    q = jnp.asarray(rand_unit_quat(rng)[0])
    v = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(quat.rotate(q, v), quat.to_rotmat(q) @ v, atol=1e-12)


def test_inverse():
    q = quat.normalize(jnp.array([0.9, 0.1, -0.3, 0.2]))
    qq = quat.mult(q, quat.inv(q))
    np.testing.assert_allclose(qq, jnp.array([1.0, 0, 0, 0]), atol=1e-12)
