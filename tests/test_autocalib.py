"""Auto-calibration from homographies (Zhang and rotating-camera IAC)."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import so3
from surikatoko_tpu.models.sfm import mvg
from surikatoko_tpu.models.sfm.autocalib import (
    calibrate_from_homographies, calibrate_from_rotation_homographies)

K_GT = np.array([[540.0, 0.0, 310.0], [0, 525.0, 245.0], [0, 0, 1.0]])


def plane_homographies(rng, m=5):
    """H_i = K [r1 r2 t] for a plane z=0 viewed from m poses."""
    Hs = []
    for i in range(m):
        R = np.asarray(so3.exp(jnp.asarray(
            rng.normal(scale=0.35, size=3))))
        t = np.array([rng.normal(scale=0.3), rng.normal(scale=0.3),
                      3.0 + rng.normal(scale=0.3)])
        H = K_GT @ np.stack([R[:, 0], R[:, 1], t], axis=1)
        Hs.append(H / H[2, 2])
    return jnp.asarray(np.stack(Hs))


def test_zhang_calibration_exact(rng):
    Hs = plane_homographies(rng, 6)
    K = np.asarray(calibrate_from_homographies(Hs))
    np.testing.assert_allclose(K, K_GT / K_GT[2, 2], rtol=1e-6, atol=1e-3)


def test_zhang_calibration_from_estimated_homographies(rng):
    """End-to-end: project plane points, estimate homographies by DLT with
    pixel noise, calibrate."""
    pts = rng.uniform(-1, 1, size=(60, 2))
    Hs = []
    for i in range(6):
        R = np.asarray(so3.exp(jnp.asarray(rng.normal(scale=0.35, size=3))))
        t = np.array([rng.normal(scale=0.3), rng.normal(scale=0.3), 3.0])
        H = K_GT @ np.stack([R[:, 0], R[:, 1], t], axis=1)
        ph = np.concatenate([pts, np.ones((60, 1))], axis=1) @ H.T
        pix = ph[:, :2] / ph[:, 2:3] + rng.normal(scale=0.2, size=(60, 2))
        Hh = mvg.homography_dlt(jnp.asarray(pts), jnp.asarray(pix),
                                jnp.ones(60, bool))
        Hs.append(np.asarray(Hh))
    K = np.asarray(calibrate_from_homographies(jnp.asarray(np.stack(Hs))))
    np.testing.assert_allclose(K[0, 0], K_GT[0, 0], rtol=0.02)
    np.testing.assert_allclose(K[1, 1], K_GT[1, 1], rtol=0.02)
    np.testing.assert_allclose(K[0, 2], K_GT[0, 2], rtol=0.05)
    np.testing.assert_allclose(K[1, 2], K_GT[1, 2], rtol=0.05)


def test_rotating_camera_calibration(rng):
    """Infinite homographies H = K R K^-1 of a rotating camera."""
    Kinv = np.linalg.inv(K_GT)
    Hs = []
    for i in range(5):
        R = np.asarray(so3.exp(jnp.asarray(rng.normal(scale=0.4, size=3))))
        Hs.append(K_GT @ R @ Kinv)
    K = np.asarray(calibrate_from_rotation_homographies(jnp.asarray(np.stack(Hs))))
    np.testing.assert_allclose(K, K_GT / K_GT[2, 2], rtol=1e-5, atol=1e-2)
