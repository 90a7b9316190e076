"""Triangulation + P-matrix decomposition round-trips."""

import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.geom import se3, so3, triangulate


def random_proj_mats(rng, n_frames, f0=1.0):
    """Build f0-convention projection matrices P = K' [R|t] with cameras on a
    ring looking at the origin."""
    Ps, cfws = [], []
    K = np.array([[600.0, 0, 160.0], [0, 600.0, 120.0], [0, 0, 1.0]])
    Kf0 = K.copy()
    Kf0[2, 2] = f0
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        eye = np.array([3 * np.cos(ang), 3 * np.sin(ang), 1.0])
        wfc = se3.look_at_luf_wfc(jnp.asarray(eye), jnp.zeros(3), jnp.array([0.0, 0, 1]))
        cfw = wfc.inv()
        Rt = np.concatenate([np.asarray(cfw.R), np.asarray(cfw.t)[:, None]], axis=1)
        Ps.append(Kf0 @ Rt)
        cfws.append(cfw)
    return jnp.asarray(np.stack(Ps)), cfws


def project_f0(P, X, f0=1.0):
    h = np.asarray(P) @ np.append(np.asarray(X), 1.0)
    return h[:2] * f0 / h[2]


def test_triangulate_exact(rng):
    f0 = 600.0
    Ps, _ = random_proj_mats(rng, 6, f0=f0)
    X = np.array([0.2, -0.3, 0.1])
    xs = jnp.asarray(np.stack([project_f0(P, X, f0) for P in Ps]))
    Xhat = triangulate.triangulate_point_least_squares(Ps, xs, f0)
    np.testing.assert_allclose(Xhat, X, atol=1e-8)


def test_triangulate_masked(rng):
    f0 = 1.0
    Ps, _ = random_proj_mats(rng, 6, f0=f0)
    X = np.array([0.2, -0.3, 0.1])
    xs = np.stack([project_f0(P, X, f0) for P in Ps])
    xs[3:] = 1e6  # garbage in masked-out frames
    mask = jnp.asarray([True, True, True, False, False, False])
    Xhat = triangulate.triangulate_point_least_squares(Ps, jnp.asarray(xs), f0, mask)
    np.testing.assert_allclose(Xhat, X, atol=1e-7)


def test_triangulate_batch(rng):
    f0 = 1.0
    Ps, _ = random_proj_mats(rng, 4, f0=f0)
    Xs = rng.uniform(-0.5, 0.5, size=(16, 3))
    xs = np.stack([[project_f0(P, X, f0) for P in Ps] for X in Xs])
    mask = jnp.ones((16, 4), bool)
    Xhat = triangulate.triangulate_points_batch(Ps, jnp.asarray(xs), f0, mask)
    np.testing.assert_allclose(Xhat, Xs, atol=1e-7)


def test_decompose_proj_mat(rng):
    K = np.array([[520.0, 0.0, 150.0], [0, 540.0, 110.0], [0, 0, 1.0]])
    R = np.asarray(so3.exp(jnp.asarray(rng.normal(size=3))))  # wfc rotation
    t = rng.normal(size=3)  # camera center
    # P = s * K * R^T * [I | -t]
    s_true = -2.5
    P = s_true * K @ R.T @ np.concatenate([np.eye(3), -t[:, None]], axis=1)
    scale, K_hat, wfc = triangulate.decompose_proj_mat(jnp.asarray(P))
    np.testing.assert_allclose(scale, s_true, atol=1e-9)
    np.testing.assert_allclose(K_hat, K, atol=1e-7)
    np.testing.assert_allclose(wfc.R, R, atol=1e-9)
    np.testing.assert_allclose(wfc.t, t, atol=1e-9)
