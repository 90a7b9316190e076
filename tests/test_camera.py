"""Camera model: projection/backprojection/distortion round-trips."""

import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.geom import camera


def scenario_cam(dtype=jnp.float64):
    # matches demo-monoslam-scenario01.json camera
    return camera.make_intrinsics(
        image_size=(320, 240), principal_point=(160.0, 120.0),
        focal_length_mm=1.95, pixel_size_mm=(0.01, 0.01), dtype=dtype,
    )


def test_focal_length_pix():
    cam = scenario_cam()
    np.testing.assert_allclose(cam.focal_length_pix, [195.0, 195.0])


def test_project_center():
    cam = scenario_cam()
    pix = camera.project_camera_point(cam, None, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(pix, [160.0, 120.0])


def test_project_backproject_roundtrip_no_distortion(rng):
    cam = scenario_cam()
    x = jnp.asarray(rng.uniform(-0.3, 0.3, size=(64, 3)) + np.array([0, 0, 1.5]))
    pix = camera.project_camera_point(cam, None, x)
    d = camera.backproject_pixel(cam, None, pix)
    # backprojected dir * Z reproduces the point
    np.testing.assert_allclose(d * x[:, 2:3], x, atol=1e-9)


def test_distort_undistort_roundtrip(rng):
    cam = scenario_cam()
    dist = camera.MikhailDistortion(jnp.float64(0.06), jnp.float64(0.01))
    hu = jnp.asarray(rng.uniform(0, 1, size=(128, 2)) * np.array([320, 240]))
    hd = camera.distort_pixel(cam, dist, hu)
    hu2 = camera.undistort_pixel(cam, dist, hd)
    np.testing.assert_allclose(hu2, hu, atol=1e-7)


def test_distortion_shrinks_toward_center():
    # barrel distortion with k1>0 pulls pixels toward the principal point
    cam = scenario_cam()
    dist = camera.MikhailDistortion(jnp.float64(0.06), jnp.float64(0.01))
    hu = jnp.array([300.0, 120.0])
    hd = camera.distort_pixel(cam, dist, hu)
    assert float(hd[0]) < 300.0
    assert float(hd[0]) > 160.0
    np.testing.assert_allclose(hd[1], 120.0, atol=1e-9)


def test_distort_identity_when_zero_k():
    cam = scenario_cam()
    dist = camera.no_distortion(jnp.float64)
    hu = jnp.array([[10.0, 20.0], [300.0, 200.0]])
    np.testing.assert_allclose(camera.distort_pixel(cam, dist, hu), hu, atol=1e-12)


def test_azim_elev_roundtrip(rng):
    d = rng.normal(size=(32, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # restrict to forward hemisphere to avoid wrap ambiguity at theta=+-pi
    d[:, 2] = np.abs(d[:, 2]) + 0.1
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    theta, phi = camera.azim_elev_from_dir(jnp.asarray(d))
    m = camera.dir_from_azim_elev(theta, phi)
    np.testing.assert_allclose(m, d, atol=1e-12)


def test_project_full_chain_matches_manual():
    cam = scenario_cam()
    dist = camera.MikhailDistortion(jnp.float64(0.06), jnp.float64(0.01))
    x = jnp.array([0.1, -0.05, 1.0])
    hu_manual = jnp.array([160.0 - 195.0 * 0.1, 120.0 + 195.0 * 0.05])
    pix = camera.project_camera_point(cam, dist, x)
    np.testing.assert_allclose(
        camera.undistort_pixel(cam, dist, pix), hu_manual, atol=1e-7)
