"""Viz helpers, GT-reset recovery, dataset builders — smoke + semantics."""

import numpy as np
import jax.numpy as jnp

from surikatoko_tpu.geom.ellipse import (
    RotatedEllipse2D, RotatedEllipsoid3D, ellipsoid_from_covariance)
from surikatoko_tpu.geom.se3 import SE3
from surikatoko_tpu.models.monoslam import init_state
from surikatoko_tpu.models.monoslam.health import reset_camera_to_gt
from surikatoko_tpu.viz import draw2d, gl_helpers, scene_view
from surikatoko_tpu.world import test_data_builder as tdb


def test_gl_mat44_roundtrip(rng):
    from surikatoko_tpu.geom import so3
    R = so3.exp(jnp.asarray(rng.normal(size=3)))
    t = jnp.asarray(rng.normal(size=3))
    m = gl_helpers.se3_to_gl_mat44(SE3(R, t)).reshape(4, 4).T  # undo col-major
    np.testing.assert_allclose(m[:3, :3], R, atol=1e-12)
    np.testing.assert_allclose(m[:3, 3], t, atol=1e-12)


def test_draw2d_overlays():
    img = draw2d.gray_to_rgb(np.zeros((60, 80), np.uint8))
    draw2d.draw_cross(img, (40, 30))
    assert (img[30, 40] == (0, 255, 0)).all()
    e = RotatedEllipse2D(center=jnp.asarray([40.0, 30.0]),
                         R=jnp.eye(2), semi_axes=jnp.asarray([10.0, 5.0]))
    draw2d.draw_ellipse(img, e)
    assert (img[30, 50] == (255, 128, 0)).all()  # point on the major axis
    # out-of-image draws are silently clipped
    draw2d.draw_cross(img, (1000, -50))


def test_scene_view_renders_png(tmp_path):
    ds = tdb.circus_grid_dataset(n_frames=8)
    cov = jnp.diag(jnp.asarray([0.01, 0.02, 0.005]))
    ell = ellipsoid_from_covariance(cov, jnp.asarray([0.0, 0.0, 0.3]))
    out = scene_view.draw_scene(
        cam_cfw=ds.cfw, points=ds.points, ellipsoids=[ell],
        gt_cam_cfw=ds.cfw, out_path=str(tmp_path / "scene.png"))
    import os
    assert os.path.getsize(out) > 10_000


def test_reset_camera_to_gt():
    st = init_state(4, cam_pos=(5.0, 5.0, 5.0), cam_pos_std=2.0,
                    dtype=jnp.float64)
    # fake some cross covariance
    st = st._replace(P=st.P.at[0, 20].set(0.5).at[20, 0].set(0.5))
    gt = jnp.concatenate([jnp.asarray([1.0, 2.0, 3.0]),
                          jnp.asarray([1.0, 0, 0, 0]), jnp.zeros(6)])
    st2 = reset_camera_to_gt(st, gt, pos_std=0.1)
    np.testing.assert_allclose(st2.x[:3], [1, 2, 3])
    np.testing.assert_allclose(st2.P[0, 0], 0.01)
    np.testing.assert_allclose(st2.P[0, 20], 0.0)   # cross-covar cleared


def test_dataset_builders_visibility():
    for ds in (tdb.crystall_grid_dataset(6), tdb.circus_grid_dataset(8)):
        obs, mask = tdb.project_dataset(ds)
        # most points visible in most frames
        assert mask.mean() > 0.5, mask.mean()
