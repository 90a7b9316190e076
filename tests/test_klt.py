"""Pyramidal Lucas-Kanade tracker: subpixel accuracy, pyramid pull-in range,
and status gating (reference prototype delegates to cv2.calcOpticalFlowPyrLK,
py_proto/suriko/mvg.py:2066)."""

import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.vision.klt import build_pyramid, track_points

from test_descriptors import textured_image


def multiscale_texture(rng, size=(240, 320)):
    """Natural-image-like texture: noise smoothed at two scales, so coarse
    pyramid levels keep structure (pure fine-scale noise has a ~2px
    autocorrelation basin at 1/4 res — unusable for ANY pyramidal LK)."""
    H, W = size
    k9 = np.ones(9) / 9
    k31 = np.ones(31) / 31

    def smooth(noise, k):
        sm = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, noise)
        return np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, sm)

    fine = smooth(rng.normal(size=(H, W)), k9)
    coarse = smooth(rng.normal(size=(H, W)), k31)
    img = 128 + 300 * fine + 900 * coarse
    pts = np.stack([rng.uniform(40, W - 40, 12), rng.uniform(40, H - 40, 12)],
                   axis=1)
    return np.clip(img, 0, 255).astype(np.float32), pts


def warp_translate(img, shift):
    """I1(x) = I0(x - shift) by bilinear interpolation (np, golden)."""
    H, W = img.shape
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    sx = np.clip(xx - shift[0], 0, W - 1.001)
    sy = np.clip(yy - shift[1], 0, H - 1.001)
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx = sx - x0
    fy = sy - y0
    return ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
            + fy * ((1 - fx) * img[y0 + 1, x0] + fx * img[y0 + 1, x0 + 1]))


def test_pyramid_shapes(rng):
    img, _ = textured_image(rng)
    pyr = build_pyramid(jnp.asarray(img), 3)
    assert [p.shape for p in pyr] == [(240, 320), (120, 160), (60, 80)]


def test_subpixel_small_shift(rng):
    img, pts = textured_image(rng)
    shift = np.array([2.3, -1.7])
    img1 = warp_translate(img, shift)
    res = track_points(jnp.asarray(img), jnp.asarray(img1),
                       jnp.asarray(pts, jnp.float32), levels=1)
    good = np.asarray(res.status)
    assert good.sum() >= 10
    flow = np.asarray(res.points)[good] - pts[good]
    np.testing.assert_allclose(np.median(flow, axis=0), shift, atol=0.1)
    assert np.abs(flow - shift).max() < 0.5


def test_pyramid_extends_pull_in_range(rng):
    img, pts = multiscale_texture(rng)
    shift = np.array([14.0, 9.0])          # far beyond a single 7px window
    img1 = warp_translate(img, shift)
    res1 = track_points(jnp.asarray(img), jnp.asarray(img1),
                        jnp.asarray(pts, jnp.float32), levels=1)
    res3 = track_points(jnp.asarray(img), jnp.asarray(img1),
                        jnp.asarray(pts, jnp.float32), levels=3)
    flow3 = np.asarray(res3.points) - pts
    good3 = np.asarray(res3.status)
    assert good3.sum() >= 8
    np.testing.assert_allclose(np.median(flow3[good3], axis=0), shift, atol=0.3)
    # single level misses it (large residual error or wrong flow)
    flow1 = np.asarray(res1.points) - pts
    err1 = np.linalg.norm(flow1 - shift, axis=1)
    err3 = np.linalg.norm(flow3 - shift, axis=1)
    assert np.median(err3[good3]) < 0.5
    assert np.median(err1) > 3 * max(np.median(err3[good3]), 0.05)


def test_flat_region_flagged(rng):
    img, _ = textured_image(rng)
    img = img.copy()
    img[80:160, 100:220] = 100.0           # textureless plateau
    pts = np.array([[160.0, 120.0], [60.0, 60.0]], np.float32)
    img1 = warp_translate(img, np.array([1.0, 1.0]))
    res = track_points(jnp.asarray(img), jnp.asarray(img1), jnp.asarray(pts),
                       levels=1)
    status = np.asarray(res.status)
    assert not status[0]                   # no gradient -> ill-conditioned
    assert status[1]
