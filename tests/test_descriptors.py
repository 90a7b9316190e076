"""BRIEF descriptors + hamming matching: invariance, discrimination, and a
wide-baseline-style end-to-end match between two rendered views."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.vision import features
from surikatoko_tpu.vision.descriptors import (
    compute_brief, compute_oriented_brief, hamming_matrix,
    keypoint_orientations, match_descriptors)

from test_vision import render_blobs


def textured_image(rng, size=(240, 320)):
    """Smoothed random texture: every patch has unique structure (gaussian
    blobs are radially symmetric and would alias under BRIEF)."""
    H, W = size
    noise = rng.normal(size=(H + 8, W + 8))
    # separable box smoothing for spatial correlation
    k = np.ones(9) / 9
    sm = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, noise)
    sm = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, sm)[:H, :W]
    img = 128 + 400 * sm
    pts = np.stack([rng.uniform(40, W - 40, 12), rng.uniform(40, H - 40, 12)],
                   axis=1)
    return np.clip(img, 0, 255).astype(np.float32), pts


def test_descriptor_stable_under_translation(rng):
    img, pts = textured_image(rng)
    shift = 5
    img2 = np.roll(img, (0, shift), axis=(0, 1))
    kp1 = jnp.asarray(pts, jnp.float32)
    kp2 = kp1 + jnp.asarray([shift, 0.0], jnp.float32)
    v = jnp.ones(len(pts), bool)
    d1 = compute_brief(jnp.asarray(img), kp1, v)
    d2 = compute_brief(jnp.asarray(img2), kp2, v)
    dist = np.diagonal(np.asarray(hamming_matrix(d1, d2)))
    assert dist.max() <= 20, dist  # same patch -> near-identical descriptor


def test_descriptors_discriminate(rng):
    img, pts = textured_image(rng)
    v = jnp.ones(len(pts), bool)
    d = compute_brief(jnp.asarray(img), jnp.asarray(pts, jnp.float32), v)
    D = np.asarray(hamming_matrix(d, d))
    off_diag = D + np.eye(len(pts), dtype=int) * 1000
    assert off_diag.min() > 40  # distinct blobs are far apart in hamming space


def test_end_to_end_matching_shifted_view(rng):
    img, pts = textured_image(rng)
    shift = np.array([7.0, -4.0])
    # second view: the same texture translated (integer roll)
    img2 = np.roll(img, (int(shift[1]), int(shift[0])), axis=(0, 1))

    kp1, v1 = features.detect_corners(jnp.asarray(img), max_corners=24,
                                      nms_radius=8, border=26)
    kp2, v2 = features.detect_corners(jnp.asarray(img2), max_corners=24,
                                      nms_radius=8, border=26)
    d1 = compute_brief(jnp.asarray(img), kp1, v1)
    d2 = compute_brief(jnp.asarray(img2), kp2, v2)
    m = match_descriptors(d1, d2, v1, v2, max_distance=80, ratio=0.9)
    good = np.asarray(m.good)
    assert good.sum() >= 5
    # matched displacement is consistent with the true shift
    disp = np.asarray(kp2)[np.asarray(m.idx_b)[good]] - np.asarray(kp1)[good]
    med = np.median(disp, axis=0)
    np.testing.assert_allclose(med, shift, atol=2.0)


def rot90_points(pts, W):
    """(x, y) -> coords in np.rot90(img): (x', y') = (y, W-1-x)."""
    return np.stack([pts[:, 1], W - 1 - pts[:, 0]], axis=1)


def test_orientation_follows_gradient():
    # a patch whose intensity increases along +x has centroid angle ~0;
    # along +y (image down) ~ pi/2
    H, W = 96, 96
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    kp = jnp.asarray([[48.0, 48.0]], jnp.float32)
    th_x = float(keypoint_orientations(jnp.asarray(xx), kp)[0])
    th_y = float(keypoint_orientations(jnp.asarray(yy), kp)[0])
    assert abs(th_x) < 0.05, th_x
    assert abs(th_y - np.pi / 2) < 0.05, th_y


def test_oriented_brief_survives_90deg_rotation(rng):
    img, pts = textured_image(rng)
    H, W = img.shape
    img2 = np.rot90(img)                      # exact 90 deg CCW, shape [W, H]
    pts2 = rot90_points(pts, W)
    v = jnp.ones(len(pts), bool)

    d1, _ = compute_oriented_brief(jnp.asarray(img), jnp.asarray(pts, jnp.float32), v)
    d2, _ = compute_oriented_brief(jnp.asarray(img2), jnp.asarray(pts2, jnp.float32), v)
    dist_oriented = np.diagonal(np.asarray(hamming_matrix(d1, d2)))

    u1 = compute_brief(jnp.asarray(img), jnp.asarray(pts, jnp.float32), v)
    u2 = compute_brief(jnp.asarray(img2), jnp.asarray(pts2, jnp.float32), v)
    dist_upright = np.diagonal(np.asarray(hamming_matrix(u1, u2)))

    # steering keeps the same patch close in hamming space; upright BRIEF
    # falls to chance level (~128) under a quarter turn
    assert np.median(dist_oriented) <= 45, dist_oriented
    assert np.median(dist_upright) >= 90, dist_upright
    assert np.median(dist_oriented) < 0.5 * np.median(dist_upright)


def test_oriented_matching_rotated_view(rng):
    img, _ = textured_image(rng)
    H, W = img.shape
    img2 = np.rot90(img)

    kp1, v1 = features.detect_corners(jnp.asarray(img), max_corners=24,
                                      nms_radius=8, border=36)
    d1, _ = compute_oriented_brief(jnp.asarray(img), kp1, v1)
    kp2 = jnp.asarray(rot90_points(np.asarray(kp1), W), jnp.float32)
    d2, _ = compute_oriented_brief(jnp.asarray(img2), kp2, v1)
    m = match_descriptors(d1, d2, v1, v1, max_distance=80, ratio=0.9)
    good = np.asarray(m.good)
    assert good.sum() >= 8, good.sum()
    # the correct correspondence is the identity permutation
    agree = (np.asarray(m.idx_b)[good] == np.nonzero(good)[0])
    assert agree.mean() >= 0.9
