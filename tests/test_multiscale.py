"""Scale-space keypoints: matching across a 2x zoom where single-scale
descriptors fail."""

import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.vision.descriptors import (
    compute_oriented_brief, hamming_matrix, match_descriptors)
from surikatoko_tpu.vision.multiscale import (
    detect_and_describe, resize_bilinear, similarity_consistent_matches)

from test_descriptors import textured_image
from test_klt import multiscale_texture


def test_pyramid_roundtrip_coords(rng):
    img, _ = textured_image(rng)
    kp = detect_and_describe(jnp.asarray(img), levels=3)
    xy = np.asarray(kp.xy)[np.asarray(kp.valid)]
    H, W = img.shape
    assert ((xy[:, 0] >= 0) & (xy[:, 0] < W)
            & (xy[:, 1] >= 0) & (xy[:, 1] < H)).all()
    # all levels contribute some keypoints
    scales = np.asarray(kp.scale)[np.asarray(kp.valid)]
    assert len(np.unique(np.round(scales, 3))) >= 2


def test_matching_across_2x_zoom(rng):
    img, _ = multiscale_texture(rng)
    H, W = img.shape
    # zoomed-in view: center crop upscaled 2x (same pixels, 2x magnified)
    crop = img[H // 4: 3 * H // 4, W // 4: 3 * W // 4]
    zoom = np.asarray(resize_bilinear(jnp.asarray(crop), (H, W)))

    a = detect_and_describe(jnp.asarray(img), levels=4, corners_per_level=48,
                            nms_radius=5)
    b = detect_and_describe(jnp.asarray(zoom), levels=4, corners_per_level=48,
                            nms_radius=5)
    m = match_descriptors(a.descriptors, b.descriptors, a.valid, b.valid,
                          max_distance=80, ratio=0.95)
    good = similarity_consistent_matches(a, b, m.idx_b, m.good)
    assert good.sum() >= 4, good.sum()

    # geometric check: matched base points map into the zoomed view by
    # x' = 2(x - W/4), y' = 2(y - H/4)
    xa = np.asarray(a.xy)[good]
    xb = np.asarray(b.xy)[np.asarray(m.idx_b)[good]]
    pred = 2.0 * (xa - np.asarray([W / 4, H / 4]))
    err = np.linalg.norm(xb - pred, axis=1)
    assert np.median(err) < 4.0, np.median(err)
    # matched pairs sit ~1 octave apart in the pyramid (2x zoom)
    ratio = np.asarray(b.scale)[np.asarray(m.idx_b)[good]] / np.asarray(a.scale)[good]
    assert abs(np.median(np.log2(ratio)) - 1.0) < 0.35, np.median(ratio)

    # single-scale steered BRIEF cannot bridge the 2x zoom: descriptors of
    # corresponding locations are at chance level
    pts_a = np.stack([rng.uniform(W // 4 + 30, 3 * W // 4 - 30, 10),
                      rng.uniform(H // 4 + 30, 3 * H // 4 - 30, 10)], axis=1)
    pts_b = 2.0 * (pts_a - np.asarray([W / 4, H / 4]))
    v = jnp.ones(10, bool)
    da, _ = compute_oriented_brief(jnp.asarray(img), jnp.asarray(pts_a, jnp.float32), v)
    db, _ = compute_oriented_brief(jnp.asarray(zoom), jnp.asarray(pts_b, jnp.float32), v)
    dist = np.diagonal(np.asarray(hamming_matrix(da, db)))
    matched_med = np.median(np.asarray(m.distance)[good])
    assert np.median(dist) >= 60, dist              # unusable for matching
    assert np.median(dist) > 2 * matched_med, (np.median(dist), matched_med)
