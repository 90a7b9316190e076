"""Appearance-based place recognition (vision/place_recognition.py): the
descriptor -> mutual-NN -> similarity-RANSAC loop-closure pipeline on a
synthetic revisit, without any GT pair oracle."""

import jax
import numpy as np
import pytest

from surikatoko_tpu.vision import place_recognition as pr


def _render(centers, amps, H=240, W=320, sigma=2.2, seed=3):
    """Textured background + one gaussian splat per center (distinct amps)."""
    rng = np.random.default_rng(seed)
    bg = rng.uniform(20.0, 70.0, size=(H, W))
    # smooth the background a little so BRIEF picks up structure, not pepper
    bg = (bg + np.roll(bg, 1, 0) + np.roll(bg, 1, 1)
          + np.roll(bg, -1, 0) + np.roll(bg, -1, 1)) / 5.0
    ys, xs = np.mgrid[0:H, 0:W]
    img = bg
    for (cx, cy), a in zip(centers, amps):
        img = img + a * np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2)
                               / (2 * sigma * sigma))
    return np.clip(img, 0, 255)


@pytest.fixture(scope="module")
def revisit_world():
    rng = np.random.default_rng(0)
    n = 24
    centers = np.stack([rng.uniform(50, 270, n), rng.uniform(50, 190, n)], 1)
    amps = rng.uniform(90.0, 180.0, n)
    base = _render(centers, amps)
    shift = np.array([23.0, -11.0])
    # the revisit sees the SAME world content, rigidly shifted in image
    # space (np.roll moves background and splats together) + sensor noise
    revisit = np.roll(np.roll(base, int(shift[1]), axis=0),
                      int(shift[0]), axis=1)
    revisit = np.clip(revisit + rng.normal(scale=1.5, size=base.shape), 0, 255)
    return centers, amps, base, revisit, shift


def test_find_loop_pairs_without_oracle(revisit_world):
    centers, amps, base, revisit, shift = revisit_world
    rng = np.random.default_rng(1)
    n = len(centers)

    head = pr.describe_tracks([
        (base, centers + rng.normal(scale=0.4, size=centers.shape),
         list(range(n)))])
    tail = pr.describe_tracks([
        (revisit, centers + shift + rng.normal(scale=0.4, size=centers.shape),
         [100 + i for i in range(n)])])

    # 3-D map positions: head at GT; tail copies drifted by a similarity
    pts = np.concatenate([centers / 50.0,
                          rng.uniform(2.0, 4.0, (n, 1))], axis=1)
    s, th = 1.07, 0.1
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    drift = (s * pts @ Rz.T) + np.array([0.3, -0.2, 0.1])
    positions = {i: pts[i] for i in range(n)}
    positions.update({100 + i: drift[i] for i in range(n)})

    pairs = pr.find_loop_pairs(tail, head, positions, ransac_threshold=0.05,
                               key=jax.random.PRNGKey(2))
    assert len(pairs) >= n // 2, f"only {len(pairs)} verified pairs"
    # every surviving pair must be a TRUE correspondence
    assert all(ta - 100 == hb for ta, hb in pairs), pairs


def test_match_track_groups_needs_no_positions(revisit_world):
    centers, amps, base, revisit, shift = revisit_world
    n = len(centers)
    head = pr.describe_tracks([(base, centers, list(range(n)))])
    tail = pr.describe_tracks([(revisit, centers + shift,
                                [100 + i for i in range(n)])])
    cand = pr.match_track_groups(tail, head)
    correct = sum(1 for ta, hb in cand if ta - 100 == hb)
    assert correct >= n // 2
    # appearance-only candidates may contain a few confusions; the RANSAC
    # stage exists precisely to kill them
    assert correct >= len(cand) - max(2, len(cand) // 4)


def test_ransac_similarity_rejects_outliers():
    rng = np.random.default_rng(5)
    n = 60
    A = rng.uniform(-2, 2, (n, 3))
    th = 0.4
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    B = 1.3 * A @ Rz.T + np.array([0.5, -1.0, 2.0])
    B += rng.normal(scale=0.005, size=B.shape)
    bad = rng.choice(n, 18, replace=False)
    B[bad] += rng.uniform(0.5, 2.0, (18, 3)) * rng.choice([-1, 1], (18, 3))

    inl = pr.ransac_similarity_pairs(A, B, threshold=0.05,
                                     key=jax.random.PRNGKey(1))
    good = np.ones(n, bool)
    good[bad] = False
    assert inl[good].all(), "true inliers rejected"
    assert not inl[bad].any(), "outliers survived"


def test_describe_tracks_aggregates_across_frames(revisit_world):
    centers, amps, base, _, _ = revisit_world
    n = len(centers)
    half = n // 2
    td = pr.describe_tracks([
        (base, centers[:half], list(range(half))),
        (base, centers[half:], list(range(half, n))),
        (base, centers[:3], [0, 1, 2]),      # repeat observations
    ])
    assert td.tids.tolist() == list(range(n))
    assert td.count[:3].tolist() == [2, 2, 2]
    assert td.desc.shape == (n, 8)
