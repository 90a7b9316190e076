"""Vision layer: ZNCC parity vs naive loops (port of the reference
templ-match semantics), corner detector sanity, batched NCC search."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.ops import ncc as ncc_mod
from surikatoko_tpu.vision import features, templ_match


def naive_zncc(patch, templ):
    """Literal port of the reference formulas (templ-match.cpp:91)."""
    t_mean = templ.mean()
    f_mean = patch.mean()
    t_d = templ - t_mean
    f_d = patch - f_mean
    denom = np.sqrt((f_d**2).sum()) * np.sqrt((t_d**2).sum())
    if denom < 1e-12:
        return 0.0
    return float((f_d * t_d).sum() / denom)


def test_corr_surface_matches_naive(rng):
    T, S = 9, 7
    P = S + T - 1
    K = 4
    patches = rng.uniform(0, 255, size=(K, P, P))
    templs = rng.uniform(0, 255, size=(K, T, T))
    surf = np.asarray(templ_match.corr_coeff_surface(
        jnp.asarray(patches), jnp.asarray(templs)))
    for k in range(K):
        for dy in range(S):
            for dx in range(S):
                want = naive_zncc(patches[k, dy:dy + T, dx:dx + T], templs[k])
                np.testing.assert_allclose(surf[k, dy, dx], want, atol=1e-9)


def test_corr_identical_patch_is_one(rng):
    T = 9
    templ = rng.uniform(0, 255, size=(T, T))
    c = templ_match.corr_coeff_single(jnp.asarray(templ), jnp.asarray(templ))
    np.testing.assert_allclose(float(c), 1.0, atol=1e-9)


def test_corr_flat_window_is_zero():
    T = 9
    flat = jnp.full((T, T), 100.0)
    templ = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (T, T)))
    assert float(templ_match.corr_coeff_single(flat, templ)) == 0.0


def render_blobs(points_xy, size=(240, 320), sigma=1.5, seed=0):
    """Tiny synthetic camera image: gaussian blobs on a noise background."""
    H, W = size
    rng = np.random.default_rng(seed)
    img = rng.uniform(20, 40, size=(H, W))
    ys, xs = np.mgrid[0:H, 0:W]
    for x, y in points_xy:
        img += 180.0 * np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2 * sigma**2))
    return np.clip(img, 0, 255).astype(np.float32)


def test_ncc_search_finds_shifted_blobs(rng):
    pts = np.array([[60.0, 50.0], [160.0, 120.0], [250.0, 200.0]])
    img0 = render_blobs(pts)
    shift = np.array([3.0, -2.0])
    img1 = render_blobs(pts + shift)

    T = 17
    half = T // 2
    templates = np.stack([
        img0[int(y) - half:int(y) + half + 1, int(x) - half:int(x) + half + 1]
        for x, y in pts])
    search = ncc_mod.make_ncc_search(search_radius=8, min_corr_coeff=0.6)
    res = search(jnp.asarray(img1), jnp.asarray(pts, jnp.float32),
                 jnp.asarray(templates), jnp.ones(3, bool))
    assert bool(jnp.all(res.matched))
    np.testing.assert_allclose(np.asarray(res.best_center), pts + shift, atol=1.0)
    assert np.all(np.asarray(res.best_corr) > 0.9)


def test_ncc_search_ellipse_gate_blocks_far_match(rng):
    """With a tight gate, a blob that moved outside the ellipse is rejected."""
    pts = np.array([[160.0, 120.0]])
    img0 = render_blobs(pts)
    img1 = render_blobs(pts + np.array([10.0, 0.0]))
    T = 17
    half = T // 2
    templ = img0[120 - half:120 + half + 1, 160 - half:160 + half + 1][None]
    sigma_inv = jnp.asarray(np.eye(2)[None] * 1.0, jnp.float32)  # sigma=1 pix
    search = ncc_mod.make_ncc_search(search_radius=12, min_corr_coeff=0.8,
                                     chi2_gate=5.99)
    res = search(jnp.asarray(img1), jnp.asarray(pts, jnp.float32),
                 jnp.asarray(templ), jnp.ones(1, bool),
                 sigma_inv=sigma_inv)
    assert not bool(res.matched[0])  # true match at +10 px is outside the gate


def test_ncc_search_gate_telemetry(rng):
    """Search-efficiency telemetry (VERDICT r4 item 9; reference
    executed_match_templ_calls, demo-davison-mono-slam.cpp:461): n_gated
    counts the candidate cells an ideally-gated scan would evaluate —
    full window without a gate, the min-search-rect floor + ellipse with a
    tight one — and in_ellipse says whether the winning cell sat inside
    the STRICT chi2 ellipse (vs rescued by the floor)."""
    pts = np.array([[160.0, 120.0], [60.0, 50.0]])
    img0 = render_blobs(pts)
    img1 = render_blobs(pts + np.array([1.0, 0.0]))
    T = 17
    half = T // 2
    templates = np.stack([
        img0[int(y) - half:int(y) + half + 1, int(x) - half:int(x) + half + 1]
        for x, y in pts])
    R = 8
    S2 = (2 * R + 1) ** 2

    # no gate: every in-image candidate counts
    search = ncc_mod.make_ncc_search(search_radius=R, min_corr_coeff=0.6)
    res = search(jnp.asarray(img1), jnp.asarray(pts, jnp.float32),
                 jnp.asarray(templates), jnp.ones(2, bool))
    np.testing.assert_array_equal(np.asarray(res.n_gated), [S2, S2])
    assert bool(jnp.all(res.in_ellipse))      # no gate -> trivially inside

    # tight gate (sigma = 1 px): the ellipse covers ~pi*chi2 cells, far
    # fewer than the window; floored at the min-search-rect 7x7
    sigma_inv = jnp.asarray(np.tile(np.eye(2), (2, 1, 1)), jnp.float32)
    search_g = ncc_mod.make_ncc_search(search_radius=R, min_corr_coeff=0.6,
                                       chi2_gate=5.99)
    res_g = search_g(jnp.asarray(img1), jnp.asarray(pts, jnp.float32),
                     jnp.asarray(templates), jnp.ones(2, bool),
                     sigma_inv=sigma_inv)
    n_g = np.asarray(res_g.n_gated)
    assert np.all(n_g >= 49) and np.all(n_g < S2 // 2), n_g
    # the +1 px true shift is well inside the strict ellipse
    assert bool(jnp.all(res_g.matched)) and bool(jnp.all(res_g.in_ellipse))


def test_matcher_gate_stats_and_log_keys(rng, tmp_path):
    """The matcher accumulates the gate telemetry and the internals JSON
    carries it (TemplEvalsWindow/TemplEvalsGated/MatchedInEllipse)."""
    import jax
    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.io.tracker_log import (
        TrackerInternalsLogger, read_tracker_internals)
    from surikatoko_tpu.models.monoslam import MonoSlamFilter, make_params
    from surikatoko_tpu.vision.matcher import ImageTemplCornersMatcher

    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.02,
                         process_noise_ang_veloc_std=0.005)
    tracker = MonoSlamFilter(params, capacity=8, update_impl=1)
    matcher = ImageTemplCornersMatcher(tracker, templ_width=15,
                                       search_radius=8,
                                       detector_max_corners=8)
    logger = TrackerInternalsLogger()
    state = tracker.init_state()
    img = render_blobs(np.array([[160.0, 120.0], [80.0, 60.0],
                                 [240.0, 180.0]]))
    for f in range(3):
        logger.start_new_frame()
        matcher.analyze_frame(img)
        obs, obs_mask = matcher.match_salient_points(state, f)
        new_pix, new_mask = matcher.recruit_new_salient_points(
            state, f, obs_mask)
        state, stats = tracker.process_frame(state, obs, obs_mask,
                                             new_pix, new_mask)
        matcher.on_landmarks_added(np.asarray(stats.new_slots),
                                   np.asarray(new_pix), state)
        matcher.sync_removed(state)
        logger.record_from_stats(stats, state)
        if matcher.last_gate_stats:
            logger.record_gate_stats(matcher.last_gate_stats)
        logger.finish_frame()
    # after frame 0's recruits, later frames actually search
    assert matcher.templ_evals_window > 0
    assert 0 < matcher.templ_evals_gated <= matcher.templ_evals_window
    assert matcher.matched_in_ellipse > 0
    path = str(tmp_path / "internals.json")
    logger.write_json(path)
    doc = read_tracker_internals(path)
    rec = [fr for fr in doc["Frames"] if "TemplEvalsWindow" in fr]
    assert rec, "gate telemetry missing from internals JSON"
    assert rec[-1]["TemplEvalsGated"] <= rec[-1]["TemplEvalsWindow"]
    assert rec[-1]["MatchedInEllipse"] >= 0


def test_ncc_subpixel_refinement(rng):
    """A blob displaced by a FRACTIONAL pixel: the parabola-refined center
    must land within ~0.15 px of the true position, where the integer
    argmax is off by up to half a pixel (round-4 quality addition; the
    reference's scan is integer, demo-davison-mono-slam.cpp:465)."""
    true_shift = np.array([0.3, -0.4])
    base = np.array([[80.0, 70.0]])
    img0 = render_blobs(base, sigma=2.0, seed=3)
    img1 = render_blobs(base + true_shift, sigma=2.0, seed=3)
    T = 13
    half = T // 2
    cx, cy = int(base[0, 0]), int(base[0, 1])
    templ = jnp.asarray(img0[cy - half:cy + half + 1,
                             cx - half:cx + half + 1])[None]
    centers = jnp.asarray(base, jnp.float32)
    active = jnp.ones(1, bool)

    res_i = ncc_mod.ncc_search(jnp.asarray(img1), centers, templ, active,
                               search_radius=5, min_corr_coeff=0.3)
    res_s = ncc_mod.ncc_search(jnp.asarray(img1), centers, templ, active,
                               search_radius=5, min_corr_coeff=0.3,
                               subpixel=True)
    assert bool(res_i.matched[0]) and bool(res_s.matched[0])
    true_pos = base[0] + true_shift
    err_i = np.linalg.norm(np.asarray(res_i.best_center[0]) - true_pos)
    err_s = np.linalg.norm(np.asarray(res_s.best_center[0]) - true_pos)
    assert err_s < 0.15, (err_s, np.asarray(res_s.best_center[0]), true_pos)
    assert err_s < err_i, (err_s, err_i)
    # integer part unchanged: refinement moves the center < half a cell
    assert np.all(np.abs(np.asarray(res_s.best_center[0])
                         - np.asarray(res_i.best_center[0])) <= 0.5)


def test_detect_corners_on_blobs():
    pts = np.array([[60.0, 50.0], [160.0, 120.0], [250.0, 200.0], [80.0, 180.0]])
    img = render_blobs(pts, sigma=2.0)
    xy, valid = features.detect_corners(jnp.asarray(img), max_corners=16,
                                        nms_radius=8)
    xy = np.asarray(xy)[np.asarray(valid)]
    # every true blob has a detection within 3 px
    for p in pts:
        d = np.linalg.norm(xy - p, axis=1).min()
        assert d < 3.0, (p, d)


def test_detect_corners_dense_cluster_none_dropped():
    """Regression (advisor r4 + r5): legal NMS survivors that share a
    coarse reduction tile were silently dropped — an 8x8 tile can hold up
    to FOUR radius-5 survivors (pairwise Chebyshev 7 > 5), so even a
    per-tile top-2 lost corners. With 4x4 tiles a tile holds at most one
    radius>=3 survivor, so ALL of them must be detected. Peak strengths
    are made distinct so nothing depends on exact float ties."""
    from surikatoko_tpu.vision import features

    corners = ((48, 48), (48, 55), (55, 48), (55, 55))
    img = np.full((96, 96), 30.0, np.float32)
    for i, (cy, cx) in enumerate(corners):
        img[cy - 1:cy + 2, cx - 1:cx + 2] = 40.0
        img[cy, cx] = 200.0 + 8.0 * i      # distinct, no tie-dependence
    xy, valid = features.detect_corners(jnp.asarray(img), max_corners=8,
                                        nms_radius=5, border=4,
                                        quality_level=0.05)
    xy = np.asarray(xy)[np.asarray(valid)]
    found = {tuple(p) for p in np.round(xy).astype(int)}
    hits = sum(1 for (cy, cx) in corners
               if any(abs(px - cx) <= 1 and abs(py - cy) <= 1
                      for px, py in found))
    assert hits == 4, (found, hits)


def test_filter_out_closest():
    cand = jnp.asarray([[10.0, 10.0], [100.0, 100.0]])
    exist = jnp.asarray([[12.0, 11.0]])
    ok = features.filter_out_closest(cand, jnp.ones(2, bool), exist,
                                     jnp.ones(1, bool), min_dist=5.0)
    assert list(np.asarray(ok)) == [False, True]


def test_matcher_recruit_without_match_uses_fresh_free_count(rng):
    """recruit_new_salient_points called WITHOUT a preceding
    match_salient_points on the same state (the free-count cache is cold)
    must compute the free-slot budget itself: recruits fill exactly the
    free capacity. Guards the round-5 batched-readback cache — a stale or
    missing cache must never over- or under-budget recruits."""
    from surikatoko_tpu.geom import camera
    from surikatoko_tpu.models.monoslam import MonoSlamFilter, make_params
    from surikatoko_tpu.vision.matcher import ImageTemplCornersMatcher

    cam = camera.make_intrinsics((320, 240), (160.0, 120.0), 1.95,
                                 (0.01, 0.01))
    params = make_params(cam, None, dt=1.0,
                         process_noise_lin_veloc_std=0.02,
                         process_noise_ang_veloc_std=0.005)
    tracker = MonoSlamFilter(params, capacity=4, update_impl=1)
    matcher = ImageTemplCornersMatcher(tracker, templ_width=15,
                                       search_radius=8,
                                       detector_max_corners=8,
                                       min_distance_new_to_tracked=5.0)
    state = tracker.init_state()
    img = render_blobs(np.array([[60.0, 60.0], [160.0, 120.0],
                                 [240.0, 180.0], [90.0, 170.0],
                                 [210.0, 70.0], [120.0, 200.0]]))
    matcher.analyze_frame(img)
    assert matcher._n_free_cache[0] is None          # cold cache
    new_pix, new_mask = matcher.recruit_new_salient_points(
        state, 0, np.zeros(4, bool))
    n = int(np.sum(np.asarray(new_mask)))
    assert 0 < n <= 4                                # capped by free slots
    state, stats = tracker.process_frame(
        state, jnp.zeros((4, 2)), jnp.zeros(4, bool), new_pix, new_mask)
    matcher.on_landmarks_added(np.asarray(stats.new_slots),
                               matcher.last_new_pix_np, state)
    # all capacity used -> a fresh recruit call must budget ZERO
    if int(np.sum(np.asarray(state.lm_active))) == 4:
        matcher.analyze_frame(img)                   # invalidates the cache
        _, mask2 = matcher.recruit_new_salient_points(
            state, 1, np.zeros(4, bool))
        assert int(np.sum(np.asarray(mask2))) == 0
