"""Corner detection in pure JAX: Shi-Tomasi (min-eigenvalue) with non-max
suppression and spatial spreading, shaped for the TPU's VPU.

The reference uses OpenCV ORB purely as a *detector* (50 keypoints,
demo-davison-mono-slam.cpp:441 — descriptors unused; tracking is NCC).
Shi-Tomasi plays the same role and vectorizes cleanly.

TPU-first formulation (round 4): single-channel 2-D convs and an 11x11
``reduce_window`` are pathological on TPU — the MXU wants >=128 channels
and the windowed max does 121 compares/pixel; the conv-based detector
measured **47 ms/frame** at 640x480 on a v5e chip, 5x the entire K=768
EKF frame it feeds. Every filter here is separable, so the whole pass is
shifted-slice adds/maxes on the [H,W] plane (exact same numbers as the
zero-padded convs they replace: separable kernels factor through zero
padding, and max over a square window == max over rows of max over cols):

  - Sobel = [1,2,1] x [-1,0,1] outer products   -> 2 passes of 3-tap adds
  - box(w) structure-tensor sum                  -> 2 passes of w-tap adds
  - NMS max over (2r+1)^2                        -> 2 passes of (2r+1) maxes
  - top-N over H*W  -> per-TILE argmax over 4x4 tiles + top-N over the
    H*W/16 tile winners. NMS survivors are > nms_radius apart (Chebyshev),
    and the max Chebyshev distance inside a 4x4 tile is 3, so for
    nms_radius >= 3 a tile holds AT MOST ONE survivor and the tiled
    reduction is exactly the full top-N. (The round-5 predecessor used 8x8
    tiles, where up to FOUR legal survivors share a tile at the default
    nms_radius=5 — per-tile top-2 was not enough; shrinking the tile is
    both exact and simpler.)

Measured: 47 ms -> ~1 ms/frame, same detections (test_vision blob test).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sep_filter(img: jnp.ndarray, kv, kh) -> jnp.ndarray:
    """Separable zero-padded 'SAME' filter: vertical taps kv then
    horizontal taps kh (lists of python floats, odd length)."""
    rv = (len(kv) - 1) // 2
    p = jnp.pad(img, ((rv, rv), (0, 0)))
    H = img.shape[0]
    v = sum(float(k) * jax.lax.dynamic_slice_in_dim(p, i, H, axis=0)
            for i, k in enumerate(kv) if k != 0.0)
    rh = (len(kh) - 1) // 2
    p = jnp.pad(v, ((0, 0), (rh, rh)))
    W = img.shape[1]
    return sum(float(k) * jax.lax.dynamic_slice_in_dim(p, j, W, axis=1)
               for j, k in enumerate(kh) if k != 0.0)


def _sep_maxpool(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """(2r+1)^2 window max with -inf padding, as two separable passes."""
    H, W = x.shape
    p = jnp.pad(x, ((radius, radius), (0, 0)), constant_values=-jnp.inf)
    v = functools.reduce(jnp.maximum, (
        jax.lax.dynamic_slice_in_dim(p, i, H, axis=0)
        for i in range(2 * radius + 1)))
    p = jnp.pad(v, ((0, 0), (radius, radius)), constant_values=-jnp.inf)
    return functools.reduce(jnp.maximum, (
        jax.lax.dynamic_slice_in_dim(p, j, W, axis=1)
        for j in range(2 * radius + 1)))


def shi_tomasi_response(image: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Min-eigenvalue corner response of the structure tensor."""
    img = image.astype(jnp.float32)
    # Sobel gradients (separable outer products, /8 normalization)
    gx = _sep_filter(img, (0.125, 0.25, 0.125), (-1.0, 0.0, 1.0))
    gy = _sep_filter(img, (-1.0, 0.0, 1.0), (0.125, 0.25, 0.125))
    ones = (1.0,) * window
    a = _sep_filter(gx * gx, ones, ones)
    b = _sep_filter(gx * gy, ones, ones)
    c = _sep_filter(gy * gy, ones, ones)
    # min eigenvalue of [[a,b],[b,c]]
    tr = a + c
    det_rad = jnp.sqrt(jnp.maximum((a - c) ** 2 + 4 * b * b, 0.0))
    return 0.5 * (tr - det_rad)


@functools.partial(jax.jit, static_argnames=("max_corners", "nms_radius",
                                             "border", "tile"))
def detect_corners(image: jnp.ndarray, max_corners: int = 50,
                   nms_radius: int = 5, border: int = 10,
                   quality_level: float = 0.01, tile: int = 4
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-N Shi-Tomasi corners. Returns (xy [N,2] float32, valid [N])."""
    H, W = image.shape
    resp = shi_tomasi_response(image)
    # non-max suppression: keep pixels equal to their neighborhood max
    local_max = _sep_maxpool(resp, nms_radius)
    is_peak = jnp.logical_and(resp >= local_max, resp > 0)
    # border + quality gate
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((xs >= border) & (xs < W - border)
              & (ys >= border) & (ys < H - border))
    thresh = quality_level * jnp.max(resp)
    score = jnp.where(is_peak & inside & (resp >= thresh), resp, -jnp.inf)

    # tile-reduce before top_k: per-tile argmax over t*t, then top-N over
    # the H*W/t^2 tile winners. NMS survivors are > nms_radius apart in
    # Chebyshev distance, and the max Chebyshev distance inside a t x t
    # tile is t-1, so for nms_radius >= tile - 1 (default: 4-tiles,
    # radius >= 3) each tile holds AT MOST ONE survivor and the reduction
    # is EXACTLY the full top-N. (An 8x8 tile can legally hold up to four
    # radius-5 survivors — the round-5 top-2-per-8-tile variant still
    # dropped corners in dense regions; advisor r5.)
    Hp = -(-H // tile) * tile
    Wp = -(-W // tile) * tile
    sp = jnp.pad(score, ((0, Hp - H), (0, Wp - W)),
                 constant_values=-jnp.inf)
    nty, ntx = Hp // tile, Wp // tile
    tiles = sp.reshape(nty, tile, ntx, tile).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(nty * ntx, tile * tile)
    tile_arg = jnp.argmax(tiles, axis=1).astype(jnp.int32)
    tile_max = jnp.take_along_axis(tiles, tile_arg[:, None], axis=1)[:, 0]

    top_vals, top_i = jax.lax.top_k(tile_max, max_corners)
    ty = top_i // ntx
    tx = top_i % ntx
    inner = tile_arg[top_i]
    y = ty * tile + inner // tile
    x = tx * tile + inner % tile
    xy = jnp.stack([x.astype(jnp.float32), y.astype(jnp.float32)], axis=1)
    return xy, jnp.isfinite(top_vals)


def filter_out_closest(candidates: jnp.ndarray, cand_valid: jnp.ndarray,
                       existing: jnp.ndarray, exist_valid: jnp.ndarray,
                       min_dist: float) -> jnp.ndarray:
    """Spatial suppression of new corners near tracked ones (reference
    FilterOutClosest, demo-davison-mono-slam.cpp:828). Returns updated
    validity mask for candidates."""
    d2 = jnp.sum(
        (candidates[:, None, :] - existing[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(exist_valid[None, :], d2, jnp.inf)
    far = jnp.min(d2, axis=1) >= min_dist**2
    return jnp.logical_and(cand_valid, far)
