"""Corner detection in pure JAX: Shi-Tomasi (min-eigenvalue) with non-max
suppression and spatial spreading.

The reference uses OpenCV ORB purely as a *detector* (50 keypoints,
demo-davison-mono-slam.cpp:441 — descriptors unused; tracking is NCC).
Shi-Tomasi plays the same role and vectorizes cleanly: gradient products,
box-filtered structure tensor, closed-form min eigenvalue, one-pass NMS via
maxpool compare, then top-N selection — all static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    k = jnp.ones((size, size), x.dtype)
    return jax.lax.conv_general_dilated(
        x[None, None], k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]


def shi_tomasi_response(image: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Min-eigenvalue corner response of the structure tensor."""
    img = image.astype(jnp.float32)
    # Sobel gradients
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 8.0
    ky = kx.T
    gx = jax.lax.conv_general_dilated(
        img[None, None], kx[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    gy = jax.lax.conv_general_dilated(
        img[None, None], ky[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    a = _box_filter(gx * gx, window)
    b = _box_filter(gx * gy, window)
    c = _box_filter(gy * gy, window)
    # min eigenvalue of [[a,b],[b,c]]
    tr = a + c
    det_rad = jnp.sqrt(jnp.maximum((a - c) ** 2 + 4 * b * b, 0.0))
    return 0.5 * (tr - det_rad)


@functools.partial(jax.jit, static_argnames=("max_corners", "nms_radius", "border"))
def detect_corners(image: jnp.ndarray, max_corners: int = 50,
                   nms_radius: int = 5, border: int = 10,
                   quality_level: float = 0.01
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-N Shi-Tomasi corners. Returns (xy [N,2] float32, valid [N])."""
    H, W = image.shape
    resp = shi_tomasi_response(image)
    # non-max suppression: keep pixels equal to their neighborhood max
    n = 2 * nms_radius + 1
    local_max = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (n, n), (1, 1), "SAME")
    is_peak = jnp.logical_and(resp >= local_max, resp > 0)
    # border + quality gate
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = ((xs >= border) & (xs < W - border)
              & (ys >= border) & (ys < H - border))
    thresh = quality_level * jnp.max(resp)
    score = jnp.where(is_peak & inside & (resp >= thresh), resp, -jnp.inf)

    flat = score.reshape(-1)
    top_vals, top_idx = jax.lax.top_k(flat, max_corners)
    xy = jnp.stack([(top_idx % W).astype(jnp.float32),
                    (top_idx // W).astype(jnp.float32)], axis=1)
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
