"""Axis-aligned rectangle ops as [x, y, w, h] arrays.

Equivalent of reference obs-geom.h:64-115 (intersect/deflate/clamp helpers used
by the NCC search-window logic). Rects are float arrays; an empty intersection
has w<=0 or h<=0.
"""

from __future__ import annotations

import jax.numpy as jnp


def make(x, y, w, h, dtype=None) -> jnp.ndarray:
    return jnp.asarray([x, y, w, h], dtype=dtype or jnp.result_type(float))


def from_points(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.minimum(p1, p2)
    hi = jnp.maximum(p1, p2)
    return jnp.concatenate([lo, hi - lo], axis=-1)


def right_bottom(r: jnp.ndarray) -> jnp.ndarray:
    return r[..., :2] + r[..., 2:]


def intersect(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Intersection rect; zero-sized (clamped) if disjoint."""
    lo = jnp.maximum(a[..., :2], b[..., :2])
    hi = jnp.minimum(right_bottom(a), right_bottom(b))
    wh = jnp.maximum(hi - lo, 0.0)
    return jnp.concatenate([lo, wh], axis=-1)


def is_empty(r: jnp.ndarray) -> jnp.ndarray:
    return jnp.logical_or(r[..., 2] <= 0, r[..., 3] <= 0)


def deflate(r: jnp.ndarray, dx, dy) -> jnp.ndarray:
    d = jnp.stack([jnp.asarray(dx, r.dtype), jnp.asarray(dy, r.dtype)], axis=-1)
    return jnp.concatenate([r[..., :2] + d, r[..., 2:] - 2 * d], axis=-1)


def center(r: jnp.ndarray) -> jnp.ndarray:
    return r[..., :2] + 0.5 * r[..., 2:]


def centered(c: jnp.ndarray, w, h) -> jnp.ndarray:
    wh = jnp.stack([jnp.asarray(w, c.dtype), jnp.asarray(h, c.dtype)], axis=-1)
    return jnp.concatenate([c - 0.5 * wh, wh], axis=-1)


def contains(r: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    inside_lo = jnp.all(p >= r[..., :2], axis=-1)
    inside_hi = jnp.all(p < right_bottom(r), axis=-1)
    return jnp.logical_and(inside_lo, inside_hi)


def clamp_rect_to(outer: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Translate/shrink r so it fits inside outer (used for search windows)."""
    inter = intersect(outer, r)
    return inter
