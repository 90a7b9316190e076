"""SE(3) rigid transforms as a small pytree, plus look-at construction.

Equivalent of reference obs-geom.h:117-174 (SE3Transform/SE3Inv/SE3Apply/
SE3AFromB) and obs-geom.cpp:729 (LookAtLufWfc). A transform maps points from
frame B to frame A: ``x_a = R @ x_b + t``.

Convention notes (match the reference):
* "cfw" = camera-from-world (the reference's ``inverse_orient_cam``),
  "wfc" = world-from-camera (R columns = camera axes in world, t = camera
  center in world).
* The camera frame is **L**eft-**U**p-**F**orward: column 0 = up × forward,
  column 1 = up, column 2 = viewing direction — which pairs with the negated
  pixel projection in geom/camera.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SE3(NamedTuple):
    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def inv(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: first apply `other`, then `self`."""
        return SE3(
            self.R @ other.R,
            jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
        )

    def matrix4(self) -> jnp.ndarray:
        bot = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=self.R.dtype),
            self.R.shape[:-2] + (1, 4),
        )
        top = jnp.concatenate([self.R, self.t[..., None]], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)


def identity(dtype=jnp.float32, batch_shape=()) -> SE3:
    return SE3(
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
        jnp.zeros(batch_shape + (3,), dtype=dtype),
    )


def a_from_b(a_from_w: SE3, b_from_w: SE3) -> SE3:
    """Transform mapping frame B coords into frame A (reference SE3AFromB)."""
    return a_from_w.compose(b_from_w.inv())


def look_at_luf_wfc(eye: jnp.ndarray, center: jnp.ndarray, up: jnp.ndarray) -> SE3:
    """World-from-camera for a camera at `eye` looking at `center`.

    Camera axes in world: col2 = forward = normalize(center-eye),
    col1 = up component orthogonal to forward, col0 = up × forward.
    Matches reference obs-geom.cpp:729-749.
    """
    fwd = center - eye
    fwd = fwd / jnp.linalg.norm(fwd, axis=-1, keepdims=True)
    cam_up = up - fwd * jnp.sum(up * fwd, axis=-1, keepdims=True)
    cam_up = cam_up / jnp.linalg.norm(cam_up, axis=-1, keepdims=True)
    left = jnp.cross(cam_up, fwd)
    R = jnp.stack([left, cam_up, fwd], axis=-1)
    return SE3(R, eye)
