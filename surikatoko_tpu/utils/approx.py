"""Closeness predicates with numpy semantics (reference approx-alg.h:8-47)."""

from __future__ import annotations

import jax.numpy as jnp


def is_close(a, b, rtol: float = 1e-5, atol: float = 1e-8):
    return jnp.isclose(jnp.asarray(a), jnp.asarray(b), rtol=rtol, atol=atol)


def is_close_abs(a, b, atol: float = 1e-8):
    return jnp.abs(jnp.asarray(a) - jnp.asarray(b)) <= atol


def sqr(x):
    return x * x
