"""Streaming mean/std accumulator (reference stat-helpers.h:7-18).

Functional: state is a tiny pytree so it can live inside scans or host loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class MeanStdState(NamedTuple):
    n: jnp.ndarray
    mean: jnp.ndarray
    m2: jnp.ndarray  # sum of squared deviations (Welford)


def mean_std_init(dtype=jnp.float32) -> MeanStdState:
    z = jnp.zeros((), dtype)
    return MeanStdState(jnp.zeros((), jnp.int32), z, z)


def mean_std_update(s: MeanStdState, x) -> MeanStdState:
    x = jnp.asarray(x, s.mean.dtype)
    n = s.n + 1
    delta = x - s.mean
    mean = s.mean + delta / n
    m2 = s.m2 + delta * (x - mean)
    return MeanStdState(n, mean, m2)


def mean_std_result(s: MeanStdState) -> tuple[jnp.ndarray, jnp.ndarray]:
    var = jnp.where(s.n > 1, s.m2 / jnp.maximum(s.n - 1, 1), 0.0)
    return s.mean, jnp.sqrt(var)
