"""Uncertainty ellipses/ellipsoids from covariance matrices.

Equivalent of reference obs-geom.cpp:751-1030: eigendecompose a 2x2 (or 3x3)
positive-definite covariance, scale semi-axes by the chi-square quantile for
the requested confidence, and report the rotated ellipse plus its axis-aligned
bounds (used to gate the NCC template search).

Closed-form chi-square quantiles (no scipy): dof=2 has an exact inverse; dof=3
uses the Wilson-Hilferty cube approximation (relative error < 1e-3 over the
confidence range used here).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RotatedEllipse2D(NamedTuple):
    center: jnp.ndarray     # [..., 2]
    R: jnp.ndarray          # [..., 2, 2] world_from_ellipse rotation
    semi_axes: jnp.ndarray  # [..., 2]


class RotatedEllipsoid3D(NamedTuple):
    center: jnp.ndarray     # [..., 3]
    R: jnp.ndarray          # [..., 3, 3]
    semi_axes: jnp.ndarray  # [..., 3]


def chi_square_quantile_2dof(confidence) -> jnp.ndarray:
    """Exact: F(x) = 1 - exp(-x/2)  =>  x = -2 ln(1-p)."""
    p = jnp.asarray(confidence)
    return -2.0 * jnp.log1p(-p)


def chi_square_quantile_3dof(confidence) -> jnp.ndarray:
    """Wilson-Hilferty approximation for dof=3."""
    p = jnp.asarray(confidence)
    # normal quantile via Acklam-style rational approx (good to ~1e-8 centrally)
    z = _norm_ppf(p)
    k = 3.0
    return k * (1.0 - 2.0 / (9.0 * k) + z * jnp.sqrt(2.0 / (9.0 * k))) ** 3


def _norm_ppf(p):
    # Peter Acklam's inverse normal CDF rational approximation.
    a = jnp.asarray([-3.969683028665376e+01, 2.209460984245205e+02,
                     -2.759285104469687e+02, 1.383577518672690e+02,
                     -3.066479806614716e+01, 2.506628277459239e+00])
    b = jnp.asarray([-5.447609879822406e+01, 1.615858368580409e+02,
                     -1.556989798598866e+02, 6.680131188771972e+01,
                     -1.328068155288572e+01])
    c = jnp.asarray([-7.784894002430293e-03, -3.223964580411365e-01,
                     -2.400758277161838e+00, -2.549732539343734e+00,
                     4.374664141464968e+00, 2.938163982698783e+00])
    d = jnp.asarray([7.784695709041462e-03, 3.224671290700398e-01,
                     2.445134137142996e+00, 3.754408661907416e+00])
    p = jnp.asarray(p)
    plow, phigh = 0.02425, 1 - 0.02425

    def central(p):
        q = p - 0.5
        r = q * q
        num = ((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]
        den = (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)
        return q * num / den

    def upper(p):
        q = jnp.sqrt(-2 * jnp.log(jnp.maximum(1 - p, 1e-300)))
        num = ((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]
        den = ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
        return num / den

    def lower(p):
        return -upper(1 - p)

    return jnp.where(p < plow, lower(jnp.clip(p, 1e-12, 1.0)),
                     jnp.where(p > phigh, upper(p), central(jnp.clip(p, plow, phigh))))


def _eigh_scaled(cov: jnp.ndarray, chi2) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    vals, vecs = jnp.linalg.eigh(cov)
    vals = jnp.maximum(vals, 0.0)
    semi = jnp.sqrt(vals * chi2)
    # order descending like the reference (largest axis first)
    order = jnp.flip(jnp.arange(cov.shape[-1]))
    semi = semi[..., order]
    vecs = vecs[..., :, order]
    # keep determinant +1 so R is a rotation
    det = jnp.linalg.det(vecs)
    vecs = vecs.at[..., :, -1].multiply(jnp.where(det < 0, -1.0, 1.0)[..., None])
    return semi, vecs, vals


def ellipse_from_covariance(cov: jnp.ndarray, center: jnp.ndarray,
                            confidence: float = 0.95) -> RotatedEllipse2D:
    chi2 = chi_square_quantile_2dof(confidence).astype(cov.dtype)
    semi, vecs, _ = _eigh_scaled(cov, chi2)
    return RotatedEllipse2D(center=center, R=vecs, semi_axes=semi)


def ellipsoid_from_covariance(cov: jnp.ndarray, center: jnp.ndarray,
                              confidence: float = 0.95) -> RotatedEllipsoid3D:
    chi2 = chi_square_quantile_3dof(confidence).astype(cov.dtype)
    semi, vecs, _ = _eigh_scaled(cov, chi2)
    return RotatedEllipsoid3D(center=center, R=vecs, semi_axes=semi)


def is_ellipsoid_extractable(cov: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """True when the covariance admits a real uncertainty ellipsoid (all
    eigenvalues finite and > eps). Reference ``CheckSalientPoint``
    (davison-mono-slam.cpp:4152) removes landmarks failing this."""
    vals = jnp.linalg.eigvalsh(cov)
    finite = jnp.all(jnp.isfinite(vals), axis=-1)
    return jnp.logical_and(finite, jnp.all(vals > eps, axis=-1))


def ellipse_bounds(e: RotatedEllipse2D) -> jnp.ndarray:
    """Axis-aligned bounding rect [x, y, w, h] of a rotated ellipse
    (reference ``GetEllipseBounds2``, obs-geom.cpp:751)."""
    # extent along world axis i: sqrt(sum_j (R[i,j] * a_j)^2)
    ext = jnp.sqrt(jnp.sum((e.R * e.semi_axes[..., None, :]) ** 2, axis=-1))
    lo = e.center - ext
    return jnp.concatenate([lo, 2.0 * ext], axis=-1)
