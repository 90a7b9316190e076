"""Small linear-algebra utilities.

Gauss-Jordan elimination with partial pivoting — parity with the reference
prototype's ``GaussJordanElimination`` (py_proto/suriko/la_utils.py:1-40),
re-designed jit-safe: fixed trip-count ``lax.fori_loop`` with masked pivot
selection and functional row swaps instead of in-place Python loops, and a
``(rref, ok)`` return instead of mutate+bool (XLA has no in-place aliasing at
the Python level). The engine itself solves systems by Cholesky/QR; this
exists for API parity and as the reference's singularity-detecting fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gauss_jordan(m: jnp.ndarray, eps: float = 1e-10
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reduce ``m`` [N, C] to reduced row echelon form.

    Returns (rref, ok): ok is False if any pivot magnitude falls below
    ``eps`` (singular top-left block), matching the reference's False return
    (la_utils.py:19). On failure the returned matrix is unspecified.
    """
    m = jnp.asarray(m)
    nrows, ncols = m.shape
    ident = min(nrows, ncols)
    rows = jnp.arange(nrows)
    one = jnp.asarray(1.0, m.dtype)

    def body(i, carry):
        a, ok = carry
        cand = jnp.where(rows >= i, jnp.abs(a[:, i]), -jnp.inf)
        p = jnp.argmax(cand)
        pivot = jnp.abs(a[p, i])
        ok = jnp.logical_and(ok, pivot >= eps)
        row_i, row_p = a[i], a[p]
        a = a.at[i].set(row_p).at[p].set(row_i)
        d = jnp.where(pivot >= eps, a[i, i], one)   # no div-by-0 after failure
        ri = a[i] / d
        factors = a[:, i].at[i].set(0.0)
        a = a - jnp.outer(factors, ri)
        a = a.at[i].set(ri)
        return a, ok

    return jax.lax.fori_loop(0, ident, body, (m, jnp.asarray(True)))
