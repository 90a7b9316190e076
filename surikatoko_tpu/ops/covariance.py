"""Blocked symmetric covariance downdate kernel: P' = P - M^T M.

The EKF posterior update P -= K S K^T = P - (S^-T/2 A)^T (S^-1/2 A) is the
framework's dominant cost at large landmark counts (O(D^2 * 2K) — SURVEY §7
names it a Pallas target). XLA computes the full D x D GEMM; this kernel
exploits symmetry: a scalar-prefetch grid visits only the n(n+1)/2 lower
blocks (half the MXU work), computes C_ij = P_ij - M_i^T M_j with an
fori-loop over panels of the contraction dimension, and a cheap bandwidth
pass mirrors the strict lower triangle up. Output is exactly symmetric by
construction (replacing the separate 0.5 (P + P^T) pass).

Measured on v5e at D=3085, m=1024: 2.36 ms vs 2.44 ms for the XLA
GEMM+symmetrize expression — XLA's MXU pipeline already hides most of the
redundant upper-triangle work, so the EKF keeps the XLA path by default and
this kernel stands as the parity-tested alternative (its real win is the
bit-exact symmetry, which removes the explicit (P + P^T)/2 passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256


def _downdate_kernel(n_panels: int, ij_ref, P_ref, Mi_ref, Mj_ref, out_ref):
    """One lower-triangle block: out = P_blk - Mi^T Mj.

    ij_ref is the scalar-prefetch (i, j) table; BlockSpec index_maps already
    used it to route P/Mi/Mj/out, so the kernel body is a plain panel loop.
    Mi_ref/Mj_ref are [m, BLOCK] column panels of M.
    """
    acc0 = jnp.zeros((BLOCK, BLOCK), jnp.float32)
    m_panel = Mi_ref.shape[0] // n_panels

    def body(p, acc):
        a = Mi_ref[pl.ds(p * m_panel, m_panel), :]
        b = Mj_ref[pl.ds(p * m_panel, m_panel), :]
        return acc + jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n_panels, body, acc0)
    out_ref[:, :] = P_ref[:, :] - acc.astype(P_ref.dtype)


def symmetric_downdate(P: jnp.ndarray, M: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """P - M^T M for symmetric P [D,D], M [m,D]; returns an exactly
    symmetric result. D is padded to a BLOCK multiple internally."""
    D = P.shape[0]
    m = M.shape[0]
    dtype = P.dtype
    padD = (-D) % BLOCK
    pad_m = (-m) % 8
    if padD:
        P = jnp.pad(P, ((0, padD), (0, padD)))
        M = jnp.pad(M, ((0, 0), (0, padD)))
    if pad_m:
        M = jnp.pad(M, ((0, pad_m), (0, 0)))
    Dp = P.shape[0]
    mp = M.shape[0]
    nb = Dp // BLOCK

    # lower-triangle block list (static) as the scalar-prefetch table
    ij = np.asarray([(i, j) for i in range(nb) for j in range(i + 1)],
                    np.int32)
    n_blocks = len(ij)
    n_panels = max(1, mp // 512)
    while mp % n_panels:
        n_panels -= 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, BLOCK),
                         lambda g, ij_t: (ij_t[g, 0], ij_t[g, 1]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, BLOCK), lambda g, ij_t: (0, ij_t[g, 0]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, BLOCK), lambda g, ij_t: (0, ij_t[g, 1]),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK, BLOCK),
                               lambda g, ij_t: (ij_t[g, 0], ij_t[g, 1]),
                               memory_space=pltpu.VMEM),
    )
    lower = pl.pallas_call(
        functools.partial(_downdate_kernel, n_panels),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Dp, Dp), dtype),
        interpret=interpret,
    )(jnp.asarray(ij), P, M, M)

    # mirror: untouched upper blocks are undefined -> rebuild from the lower
    tri = jnp.tril(lower)
    out = tri + jnp.tril(lower, -1).T
    return out[:D, :D]
