"""Correction solvers: Schur-complement two-phase solve + naive dense
cross-check.

Reference EstimateCorrectionsDecomposedInTwoPhases
(bundle-adj-kanatani.cpp:1771-1995): eliminate the 3Np point block via
batched 3x3 inverses, reduce onto the 10F camera system
(S = G - sum_i F_i^T E_i^-1 F_i — the reference's marked "perf hot spot"
:1888 becomes one einsum chain), solve, back-substitute points.

Damping is multiplicative on the diagonal (x(1+factor)), matching the
reference (:1817-1833). Gauge-fixed variables carry zero rows/cols with a
unit diagonal, so they solve to exactly zero correction without any shape
surgery (replaces RemoveRowsAndColsInplace).

Solves H d = -g; returns (dX [Np,3], du [F,10]).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from surikatoko_tpu.models.ba.derivs import FRAME_VARS, GNBlocks, frame_var_mask


def _damp(M: jnp.ndarray, factor) -> jnp.ndarray:
    """diag *= (1 + factor) on the trailing square dims."""
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    return M + M * eye * factor


def _fixed_var_identity(G: jnp.ndarray, fmask: jnp.ndarray) -> jnp.ndarray:
    """Set unit diagonal on gauge-fixed frame vars so the system stays SPD."""
    fixed = (~fmask).astype(G.dtype)
    eye = jnp.eye(FRAME_VARS, dtype=G.dtype)
    return G + eye[None] * fixed[:, None, :]


def solve_corrections_schur(blocks: GNBlocks, hessian_factor,
                            unity_comp_ind: int = 1,
                            optimize_intrinsics: bool = True,
                            pin_frames: tuple = ()
                            ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-phase solve. Returns (dX, du, ok) where ok=False if the reduced
    system was numerically singular."""
    Np, F = blocks.Fpf.shape[0], blocks.Fpf.shape[1]
    dtype = blocks.E.dtype
    fmask = frame_var_mask(F, unity_comp_ind, optimize_intrinsics, pin_frames)

    E = _damp(blocks.E, hessian_factor)                       # [Np,3,3]
    G = _damp(blocks.G, hessian_factor)                       # [F,10,10]
    G = _fixed_var_identity(G, fmask)

    Einv = jnp.linalg.inv(E)                                  # batched 3x3
    # C_ij = E_i^-1 F_ij : [Np,F,3,10]
    C = jnp.einsum("iab,ifbc->ifac", Einv, blocks.Fpf)
    # S_jl = delta_jl G_j - sum_i F_ij^T C_il  (reduced camera system)
    S = -jnp.einsum("ifab,igac->fbgc", blocks.Fpf, C)
    S = S + jnp.einsum("fab,fg->fagb", G, jnp.eye(F, dtype=dtype))
    S = S.reshape(F * FRAME_VARS, F * FRAME_VARS)

    # rhs_f = -(gf - sum_i F_ij^T E_i^-1 gp_i)
    w = jnp.einsum("iab,ib->ia", Einv, blocks.gp)             # [Np,3]
    rhs = -(blocks.gf - jnp.einsum("ifab,ia->fb", blocks.Fpf, w))
    rhs = rhs.reshape(F * FRAME_VARS)

    # Jacobi symmetric preconditioning (robustness for f32 reduced systems)
    dgs = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diagonal(S)), 1e-12))
    dinv = 1.0 / dgs
    Sp = S * dinv[:, None] * dinv[None, :]
    du = (dinv * cho_solve(cho_factor(Sp, lower=True), rhs * dinv)
          ).reshape(F, FRAME_VARS)
    # back-substitute points: dX_i = -E_i^-1 (gp_i + sum_j F_ij du_j)
    dX = -jnp.einsum("iab,ib->ia",
                     Einv, blocks.gp + jnp.einsum("ifab,fb->ia", blocks.Fpf, du))
    ok = jnp.all(jnp.isfinite(du)) & jnp.all(jnp.isfinite(dX))
    return dX, du, ok


def solve_corrections_naive(blocks: GNBlocks, hessian_factor,
                            unity_comp_ind: int = 1,
                            optimize_intrinsics: bool = True,
                            pin_frames: tuple = ()
                            ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Assemble the full dense Hessian and solve — the reference
    EstimateCorrectionsNaive (:1700), kept as the numeric cross-check."""
    Np, F = blocks.Fpf.shape[0], blocks.Fpf.shape[1]
    dtype = blocks.E.dtype
    n_p = Np * 3
    n_f = F * FRAME_VARS
    fmask = frame_var_mask(F, unity_comp_ind, optimize_intrinsics, pin_frames)

    E = _damp(blocks.E, hessian_factor)
    G = _fixed_var_identity(_damp(blocks.G, hessian_factor), fmask)

    H = jnp.zeros((n_p + n_f, n_p + n_f), dtype)
    Hpp = jnp.einsum("iab,ij->iajb", E, jnp.eye(Np, dtype=dtype))
    H = H.at[:n_p, :n_p].set(Hpp.reshape(n_p, n_p))
    Hff = jnp.zeros((F, FRAME_VARS, F, FRAME_VARS), dtype)
    Hff = Hff + jnp.einsum("fab,fg->fagb", G, jnp.eye(F, dtype=dtype))
    H = H.at[n_p:, n_p:].set(Hff.reshape(n_f, n_f))
    Hpf = blocks.Fpf.transpose(0, 2, 1, 3).reshape(n_p, n_f)
    H = H.at[:n_p, n_p:].set(Hpf)
    H = H.at[n_p:, :n_p].set(Hpf.T)

    g = jnp.concatenate([blocks.gp.reshape(-1), blocks.gf.reshape(-1)])
    d = jnp.linalg.solve(H, -g)
    dX = d[:n_p].reshape(Np, 3)
    du = d[n_p:].reshape(F, FRAME_VARS)
    ok = jnp.all(jnp.isfinite(d))
    return dX, du, ok


def solve_corrections_steepest_descent(blocks: GNBlocks, step
                                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gradient step fallback (reference EstimateCorrectionsSteepestDescent
    :1681)."""
    return -step * blocks.gp, -step * blocks.gf
