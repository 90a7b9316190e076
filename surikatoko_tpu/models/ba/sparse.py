"""Sparse (padded-track) BA for the at-scale configuration.

The dense [Np, F] observation grid (problem.py) is right for dino-sized
problems but not for 10k+ landmarks x 500+ keyframes (the grid alone would
be ~600 MB and ~0.2% occupied). Here observations are track-major: each
point carries up to L observing frames (padded):

  obs [Np, L, 2], frame_idx [Np, L] int32, obs_mask [Np, L]

Gauss-Newton blocks: per-observation Jacobians exactly as the dense path
(autodiff of the same residual), E/gp reduced over L per point, G/gf by
segment_sum over frames, and the Schur reduction scattered into the
[F,10,F,10] reduced system in point-chunks (each point contributes an
L x L grid of 10x10 blocks at its observing-frame pairs) — O(sum_i deg_i^2)
work, the classic sparse-BA cost, with no dense point-frame grid anywhere.

Numerically identical to the dense path on the same problem
(tests/test_ba_sparse.py) and shardable over points (parallel/sharded_schur
pattern: psum the scattered S and rhs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from surikatoko_tpu.models.ba import derivs as dv
from surikatoko_tpu.models.ba.derivs import FRAME_VARS, frame_var_mask
from surikatoko_tpu.models.ba.schur import _damp, _fixed_var_identity


class BAProblemSparse(NamedTuple):
    points: jnp.ndarray      # [Np, 3]
    cfw_R: jnp.ndarray       # [F, 3, 3]
    cfw_t: jnp.ndarray       # [F, 3]
    K: jnp.ndarray           # [F, 3, 3] f0-scaled
    obs: jnp.ndarray         # [Np, L, 2] pixels
    frame_idx: jnp.ndarray   # [Np, L] int32 (0 where masked)
    obs_mask: jnp.ndarray    # [Np, L]
    f0: jnp.ndarray

    @property
    def n_points(self) -> int:
        return self.points.shape[0]

    @property
    def n_frames(self) -> int:
        return self.cfw_R.shape[0]

    @property
    def track_len(self) -> int:
        return self.obs.shape[1]


def from_dense(p) -> BAProblemSparse:
    """Convert a dense BAProblem (host-side; for tests/parity)."""
    import numpy as np

    obs_mask = np.asarray(p.obs_mask)
    L = int(obs_mask.sum(axis=1).max())
    Np, F = obs_mask.shape
    obs = np.zeros((Np, L, 2))
    fidx = np.zeros((Np, L), np.int32)
    mask = np.zeros((Np, L), bool)
    for i in range(Np):
        js = np.nonzero(obs_mask[i])[0]
        obs[i, :len(js)] = np.asarray(p.obs)[i, js]
        fidx[i, :len(js)] = js
        mask[i, :len(js)] = True
    return BAProblemSparse(
        points=p.points, cfw_R=p.cfw_R, cfw_t=p.cfw_t, K=p.K,
        obs=jnp.asarray(obs, p.points.dtype), frame_idx=jnp.asarray(fidx),
        obs_mask=jnp.asarray(mask), f0=p.f0)


class SparseBlocks(NamedTuple):
    E: jnp.ndarray       # [Np, 3, 3]
    G: jnp.ndarray       # [F, 10, 10]
    Fpf: jnp.ndarray     # [Np, L, 3, 10]
    gp: jnp.ndarray      # [Np, 3]
    gf: jnp.ndarray      # [F, 10]


def reproj_error(p: BAProblemSparse) -> jnp.ndarray:
    from surikatoko_tpu.models.ba.problem import project_f0

    Kg = p.K[p.frame_idx]                 # [Np,L,3,3]
    Rg = p.cfw_R[p.frame_idx]
    tg = p.cfw_t[p.frame_idx]
    proj = project_f0(Kg, Rg, tg, p.points[:, None, :])
    r = (proj - p.obs / p.f0) * p.obs_mask[..., None].astype(p.points.dtype)
    return jnp.sum(r * r)


def compute_blocks(p: BAProblemSparse, unity_comp_ind: int = 1,
                   pin_frames: tuple = (),
                   optimize_intrinsics: bool = True) -> SparseBlocks:
    dtype = p.points.dtype
    F = p.n_frames
    u0 = jnp.zeros((FRAME_VARS,), dtype)
    obs_f0 = p.obs / p.f0
    Kg = p.K[p.frame_idx]
    Rg = p.cfw_R[p.frame_idx]
    tg = p.cfw_t[p.frame_idx]

    def per_obs(K, R, t, o, X):
        f = lambda XX, uu: dv._residual_one(K, R, t, o, XX, uu)
        r = f(X, u0)
        Jp, Jf = jax.jacfwd(f, argnums=(0, 1))(X, u0)
        return r, Jp, Jf

    per_track = jax.vmap(per_obs, in_axes=(0, 0, 0, 0, None))
    r, Jp, Jf = jax.vmap(per_track)(Kg, Rg, tg, obs_f0, p.points)
    m = p.obs_mask[..., None].astype(dtype)
    r = r * m
    Jp = Jp * m[..., None]
    Jf = Jf * m[..., None]
    fmask = frame_var_mask(F, unity_comp_ind, optimize_intrinsics,
                           pin_frames).astype(dtype)
    Jf = Jf * fmask[p.frame_idx][:, :, None, :]

    E = jnp.einsum("ilca,ilcb->iab", Jp, Jp)
    unseen = jnp.logical_not(jnp.any(p.obs_mask, axis=1)).astype(dtype)
    E = E + jnp.eye(3, dtype=dtype)[None] * unseen[:, None, None]
    gp = jnp.einsum("ilca,ilc->ia", Jp, r)
    Fpf = jnp.einsum("ilca,ilcb->ilab", Jp, Jf)

    seg = p.frame_idx.reshape(-1)
    G = jax.ops.segment_sum(
        jnp.einsum("oca,ocb->oab", Jf.reshape(-1, 2, FRAME_VARS),
                   Jf.reshape(-1, 2, FRAME_VARS)),
        seg, num_segments=F)
    gf = jax.ops.segment_sum(
        jnp.einsum("oca,oc->oa", Jf.reshape(-1, 2, FRAME_VARS),
                   r.reshape(-1, 2)),
        seg, num_segments=F)
    return SparseBlocks(E=E, G=G, Fpf=Fpf, gp=gp, gf=gf)


def solve_corrections_schur_sparse(
    p: BAProblemSparse, blocks: SparseBlocks, hessian_factor,
    unity_comp_ind: int = 1, optimize_intrinsics: bool = True,
    point_chunk: int = 2048, pin_frames: tuple = (),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-phase Schur solve; the reduction rides the MXU in Gram form.

    S = G_diag - sum_i F_i^T E_i^-1 F_i is computed as G_diag - B^T B with
    B_i = L_i^-1 F_i (E_i = L_i L_i^T batched 3x3 Cholesky): per point chunk,
    the L-track sparse rows expand into a dense [3*pc, 10F] strip via a
    one-hot batched matmul and ONE [10F, 3*pc] @ [3*pc, 10F] product
    accumulates every (l, m) frame-pair cross term. This replaces the direct
    form's pc*L^2 10x10 block scatter-adds (the reference's per-point loop,
    bundle-adj-kanatani.cpp:1888): the O(pc * (10F)^2) FLOPs of the dense
    strip product are ~40x the nonzero work at L=12, F=500, but the MXU runs
    them two orders of magnitude faster than TPU scatter-adds — measured
    17.2 TFLOP/s = 57% of the chip's f32 matmul ceiling and 2.7x faster LM
    iterations (3.5 -> 9.4/s) on the 10k x 500 configuration
    (analysis/roofline_schur.py). The rhs reduction and the point
    back-substitution ride the same Cholesky factor (no batched 3x3
    inverse). Exact same math: zero rows multiply to zero."""
    Np, L = blocks.Fpf.shape[0], blocks.Fpf.shape[1]
    F = p.n_frames
    dtype = blocks.E.dtype
    fmask = frame_var_mask(F, unity_comp_ind, optimize_intrinsics, pin_frames)

    E = _damp(blocks.E, hessian_factor)
    G = _fixed_var_identity(_damp(blocks.G, hessian_factor), fmask)
    Lch = jnp.linalg.cholesky(E)                            # [Np,3,3]
    # B_il = L_i^-1 F_il : solve over the 3 point vars, batched [Np,3,L*10]
    Bv = jax.scipy.linalg.solve_triangular(
        Lch, blocks.Fpf.transpose(0, 2, 1, 3).reshape(Np, 3, L * FRAME_VARS),
        lower=True).reshape(Np, 3, L, FRAME_VARS)           # [Np,3,L,10]
    # rhs reduction rides the same factor: F^T Einv g = B^T (L^-1 g)
    y = jax.scipy.linalg.solve_triangular(
        Lch, blocks.gp[:, :, None], lower=True)[..., 0]     # [Np,3]
    Rv = jnp.einsum("ialb,ia->ilb", Bv, y)                  # [Np,L,10]

    # pad Np to chunks
    pad = (-Np) % point_chunk
    def padz(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x
    Bp = padz(Bv)
    Rp = padz(Rv)
    fidxp = padz(p.frame_idx)
    n_chunks = Bp.shape[0] // point_chunk
    pc = point_chunk

    S0 = jnp.zeros((F * FRAME_VARS, F * FRAME_VARS), dtype)
    red0 = jnp.zeros((F, FRAME_VARS), dtype)

    def chunk_body(c, carry):
        S, red = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * pc, pc)
        Bc, Rc, fc = sl(Bp), sl(Rp), sl(fidxp)
        # one-hot matmuls instead of scatters: TPU scatter-add of pc*L small
        # blocks is ~2x slower than this batched [F,L]@[L,3*10] expansion
        oh = jax.nn.one_hot(fc, F, dtype=dtype)             # [pc,L,F]
        strip = jnp.einsum("ilf,ialb->iafb", oh, Bc)        # [pc,3,F,10]
        Bm = strip.reshape(pc * 3, F * FRAME_VARS)
        return S + Bm.T @ Bm, red + jnp.einsum("ilf,ilb->fb", oh, Rc)

    Sg, red = jax.lax.fori_loop(0, n_chunks, chunk_body, (S0, red0))
    S2 = (jnp.einsum("fab,fg->fagb", G, jnp.eye(F, dtype=dtype))
          .reshape(F * FRAME_VARS, F * FRAME_VARS) - Sg)

    rhs = (-(blocks.gf - red)).reshape(F * FRAME_VARS)

    # Jacobi symmetric preconditioning: essential for f32 at 5000+ unknowns
    # (pixel^2 vs radian^2 diagonal entries differ by ~1e6)
    d = jnp.sqrt(jnp.maximum(jnp.abs(jnp.diagonal(S2)), 1e-12))
    dinv = 1.0 / d
    S2p = S2 * dinv[:, None] * dinv[None, :]
    # SPD after damping + gauge unit diagonals: Cholesky is ~3x faster than
    # LU on TPU at 5000 unknowns; a failed factorization surfaces as NaN and
    # trips the ok flag (LM then raises the damping factor)
    du = (dinv * cho_solve(cho_factor(S2p, lower=True), rhs * dinv)
          ).reshape(F, FRAME_VARS)
    du_g = du[p.frame_idx]                                   # [Np,L,10]
    # back-substitute through the same Cholesky factor (no batched inverse)
    rhs_pt = blocks.gp + jnp.einsum("ilab,ilb->ia", blocks.Fpf, du_g)
    dX = -cho_solve((Lch, True), rhs_pt[:, :, None])[..., 0]
    ok = jnp.all(jnp.isfinite(du)) & jnp.all(jnp.isfinite(dX))
    return dX, du, ok


def apply_corrections(p: BAProblemSparse, dX, du) -> BAProblemSparse:
    from surikatoko_tpu.models.ba.problem import BAProblem

    dummy = BAProblem(points=p.points, cfw_R=p.cfw_R, cfw_t=p.cfw_t, K=p.K,
                      obs=jnp.zeros((1, p.n_frames, 2), p.points.dtype),
                      obs_mask=jnp.zeros((1, p.n_frames), bool), f0=p.f0)
    out = dv.apply_corrections(dummy, dX, du)
    return p._replace(points=out.points, cfw_R=out.cfw_R, cfw_t=out.cfw_t,
                      K=out.K)
