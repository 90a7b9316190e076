"""Batched Gauss-Newton blocks for BA via autodiff.

Replaces the reference's closed-form "pqr" derivative machinery
(ComputeCloseFormReprErrorDerivatives, bundle-adj-kanatani.cpp:1140-1548).
Per observation (i,j) the residual r(X_i, u_j) depends on the point (3 vars)
and the frame's 10 local vars u = [dfx dfy du0 dv0 dTx dTy dTz dWx dWy dWz],
all zero at the linearization point (T/W are increments on the *direct*
camera pose; rotation increment is left-multiplied Rodrigues, reference
IncrementRotMat :59).

Blocks (Gauss-Newton, i.e. Kanatani's normal equations):
  E_i  = sum_j Jp^T Jp     [Np,3,3]     point-point
  G_j  = sum_i Jf^T Jf     [F,10,10]    frame-frame (block diag)
  F_ij = Jp^T Jf           [Np,F,3,10]  point-frame
  gp_i = sum_j Jp^T r      [Np,3]
  gf_j = sum_i Jf^T r      [F,10]

Gauge fixing: instead of deleting the 7 normalized rows/cols
(RemoveRowsAndColsInplace), fixed vars are masked out of Jf — their
corrections solve to exactly 0 through a unit diagonal (jit-stable shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from surikatoko_tpu.geom import so3
from surikatoko_tpu.models.ba.problem import BAProblem

FRAME_VARS = 10


class GNBlocks(NamedTuple):
    E: jnp.ndarray       # [Np, 3, 3]
    G: jnp.ndarray       # [F, 10, 10]
    Fpf: jnp.ndarray     # [Np, F, 3, 10]
    gp: jnp.ndarray      # [Np, 3]
    gf: jnp.ndarray      # [F, 10]


def frame_var_mask(n_frames: int, unity_comp_ind: int = 1,
                   optimize_intrinsics: bool = True,
                   pin_frames: tuple = ()) -> jnp.ndarray:
    """[F,10] bool mask of FREE frame variables under the normalization gauge:
    frame 0 keeps only intrinsics; frame 1 loses T[unity_comp]; others free.
    With ``optimize_intrinsics=False`` (the MVF shared-calibrated-K case) the
    four intrinsic vars are pinned for every frame. ``pin_frames`` holds
    additional frames whose pose (T, W) is frozen — fixed-keyframe BA, used
    e.g. to keep pose-graph loop-closure corrections from relaxing away."""
    mask = jnp.ones((n_frames, FRAME_VARS), bool)
    mask = mask.at[0, 4:].set(False)
    mask = mask.at[1, 4 + unity_comp_ind].set(False)
    for f in pin_frames:
        mask = mask.at[int(f), 4:].set(False)
    if not optimize_intrinsics:
        mask = mask.at[:, :4].set(False)
    return mask


def _residual_one(K, R_cfw, t_cfw, obs_f0, X, u):
    """Residual [2] of one observation as a function of point X and the local
    frame increment u (zeros at linearization)."""
    dtype = X.dtype
    dK = jnp.zeros((3, 3), dtype)
    dK = dK.at[0, 0].set(u[0]).at[1, 1].set(u[1])
    dK = dK.at[0, 2].set(u[2]).at[1, 2].set(u[3])
    Kp = K + dK
    # direct pose: R_d = R_cfw^T, t_d = -R_cfw^T t_cfw; increments apply there
    R_d = R_cfw.T
    t_d = -R_cfw.T @ t_cfw
    R_d_new = so3.exp(u[7:10]) @ R_d
    t_d_new = t_d + u[4:7]
    x_cam = R_d_new.T @ (X - t_d_new)
    x_h = Kp @ x_cam
    return x_h[:2] / x_h[2] - obs_f0


def _jacobians(p: BAProblem):
    """Per-observation residual + Jacobians over the dense grid, masked.
    Returns r [Np,F,2], Jp [Np,F,2,3], Jf [Np,F,2,10]."""
    dtype = p.points.dtype
    u0 = jnp.zeros((FRAME_VARS,), dtype)
    obs_f0 = p.obs / p.f0

    def per_obs(K, R, t, o, X):
        f = lambda XX, uu: _residual_one(K, R, t, o, XX, uu)
        r = f(X, u0)
        Jp, Jf = jax.jacfwd(f, argnums=(0, 1))(X, u0)
        return r, Jp, Jf

    per_frame = jax.vmap(per_obs, in_axes=(0, 0, 0, 0, None))      # over F
    per_point = jax.vmap(per_frame, in_axes=(None, None, None, 0, 0))  # over Np
    r, Jp, Jf = per_point(p.K, p.cfw_R, p.cfw_t, obs_f0, p.points)
    m = p.obs_mask[..., None].astype(dtype)
    return r * m, Jp * m[..., None], Jf * m[..., None]


def compute_blocks(p: BAProblem, unity_comp_ind: int = 1,
                   fix_gauge: bool = True,
                   optimize_intrinsics: bool = True,
                   pin_frames: tuple = ()) -> GNBlocks:
    r, Jp, Jf = _jacobians(p)
    if fix_gauge:
        fmask = frame_var_mask(p.n_frames, unity_comp_ind,
                               optimize_intrinsics,
                               pin_frames).astype(p.points.dtype)
        Jf = Jf * fmask[None, :, None, :]

    E = jnp.einsum("ifca,ifcb->iab", Jp, Jp)
    # points observed nowhere get a unit E block: gp=0 and F=0 for them, so
    # their corrections solve to exactly zero instead of inf
    unseen = jnp.logical_not(jnp.any(p.obs_mask, axis=1)).astype(E.dtype)
    E = E + jnp.eye(3, dtype=E.dtype)[None] * unseen[:, None, None]
    G = jnp.einsum("ifca,ifcb->fab", Jf, Jf)
    Fpf = jnp.einsum("ifca,ifcb->ifab", Jp, Jf)
    gp = jnp.einsum("ifca,ifc->ia", Jp, r)
    gf = jnp.einsum("ifca,ifc->fa", Jf, r)
    return GNBlocks(E=E, G=G, Fpf=Fpf, gp=gp, gf=gf)


def apply_corrections(p: BAProblem, dX: jnp.ndarray, du: jnp.ndarray) -> BAProblem:
    """Reference ApplyCorrections (bundle-adj-kanatani.cpp:1997-2063):
    X += dX; K += dK; direct T += dT; direct R <- Rodrigues(dW) R."""
    dtype = p.points.dtype
    points = p.points + dX
    dK = jnp.zeros((p.n_frames, 3, 3), dtype)
    dK = dK.at[:, 0, 0].set(du[:, 0]).at[:, 1, 1].set(du[:, 1])
    dK = dK.at[:, 0, 2].set(du[:, 2]).at[:, 1, 2].set(du[:, 3])
    K = p.K + dK
    R_d = jnp.swapaxes(p.cfw_R, -1, -2)
    t_d = -jnp.einsum("fij,fj->fi", R_d, p.cfw_t)
    R_d = so3.exp(du[:, 7:10]) @ R_d
    t_d = t_d + du[:, 4:7]
    cfw_R = jnp.swapaxes(R_d, -1, -2)
    cfw_t = -jnp.einsum("fij,fj->fi", cfw_R, t_d)
    return p._replace(points=points, K=K, cfw_R=cfw_R, cfw_t=cfw_t)
