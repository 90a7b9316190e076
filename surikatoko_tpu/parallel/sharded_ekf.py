"""Landmark-sharded EKF stacked update over a device mesh.

The covariance P[D,D] (D = 13 + 6K) dominates memory and FLOPs at large K.
Sharding: landmark row-blocks of P over the "lm" mesh axis; the 13 camera
rows are replicated (tiny). Per step (SURVEY §7 "blocked EKF update"):

  local   A_k = H_k P          (needs only local P rows + H of local slots)
  gather  H blocks + A rows    (one all_gather of the gain precursor per step)
  repl    S = A H^T + R; whitened gain B = C^-1 A for S = C C^T (small trsm)
  local   Delta P rows = B[:, rows_d]^T B   (Gram product, own row block)

All cross-device traffic is the single all_gather of A [2K, D] plus the tiny
H/resid gathers; the O(D^2 K) downdate runs fully distributed. The Gram form
makes every P element B[:,r]^T B[:,c] — the identical contraction on every
device — so the assembled P is exactly symmetric across shards with NO
replicated (P + P^T)/2 repair pass (the old S^-1 form computed mirror
elements on different devices in different orders). Numerically identical to
models/monoslam/update.stacked_update (tested in tests/test_parallel_ekf.py —
the single-vs-sharded parity pattern that replaces the reference's
Schur-vs-naive check).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from surikatoko_tpu.models.monoslam import measure
from surikatoko_tpu.models.monoslam.state import CAM_STATE_COMPS, MonoSlamParams

_N = CAM_STATE_COMPS


def _local_update_kernel(params: MonoSlamParams, K: int,
                         x, P_cam, P_lm, lms, obs, obs_mask):
    """shard_map body. Shapes (per device, L = K / n_dev):
    x [D] repl, P_cam [13,D] repl, P_lm [L,6,D] local rows, lms [L,6],
    obs [L,2], obs_mask [L]."""
    dtype = x.dtype
    D = x.shape[0]
    L = lms.shape[0]
    cam13 = x[:_N]
    r_var = params.measurm_noise_var.astype(dtype)

    # same analytic Jacobian core as the single-device update (bit-identical
    # per-slot numerics -> tight sharded-vs-single parity)
    h_loc, Hcam_loc, Hlm_loc = measure.batched_jacobians(params, cam13, lms)
    m = obs_mask[:, None, None].astype(dtype)
    Hcam_loc = Hcam_loc * m
    Hlm_loc = Hlm_loc * m
    resid_loc = (obs - h_loc) * obs_mask[:, None].astype(dtype)

    # A rows for local observations: [L,2,D]
    A_loc = (jnp.einsum("kij,jd->kid", Hcam_loc, P_cam)
             + jnp.einsum("kij,kjd->kid", Hlm_loc, P_lm))

    # gather the small pieces
    Hcam_all = jax.lax.all_gather(Hcam_loc, "lm", tiled=True)   # [K,2,13]
    Hlm_all = jax.lax.all_gather(Hlm_loc, "lm", tiled=True)     # [K,2,6]
    A_all = jax.lax.all_gather(A_loc, "lm", tiled=True)         # [K,2,D]
    r_all = jax.lax.all_gather(resid_loc, "lm", tiled=True)     # [K,2]

    # innovation system (replicated; (2K)^2 is small next to D^2)
    A_lm_cols = A_all[:, :, _N:].reshape(K, 2, K, 6)
    S = (jnp.einsum("kid,ljd->kilj", A_all[:, :, :_N], Hcam_all)
         + jnp.einsum("kild,ljd->kilj", A_lm_cols, Hlm_all))
    S2 = S.reshape(2 * K, 2 * K) + r_var * jnp.eye(2 * K, dtype=dtype)
    A2 = A_all.reshape(2 * K, D)
    C = jnp.linalg.cholesky(S2)                     # replicated, (2K)^2 small
    B = solve_triangular(C, A2, lower=True)         # [2K, D] whitened gain
    y = solve_triangular(C, r_all.reshape(-1), lower=True)

    # state update (replicated)
    x_new = x + B.T @ y

    # covariance downdate, distributed over local rows: own-rows Gram slab
    dev = jax.lax.axis_index("lm")
    col0 = jnp.asarray(_N, jnp.int32) + dev.astype(jnp.int32) * (L * 6)
    B_own = jax.lax.dynamic_slice(
        B, (jnp.zeros((), jnp.int32), col0), (2 * K, L * 6))  # [2K, 6L]
    P_lm_new = P_lm - (B_own.T @ B).reshape(L, 6, D)

    # camera rows (replicated, tiny)
    P_cam_new = P_cam - B[:, :_N].T @ B

    return x_new, P_cam_new, P_lm_new, resid_loc


def _local_fused_kernel(params: MonoSlamParams, K: int,
                        x, P_cam, P_lm, lms, obs, obs_mask,
                        precomputed=None, deactivate_loc=None,
                        recruit=None):
    """shard_map body for the FUSED frame (update + health + predict as one
    covariance congruence, models/monoslam/fused_step.py). Same distributed
    structure as _local_update_kernel — one all_gather of the gain precursor
    — plus a tiny all_gather of the local covariance diagonals for the
    nonneg-variance keep mask. The V P V^T congruence is row-local: each
    device transforms its own landmark rows (columns hit by the replicated
    13x13 camera block Ac and the replicated keep mask).

    ``precomputed`` optionally carries (h_loc, Hcam_un, Hlm_un, A_un) — the
    UNMASKED local perception products the sharded imageseq loop already
    built for the NCC search-ellipse prediction (the sharded twin of the
    single-device precomputed path); masking is an exact row scaling.
    ``deactivate_loc`` ([L] bool) folds the delete-unobserved policy into
    the keep congruence, like the single-device deactivate_mask.

    ``recruit`` optionally carries (new_pix [M,2] REPLICATED candidate
    pixels, new_valid [M] replicated, free_loc [L] bool LOCAL free slots,
    rho0 replicated scalar or per-candidate [M] inverse-depth prior, or None
    for the configured
    one) and splices per-frame landmark RECRUITMENT into the congruence — the
    sharded twin of fused_step.fused_update_health_recruit_predict
    (reference ProcessFrame davison-mono-slam.cpp:923 ->
    RecruitNewSalientPoints :1812 -> AddSalientPoint :2597). The recruit
    math is REPLICATED for free: a new slot's covariance rows need only the
    top-7 posterior rows, recoverable from the replicated P_cam stripe and
    the replicated whitened gain B — no collective beyond one tiny
    all_gather of the free masks for globally-consistent first-free slot
    assignment. Only the row/col scatter is distributed: the owner device
    writes the recruited rows, every device writes the recruited columns
    into its own rows. When set, the kernel returns a sixth output
    ``slots`` [M] (global slot ids, -1 where not added)."""
    dtype = x.dtype
    D = x.shape[0]
    L = lms.shape[0]
    cam13 = x[:_N]
    r_var = params.measurm_noise_var.astype(dtype)

    m = obs_mask[:, None, None].astype(dtype)
    if precomputed is None:
        h_loc, Hcam_loc, Hlm_loc = measure.batched_jacobians(
            params, cam13, lms)
        Hcam_loc = Hcam_loc * m
        Hlm_loc = Hlm_loc * m
        A_loc = (jnp.einsum("kij,jd->kid", Hcam_loc, P_cam)
                 + jnp.einsum("kij,kjd->kid", Hlm_loc, P_lm))
    else:
        h_loc, Hcam_un, Hlm_un, A_un = precomputed
        Hcam_loc = Hcam_un * m
        Hlm_loc = Hlm_un * m
        A_loc = A_un * m
    resid_loc = (obs - h_loc) * obs_mask[:, None].astype(dtype)

    Hcam_all = jax.lax.all_gather(Hcam_loc, "lm", tiled=True)   # [K,2,13]
    Hlm_all = jax.lax.all_gather(Hlm_loc, "lm", tiled=True)     # [K,2,6]
    A_all = jax.lax.all_gather(A_loc, "lm", tiled=True)         # [K,2,D]
    r_all = jax.lax.all_gather(resid_loc, "lm", tiled=True)     # [K,2]

    A_lm_cols = A_all[:, :, _N:].reshape(K, 2, K, 6)
    S = (jnp.einsum("kid,ljd->kilj", A_all[:, :, :_N], Hcam_all)
         + jnp.einsum("kild,ljd->kilj", A_lm_cols, Hlm_all))
    S2 = S.reshape(2 * K, 2 * K) + r_var * jnp.eye(2 * K, dtype=dtype)
    A2 = A_all.reshape(2 * K, D)
    C = jnp.linalg.cholesky(S2)
    B = solve_triangular(C, A2, lower=True)         # [2K, D] whitened gain
    y = solve_triangular(C, r_all.reshape(-1), lower=True)
    x1 = x + B.T @ y

    # keep mask from diag(P) - colsum(B^2): local diagonals, tiny gather
    dev = jax.lax.axis_index("lm")
    col0 = jnp.asarray(_N, jnp.int32) + dev.astype(jnp.int32) * (L * 6)
    Pl = P_lm.reshape(L * 6, D)
    cols_loc = col0 + jnp.arange(L * 6, dtype=jnp.int32)
    diag_loc = jax.vmap(lambda row, c: row[c])(Pl, cols_loc)    # [6L]
    diag_lm = jax.lax.all_gather(diag_loc, "lm", tiled=True)    # [6K]
    diag_cam = jnp.diagonal(P_cam[:, :_N])
    keep = ((jnp.concatenate([diag_cam, diag_lm])
             - jnp.sum(B * B, axis=0)) >= 0).astype(dtype)
    if deactivate_loc is not None:
        drop_all = jax.lax.all_gather(deactivate_loc, "lm", tiled=True)
        keep = keep.at[_N:].mul(
            jnp.repeat(jnp.logical_not(drop_all), 6).astype(dtype))
        lm_zero = jnp.repeat(drop_all, 6)
        x1 = jnp.where(jnp.concatenate(
            [jnp.zeros((_N,), bool), lm_zero]), 0.0, x1)
    kc, km = keep[:_N], keep[_N:]

    from surikatoko_tpu.models.monoslam.fused_step import camera_epilogue
    epi = camera_epilogue(params, x1, K)
    x_next, Cp, G = epi.x_next, epi.Cp, epi.G

    # fused covariance P+ = V P V^T - (B V^T)^T (B V^T) + GQG (replicated
    # camera stripe; landmark rows local)
    Ac = Cp * kc[None, :]
    B2 = jnp.concatenate([B[:, :_N] @ Ac.T, B[:, _N:] * km[None, :]], axis=1)
    top_all = Ac @ P_cam                                        # [13,D]
    Q = params.process_noise_cov.astype(dtype)
    corner = top_all[:, :_N] @ Ac.T + G @ Q @ G.T
    corner = 0.5 * (corner + corner.T)
    top = jnp.concatenate([corner, top_all[:, _N:] * km[None, :]], axis=1)
    P_cam_new = top - B2[:, :_N].T @ B2

    km_own = jax.lax.dynamic_slice(km, (col0 - _N,), (L * 6,))
    # cam-col block = exact transpose of the replicated camera rows (the
    # single-device fused step's bottom = top[:, 13:].T trick): recomputing
    # it locally would be a transposed contraction with different rounding,
    # breaking exact stripe symmetry. The lm-lm block is symmetric as
    # computed: the keep congruence multiplies by exact 0/1 and the Gram
    # downdate runs the same-shaped matmul on every device.
    cam_cols = jax.lax.dynamic_slice(
        P_cam_new, (jnp.zeros((), jnp.int32), col0), (_N, L * 6)).T
    B2_own = jax.lax.dynamic_slice(
        B2, (jnp.zeros((), jnp.int32), col0), (2 * K, L * 6))
    lm_cols = (km_own[:, None] * (Pl[:, _N:] * km[None, :])
               - B2_own.T @ B2[:, _N:])
    if params.covar_diag_inflation is not None:
        # same live-diagonal inflation as the single-chip fused step
        infl = params.covar_diag_inflation.astype(dtype)
        idx = jnp.arange(_N)
        dgc = P_cam_new[idx, idx]
        P_cam_new = P_cam_new.at[idx, idx].add(
            jnp.where(dgc > 0, infl * kc, 0.0))
        rows = jnp.arange(L * 6)
        cols = (col0 - _N) + rows
        dgl = lm_cols[rows, cols]
        lm_cols = lm_cols.at[rows, cols].add(
            jnp.where(dgl > 0, infl * km_own, 0.0))
    Pl_new = jnp.concatenate([cam_cols, lm_cols], axis=1)        # [6L, D]

    if recruit is None:
        return x_next, P_cam_new, Pl_new.reshape(L, 6, D), resid_loc, x1

    # ---- recruit splice (replicated math, distributed scatter) ----
    from surikatoko_tpu.models.monoslam import fused_step as fused_step_mod

    new_pix, new_valid, free_loc, rho0_in = recruit
    M = new_pix.shape[0]

    # top-7 rows of the post-health, post-renorm posterior — replicated:
    # P[:7,:] is the replicated camera stripe, B the replicated gain
    # (identical formula to fused_update_health_recruit_predict)
    rows7 = (P_cam[:7, :] - B[:, :7].T @ B) * (kc[:7, None] * keep[None, :])
    rows7 = rows7.at[3:7, :].set(epi.Jq @ rows7[3:7, :])
    rows7 = rows7.at[:, 3:7].set(rows7[:, 3:7] @ epi.Jq.T)
    P77 = 0.5 * (rows7[:, :7] + rows7[:, :7].T)
    cam_pq = epi.x2[:7]

    # globally-consistent first-free slot assignment: slots are laid out
    # device-major, so concatenating the per-device free masks preserves
    # the single-device first-free order exactly. The linearization + row
    # assembly itself is the SHARED single-chip math (replicated inputs ->
    # replicated outputs on every device).
    free_all = jax.lax.all_gather(free_loc, "lm", tiled=True)    # [K]
    y_m, Rt, slots, valid, idx, idx_safe, v6 = fused_step_mod.recruit_rows(
        params, cam_pq, rows7, P77, free_all, new_pix, new_valid, rho0_in,
        epi.F)

    # scatter — same row-then-column order as the single-chip fused recruit
    x_next = x_next.at[idx_safe].set(y_m.reshape(6 * M), mode="drop")
    P_cam_new = P_cam_new.at[:, idx_safe].set(Rt[:, :_N].T, mode="drop")
    # recruited ROWS: owned by one device (a slot's 6 rows never split)
    comp_own = v6 & (idx >= col0) & (idx < col0 + L * 6)
    idx_loc = jnp.where(comp_own, idx - col0, L * 6)
    Pl_new = Pl_new.at[idx_loc, :].set(Rt, mode="drop")
    # recruited COLUMNS of the local rows: P[r, idx] = Rt[:, r]^T for the
    # global row range this device owns
    col_block = jax.lax.dynamic_slice(
        Rt, (jnp.zeros((), jnp.int32), col0), (6 * M, L * 6)).T  # [6L, 6M]
    Pl_new = Pl_new.at[:, idx_safe].set(col_block, mode="drop")

    return x_next, P_cam_new, Pl_new.reshape(L, 6, D), resid_loc, x1, slots


def make_sharded_fused_step(params: MonoSlamParams, capacity: int, mesh: Mesh):
    """Landmark-sharded FUSED frame step (stacked update + nonneg-variance
    clamp + quat renorm + kinematic predict as one congruence): the sharded
    counterpart of fused_step.fused_update_health_predict. Returns a jitted
    fn (x, P, obs, obs_mask) -> (x_next, P_next, resid, x_post_update).
    Parity: tests/test_parallel_fused.py (single vs 2/4/8-device mesh)."""
    n_dev = mesh.devices.size
    assert capacity % n_dev == 0, (capacity, n_dev)

    kernel = functools.partial(_local_fused_kernel, params, capacity)
    smapped = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(), P("lm"), P("lm"), P("lm"), P("lm")),
        out_specs=(P(), P(), P("lm"), P("lm"), P()),
        check_rep=False,
    )

    @jax.jit
    def step(x, Pmat, obs, obs_mask):
        D = x.shape[0]
        P_cam = Pmat[:_N, :]
        P_lm = Pmat[_N:, :].reshape(capacity, 6, D)
        lms = x[_N:].reshape(capacity, 6)
        x_next, P_cam_new, P_lm_new, resid, x1 = smapped(
            x, P_cam, P_lm, lms, obs, obs_mask)
        P_new = jnp.concatenate([P_cam_new, P_lm_new.reshape(-1, D)], axis=0)
        return x_next, P_new, resid, x1

    return step


def make_sharded_stacked_update(params: MonoSlamParams, capacity: int, mesh: Mesh):
    """Returns a jitted fn (x, P, obs, obs_mask) -> (x', P', resid) running the
    stacked update landmark-sharded over ``mesh`` axis "lm".

    P is accepted/returned as the full [D,D] array (sharding handled
    internally via shard_map specs); capacity must divide the mesh size.
    """
    n_dev = mesh.devices.size
    assert capacity % n_dev == 0, (capacity, n_dev)

    kernel = functools.partial(_local_update_kernel, params, capacity)
    smapped = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(), P("lm"), P("lm"), P("lm"), P("lm")),
        out_specs=(P(), P(), P("lm"), P("lm")),
        check_rep=False,
    )

    @jax.jit
    def update(x, Pmat, obs, obs_mask):
        D = x.shape[0]
        P_cam = Pmat[:_N, :]
        P_lm = Pmat[_N:, :].reshape(capacity, 6, D)
        lms = x[_N:].reshape(capacity, 6)
        x_new, P_cam_new, P_lm_new, resid = smapped(
            x, P_cam, P_lm, lms, obs, obs_mask)
        # exactly symmetric by the Gram construction — no (P + P^T)/2 pass
        P_new = jnp.concatenate([P_cam_new, P_lm_new.reshape(-1, D)], axis=0)
        return x_new, P_new, resid

    return update
