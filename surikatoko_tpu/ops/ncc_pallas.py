"""Fused Pallas TPU kernel for the batched ZNCC search.

Layout: landmarks live in the *lane* dimension — patches are [P, P, K] so a
block of 128 landmarks fills the VPU lanes exactly, and every shifted-window
multiply-add processes 128 landmarks at once. The kernel accumulates the
correlation surface, window sum and window sum-of-squares over the T^2
template taps (outer fori over the untiled row offset i — dynamic indices
are free there; inner *static* unroll over the sublane column offset j,
which Mosaic requires), then normalizes and takes the gate-masked argmax.
The [S, S, K] surface never round-trips to HBM, unlike the XLA conv path
(ops/ncc.py) which materializes it between ops.

Numerics match ops/ncc.py's conv formulation exactly (same cancellation:
corr_prod = conv(f, t - mean(t))); parity is tested in interpret mode on CPU
and on the real chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ncc_block_kernel(T: int, S: int, n_pix: float, with_neigh: bool,
                      patches_ref, taps_ref, tssd_ref, gate_ref,
                      best_corr_ref, best_idx_ref, neigh_ref=None):
    """patches_ref [1,P,P,LANES]; taps_ref [1,T,T,LANES] (template - mean);
    tssd_ref [1,1,LANES]; gate_ref [1,S,S,LANES]; outputs best_corr/best_idx
    [1,1,LANES] + (with_neigh only) neigh [1,4,LANES] — the RAW ungated
    surface at the argmax's x-1/x+1/y-1/y+1 neighbours, which the subpixel
    parabola consumes instead of re-evaluating 4 ZNCCs per slot with
    dynamic slices; row-wrap garbage at window edges is masked by the
    caller. With subpixel off the neigh output and its 4 masked [S*S,LANES]
    reductions are compiled out entirely."""
    dtype = patches_ref.dtype

    def row_body(i, cp):
        for j in range(T):                      # static: sublane offsets
            sl = patches_ref[0, pl.ds(i, S), pl.ds(j, S), :]  # [S,S,LANES]
            tval = taps_ref[0, i, j, :]                       # [LANES]
            cp = cp + tval[None, None, :] * sl
        return cp

    zero = jnp.zeros((S, S, LANES), dtype)
    cp = jax.lax.fori_loop(0, T, row_body, zero)

    # window sum / sum-of-squares are BOX filters — separable: one T-tap
    # row pass to [S,P,LANES] strips, one T-tap column pass to [S,S,LANES],
    # replacing 2*T^2 accumulation streams with 2*T. The win is modest
    # (~5% of the search at T=S=15/K=768 on v5e: the T^2 loop's shifted
    # window LOADS dominate and the numerator still needs every one of
    # them — only the redundant ws/ws2 FMAs disappear). Numerics: same
    # values summed in a different association — parity vs the XLA conv
    # path is pinned at 1e-4/1e-5 in tests and re-measured on-chip every
    # round by the bench's ncc_pallas_maxdiff key
    patch = patches_ref[0]                                    # [P,P,LANES]
    sq = patch * patch
    # static python loops: T is a trace-time constant and Mosaic lowers
    # static value slices (dynamic_slice on values is unsupported)
    rs = sum(patch[i:i + S, :, :] for i in range(T))          # [S,P,LANES]
    rs2 = sum(sq[i:i + S, :, :] for i in range(T))
    ws = sum(rs[:, j:j + S, :] for j in range(T))             # [S,S,LANES]
    ws2 = sum(rs2[:, j:j + S, :] for j in range(T))

    var_term = jnp.maximum(ws2 - ws * ws * (1.0 / n_pix), 0.0)
    denom = jnp.sqrt(var_term) * tssd_ref[0, 0, :][None, None, :]
    ok = denom > 1e-12
    corr_raw = jnp.where(ok, cp / jnp.where(ok, denom, 1.0), 0.0)
    corr = jnp.where(gate_ref[0], corr_raw, -jnp.inf)

    flat = corr.reshape(S * S, LANES)
    best = jnp.argmax(flat, axis=0).astype(jnp.int32)
    best_corr_ref[0, 0, :] = jnp.max(flat, axis=0)
    best_idx_ref[0, 0, :] = best
    if with_neigh:
        # one-hot gathers of the raw surface at best±1 (x) / best±S (y): a
        # few masked [S*S, LANES] reductions vs the T^2-tap accumulation
        flat_raw = corr_raw.reshape(S * S, LANES)
        iot = jax.lax.broadcasted_iota(jnp.int32, (S * S, LANES), 0)
        for o, d in enumerate((-1, 1, -S, S)):
            sel = iot == (best + d)[None, :]
            neigh_ref[0, o, :] = jnp.sum(jnp.where(sel, flat_raw, 0.0),
                                         axis=0)


def ncc_surface_argmax_pallas(
    patches: jnp.ndarray,      # [K, P, P] f32
    templates: jnp.ndarray,    # [K, T, T] f32
    gate: jnp.ndarray,         # [K, S, S] bool
    *,
    with_neigh: bool = False,
    interpret: bool = False,
):
    """(best_corr [K], best_flat_idx [K]) of the gated ZNCC surface; with
    ``with_neigh=True`` additionally returns neigh [K,4] — the RAW
    (ungated) surface at the argmax's x-1/x+1/y-1/y+1 neighbours for
    subpixel refinement (compiled out of the kernel otherwise)."""
    K, P, _ = patches.shape
    T = templates.shape[-1]
    S = P - T + 1
    assert gate.shape == (K, S, S), (gate.shape, (K, S, S))
    pad = (-K) % LANES
    if pad:
        patches = jnp.pad(patches, ((0, pad), (0, 0), (0, 0)))
        templates = jnp.pad(templates, ((0, pad), (0, 0), (0, 0)),
                            constant_values=1.0)
        gate = jnp.pad(gate, ((0, pad), (0, 0), (0, 0)))
    Kp = patches.shape[0]
    G = Kp // LANES

    tmean = jnp.mean(templates, axis=(-2, -1))
    td = templates - tmean[:, None, None]
    tssd = jnp.sqrt(jnp.sum(td * td, axis=(-2, -1)))

    # lanes-last layouts
    patches_l = jnp.moveaxis(patches.reshape(G, LANES, P, P), 1, -1)  # [G,P,P,L]
    taps_l = jnp.moveaxis(td.reshape(G, LANES, T, T), 1, -1)          # [G,T,T,L]
    gate_l = jnp.moveaxis(gate.reshape(G, LANES, S, S), 1, -1)        # [G,S,S,L]
    tssd_l = tssd.reshape(G, 1, LANES)

    kernel = functools.partial(_ncc_block_kernel, T, S, float(T * T),
                               with_neigh)
    out_specs = [
        pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((G, 1, LANES), patches.dtype),
        jax.ShapeDtypeStruct((G, 1, LANES), jnp.int32),
    ]
    if with_neigh:
        out_specs.append(pl.BlockSpec((1, 4, LANES), lambda g: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((G, 4, LANES), patches.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, P, P, LANES), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, T, LANES), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, S, LANES), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(patches_l, taps_l, tssd_l, gate_l)
    best_corr, best_idx = out[0], out[1]
    res = (best_corr.reshape(Kp)[:K], best_idx.reshape(Kp)[:K])
    if with_neigh:
        res = res + (jnp.moveaxis(out[2], 1, -1).reshape(Kp, 4)[:K],)
    return res
