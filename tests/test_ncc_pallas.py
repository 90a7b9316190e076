"""Pallas NCC kernel parity vs the XLA conv formulation (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.ops.ncc_pallas import ncc_surface_argmax_pallas
from surikatoko_tpu.vision import templ_match


@pytest.mark.parametrize("K,T,S", [(8, 9, 7), (5, 17, 25)])
def test_pallas_matches_conv_surface(rng, K, T, S):
    P = S + T - 1
    patches = jnp.asarray(rng.uniform(0, 255, size=(K, P, P)), jnp.float32)
    templs = jnp.asarray(rng.uniform(0, 255, size=(K, T, T)), jnp.float32)
    gate = jnp.asarray(rng.uniform(size=(K, S, S)) < 0.7)
    # ensure at least one gated candidate per landmark
    gate = gate.at[:, S // 2, S // 2].set(True)

    surf = templ_match.corr_coeff_surface(patches, templs)
    surf_g = jnp.where(gate, surf, -jnp.inf)
    want_idx = jnp.argmax(surf_g.reshape(K, -1), axis=1)
    want_corr = jnp.max(surf_g.reshape(K, -1), axis=1)

    corr, idx, neigh = ncc_surface_argmax_pallas(patches, templs, gate,
                                                 with_neigh=True,
                                                 interpret=True)
    # the neigh-free variant (subpixel off: the flagship bench config)
    # must agree on corr/idx
    corr2, idx2 = ncc_surface_argmax_pallas(patches, templs, gate,
                                            interpret=True)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(corr2), np.asarray(corr))
    np.testing.assert_allclose(np.asarray(corr), np.asarray(want_corr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    # neighbour outputs = RAW (ungated) surface at idx +/- 1 (x) / +/- S (y),
    # wherever the neighbour stays inside the window row/col
    flat_raw = np.asarray(surf.reshape(K, -1))
    bi = np.asarray(want_idx)
    for o, d in enumerate((-1, 1, -S, S)):
        nb = bi + d
        bx = bi % S
        by = bi // S
        valid = ((0 <= nb) & (nb < S * S)
                 & ((bx > 0) if d == -1 else (bx < S - 1) if d == 1
                    else (by > 0) if d == -S else (by < S - 1)))
        got = np.asarray(neigh)[:, o]
        want_n = flat_raw[np.arange(K), np.clip(nb, 0, S * S - 1)]
        np.testing.assert_allclose(got[valid], want_n[valid],
                                   rtol=1e-4, atol=1e-5)


def test_pallas_padding_path(rng):
    """K not divisible by block exercises the pad/unpad logic."""
    K, T, S = 3, 9, 11
    P = S + T - 1
    patches = jnp.asarray(rng.uniform(0, 255, size=(K, P, P)), jnp.float32)
    templs = jnp.asarray(rng.uniform(0, 255, size=(K, T, T)), jnp.float32)
    gate = jnp.ones((K, S, S), bool)
    corr, idx = ncc_surface_argmax_pallas(patches, templs, gate,
                                          interpret=True)
    surf = templ_match.corr_coeff_surface(patches, templs)
    want = jnp.argmax(surf.reshape(K, -1), axis=1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want))
