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

    corr, idx = ncc_surface_argmax_pallas(patches, templs, gate,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(corr), np.asarray(want_corr),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))


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
