"""On-device LM loop (models/ba/lm_device.py) vs the host-driven driver: the
same damping schedule compiled as one program must take the SAME path —
identical accepted-iteration counts, stop reasons, and final errors (the
Schur-vs-naive cross-check discipline applied to the driver itself)."""

import jax
import jax.numpy as jnp
import numpy as np

from surikatoko_tpu.models.ba import (
    BundleAdjustment, TermCriteria, reproj_error)
from surikatoko_tpu.models.ba.lm import SparseBundleAdjustment
from surikatoko_tpu.models.ba import sparse as sp

from test_ba import circle_grid_problem


def _compare(term):
    p, _, _ = circle_grid_problem(noise_pnt=0.05, noise_rot=0.01)
    host = BundleAdjustment()
    ok_h, p_h = host.compute_inplace(p, term)
    dev = BundleAdjustment(device_loop=True)
    ok_d, p_d = dev.compute_inplace(p, term)
    assert (ok_h, host.stop_reason, host.iterations) == \
           (ok_d, dev.stop_reason, dev.iterations)
    np.testing.assert_allclose(float(reproj_error(p_d)),
                               float(reproj_error(p_h)), rtol=1e-9)
    return p_h, p_d


def test_device_loop_matches_host_default_criteria():
    p_h, p_d = _compare(TermCriteria(allowed_reproj_err_rel_change=1e-14,
                                     max_iters=30))
    np.testing.assert_allclose(np.asarray(p_d.points), np.asarray(p_h.points),
                               rtol=1e-6, atol=1e-9)


def test_device_loop_matches_host_max_iters():
    # tiny cap: both must stop on "max iterations" after the same 3 accepts
    _compare(TermCriteria(allowed_reproj_err_rel_change=1e-18, max_iters=3))


def test_device_loop_reduces_error():
    p, gt_points, _ = circle_grid_problem(noise_pnt=0.1, noise_rot=0.02)
    e0 = float(reproj_error(p))
    ba = BundleAdjustment(device_loop=True)
    ok, p_opt = ba.compute_inplace(
        p, TermCriteria(allowed_reproj_err_rel_change=1e-12))
    assert ok, ba.stop_reason
    assert float(reproj_error(p_opt)) < 1e-6 * e0, ba.stop_reason


def test_sparse_device_loop_matches_host():
    p, _, _ = circle_grid_problem(noise_pnt=0.05)
    ps = sp.from_dense(p)
    term = TermCriteria(allowed_reproj_err_rel_change=1e-14, max_iters=25)
    host = SparseBundleAdjustment(point_chunk=32)
    ok_h, p_h = host.compute(ps, term)
    dev = SparseBundleAdjustment(point_chunk=32, device_loop=True)
    ok_d, p_d = dev.compute(ps, term)
    assert (ok_h, host.stop_reason, host.iterations) == \
           (ok_d, dev.stop_reason, dev.iterations)
    np.testing.assert_allclose(float(sp.reproj_error(p_d)),
                               float(sp.reproj_error(p_h)),
                               rtol=1e-9, atol=1e-18)


def test_sparse_device_loop_inplace_matches_host():
    """compute_inplace (normalize -> LM -> revert FUSED into the one-dispatch
    program) on a VALID gauge, sparse driver — round-3 advisor gap: the
    fused normalize/revert equivalence was only host-vs-device tested for
    the dense driver and the degenerate-refusal case."""
    p, _, _ = circle_grid_problem(noise_pnt=0.05, noise_rot=0.01)
    ps = sp.from_dense(p)
    term = TermCriteria(allowed_reproj_err_rel_change=1e-14, max_iters=25)
    host = SparseBundleAdjustment(point_chunk=32)
    ok_h, p_h = host.compute_inplace(ps, term)
    dev = SparseBundleAdjustment(point_chunk=32, device_loop=True)
    ok_d, p_d = dev.compute_inplace(ps, term)
    assert (ok_h, host.stop_reason, host.iterations) == \
           (ok_d, dev.stop_reason, dev.iterations)
    np.testing.assert_allclose(float(sp.reproj_error(p_d)),
                               float(sp.reproj_error(p_h)),
                               rtol=1e-9, atol=1e-18)
    # the revert must land in the ORIGINAL gauge, not the normalized one
    np.testing.assert_allclose(np.asarray(p_d.points),
                               np.asarray(p_h.points), rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(p_d.cfw_t),
                               np.asarray(p_h.cfw_t), rtol=1e-6, atol=1e-9)


def test_device_loop_cannot_normalize_matches_host():
    """Degenerate gauge (zero cam0-cam1 shift in the unity component): the
    FUSED normalize->LM->revert program must refuse identically to the host
    path and hand the problem back untouched."""
    p, _, _ = circle_grid_problem(noise_pnt=0.05)
    # make cam1 == cam0: the T01 unity component vanishes
    p = p._replace(cfw_R=p.cfw_R.at[1].set(p.cfw_R[0]),
                   cfw_t=p.cfw_t.at[1].set(p.cfw_t[0]))
    term = TermCriteria(allowed_reproj_err_rel_change=1e-14, max_iters=5)
    host = BundleAdjustment()
    ok_h, p_h = host.compute_inplace(p, term)
    dev = BundleAdjustment(device_loop=True)
    ok_d, p_d = dev.compute_inplace(p, term)
    assert not ok_h and not ok_d
    assert host.stop_reason == dev.stop_reason \
        == "cannot normalize (zero cam0-cam1 shift)"
    np.testing.assert_allclose(np.asarray(p_d.points), np.asarray(p.points),
                               atol=0)
    np.testing.assert_allclose(np.asarray(p_d.cfw_t), np.asarray(p.cfw_t),
                               atol=0)


def test_device_loop_vmaps_batch_ba():
    """Batch BA: vmap the compiled LM over independently-corrupted copies of
    the problem — a capability the host driver (and the reference) cannot
    express."""
    from surikatoko_tpu.models.ba import derivs, schur, lm_device
    import functools

    rngs = [np.random.default_rng(s) for s in (1, 2, 3)]
    probs = [circle_grid_problem(noise_pnt=0.06, rng=r)[0] for r in rngs]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *probs)

    blocks_fn = functools.partial(derivs.compute_blocks)
    solve_fn = lambda _p, blocks, factor: schur.solve_corrections_schur(  # noqa: E731
        blocks, factor)

    def run_one(p0):
        return lm_device.run_lm_on_device(
            p0, blocks_fn=blocks_fn, solve_fn=solve_fn,
            apply_fn=derivs.apply_corrections, err_fn=reproj_error,
            err_thresh=1e-12, max_factor=1e12, max_iters=20)

    # note: problems here are pre-normalized enough for the gauge (frame 0
    # exact); batch runs on the raw problems for the vmap smoke check
    p_out, code, iters, err, trials = jax.jit(jax.vmap(run_one))(batched)
    assert np.all(np.asarray(trials) >= np.asarray(iters))
    assert code.shape == (3,)
    e0 = np.array([float(reproj_error(pp)) for pp in probs])
    assert np.all(np.asarray(err) < 0.2 * e0)
