"""SE(3) pose-graph optimization: odometry drift corrected by loop closure."""

import jax.numpy as jnp
import numpy as np
import pytest

from surikatoko_tpu.geom import so3
from surikatoko_tpu.models.posegraph import (
    PoseGraph, graph_error, make_pose_graph, optimize_pose_graph)


def circle_poses(n, radius=5.0):
    """GT keyframes on a circle, each facing along the tangent."""
    Rs, ts = [], []
    for k in range(n):
        a = 2 * np.pi * k / n
        Rs.append(np.asarray(so3.exp(jnp.asarray([0.0, 0.0, a]))))
        ts.append(np.array([radius * np.cos(a), radius * np.sin(a), 0.0]))
    return np.stack(Rs), np.stack(ts)


def rel(Ri, ti, Rj, tj):
    return Ri.T @ Rj, Ri.T @ (tj - ti)


def test_posegraph_recovers_from_odometry_drift(rng):
    n = 24
    R_gt, t_gt = circle_poses(n)

    # noisy odometry chain: integrate perturbed relative poses
    Rs = [R_gt[0]]
    ts = [t_gt[0]]
    edges = []
    for k in range(1, n):
        rR, rt = rel(R_gt[k - 1], t_gt[k - 1], R_gt[k], t_gt[k])
        rR_n = np.asarray(so3.exp(jnp.asarray(rng.normal(scale=0.03, size=3)))) @ rR
        rt_n = rt + rng.normal(scale=0.05, size=3)
        Rs.append(Rs[-1] @ rR_n)
        ts.append(ts[-1] + Rs[-2] @ rt_n)
        edges.append((k - 1, k, rR_n, rt_n, 1.0))
    # loop closures: exact measurements back to pose 0 and mid-loop
    for (i, j) in ((n - 1, 0), (n // 2, 0), (3 * n // 4, n // 4)):
        rR, rt = rel(R_gt[i], t_gt[i], R_gt[j], t_gt[j])
        edges.append((i, j, rR, rt, 2.0))

    g = make_pose_graph(np.stack(Rs), np.stack(ts), edges)
    # gauge is pinned at pose 0, so compare positions directly (similarity
    # alignment would hide most of the loop-closure benefit)
    drift_before = float(np.sqrt(np.mean(
        np.sum((np.stack(ts) - t_gt) ** 2, axis=1))))
    err0 = float(graph_error(g))
    g_opt = optimize_pose_graph(g, iters=25)
    err1 = float(graph_error(g_opt))
    drift_after = float(np.sqrt(np.mean(
        np.sum((np.asarray(g_opt.t) - t_gt) ** 2, axis=1))))

    assert err1 < err0 * 1e-2, (err0, err1)
    assert drift_after < drift_before * 0.6, (drift_before, drift_after)
    assert drift_after < 0.2
    # gauge: pose 0 pinned exactly
    np.testing.assert_allclose(g_opt.t[0], ts[0], atol=1e-9)
    np.testing.assert_allclose(g_opt.R[0], Rs[0], atol=1e-9)
    # rotations stay on SO(3)
    for k in range(n):
        Rk = np.asarray(g_opt.R[k])
        np.testing.assert_allclose(Rk @ Rk.T, np.eye(3), atol=1e-8)


def test_posegraph_exact_input_is_fixed_point():
    n = 8
    R_gt, t_gt = circle_poses(n)
    edges = []
    for k in range(1, n):
        rR, rt = rel(R_gt[k - 1], t_gt[k - 1], R_gt[k], t_gt[k])
        edges.append((k - 1, k, rR, rt, 1.0))
    g = make_pose_graph(R_gt, t_gt, edges)
    assert float(graph_error(g)) < 1e-20
    g2 = optimize_pose_graph(g, iters=3)
    np.testing.assert_allclose(g2.t, t_gt, atol=1e-8)


def test_posegraph_device_loop_matches_host(rng):
    """device_loop=True (the BA's on-device LM driver over the pose graph)
    must reach the same optimum as the host-driven schedule."""
    n = 16
    R_gt, t_gt = circle_poses(n)
    Rs, ts, edges = [R_gt[0]], [t_gt[0]], []
    for k in range(1, n):
        rR, rt = rel(R_gt[k - 1], t_gt[k - 1], R_gt[k], t_gt[k])
        rR_n = np.asarray(so3.exp(jnp.asarray(rng.normal(scale=0.02, size=3)))) @ rR
        rt_n = rt + rng.normal(scale=0.04, size=3)
        Rs.append(Rs[-1] @ rR_n)
        ts.append(ts[-1] + Rs[-2] @ rt_n)
        edges.append((k - 1, k, rR_n, rt_n, 1.0))
    rR, rt = rel(R_gt[n - 1], t_gt[n - 1], R_gt[0], t_gt[0])
    edges.append((n - 1, 0, rR, rt, 2.0))
    g = make_pose_graph(np.stack(Rs), np.stack(ts), edges)

    g_h = optimize_pose_graph(g, iters=25)
    g_d = optimize_pose_graph(g, iters=25, device_loop=True)
    err_h = float(graph_error(g_h))
    err_d = float(graph_error(g_d))
    assert err_d < float(graph_error(g)) * 1e-2
    np.testing.assert_allclose(err_d, err_h, rtol=1e-6, atol=1e-18)
    np.testing.assert_allclose(np.asarray(g_d.t), np.asarray(g_h.t),
                               atol=1e-6)


def test_posegraph_converges_from_far_initialization():
    """Regression for the LM damping schedule: a loop-closure residual far
    outside the linear regime (endpoint ~90deg + units away) must still
    converge — plain GN overshoots on the first step and would stall."""
    n = 10
    R_gt, t_gt = circle_poses(n, radius=3.0)
    edges = []
    for k in range(1, n):
        rR, rt = rel(R_gt[k - 1], t_gt[k - 1], R_gt[k], t_gt[k])
        edges.append((k - 1, k, rR, rt, 1.0))
    rR, rt = rel(R_gt[n - 1], t_gt[n - 1], R_gt[0], t_gt[0])
    edges.append((n - 1, 0, rR, rt, 5.0))

    # initialization: poses badly wrong (rotated ~90deg, shifted)
    Rs = [R_gt[0]]
    ts = [t_gt[0]]
    for k in range(1, n):
        off = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, 0.15 * k])))
        Rs.append(off @ R_gt[k])
        ts.append(t_gt[k] + np.array([0.3 * k, -0.2 * k, 0.1 * k]))
    g = make_pose_graph(np.stack(Rs), np.stack(ts), edges)
    err0 = float(graph_error(g))
    assert err0 > 10.0, err0
    g2 = optimize_pose_graph(g, iters=40)
    err1 = float(graph_error(g2))
    assert err1 < 1e-6 * err0, (err0, err1)
    np.testing.assert_allclose(np.asarray(g2.t), t_gt, atol=1e-4)
