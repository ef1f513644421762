"""Graph container + pose-graph solver tests.

Covers what the reference tests (graph_tests.cpp: barycenters, findNearest
ordering) and what it doesn't (ceres_solver_tests.cpp only checks the empty
case, :39-40): synthetic noisy graphs with exact ground-truth recovery.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ndt_2d_tpu.config import SolverConfig
from ndt_2d_tpu.graph import pose_graph, solver


def _make_graph(max_points=16, use_barycenter=True):
    return pose_graph.Graph(max_points, use_barycenter)


def _pad_points(pts, max_points=16):
    points = np.zeros((max_points, 2), np.float32)
    mask = np.zeros(max_points, bool)
    n = len(pts)
    if n:
        points[:n] = pts
        mask[:n] = True
    return points, mask


class TestGraphStore:
    def test_barycenter_math(self):
        # Mirrors graph_tests.cpp:57-80: barycenter = pose + rotated mean.
        g = _make_graph()
        pts, mask = _pad_points([(1.0, 0.0), (1.0, 1.0)])
        g.add_scan([1.0, 2.0, np.pi / 2.0], pts, mask)
        b = g.barycenters()[0]
        # mean point (1.0, 0.5) rotated by pi/2 -> (-0.5, 1.0)
        np.testing.assert_allclose(b, [1.0 - 0.5, 2.0 + 1.0], atol=1e-6)

    def test_barycenter_empty_scan_is_pose(self):
        g = _make_graph()
        pts, mask = _pad_points([])
        g.add_scan([3.0, 4.0, 1.0], pts, mask)
        np.testing.assert_allclose(g.barycenters()[0], [3.0, 4.0])

    def test_find_nearest_squared_radius_and_order(self):
        # dist is a squared radius (nanoflann semantics, graph.cpp:181).
        g = _make_graph(use_barycenter=False)
        pts, mask = _pad_points([])
        for x in [0.0, 1.0, 2.0, 5.0]:
            g.add_scan([x, 0.0, 0.0], pts, mask)
        hits = g.find_nearest([0.9, 0.0], dist=4.1)  # radius ~2.02m
        np.testing.assert_array_equal(hits, [1, 0, 2])

    def test_find_nearest_limit_excludes_tail(self):
        g = _make_graph(use_barycenter=False)
        pts, mask = _pad_points([])
        for x in [0.0, 1.0, 2.0]:
            g.add_scan([x, 0.0, 0.0], pts, mask)
        hits = g.find_nearest([2.0, 0.0], dist=100.0, limit_scan_index=2)
        assert 2 not in hits
        assert set(hits) == {0, 1}

    def test_make_constraint_math(self):
        # makeConstraint rotates the world delta into begin's frame
        # (src/constraint.cpp:42-50).
        g = _make_graph()
        pts, mask = _pad_points([])
        g.add_scan([1.0, 1.0, np.pi / 2.0], pts, mask)
        g.add_scan([1.0, 2.0, np.pi / 2.0 + 0.1], pts, mask)
        pose_graph.make_constraint_np(g, 0, 1, np.eye(3) * 0.01)
        t = g.constraint_transform[0]
        np.testing.assert_allclose(t, [1.0, 0.0, 0.1], atol=1e-9)
        np.testing.assert_allclose(g.constraint_information[0],
                                   np.eye(3) * 100.0, atol=1e-6)


def _chain_with_loop(n=12, drift=0.05, seed=3):
    """Ground-truth square loop; odometry constraints with drifted initial
    poses plus one loop-closure constraint back to node 0."""
    rng = np.random.default_rng(seed)
    side = n // 4
    truth = np.zeros((n, 3))
    pose = np.zeros(3)
    for i in range(1, n):
        pose = pose + [np.cos(pose[2]), np.sin(pose[2]), 0.0]
        if i % side == 0:
            pose[2] += np.pi / 2.0
        truth[i] = pose

    g = _make_graph()
    pts, mask = _pad_points([])
    info = np.linalg.inv(np.diag([0.01, 0.01, 0.005]))
    init = truth.copy()
    for i in range(n):
        if i > 0:
            init[i] = init[i] + rng.normal(0, drift, 3)
        g.add_scan(init[i], pts, mask)
    # exact relative constraints from ground truth
    for i in range(1, n):
        pa, pb = truth[i - 1], truth[i]
        c, s = np.cos(pa[2]), np.sin(pa[2])
        d = pb[:2] - pa[:2]
        t = [c * d[0] + s * d[1], -s * d[0] + c * d[1], pb[2] - pa[2]]
        g.add_constraint(i - 1, i, t, info)
    # loop closure end -> start
    pa, pb = truth[n - 1], truth[0]
    c, s = np.cos(pa[2]), np.sin(pa[2])
    d = pb[:2] - pa[:2]
    t = [c * d[0] + s * d[1], -s * d[0] + c * d[1], pb[2] - pa[2]]
    g.add_constraint(n - 1, 0, t, info, switchable=True)
    return g, truth


class TestSolver:
    def test_empty_graph_returns_false(self):
        # ceres_solver_tests.cpp:39-40
        g = _make_graph()
        assert solver.solve_graph(g, SolverConfig()) is False

    def test_zero_residual_graph_unchanged(self):
        g, truth = _chain_with_loop(drift=0.0)
        g.set_poses(truth.copy())
        assert solver.solve_graph(g, SolverConfig())
        np.testing.assert_allclose(g.poses, truth, atol=1e-4)

    def test_recovers_ground_truth(self):
        g, truth = _chain_with_loop(n=12, drift=0.05)
        before = np.abs(g.poses - truth).max()
        assert solver.solve_graph(g, SolverConfig())
        after = np.abs(g.poses - truth).max()
        assert after < 1e-3
        assert after < before
        # gauge: node 0 stays fixed
        np.testing.assert_allclose(g.poses[0], truth[0], atol=1e-6)

    def test_pcg_matches_dense(self):
        g, truth = _chain_with_loop(n=16, drift=0.04, seed=7)
        cfg = SolverConfig()
        args = (
            jnp.asarray(g.poses, jnp.float32),
            jnp.asarray(g.constraint_begin),
            jnp.asarray(g.constraint_end),
            jnp.asarray(g.constraint_transform, jnp.float32),
            jnp.asarray(g.constraint_information, jnp.float32),
            jnp.ones(g.num_constraints, bool),
            jnp.ones(g.num_scans, bool),
        )
        dense = solver.solve(cfg, *args, use_dense=True)
        pcg = solver.solve(cfg, *args, use_dense=False)
        assert bool(dense.success) and bool(pcg.success)
        np.testing.assert_allclose(np.asarray(dense.poses),
                                   np.asarray(pcg.poses), atol=5e-3)
        np.testing.assert_allclose(np.asarray(dense.poses), truth, atol=2e-3)

    def test_padded_nodes_and_constraints_ignored(self):
        g, truth = _chain_with_loop(n=12, drift=0.05)
        cfg = SolverConfig()
        n, c = g.num_scans, g.num_constraints
        pad_n, pad_c = n + 6, c + 9
        poses = np.zeros((pad_n, 3), np.float32)
        poses[:n] = g.poses
        begin = np.zeros(pad_c, np.int32)
        end = np.zeros(pad_c, np.int32)
        begin[:c] = g.constraint_begin
        end[:c] = g.constraint_end
        tr = np.zeros((pad_c, 3), np.float32)
        tr[:c] = g.constraint_transform
        info = np.zeros((pad_c, 3, 3), np.float32)
        info[:c] = g.constraint_information
        res = solver.solve(
            cfg, jnp.asarray(poses), jnp.asarray(begin), jnp.asarray(end),
            jnp.asarray(tr), jnp.asarray(info),
            jnp.arange(pad_c) < c, jnp.arange(pad_n) < n, use_dense=True)
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.poses)[:n], truth, atol=2e-3)
        # padded nodes untouched
        np.testing.assert_allclose(np.asarray(res.poses)[n:], 0.0, atol=1e-6)

    def test_failed_solve_keeps_poses(self):
        # Force failure with a NaN information matrix.
        g, _ = _chain_with_loop()
        g.constraint_information[0] = np.nan
        before = g.poses.copy()
        ok = solver.solve_graph(g, SolverConfig())
        assert ok is False
        np.testing.assert_array_equal(g.poses, before)


class TestLargeGraphPCG:
    """Scale shape of BASELINE config 5 (district map): a large pose graph
    solved with the matrix-free PCG path (CI-sized; the real thing shards
    constraints across hosts, tests/test_sharding.py)."""

    def test_2k_node_loop_grid(self):
        rng = np.random.default_rng(0)
        # A 2D lattice of poses with odometry chain + lattice cross-bracing:
        # ~2k nodes, ~4k constraints.
        side = 45
        n = side * side
        xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
        truth = np.stack([xs.ravel().astype(float),
                          ys.ravel().astype(float),
                          np.zeros(n)], axis=-1)
        init = truth + rng.normal(0, 0.08, truth.shape)
        init[0] = truth[0]

        begin, end = [], []
        for i in range(side):
            for j in range(side):
                k = i * side + j
                if j + 1 < side:
                    begin.append(k)
                    end.append(k + 1)
                if i + 1 < side:
                    begin.append(k)
                    end.append(k + side)
        begin = np.asarray(begin, np.int32)
        end = np.asarray(end, np.int32)
        c = len(begin)
        # exact relative constraints (theta = 0 everywhere)
        t = truth[end, :2] - truth[begin, :2]
        transform = np.concatenate([t, np.zeros((c, 1))], axis=-1)
        info = np.tile(np.eye(3, dtype=np.float32)[None] * 100.0, (c, 1, 1))

        cfg = SolverConfig(max_iterations=30)
        res = solver.solve(
            cfg, jnp.asarray(init, jnp.float32), jnp.asarray(begin),
            jnp.asarray(end), jnp.asarray(transform, jnp.float32),
            jnp.asarray(info), jnp.ones(c, bool), jnp.ones(n, bool),
            use_dense=False)
        assert bool(res.success)
        err = np.abs(np.asarray(res.poses)[:, :2] - truth[:, :2]).max()
        assert err < 0.02, f"max node error {err}"


class TestRobustLoss:
    """Huber-robustified loop closures (the switchable flag made real —
    the reference stores it but optimizes plain squared loss,
    ceres_solver.cpp:159-166)."""

    def _graph_with_false_closure(self):
        g, truth = _chain_with_loop(n=12, drift=0.02, seed=5)
        # an outright WRONG loop closure: claims node 3 sits on node 8
        info = np.linalg.inv(np.diag([0.01, 0.01, 0.005]))
        g.add_constraint(3, 8, [0.0, 0.0, 0.0], info, switchable=True)
        return g, truth

    def test_plain_loss_distorted_by_false_closure(self):
        g, truth = self._graph_with_false_closure()
        assert solver.solve_graph(g, SolverConfig())
        err = np.abs(g.poses[:, :2] - truth[:, :2]).max()
        assert err > 0.3, f"expected distortion, got {err}"

    def test_huber_downweights_false_closure(self):
        g, truth = self._graph_with_false_closure()
        cfg = SolverConfig(robust_loss="huber", huber_delta=1.0)
        assert solver.solve_graph(g, cfg)
        err = np.abs(g.poses[:, :2] - truth[:, :2]).max()
        # Huber only down-weights (w = delta/s), so a residual pull remains;
        # it must still clearly beat the plain squared loss.
        assert err < 0.25, f"huber distortion {err}"

    def test_geman_mcclure_rejects_false_closure(self):
        g, truth = self._graph_with_false_closure()
        cfg = SolverConfig(robust_loss="geman_mcclure", huber_delta=1.0)
        assert solver.solve_graph(g, cfg)
        err = np.abs(g.poses[:, :2] - truth[:, :2]).max()
        assert err < 0.05, f"redescending loss failed: {err}"

    def test_huber_keeps_true_closure_accuracy(self):
        # With only honest constraints, huber must not degrade recovery.
        g, truth = _chain_with_loop(n=12, drift=0.05)
        cfg = SolverConfig(robust_loss="huber", huber_delta=1.0)
        assert solver.solve_graph(g, cfg)
        assert np.abs(g.poses - truth).max() < 5e-3

    def test_multichip_huber_matches_single(self):
        from ndt_2d_tpu.parallel import mesh as mesh_mod
        from ndt_2d_tpu.parallel import solver as psolver

        g, truth = self._graph_with_false_closure()
        cfg = SolverConfig(robust_loss="geman_mcclure", huber_delta=1.0)
        single = solver.solve(
            cfg,
            jnp.asarray(g.poses, jnp.float32),
            jnp.asarray(g.constraint_begin),
            jnp.asarray(g.constraint_end),
            jnp.asarray(g.constraint_transform, jnp.float32),
            jnp.asarray(g.constraint_information, jnp.float32),
            jnp.ones(g.num_constraints, bool),
            jnp.ones(g.num_scans, bool),
            robust_mask=jnp.asarray(g.constraint_switchable))
        mesh = mesh_mod.make_mesh(8, shape=(1, 8))
        b, e, t, i_, cm = psolver.pad_constraints(
            np.asarray(g.constraint_begin), np.asarray(g.constraint_end),
            np.asarray(g.constraint_transform, np.float32),
            np.asarray(g.constraint_information, np.float32),
            np.ones(g.num_constraints, bool), 8)
        rm = np.zeros(b.shape[0], bool)
        rm[:g.num_constraints] = np.asarray(g.constraint_switchable)
        multi = psolver.solve_multichip(
            cfg, mesh, jnp.asarray(g.poses, jnp.float32), b, e, t, i_, cm,
            jnp.ones(g.num_scans, bool), robust_mask=jnp.asarray(rm))
        assert bool(single.success) and bool(multi.success)
        np.testing.assert_allclose(np.asarray(multi.poses),
                                   np.asarray(single.poses), atol=2e-2)
        np.testing.assert_allclose(np.asarray(multi.poses)[:, :2],
                                   truth[:, :2], atol=5e-2)


def test_single_barycenter_matches_batch():
    """PoseGraph.barycenter(i) (O(1), per-query) must equal barycenters()[i]."""
    rng = np.random.default_rng(3)
    g = pose_graph.Graph(max_points_per_scan=32)
    for k in range(7):
        pts = rng.normal(0.0, 2.0, (32, 2)).astype(np.float32)
        mask = rng.uniform(size=32) < 0.7
        if k == 4:
            mask[:] = False  # point-less scan: barycenter == pose position
        g.add_scan(rng.normal(0.0, 5.0, 3), pts, mask)
    batch = g.barycenters()
    for i in range(g.num_scans):
        np.testing.assert_allclose(g.barycenter(i), batch[i], atol=1e-12)
