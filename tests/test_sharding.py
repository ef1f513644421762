"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference is single-process with zero distribution (SURVEY.md section 2);
these tests are the "fake backend" harness it never needed: sharded results
must match the single-device computation bit-for-meaningful-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_2d_tpu.config import (MapperConfig, ScanMatcherConfig, SolverConfig)
from ndt_2d_tpu.matching import matcher, registry
from ndt_2d_tpu.parallel import filter as pfilter
from ndt_2d_tpu.parallel import matcher as pmatcher
from ndt_2d_tpu.parallel import mesh as mesh_mod
from ndt_2d_tpu.parallel import slam_step
from ndt_2d_tpu.parallel import solver as psolver
from ndt_2d_tpu.graph import solver as base_solver
from ndt_2d_tpu.utils import sim

MCFG = ScanMatcherConfig(grid_cells_x=128, grid_cells_y=128)


@pytest.fixture(scope="module")
def world_setup():
    world = sim.make_box_world(10.0, 8.0)
    m = registry.create("ndt", MCFG, 15.0)
    poses = np.asarray([[4.8, 3.9, 0.0], [5.0, 4.0, 0.05],
                        [5.2, 4.1, -0.05]], np.float32)
    pts, msk = [], []
    for p in poses:
        msg = sim.scan_at_pose(world, p, n_beams=360, range_max=15.0)
        a, b = sim.project_scan(msg, 512)
        pts.append(a)
        msk.append(b)
    m.add_scans(poses, np.stack(pts), np.stack(msk))
    msg = sim.scan_at_pose(world, np.asarray([5.0, 4.0, 0.0]), n_beams=360,
                           range_max=15.0)
    qpts, qmask = sim.project_scan(msg, 512)
    return m, qpts, qmask


class TestShardedMatcher:
    def test_matches_single_device(self, world_setup):
        m, qpts, qmask = world_setup
        n = int(qmask.sum())
        pose = jnp.asarray([5.02, 3.98, 0.01], jnp.float32)
        ref = m.match_scan(qpts, qmask, n, pose)

        mesh = mesh_mod.make_mesh(8)  # (space, batch) = e.g. (4, 2)
        out = pmatcher.match_scan_multichip(
            MCFG, mesh, m.grid, jnp.asarray(qpts), jnp.asarray(qmask),
            jnp.int32(n), pose)
        assert float(out.score) == pytest.approx(float(ref.score), abs=1e-5)
        np.testing.assert_allclose(np.asarray(out.correction),
                                   np.asarray(ref.correction), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.covariance),
                                   np.asarray(ref.covariance), rtol=1e-3,
                                   atol=1e-6)

    def test_overlapping_grids_match_single_device(self, world_setup):
        """The angle-sharded matcher works over a stacked overlapping-grids
        NDT (replicated like a single grid; candidate_scores dispatches on
        the stacked leading axis)."""
        import dataclasses

        from ndt_2d_tpu.matching.matcher import NDTScanMatcher
        m, qpts, qmask = world_setup
        ocfg = dataclasses.replace(MCFG, overlapping_grids=True)
        om = NDTScanMatcher(ocfg, range_max=15.0)
        om.grid = None
        # Rebuild the same window with overlapping grids.
        world = sim.make_box_world(10.0, 8.0)
        poses = np.asarray([[4.8, 3.9, 0.0], [5.0, 4.0, 0.05],
                            [5.2, 4.1, -0.05]], np.float32)
        pts, msk = [], []
        for p in poses:
            msg = sim.scan_at_pose(world, p, n_beams=360, range_max=15.0)
            a, b = sim.project_scan(msg, 512)
            pts.append(a)
            msk.append(b)
        om.add_scans(poses, np.stack(pts), np.stack(msk))
        n = int(qmask.sum())
        pose = jnp.asarray([5.02, 3.98, 0.01], jnp.float32)
        ref = om.match_scan(qpts, qmask, n, pose)
        mesh = mesh_mod.make_mesh(8)
        out = pmatcher.match_scan_multichip(
            ocfg, mesh, om.grid, jnp.asarray(qpts), jnp.asarray(qmask),
            jnp.int32(n), pose)
        assert float(out.score) == pytest.approx(float(ref.score), abs=1e-5)
        np.testing.assert_allclose(np.asarray(out.correction),
                                   np.asarray(ref.correction), atol=1e-6)

    def test_newton_refine_matches_single_device(self, world_setup):
        """refine_iterations > 0: the sharded match must apply the same
        Newton polish as the single-device path (it is replicated compute
        after the sharded lattice reduction)."""
        import dataclasses
        m, qpts, qmask = world_setup
        rcfg = dataclasses.replace(MCFG, refine_iterations=5)
        n = int(qmask.sum())
        pose = jnp.asarray([5.02, 3.98, 0.01], jnp.float32)
        ref = matcher.match_scan(rcfg, m.grid, jnp.asarray(qpts),
                                 jnp.asarray(qmask), jnp.int32(n), pose,
                                 jnp.float32(15.0))
        mesh = mesh_mod.make_mesh(8)
        out = pmatcher.match_scan_multichip(
            rcfg, mesh, m.grid, jnp.asarray(qpts), jnp.asarray(qmask),
            jnp.int32(n), pose)
        assert float(out.score) == pytest.approx(float(ref.score), abs=1e-5)
        np.testing.assert_allclose(np.asarray(out.correction),
                                   np.asarray(ref.correction), atol=1e-5)

    def test_confirm_refine_matches_single_device(self, world_setup):
        """The confirmation batch (runtime.confirm_batch_multichip) applies
        the Newton polish inside its sharded per-candidate reduction."""
        import dataclasses

        from ndt_2d_tpu.parallel import runtime
        m, qpts, qmask = world_setup
        rcfg = dataclasses.replace(MCFG, refine_iterations=5)
        world = sim.make_box_world(10.0, 8.0)
        poses = np.asarray([[[4.8, 3.9, 0.0], [5.0, 4.0, 0.05]],
                            [[5.2, 4.1, -0.05], [5.4, 4.0, 0.0]]], np.float32)
        pts = np.zeros((2, 2, 512, 2), np.float32)
        msk = np.zeros((2, 2, 512), bool)
        for a in range(2):
            for b in range(2):
                msg = sim.scan_at_pose(world, poses[a, b], n_beams=360,
                                       range_max=15.0)
                pts[a, b], msk[a, b] = sim.project_scan(msg, 512)
        wmask = np.ones((2, 2), bool)
        starts = np.asarray([[5.02, 3.98, 0.01], [5.3, 4.05, -0.02]],
                            np.float32)
        n = int(qmask.sum())
        ref = matcher.match_scan_batch(
            rcfg, jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(msk),
            jnp.asarray(wmask), jnp.float32(15.0), jnp.asarray(qpts),
            jnp.asarray(qmask), jnp.int32(n), jnp.asarray(starts))
        mesh = mesh_mod.make_mesh(8)  # batch axis = 2
        out = runtime.confirm_batch_multichip(
            rcfg, mesh, jnp.asarray(poses), jnp.asarray(pts),
            jnp.asarray(msk), jnp.asarray(wmask), jnp.float32(15.0),
            jnp.asarray(qpts), jnp.asarray(qmask), jnp.int32(n),
            jnp.asarray(starts))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                                   atol=1e-5)

    def test_single_axis_mesh(self, world_setup):
        m, qpts, qmask = world_setup
        n = int(qmask.sum())
        pose = jnp.asarray([5.0, 4.0, 0.0], jnp.float32)
        ref = m.match_scan(qpts, qmask, n, pose)
        mesh = mesh_mod.single_axis_mesh(8, axis="space")
        out = pmatcher.match_scan_multichip(
            MCFG, mesh, m.grid, jnp.asarray(qpts), jnp.asarray(qmask),
            jnp.int32(n), pose, axis="space")
        assert float(out.score) == pytest.approx(float(ref.score), abs=1e-5)


class TestShardedSolver:
    def _graph(self):
        from tests.test_graph import _chain_with_loop
        return _chain_with_loop(n=16, drift=0.05, seed=2)

    def test_matches_dense_and_truth(self):
        g, truth = self._graph()
        cfg = SolverConfig()
        mesh = mesh_mod.make_mesh(8)
        poses = jnp.asarray(g.poses, jnp.float32)
        nm = jnp.ones(g.num_scans, bool)
        b, e, t, i, cm = psolver.pad_constraints(
            g.constraint_begin, g.constraint_end,
            g.constraint_transform, g.constraint_information,
            np.ones(g.num_constraints, bool), mesh.shape["batch"])
        out = psolver.solve_multichip(cfg, mesh, poses, b, e, t, i, cm, nm)
        assert bool(out.success)
        np.testing.assert_allclose(np.asarray(out.poses), truth, atol=3e-3)


class TestShardedFilter:
    def test_measure_matches_single_device(self, world_setup):
        m, qpts, qmask = world_setup
        n = int(qmask.sum())
        rng = np.random.default_rng(0)
        particles = jnp.asarray(
            np.concatenate([rng.normal([5.0, 4.0, 0.0], 0.3, (64, 3))],
                           0), jnp.float32)
        ref = matcher.score_points_batch(
            MCFG, m.grid, jnp.asarray(qpts), jnp.asarray(qmask),
            jnp.int32(n), particles)
        mesh = mesh_mod.make_mesh(8)
        out = pfilter.measure_multichip(
            MCFG, mesh, m.grid, jnp.asarray(qpts), jnp.asarray(qmask),
            jnp.int32(n), particles)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)


class TestFullSlamStep:
    def test_step_runs_and_optimizes(self):
        mesh = mesh_mod.make_mesh(8)
        cfg = MapperConfig(
            local_scan_matcher=ScanMatcherConfig(grid_cells_x=64,
                                                 grid_cells_y=64),
            max_points_per_scan=128)
        step = slam_step.make_slam_step(mesh, cfg, range_max=6.0,
                                        optimize_every=4)
        state = slam_step.init_state(max_scans=16, max_points=128,
                                     max_constraints=16)
        world = sim.make_box_world(8.0, 6.0)
        pose = np.asarray([4.0, 3.0, 0.0])
        for t in range(6):
            msg = sim.scan_at_pose(world, pose, n_beams=120, range_max=6.0)
            pts, msk = sim.project_scan(msg, 128)
            delta = np.asarray([0.15, 0.0, 0.0], np.float32) \
                if t else np.zeros(3, np.float32)
            state, res = step(state, jnp.asarray(pts), jnp.asarray(msk),
                              jnp.asarray(delta))
            pose = pose + np.asarray([0.15, 0.0, 0.0])
        assert int(state.num_scans) == 6
        assert int(state.c_num) == 5
        assert np.isfinite(np.asarray(state.poses[:6])).all()
        # trajectory roughly along +x
        assert float(state.poses[5, 0]) > float(state.poses[0, 0]) + 0.5
