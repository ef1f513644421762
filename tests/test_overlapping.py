"""Overlapping-grids NDT tests (config.overlapping_grids).

The reference deliberately uses a single grid (README.md:114-118); the
4-overlapping-grids scheme from the Biber paper smooths the score surface.
These tests pin the semantics: mean-of-4-shifted-grids, identical plumbing
through match_scan / packed tables / Newton refinement.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching import matcher, registry
from ndt_2d_tpu.ndt import grid as ndt_grid
from ndt_2d_tpu.utils import sim

CFG = ScanMatcherConfig(grid_cells_x=128, grid_cells_y=128)
OCFG = dataclasses.replace(CFG, overlapping_grids=True)


def make_scan(pose, world, n_beams=360, max_points=512):
    msg = sim.scan_at_pose(world, np.asarray(pose, float), n_beams=n_beams,
                           range_max=15.0)
    pts, mask = sim.project_scan(msg, max_points)
    return pts, mask, int(mask.sum())


def build_fixture(cfg):
    world = sim.make_box_world(10.0, 8.0)
    m = registry.create("ndt", cfg, range_max=15.0)
    poses = np.asarray([[4.8, 3.9, 0.0], [5.0, 4.0, 0.05],
                        [5.2, 4.1, -0.05]], np.float32)
    pts, msk = [], []
    for p in poses:
        a, b, _ = make_scan(p, world)
        pts.append(a)
        msk.append(b)
    m.add_scans(poses, np.stack(pts), np.stack(msk))
    return world, m, (poses, np.stack(pts), np.stack(msk))


class TestOverlappingGrids:
    def test_stacked_build_matches_manual_shifted_grids(self):
        world, m, (poses, pts, msk) = build_fixture(OCFG)
        g = m.grid
        assert matcher.is_multi_grid(g)
        assert g.mean.shape[0] == 4
        # Each sub-grid equals a plain build at the shifted origin.
        base = matcher.window_origin(OCFG, jnp.asarray(poses),
                                     jnp.ones(3, bool), jnp.float32(15.0))
        h = 0.5 * OCFG.ndt_resolution
        offs = np.asarray([[0, 0], [h, 0], [0, h], [h, h]], np.float32)
        for i in range(4):
            single = ndt_grid.build_ndt_from_scans(
                jnp.asarray(poses), jnp.asarray(pts), jnp.asarray(msk),
                jnp.asarray(np.asarray(base) - offs[i]),
                OCFG.ndt_resolution, OCFG.grid_cells_x, OCFG.grid_cells_y)
            np.testing.assert_allclose(np.asarray(g.mean[i]),
                                       np.asarray(single.mean), atol=1e-5)
            np.testing.assert_array_equal(np.asarray(g.count[i]),
                                          np.asarray(single.count))

    def test_score_is_mean_over_grids(self):
        world, m, _ = build_fixture(OCFG)
        pts, mask, n = make_scan([5.0, 4.0, 0.0], world)
        pose = jnp.asarray([5.0, 4.0, 0.0], jnp.float32)
        total = matcher.score_points_at_pose(
            OCFG, m.grid, jnp.asarray(pts), jnp.asarray(mask), jnp.int32(n),
            pose)
        singles = []
        for i in range(4):
            gi = matcher._grid_slice(m.grid, i)
            singles.append(float(matcher.score_points_at_pose(
                CFG, gi, jnp.asarray(pts), jnp.asarray(mask), jnp.int32(n),
                pose)))
        np.testing.assert_allclose(float(total), np.mean(singles), atol=1e-5)

    def test_match_recovers_offset(self):
        world, m, _ = build_fixture(OCFG)
        true_pose = np.asarray([5.0, 4.0, 0.0], np.float32)
        pts, mask, n = make_scan(true_pose, world)
        offset = np.asarray([0.03, -0.02, 0.02], np.float32)
        res = m.match_scan(pts, mask, n, true_pose + offset)
        assert float(res.score) < -0.3
        np.testing.assert_allclose(np.asarray(res.correction)[:2],
                                   -offset[:2], atol=0.011)
        np.testing.assert_allclose(np.asarray(res.correction)[2],
                                   -offset[2], atol=0.006)

    def test_packed_table_path_matches_tableless(self):
        world, m, _ = build_fixture(OCFG)
        pts, mask, n = make_scan([5.0, 4.0, 0.0], world)
        pose = jnp.asarray([5.03, 3.98, 0.01], jnp.float32)
        with_table = matcher.match_scan(
            OCFG, m.grid, jnp.asarray(pts), jnp.asarray(mask), jnp.int32(n),
            pose, jnp.float32(15.0), m.packed_table)
        without = matcher.match_scan(
            OCFG, m.grid, jnp.asarray(pts), jnp.asarray(mask), jnp.int32(n),
            pose, jnp.float32(15.0))
        np.testing.assert_allclose(float(with_table.score),
                                   float(without.score), atol=1e-6)
        np.testing.assert_allclose(np.asarray(with_table.correction),
                                   np.asarray(without.correction))

    def test_newton_gradient_on_multi_grid_matches_autodiff(self):
        from ndt_2d_tpu.matching import newton
        world, m, _ = build_fixture(OCFG)
        pts, mask, n = make_scan([5.0, 4.0, 0.0], world)
        spts, smask, _ = matcher.subsample(
            jnp.asarray(pts), jnp.asarray(mask), jnp.int32(n), 100)
        W, H = OCFG.grid_cells_x, OCFG.grid_cells_y
        pose = jnp.asarray([5.01, 3.99, 0.004], jnp.float32)

        def f(p):
            return newton._objective_grad_hess(m.grid, W, H, spts, smask, p)[0]

        _, grad, hess = newton._objective_grad_hess(m.grid, W, H, spts,
                                                    smask, pose)
        np.testing.assert_allclose(np.asarray(jax.grad(f)(pose)),
                                   np.asarray(grad), rtol=2e-3, atol=1e-4)

    def test_smoother_surface_at_cell_boundary(self):
        """A single point swept across a cell boundary: the single grid's
        score is discontinuous there, the 4-grid mean's jump is the average
        of fewer coinciding per-grid jumps (that is the point of the scheme).
        """
        rng = np.random.default_rng(0)
        # A dense diagonal-gradient cloud: every cell scorable, neighboring
        # cells get genuinely different Gaussians.
        cloud = rng.uniform(0.0, 4.0, (4000, 2)).astype(np.float32)
        cloud[:, 1] += 0.3 * np.sin(3.0 * cloud[:, 0])
        mask = np.ones(len(cloud), bool)
        query = np.zeros((1, 2), np.float32)
        qmask = np.ones(1, bool)
        cfg = dataclasses.replace(CFG, grid_cells_x=32, grid_cells_y=32)
        ocfg = dataclasses.replace(cfg, overlapping_grids=True)

        def sweep(c):
            m = matcher.NDTScanMatcher(c, range_max=1.0)
            m.add_scans(np.zeros((1, 3), np.float32), cloud[None],
                        mask[None])
            vals = []
            for x in np.linspace(1.0, 3.0, 401):
                pose = jnp.asarray([x, 2.0, 0.0], jnp.float32)
                vals.append(float(matcher.score_points_at_pose(
                    c, m.grid, jnp.asarray(query), jnp.asarray(qmask),
                    jnp.int32(1), pose)))
            return np.abs(np.diff(np.asarray(vals))).max()

        assert sweep(ocfg) < 0.6 * sweep(cfg)
