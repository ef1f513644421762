"""Newton sub-lattice refinement tests (matching/newton.py).

The lattice search is quantized to search_linear/angular_resolution
(0.005 m / 0.0025 rad); Newton polish must land strictly inside that
quantization and never degrade the lattice result.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching import matcher, newton, registry
from ndt_2d_tpu.utils import sim

CFG = ScanMatcherConfig(grid_cells_x=128, grid_cells_y=128)
RCFG = dataclasses.replace(CFG, refine_iterations=10)


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
    return world, m


class TestRefinePose:
    def test_sub_lattice_recovery(self):
        """An off-lattice true offset is recovered beyond lattice precision."""
        world, m = build_fixture(CFG)
        true_pose = np.asarray([5.0, 4.0, 0.0], np.float32)
        pts, mask, n = make_scan(true_pose, world)
        # Deliberately NOT a multiple of (0.005 m, 0.0025 rad).
        offset = np.asarray([0.0131, -0.0072, 0.0033], np.float32)

        lattice = m.match_scan(pts, mask, n, true_pose + offset)
        mr = registry.create("ndt_newton", CFG, range_max=15.0)
        mr.grid = m.grid
        refined = mr.match_scan(pts, mask, n, true_pose + offset)

        lat_err = np.abs(np.asarray(lattice.correction) + offset)
        ref_err = np.abs(np.asarray(refined.correction) + offset)
        # The lattice can't do better than half a step; Newton should.
        assert ref_err[:2].max() < 0.0025
        assert ref_err[2] < 0.00125
        assert ref_err.sum() < lat_err.sum()
        # Refined score is never worse than the lattice winner's.
        assert float(refined.score) <= float(lattice.score) + 1e-6

    def test_refine_never_degrades(self):
        """Starting exactly at the optimum, refinement stays there."""
        world, m = build_fixture(RCFG)
        true_pose = np.asarray([5.0, 4.0, 0.0], np.float32)
        pts, mask, n = make_scan(true_pose, world)
        spts, smask, _ = matcher.subsample(
            jnp.asarray(pts), jnp.asarray(mask), jnp.int32(n),
            RCFG.laser_max_beams)
        f_start = newton._objective_grad_hess(
            m.grid, RCFG.grid_cells_x, RCFG.grid_cells_y, spts, smask,
            jnp.asarray(true_pose))[0]
        best, best_f = newton.refine_pose(RCFG, m.grid, spts, smask,
                                          jnp.asarray(true_pose), 10)
        assert float(best_f) <= float(f_start) + 1e-6
        assert np.abs(np.asarray(best) - true_pose).max() < 0.01

    def test_empty_grid_is_a_noop(self):
        """All-zero scores: gradient is zero, pose unchanged, no NaNs."""
        from ndt_2d_tpu.ndt import grid as ndt_grid
        g = ndt_grid.build_ndt(jnp.zeros((4, 2)), jnp.zeros(4, bool),
                               jnp.zeros(2), 0.25, 32, 32)
        spts = jnp.asarray(np.random.default_rng(0).uniform(0, 4, (16, 2)),
                           jnp.float32)
        smask = jnp.ones(16, bool)
        pose = jnp.asarray([1.0, 1.0, 0.1], jnp.float32)
        cfg = dataclasses.replace(CFG, grid_cells_x=32, grid_cells_y=32)
        best, best_f = newton.refine_pose(cfg, g, spts, smask, pose, 5)
        assert float(best_f) == 0.0
        np.testing.assert_allclose(np.asarray(best), np.asarray(pose),
                                   atol=1e-5)

    def test_registry_plugin_enables_refinement(self):
        m = registry.create("ndt_newton", CFG, range_max=15.0)
        assert m.config.refine_iterations == 10
        m2 = registry.create(
            "ndt_newton", dataclasses.replace(CFG, refine_iterations=3), 15.0)
        assert m2.config.refine_iterations == 3

    def test_gradient_matches_autodiff(self):
        """Analytic gradient/Hessian agree with jax.grad/jax.hessian."""
        import jax
        world, m = build_fixture(CFG)
        pts, mask, n = make_scan([5.0, 4.0, 0.0], world)
        spts, smask, _ = matcher.subsample(
            jnp.asarray(pts), jnp.asarray(mask), jnp.int32(n), 100)
        W, H = CFG.grid_cells_x, CFG.grid_cells_y
        pose = jnp.asarray([5.01, 3.99, 0.004], jnp.float32)

        def f(p):
            return newton._objective_grad_hess(m.grid, W, H, spts, smask, p)[0]

        _, grad, hess = newton._objective_grad_hess(m.grid, W, H, spts,
                                                    smask, pose)
        np.testing.assert_allclose(np.asarray(jax.grad(f)(pose)),
                                   np.asarray(grad), rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(jax.hessian(f)(pose)),
                                   np.asarray(hess), rtol=2e-2, atol=0.3)
