"""Spatially-sharded NDT blocks vs the dense grid (parallel.ndt_blocks)."""

import numpy as np
import jax.numpy as jnp

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching import matcher
from ndt_2d_tpu.ndt import grid as ndt_grid
from ndt_2d_tpu.parallel import mesh as mesh_mod, ndt_blocks
from ndt_2d_tpu.utils import sim

CFG = ScanMatcherConfig(grid_cells_x=128, grid_cells_y=128)
RANGE_MAX = 15.0


def _window(n_scans=4):
    world = sim.make_box_world(10.0, 8.0)
    poses = np.asarray([[4.6 + 0.2 * i, 3.8 + 0.1 * i, 0.05 * i]
                        for i in range(n_scans)], np.float32)
    pts, msk = [], []
    rng = np.random.default_rng(0)
    for p in poses:
        msg = sim.scan_at_pose(world, p, n_beams=360, range_max=RANGE_MAX,
                               noise=0.01, rng=rng)
        a, b = sim.project_scan(msg, 512)
        pts.append(a)
        msk.append(b)
    return (jnp.asarray(poses), jnp.asarray(np.stack(pts)),
            jnp.asarray(np.stack(msk)), jnp.ones(n_scans, bool), world)


class TestShardedNDT:
    def setup_method(self):
        self.mesh = mesh_mod.make_mesh(8, shape=(8, 1))
        (self.poses, self.points, self.pmask, self.wmask,
         self.world) = _window()
        self.origin = matcher.window_origin(CFG, self.poses, self.wmask,
                                            jnp.float32(RANGE_MAX))
        self.dense = ndt_grid.build_ndt_from_scans(
            self.poses, self.points, self.pmask & self.wmask[:, None],
            self.origin, CFG.ndt_resolution, CFG.grid_cells_x,
            CFG.grid_cells_y)
        self.sharded = ndt_blocks.build_ndt_sharded(
            self.mesh, self.poses, self.points, self.pmask, self.wmask,
            self.origin, CFG.ndt_resolution, CFG.grid_cells_x,
            CFG.grid_cells_y)

    def test_build_matches_dense(self):
        np.testing.assert_array_equal(np.asarray(self.sharded.count),
                                      np.asarray(self.dense.count))
        np.testing.assert_allclose(np.asarray(self.sharded.mean),
                                   np.asarray(self.dense.mean), atol=1e-5)
        np.testing.assert_allclose(np.asarray(self.sharded.information),
                                   np.asarray(self.dense.information),
                                   rtol=2e-4, atol=1e-3)

    def test_score_matches_dense(self):
        msg = sim.scan_at_pose(self.world, [5.0, 4.0, 0.0], n_beams=240,
                               range_max=RANGE_MAX)
        qp, qm = sim.project_scan(msg, 512)
        # world-frame points at a test pose
        w = np.asarray(qp) + np.asarray([5.0, 4.0])
        dense = float(jnp.sum(ndt_grid.score_points(
            self.dense, jnp.asarray(w), jnp.asarray(qm),
            CFG.grid_cells_x, CFG.grid_cells_y)))
        sharded = float(ndt_blocks.score_points_sharded(
            self.mesh, self.sharded, jnp.asarray(w), jnp.asarray(qm),
            CFG.grid_cells_x, CFG.grid_cells_y))
        assert dense > 1.0  # fixture sanity: something actually scored
        np.testing.assert_allclose(sharded, dense, rtol=1e-5)

    def test_match_matches_dense(self):
        msg = sim.scan_at_pose(self.world, [5.0, 4.0, 0.02], n_beams=360,
                               range_max=RANGE_MAX)
        qp, qm = sim.project_scan(msg, 512)
        nq = jnp.int32(int(qm.sum()))
        pose = jnp.asarray([5.03, 3.99, 0.0], jnp.float32)
        dense = matcher.match_scan(CFG, self.dense, jnp.asarray(qp),
                                   jnp.asarray(qm), nq, pose,
                                   jnp.float32(RANGE_MAX))
        sharded = ndt_blocks.match_scan_sharded_map(
            CFG, self.mesh, self.sharded, jnp.asarray(qp), jnp.asarray(qm),
            nq, pose)
        assert float(dense.score) < -0.2
        np.testing.assert_allclose(float(sharded.score), float(dense.score),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sharded.correction),
                                   np.asarray(dense.correction), atol=1e-6)
        np.testing.assert_allclose(np.asarray(sharded.covariance),
                                   np.asarray(dense.covariance), rtol=1e-4,
                                   atol=1e-6)


class TestParticleTimesMapSharding:
    """Particles over 'batch' x map stripes over 'space' in one shard_map."""

    def test_matches_dense_batch_scoring(self):
        from ndt_2d_tpu.matching import matcher as matcher_mod

        mesh = mesh_mod.make_mesh(8, shape=(4, 2))
        poses, points, pmask, wmask, world = _window()
        origin = matcher.window_origin(CFG, poses, wmask,
                                       jnp.float32(RANGE_MAX))
        dense = ndt_grid.build_ndt_from_scans(
            poses, points, pmask & wmask[:, None], origin,
            CFG.ndt_resolution, CFG.grid_cells_x, CFG.grid_cells_y)
        sharded = ndt_blocks.build_ndt_sharded(
            mesh, poses, points, pmask, wmask, origin, CFG.ndt_resolution,
            CFG.grid_cells_x, CFG.grid_cells_y, axis="space")

        msg = sim.scan_at_pose(world, [5.0, 4.0, 0.0], n_beams=240,
                               range_max=RANGE_MAX)
        qp, qm = sim.project_scan(msg, 512)
        nq = jnp.int32(int(qm.sum()))
        rng = np.random.default_rng(3)
        particles = jnp.asarray(
            (np.asarray([5.0, 4.0, 0.0]) +
             rng.normal(0, [0.3, 0.3, 0.05], (16, 3))).astype(np.float32))

        got = ndt_blocks.score_particles_sharded_map(
            CFG, mesh, sharded, jnp.asarray(qp), jnp.asarray(qm), nq,
            particles)
        want = matcher_mod.score_points_batch(
            CFG, dense, jnp.asarray(qp), jnp.asarray(qm), nq, particles)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        # Weights are meaningful relatively: all nonpositive, not all equal
        # (NDT wall Gaussians are ~1 cm thin, so absolute values are tiny
        # for offset particles — exactly like the dense path).
        got = np.asarray(got)
        assert (got <= 0).all() and got.min() < got.mean()
