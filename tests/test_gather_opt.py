"""Grouped-gather candidate scoring (matching.gather_opt) equivalence."""

import numpy as np
import pytest

import jax.numpy as jnp

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching import gather_opt, matcher
from ndt_2d_tpu.utils import sim


def _setup(grid_cells=96, n_beams=240, range_max=10.0):
    cfg = ScanMatcherConfig(grid_cells_x=grid_cells, grid_cells_y=grid_cells)
    world = sim.make_box_world(10.0, 8.0)
    rng = np.random.default_rng(0)
    poses = np.asarray([[4.8, 3.9, 0.0], [5.0, 4.0, 0.05],
                        [5.2, 4.1, -0.05]], np.float32)
    pts, msk = [], []
    for p in poses:
        msg = sim.scan_at_pose(world, p, n_beams=n_beams, range_max=range_max,
                               noise=0.005, rng=rng)
        a, b = sim.project_scan(msg, 512)
        pts.append(a)
        msk.append(b)
    grid = matcher.build_window_ndt(
        cfg, jnp.asarray(poses), jnp.asarray(np.stack(pts)),
        jnp.asarray(np.stack(msk)), jnp.ones(3, bool),
        jnp.float32(range_max))
    msg = sim.scan_at_pose(world, np.asarray([5.0, 4.0, 0.01]),
                           n_beams=n_beams, range_max=range_max,
                           noise=0.005, rng=rng)
    qp, qm = sim.project_scan(msg, 512)
    return cfg, grid, qp, qm, range_max


class TestGroupedGather:
    @pytest.mark.parametrize("group", [1, 3, 4, 7, 8])
    def test_matches_local_path(self, group):
        # 3 and 7 do NOT divide the default 80 angles: the padded tail
        # group must pad dths with the edge angle, not zero (a zero pad
        # pulled the group's min-position reference toward the lattice
        # center and silently mis-scored the real tail angles).
        cfg, grid, qp, qm, range_max = _setup()
        assert group <= gather_opt.max_group(cfg, range_max)
        spts, smask, _ = matcher.subsample(
            jnp.asarray(qp), jnp.asarray(qm), jnp.int32(int(qm.sum())),
            cfg.laser_max_beams)
        dths, dls = matcher._search_offsets(cfg)
        pose = jnp.asarray([5.02, 3.98, 0.01], jnp.float32)
        ref = matcher._candidate_scores_local(cfg, grid, spts, smask, pose,
                                              dths, dls)
        got = gather_opt.candidate_scores_grouped(cfg, grid, spts, smask,
                                                  pose, dths, dls, group)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grid_edges_agree(self):
        """Start pose near the grid edge: clip + bounds-mask path."""
        cfg, grid, qp, qm, range_max = _setup()
        spts, smask, _ = matcher.subsample(
            jnp.asarray(qp), jnp.asarray(qm), jnp.int32(int(qm.sum())),
            cfg.laser_max_beams)
        dths, dls = matcher._search_offsets(cfg)
        # push beams across/off the grid boundary
        for shift in ((-11.0, 0.0), (11.0, 9.0), (0.0, -9.5)):
            pose = jnp.asarray([5.0 + shift[0], 4.0 + shift[1], 0.01],
                               jnp.float32)
            ref = matcher._candidate_scores_local(cfg, grid, spts, smask,
                                                  pose, dths, dls)
            got = gather_opt.candidate_scores_grouped(
                cfg, grid, spts, smask, pose, dths, dls, 8)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

    def test_max_group_bound(self):
        cfg = ScanMatcherConfig()
        g = gather_opt.max_group(cfg, 15.0)
        assert g >= 1
        # sweep + window must fit the 3x3 patch
        assert (15.0 * g * cfg.search_angular_resolution
                + 2 * cfg.search_linear_size) <= 2 * cfg.ndt_resolution
