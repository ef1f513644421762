"""Pallas kernel correctness: must match the XLA fast path bit-for-close.

Runs in interpret mode on the CPU test mesh; bench.py exercises the compiled
kernel on real TPU hardware.
"""

import jax.numpy as jnp
import numpy as np

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching import matcher, pallas_kernels, registry
from ndt_2d_tpu.utils import sim

CFG = ScanMatcherConfig(grid_cells_x=128, grid_cells_y=128)


def _setup():
    world = sim.make_box_world(10.0, 8.0)
    m = registry.create("ndt", CFG, 15.0)
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


class TestPallasKernel:
    def test_matches_xla_fast_path(self):
        m, qpts, qmask = _setup()
        n = int(qmask.sum())
        pose = jnp.asarray([5.03, 3.99, 0.01], jnp.float32)
        spts, smask, _ = matcher.subsample(
            jnp.asarray(qpts), jnp.asarray(qmask), jnp.int32(n),
            CFG.laser_max_beams)
        dths, dls = matcher._search_offsets(CFG)

        xla = matcher._candidate_scores_local(CFG, m.grid, spts, smask, pose,
                                              dths, dls)
        pls = pallas_kernels.candidate_scores_pallas(
            CFG, m.grid, spts, smask, pose, dths, dls, interpret=True)
        np.testing.assert_allclose(np.asarray(pls), np.asarray(xla),
                                   rtol=1e-5, atol=1e-5)

    def test_masked_beams_and_padding(self):
        m, qpts, qmask = _setup()
        # Few beams: exercises beam padding + masked slots.
        qmask2 = qmask & (np.arange(512) < 37)
        n = int(qmask2.sum())
        pose = jnp.asarray([5.0, 4.0, 0.0], jnp.float32)
        spts, smask, _ = matcher.subsample(
            jnp.asarray(qpts), jnp.asarray(qmask2), jnp.int32(n),
            CFG.laser_max_beams)
        dths, dls = matcher._search_offsets(CFG)
        xla = matcher._candidate_scores_local(CFG, m.grid, spts, smask, pose,
                                              dths, dls)
        pls = pallas_kernels.candidate_scores_pallas(
            CFG, m.grid, spts, smask, pose, dths, dls, interpret=True)
        np.testing.assert_allclose(np.asarray(pls), np.asarray(xla),
                                   rtol=1e-5, atol=1e-5)
