"""Correlative occupancy matcher: the alternative matcher plugin."""

import dataclasses

import numpy as np

from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
from ndt_2d_tpu.matching import registry
from ndt_2d_tpu.utils import sim

CFG = ScanMatcherConfig(grid_cells_x=128, grid_cells_y=128)


def make_scan(pose, world, n_beams=360, max_points=512):
    msg = sim.scan_at_pose(world, np.asarray(pose, float), n_beams=n_beams,
                           range_max=15.0)
    pts, mask = sim.project_scan(msg, max_points)
    return pts, mask, int(mask.sum())


class TestCorrelativeMatcher:
    def test_registry_creates(self):
        m = registry.create("correlative", CFG, range_max=15.0)
        assert type(m).__name__ == "CorrelativeScanMatcher"

    def test_recovers_offset(self):
        world = sim.make_box_world(10.0, 8.0)
        poses = np.asarray([[4.8, 3.9, 0.0], [5.0, 4.0, 0.05],
                            [5.2, 4.1, -0.05]], np.float32)
        pts, msk = [], []
        for p in poses:
            a, b, _ = make_scan(p, world)
            pts.append(a)
            msk.append(b)
        m = registry.create("correlative", CFG, range_max=15.0)
        m.add_scans(poses, np.stack(pts), np.stack(msk))

        qpts, qmask, qn = make_scan([5.0, 4.0, 0.0], world)
        # Offset initial guess by (+0.03, -0.02); the matcher should undo it.
        res = m.match_scan(qpts, qmask, qn,
                           np.asarray([5.03, 3.98, 0.0], np.float32))
        assert float(res.score) < -0.3
        # The field is piecewise-constant per cell (0.25 m), so sub-cell
        # precision is ~cell/8 — coarser than the NDT matcher's analytic
        # Gaussians, which is exactly why NDT is the default.
        np.testing.assert_allclose(np.asarray(res.correction)[:2],
                                   [-0.03, 0.02], atol=0.035)
        # score_points agrees in sign/scale at the corrected pose
        sp = float(m.score_points(qpts, qmask, qn,
                                  np.asarray([5.0, 4.0, 0.0], np.float32)))
        assert sp < -0.3

    def test_reset(self):
        m = registry.create("correlative", CFG, range_max=15.0)
        m.reset()
        assert float(m.match_scan(np.zeros((8, 2), np.float32),
                                  np.zeros(8, bool), 0,
                                  np.zeros(3, np.float32)).score) == 0.0


class TestMapperWithCorrelative:
    def test_end_to_end_mapping(self):
        """The mapper runs unchanged with scan_matcher_type='correlative' —
        the plugin swap the reference architecture promises."""
        from ndt_2d_tpu.mapping.mapper import Mapper
        from ndt_2d_tpu.utils import metrics

        world = sim.make_box_world(10.0, 8.0)
        truth = np.stack([np.linspace(3.0, 6.5, 14), np.full(14, 4.0),
                          np.zeros(14)], -1)
        odom = sim.drift_odometry(truth, 0.04, 0.012, seed=3)
        # Correlative matchers are typically run with a wider search window
        # than NDT (their strength is robustness, not sub-cm precision);
        # size it to cover the odometry noise above.
        local = dataclasses.replace(CFG, grid_cells_x=160, grid_cells_y=160,
                                    search_linear_size=0.15,
                                    search_linear_resolution=0.0075)
        cfg = MapperConfig(
            scan_matcher_type="correlative",
            local_scan_matcher=local,
            global_scan_matcher=CFG, max_points_per_scan=512,
            loop_closure_every=10**9)
        mapper = Mapper(cfg)
        est, tru = [], []
        for t in range(len(truth)):
            msg = sim.scan_at_pose(world, truth[t], n_beams=360,
                                   range_max=12.0, noise=0.01,
                                   rng=np.random.default_rng(t))
            res = mapper.process_scan(msg, odom[t])
            if res.accepted:
                est.append(res.pose)
                tru.append(truth[t])
        assert len(est) >= 12
        ate = metrics.ate_rmse(np.asarray(est), np.asarray(tru))
        odom_ate = metrics.ate_rmse(odom, truth)
        # Correlative precision is ~cell/8, so it only beats odometry when
        # odometry is meaningfully noisy (hence the noise levels above).
        assert ate < odom_ate, f"ate {ate} vs odom {odom_ate}"
        assert ate < 0.15, f"correlative mapping ATE {ate}"
