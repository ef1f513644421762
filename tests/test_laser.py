"""Laser projection / de-skew tests (the math at ndt_mapper.cpp:366-453)."""

import numpy as np

from ndt_2d_tpu.mapping import laser
from ndt_2d_tpu.utils.sim import LaserScanMsg


def _msg(ranges, angle_min=0.0, inc=np.pi / 2.0):
    return LaserScanMsg(ranges=np.asarray(ranges, float), angle_min=angle_min,
                        angle_increment=inc, range_max=10.0)


class TestProjection:
    def test_basic_polar_to_cartesian(self):
        msg = _msg([1.0, 2.0, 3.0, 4.0])  # beams at 0, 90, 180, 270 deg
        pts, mask = laser.project_scan(msg, range_max=10.0, max_points=8)
        assert mask.sum() == 4
        np.testing.assert_allclose(pts[0], [1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(pts[1], [0.0, 2.0], atol=1e-6)
        np.testing.assert_allclose(pts[2], [-3.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(pts[3], [0.0, -4.0], atol=1e-6)

    def test_nan_and_range_filtering(self):
        msg = _msg([1.0, np.nan, 20.0, 2.0])
        pts, mask = laser.project_scan(msg, range_max=10.0, max_points=8)
        assert mask.sum() == 2  # NaN and >max dropped (ndt_mapper.cpp:436)
        np.testing.assert_allclose(pts[0], [1.0, 0.0], atol=1e-6)
        np.testing.assert_allclose(pts[1], [0.0, -2.0], atol=1e-6)

    def test_laser_extrinsic(self):
        msg = _msg([1.0])
        pts, mask = laser.project_scan(
            msg, 10.0, laser_transform=np.asarray([0.5, 0.0, np.pi / 2.0]),
            max_points=4)
        # beam along laser +x; laser rotated 90deg and offset 0.5m forward.
        np.testing.assert_allclose(pts[0], [0.5, 1.0], atol=1e-6)

    def test_inverted_laser_skips_beam_zero_and_negates(self):
        msg = _msg([1.0, 2.0, 3.0, 4.0])
        pts, mask = laser.project_scan(msg, 10.0, laser_inverted=True,
                                       max_points=8)
        assert mask.sum() == 3  # i runs n-1..1 (ndt_mapper.cpp:410)
        # first emitted point is beam 3 at angle -(3*pi/2)
        np.testing.assert_allclose(pts[0], [0.0, 4.0], atol=1e-6)
        np.testing.assert_allclose(pts[1], [-3.0, 0.0], atol=1e-5)
        np.testing.assert_allclose(pts[2], [0.0, -2.0], atol=1e-6)

    def test_deskew_shifts_later_beams(self):
        # Robot translating +x by 0.4m over the sweep: beam i is corrected by
        # (i/n) * motion (ndt_mapper.cpp:391-395, :445-448).
        msg = _msg([1.0, 1.0, 1.0, 1.0])
        pts, _ = laser.project_scan(
            msg, 10.0, translation=np.asarray([0.4, 0.0, 0.0]), max_points=8)
        np.testing.assert_allclose(pts[0], [1.0, 0.0], atol=1e-6)   # i=0: none
        np.testing.assert_allclose(pts[1], [0.1, 1.0], atol=1e-6)   # i=1: 0.1
        np.testing.assert_allclose(pts[2], [-1.0 + 0.2, 0.0], atol=1e-6)
        np.testing.assert_allclose(pts[3], [0.3, -1.0], atol=1e-6)

    def test_truncates_to_max_points(self):
        msg = _msg(np.ones(16), inc=0.1)
        pts, mask = laser.project_scan(msg, 10.0, max_points=8)
        assert mask.sum() == 8


class TestInvertedDetection:
    """Auto-detection of an upside-down laser from the mount rotation
    quaternion (ndt_mapper.cpp:278-283: |q.x| or |q.y| > 0.02)."""

    def test_upright_not_inverted(self):
        assert not laser.detect_inverted([0.0, 0.0, 0.0, 1.0])
        # yaw-only rotation is still upright
        assert not laser.detect_inverted(
            [0.0, 0.0, np.sin(0.5), np.cos(0.5)])

    def test_rolled_laser_detected(self):
        # 180deg roll: q = (1, 0, 0, 0)
        assert laser.detect_inverted([1.0, 0.0, 0.0, 0.0])
        # slight pitch above threshold
        assert laser.detect_inverted([0.0, 0.03, 0.0, 0.999])
        # sub-threshold mount wobble tolerated (the reference's 0.02 gate)
        assert not laser.detect_inverted([0.015, 0.01, 0.0, 0.999])

    def test_extrinsic_from_transform_yaw(self):
        yaw = 0.7
        q = [0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)]
        xyth, inv = laser.extrinsic_from_transform([0.2, -0.1, 0.3], q)
        np.testing.assert_allclose(xyth, [0.2, -0.1, yaw], atol=1e-9)
        assert not inv

    def test_mapper_auto_detects_mirrored_scan(self):
        """A mapper given the rolled quaternion projects the scan through the
        mirrored branch — identical to an explicit laser_inverted=True."""
        from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
        from ndt_2d_tpu.mapping.mapper import Mapper

        cfg = MapperConfig(
            local_scan_matcher=ScanMatcherConfig(grid_cells_x=64,
                                                 grid_cells_y=64),
            max_points_per_scan=64)
        rolled = [1.0, 0.0, 0.0, 0.0]   # 180deg roll about x
        m_auto = Mapper(cfg, laser_rotation=rolled)
        assert m_auto.laser_inverted
        m_explicit = Mapper(cfg, laser_inverted=True)
        # Explicit override wins over detection.
        m_override = Mapper(cfg, laser_rotation=rolled, laser_inverted=False)
        assert not m_override.laser_inverted

        msg = _msg([1.0, 2.0, 3.0, 4.0], angle_min=-np.pi / 4)
        msg = LaserScanMsg(ranges=msg.ranges, angle_min=msg.angle_min,
                           angle_increment=msg.angle_increment,
                           range_max=10.0)
        res_a = m_auto.process_scan(msg, np.zeros(3))
        res_e = m_explicit.process_scan(msg, np.zeros(3))
        assert res_a.accepted and res_e.accepted
        np.testing.assert_allclose(
            m_auto.graph.points[0], m_explicit.graph.points[0], atol=1e-6)
        assert m_auto.graph.point_mask[0].sum() == 3  # mirrored branch: n-1
