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
