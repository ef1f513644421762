"""Occupancy-grid export tests (OccupancyGrid behavior,
src/occupancy_grid.cpp:47-185): endpoint cells occupied, ray cells free,
untouched cells unknown, bounds snapped + padded."""

import numpy as np

from ndt_2d_tpu.mapping import occupancy


def _single_scan(points, pose=(0.0, 0.0, 0.0), max_points=16):
    pts = np.zeros((1, max_points, 2), np.float32)
    mask = np.zeros((1, max_points), bool)
    n = len(points)
    pts[0, :n] = points
    mask[0, :n] = True
    return np.asarray([pose], np.float64), pts, mask


def _cell(grid, x, y):
    ix = int(np.floor((x - grid.origin[0]) / grid.resolution))
    iy = int(np.floor((y - grid.origin[1]) / grid.resolution))
    return grid.data[iy, ix]


class TestOccupancy:
    def test_hit_free_unknown(self):
        poses, pts, mask = _single_scan([(2.0, 0.0)])
        grid = occupancy.render_occupancy(poses, pts, mask, resolution=0.1,
                                          occ_thresh=0.25)
        assert _cell(grid, 2.0, 0.0) == 100          # endpoint occupied
        assert _cell(grid, 1.0, 0.0) == 0            # along ray: free
        assert _cell(grid, 0.3, 0.0) == 0
        assert _cell(grid, 1.0, 1.0) == -1           # off-ray: unknown

    def test_threshold_occupied_vs_free(self):
        # One beam ends in a cell that several other beams pass through:
        # hits/(hits+empty) below the threshold means free
        # (occupancy_grid.cpp:136-151).
        beams = [(2.0, 0.0)] + [(4.0, 0.0)] * 8
        poses, pts, mask = _single_scan(beams)
        grid = occupancy.render_occupancy(poses, pts, mask, resolution=0.1,
                                          occ_thresh=0.25)
        # (2.0, 0) got 1 hit + 8 pass-throughs: ratio 1/9 < 0.25 -> free
        assert _cell(grid, 2.0, 0.0) == 0
        assert _cell(grid, 4.0, 0.0) == 100

    def test_rotated_pose(self):
        # Point (1, 0) in robot frame with pose theta=pi/2 lands at (0, 1).
        poses, pts, mask = _single_scan([(1.0, 0.0)],
                                        pose=(0.0, 0.0, np.pi / 2.0))
        grid = occupancy.render_occupancy(poses, pts, mask, resolution=0.1,
                                          occ_thresh=0.25)
        assert _cell(grid, 0.0, 1.0) == 100

    def test_bounds_include_origin_and_pad(self):
        poses, pts, mask = _single_scan([(3.0, 2.0)], pose=(1.0, 1.0, 0.0))
        grid = occupancy.render_occupancy(poses, pts, mask, resolution=0.1,
                                          occ_thresh=0.25, pad_cells=5)
        # origin <= world origin - pad (reference bounds start at 0 and pad
        # by 5 cells, occupancy_grid.cpp:39-42, :57)
        assert grid.origin[0] <= -0.5 + 1e-9
        assert grid.origin[1] <= -0.5 + 1e-9

    def test_masked_beams_ignored(self):
        poses, pts, mask = _single_scan([(2.0, 0.0)])
        mask[0, 1:] = False
        pts[0, 1] = (5.0, 5.0)  # garbage in a masked slot
        grid = occupancy.render_occupancy(poses, pts, mask, resolution=0.1,
                                          occ_thresh=0.25)
        assert _cell(grid, 5.0, 5.0) == -1
