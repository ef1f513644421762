"""Host-side pose graph store (keyframes + constraints).

Mirrors the reference ``Graph`` container (include/ndt_2d/graph.hpp:45-118):
scans and constraints with nearest-keyframe radius search.  The reference
rebuilds a nanoflann KD-tree from scratch on every query (src/graph.cpp:167-189);
on TPU-scale graphs a brute-force masked distance computation is both simpler
and faster, and is what we do (vectorized numpy on host; the sharded variant
lives in ndt_2d_tpu.parallel).

Storage is structure-of-arrays numpy with padded point buffers so device
transfers are zero-copy-ish slices; poses are float64 on host (the graph is
the source of truth), cast to float32 at device boundaries.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class Graph:
    """Keyframe graph: scans, constraints, nearest search, barycenters."""

    def __init__(self, max_points_per_scan: int, use_barycenter: bool = True):
        self.use_barycenter = use_barycenter
        self.max_points = max_points_per_scan
        self.poses = np.zeros((0, 3), np.float64)
        self.points = np.zeros((0, max_points_per_scan, 2), np.float32)
        self.point_mask = np.zeros((0, max_points_per_scan), bool)
        self._point_means = np.zeros((0, 2), np.float64)  # robot-frame mean
        self._has_points = np.zeros((0,), bool)
        # Constraints
        self.constraint_begin = np.zeros((0,), np.int32)
        self.constraint_end = np.zeros((0,), np.int32)
        self.constraint_transform = np.zeros((0, 3), np.float64)
        self.constraint_information = np.zeros((0, 3, 3), np.float64)
        self.constraint_switchable = np.zeros((0,), bool)

    # -- scans ------------------------------------------------------------
    @property
    def num_scans(self) -> int:
        return self.poses.shape[0]

    @property
    def num_constraints(self) -> int:
        return self.constraint_begin.shape[0]

    def add_scan(self, pose, points: np.ndarray, point_mask: np.ndarray) -> int:
        """Append a keyframe; returns its id (== index, as in the reference
        where Scan ids are assigned graph_->scans.size(), ndt_mapper.cpp:398)."""
        scan_id = self.num_scans
        self.poses = np.concatenate(
            [self.poses, np.asarray(pose, np.float64)[None]], axis=0)
        self.points = np.concatenate(
            [self.points, np.asarray(points, np.float32)[None]], axis=0)
        self.point_mask = np.concatenate(
            [self.point_mask, np.asarray(point_mask, bool)[None]], axis=0)
        n = point_mask.sum()
        mean = (points[point_mask].mean(0) if n else np.zeros(2))
        self._point_means = np.concatenate(
            [self._point_means, np.asarray(mean, np.float64)[None]], axis=0)
        self._has_points = np.concatenate([self._has_points, [n > 0]])
        return scan_id

    def set_poses(self, poses: np.ndarray) -> None:
        """Overwrite all scan poses (after optimization).  Barycenters are
        derived quantities and follow automatically (cf. Scan::setPose
        marking the cached barycenter dirty, src/scan.cpp:44-48)."""
        assert poses.shape == self.poses.shape
        self.poses = np.asarray(poses, np.float64)

    def barycenters(self) -> np.ndarray:
        """[N, 2] barycenter of each scan: pose + R(theta) * mean(points)
        (src/scan.cpp:72-91); equals the pose position for empty scans."""
        th = self.poses[:, 2]
        c, s = np.cos(th), np.sin(th)
        mx, my = self._point_means[:, 0], self._point_means[:, 1]
        off = np.stack([c * mx - s * my, s * mx + c * my], axis=-1)
        return self.poses[:, :2] + np.where(self._has_points[:, None], off, 0.0)

    def query_position(self, scan_id: int) -> np.ndarray:
        if self.use_barycenter:
            return self.barycenters()[scan_id]
        return self.poses[scan_id, :2]

    def find_nearest(self, query_xy, dist: float = 10.0,
                     limit_scan_index: int = -1) -> np.ndarray:
        """Radius search over scan positions/barycenters.

        Mirrors Graph::findNearest (src/graph.cpp:167-189) including the
        nanoflann convention that ``dist`` is a *squared* L2 radius, and
        returns indices sorted by ascending distance.  ``limit_scan_index > 0``
        restricts the search to scans[0:limit] (used to exclude the rolling
        window during loop closure, ndt_mapper.cpp:615).
        """
        limit = limit_scan_index if limit_scan_index > 0 else self.num_scans
        if limit == 0:
            return np.zeros(0, np.int64)
        pos = (self.barycenters() if self.use_barycenter
               else self.poses[:, :2])[:limit]
        d2 = np.sum((pos - np.asarray(query_xy)[None, :]) ** 2, axis=-1)
        hits = np.nonzero(d2 < dist)[0]
        return hits[np.argsort(d2[hits], kind="stable")]

    # -- constraints ------------------------------------------------------
    def add_constraint(self, begin: int, end: int, transform, information,
                       switchable: bool = False) -> None:
        self.constraint_begin = np.concatenate(
            [self.constraint_begin, [np.int32(begin)]])
        self.constraint_end = np.concatenate(
            [self.constraint_end, [np.int32(end)]])
        self.constraint_transform = np.concatenate(
            [self.constraint_transform,
             np.asarray(transform, np.float64)[None]], axis=0)
        self.constraint_information = np.concatenate(
            [self.constraint_information,
             np.asarray(information, np.float64)[None]], axis=0)
        self.constraint_switchable = np.concatenate(
            [self.constraint_switchable, [bool(switchable)]])


def make_constraint_np(graph: Graph, begin: int, end: int,
                       covariance: np.ndarray,
                       switchable: bool = False) -> None:
    """makeConstraint (src/constraint.cpp:35-56) directly into the graph."""
    pa, pb = graph.poses[begin], graph.poses[end]
    dx, dy = pb[0] - pa[0], pb[1] - pa[1]
    c, s = np.cos(pa[2]), np.sin(pa[2])
    transform = np.asarray([c * dx + s * dy, -s * dx + c * dy, pb[2] - pa[2]])
    information = np.linalg.inv(np.asarray(covariance, np.float64))
    graph.add_constraint(begin, end, transform, information, switchable)
