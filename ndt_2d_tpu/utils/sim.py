"""Synthetic 2D laser world simulator (host-side, numpy).

The reference ships no test data; its behavior is exercised live on robots.
We generate synthetic worlds (box room, corridor, office) and raycast laser
scans along ground-truth trajectories, with optional range noise and odometry
drift, to drive end-to-end tests and benchmarks (BASELINE.json configs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class LaserScanMsg:
    """Stand-in for sensor_msgs/LaserScan as consumed by laserCallback
    (src/ndt_mapper.cpp:267-453)."""

    ranges: np.ndarray          # [N] float; NaN = invalid
    angle_min: float
    angle_increment: float
    time_increment: float = 0.0
    range_max: float = 30.0


def polygon_segments(vertices: np.ndarray) -> np.ndarray:
    """Closed polygon -> [M, 2, 2] wall segments."""
    v = np.asarray(vertices, np.float64)
    return np.stack([v, np.roll(v, -1, axis=0)], axis=1)


def make_box_world(width: float = 10.0, height: float = 8.0) -> np.ndarray:
    return polygon_segments(
        [(0, 0), (width, 0), (width, height), (0, height)])


def make_corridor_world(length: float = 40.0, width: float = 3.0,
                        n_pillars: int = 6) -> np.ndarray:
    """A long corridor with alternating wall pillars for texture."""
    segs = [polygon_segments([(0, 0), (length, 0), (length, width), (0, width)])]
    for i in range(n_pillars):
        x = (i + 1) * length / (n_pillars + 1)
        side = i % 2
        y0 = 0.0 if side == 0 else width - 0.3
        segs.append(polygon_segments(
            [(x, y0), (x + 0.3, y0), (x + 0.3, y0 + 0.3), (x, y0 + 0.3)]))
    return np.concatenate(segs, axis=0)


def make_office_world(size: float = 16.0) -> np.ndarray:
    """A square office with inner rooms, suitable for loop-closure loops."""
    s = size
    segs = [polygon_segments([(0, 0), (s, 0), (s, s), (0, s)])]
    # Inner block with a corridor ring around it.
    m = s * 0.25
    segs.append(polygon_segments(
        [(m, m), (s - m, m), (s - m, s - m), (m, s - m)]))
    # A few wall stubs off the outer wall for texture.
    for frac in (0.2, 0.5, 0.8):
        x = s * frac
        segs.append(np.asarray([[[x, 0.0], [x, 0.8]]]))
        segs.append(np.asarray([[[x, s], [x, s - 0.8]]]))
        segs.append(np.asarray([[[0.0, x], [0.8, x]]]))
        segs.append(np.asarray([[[s, x], [s - 0.8, x]]]))
    return np.concatenate(segs, axis=0)


def raycast(segments: np.ndarray, origin: np.ndarray, angles: np.ndarray,
            range_max: float) -> np.ndarray:
    """Vectorized ray/segment intersection.

    Args:
      segments: [M, 2, 2]; origin: [2]; angles: [N] world-frame beam angles.
    Returns [N] ranges; NaN where no hit within range_max (matching the
    NaN-filtered LaserScan convention, src/ndt_mapper.cpp:413).
    """
    d = np.stack([np.cos(angles), np.sin(angles)], axis=-1)     # [N, 2]
    a = segments[:, 0]                                          # [M, 2]
    s = segments[:, 1] - segments[:, 0]                         # [M, 2]
    ap = a[None, :, :] - origin[None, None, :]                  # [1->N, M, 2]
    denom = d[:, None, 0] * s[None, :, 1] - d[:, None, 1] * s[None, :, 0]
    denom = np.where(np.abs(denom) < 1e-12, np.nan, denom)
    t = (ap[..., 0] * s[None, :, 1] - ap[..., 1] * s[None, :, 0]) / denom
    u = (ap[..., 0] * d[:, None, 1] - ap[..., 1] * d[:, None, 0]) / denom
    t = np.where((u >= 0.0) & (u <= 1.0) & (t > 1e-6), t, np.inf)
    r = np.nanmin(np.where(np.isnan(t), np.inf, t), axis=1)
    return np.where(r <= range_max, r, np.nan)


def scan_at_pose(segments: np.ndarray, pose: np.ndarray, n_beams: int = 360,
                 fov: float = 2.0 * np.pi, range_max: float = 30.0,
                 noise: float = 0.0,
                 rng: Optional[np.random.Generator] = None) -> LaserScanMsg:
    """Simulate a laser scan from pose (x, y, theta)."""
    angle_min = -fov / 2.0
    inc = fov / n_beams
    beam_angles = pose[2] + angle_min + inc * np.arange(n_beams)
    ranges = raycast(segments, np.asarray(pose[:2], np.float64), beam_angles,
                     range_max)
    if noise > 0.0:
        rng = rng or np.random.default_rng(0)
        ranges = ranges + rng.normal(0.0, noise, size=ranges.shape)
    return LaserScanMsg(ranges=ranges.astype(np.float64), angle_min=angle_min,
                        angle_increment=inc, range_max=range_max)


def project_scan(msg: LaserScanMsg, max_points: int):
    """Project a LaserScanMsg to padded robot-frame points (no de-skew).

    Returns (points [max_points, 2] float32, mask [max_points]).
    """
    valid = ~np.isnan(msg.ranges)
    idx = np.nonzero(valid)[0]
    ang = msg.angle_min + msg.angle_increment * idx
    pts = np.stack([np.cos(ang) * msg.ranges[idx],
                    np.sin(ang) * msg.ranges[idx]], axis=-1)
    n = min(len(idx), max_points)
    points = np.zeros((max_points, 2), np.float32)
    mask = np.zeros(max_points, bool)
    points[:n] = pts[:n]
    mask[:n] = True
    return points, mask


def drift_odometry(true_poses: np.ndarray, trans_noise: float = 0.01,
                   rot_noise: float = 0.002,
                   seed: int = 0) -> np.ndarray:
    """Integrate noisy relative motions to simulate odometry drift.

    Returns [T, 3] odometry-frame poses whose frame-to-frame deltas are the
    ground-truth deltas plus Gaussian noise.
    """
    rng = np.random.default_rng(seed)
    odom = np.zeros_like(true_poses)
    odom[0] = true_poses[0]
    for t in range(1, len(true_poses)):
        prev_t, cur_t = true_poses[t - 1], true_poses[t]
        # true delta in prev frame
        c, s = np.cos(prev_t[2]), np.sin(prev_t[2])
        dx_w, dy_w = cur_t[0] - prev_t[0], cur_t[1] - prev_t[1]
        dx = c * dx_w + s * dy_w + rng.normal(0, trans_noise)
        dy = -s * dx_w + c * dy_w + rng.normal(0, trans_noise)
        dth = (cur_t[2] - prev_t[2]) + rng.normal(0, rot_noise)
        # integrate in odom frame
        po = odom[t - 1]
        c2, s2 = np.cos(po[2]), np.sin(po[2])
        odom[t] = [po[0] + c2 * dx - s2 * dy,
                   po[1] + s2 * dx + c2 * dy,
                   po[2] + dth]
    return odom
