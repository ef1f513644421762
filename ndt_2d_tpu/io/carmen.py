"""CARMEN log importer: bring real 2D SLAM datasets into the engine.

The classic public 2D laser datasets (Intel Research Lab, MIT Killian
Court, Freiburg, ACES) ship as CARMEN log files.  ``FLASER`` lines carry
one scan each:

  FLASER n r_1 ... r_n laser_x laser_y laser_th odom_x odom_y odom_th ts ...

(`n` readings over the field of view, then the laser pose and the robot
odometry pose in the odometry frame).  This importer converts them to a
``ScanBag`` so every CLI verb (run/localize/serve/viz/benchmarks) works on
real recordings unchanged.

The reference package has no dataset tooling at all — its only input is a
live ROS topic.
"""

from __future__ import annotations

import math

import numpy as np

from ndt_2d_tpu.io.bag import ScanBag


def _open_text(path: str, mode: str = "rt"):
    """Open a (possibly gzip-compressed) text log — the public datasets ship
    as .log.gz / .clf.gz."""
    if path.endswith(".gz"):
        import gzip
        return gzip.open(path, mode)
    return open(path, mode)


def load_carmen(path: str, fov_degrees: float = 180.0,
                range_max: float = None, invalid_beyond: float = 79.0,
                use_laser_pose: bool = True) -> ScanBag:
    """Parse a CARMEN .log/.clf file into a ScanBag.

    Args:
      fov_degrees: laser field of view (classic SICK logs are 180).
      range_max: maximum valid range; defaults to ``invalid_beyond``.
      invalid_beyond: readings >= this are out-of-range markers
        (CARMEN logs use values like 81.91) and become NaN.
      use_laser_pose: odometry column to use — the laser pose (cols right
        after the readings) or the robot odometry pose (next three).
    """
    ranges_rows = []
    odom_rows = []
    n_beams = None
    with _open_text(path) as f:
        for line in f:
            if not line.startswith("FLASER"):
                continue
            parts = line.split()
            try:
                n = int(parts[1])
                vals = [float(v) for v in parts[2:2 + n + 6]]
            except (ValueError, IndexError):
                continue  # malformed line; skip like CARMEN tools do
            if len(vals) < n + 6:
                continue
            if n_beams is None:
                n_beams = n
            elif n != n_beams:
                continue  # mixed laser configurations; keep the first
            r = np.asarray(vals[:n], np.float32)
            pose = vals[n:n + 3] if use_laser_pose else vals[n + 3:n + 6]
            ranges_rows.append(r)
            odom_rows.append(pose)
    if not ranges_rows:
        raise ValueError(f"no FLASER scans found in {path}")

    ranges = np.stack(ranges_rows)
    if range_max is None:
        range_max = float(invalid_beyond)
    ranges = np.where(ranges >= invalid_beyond, np.nan, ranges)

    fov = math.radians(fov_degrees)
    return ScanBag(
        ranges=ranges.astype(np.float32),
        angle_min=-fov / 2.0,
        angle_increment=fov / max(n_beams - 1, 1),
        time_increment=0.0,
        range_max=float(range_max),
        odom=np.asarray(odom_rows, np.float64),
        truth=None,
    )


def save_carmen(bag: ScanBag, path: str) -> None:
    """Write a ScanBag as CARMEN FLASER lines (for tooling round-trips)."""
    with _open_text(path, "wt") as f:
        t0 = 0.0
        for t in range(len(bag)):
            r = np.where(np.isnan(bag.ranges[t]), 81.91, bag.ranges[t])
            vals = " ".join(f"{v:.3f}" for v in r)
            x, y, th = bag.odom[t]
            stamp = t0 + 0.1 * t
            f.write(f"FLASER {bag.ranges.shape[1]} {vals} "
                    f"{x:.6f} {y:.6f} {th:.6f} {x:.6f} {y:.6f} {th:.6f} "
                    f"{stamp:.6f} host {stamp:.6f}\n")
