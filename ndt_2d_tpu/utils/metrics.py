"""Trajectory metrics (ATE) for benchmark/e2e evaluation.

The reference publishes no accuracy numbers; ATE against simulated ground
truth is the driver-set accuracy metric (BASELINE.json).
"""

from __future__ import annotations

import numpy as np


def relative_to_first(poses: np.ndarray) -> np.ndarray:
    """Express a trajectory [N, 3] relative to its first pose (SE(2))."""
    p0 = poses[0]
    c, s = np.cos(-p0[2]), np.sin(-p0[2])
    d = poses[:, :2] - p0[:2]
    xy = np.stack([c * d[:, 0] - s * d[:, 1],
                   s * d[:, 0] + c * d[:, 1]], axis=-1)
    th = poses[:, 2] - p0[2]
    th = th - 2 * np.pi * np.floor((th + np.pi) / (2 * np.pi))
    return np.concatenate([xy, th[:, None]], axis=-1)


def ate_rmse(estimated: np.ndarray, truth: np.ndarray) -> float:
    """Absolute trajectory error (RMSE of positions) after aligning both
    trajectories to their first pose (the map frame starts at the first
    scan's pose in both the reference and this implementation)."""
    est = relative_to_first(np.asarray(estimated, np.float64))
    tru = relative_to_first(np.asarray(truth, np.float64))
    d = est[:, :2] - tru[:, :2]
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))
