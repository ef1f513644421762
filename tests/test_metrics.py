"""Trajectory metrics (utils.metrics)."""

import numpy as np

from ndt_2d_tpu.utils import metrics


def _with_theta(xy):
    return np.concatenate([xy, np.zeros((len(xy), 1))], axis=-1)


class TestAteAligned:
    def test_pure_se2_offset_is_zero(self):
        """A rigidly transformed copy of the truth has zero aligned ATE
        (the unobservable SLAM gauge is removed)."""
        rng = np.random.default_rng(0)
        q = _with_theta(rng.normal(0.0, 5.0, (50, 2)))
        th, t = 0.3, np.asarray([1.5, -2.0])
        c, s = np.cos(th), np.sin(th)
        p = q.copy()
        p[:, :2] = np.stack([c * q[:, 0] - s * q[:, 1],
                             s * q[:, 0] + c * q[:, 1]], -1) + t
        assert metrics.ate_rmse_aligned(p, q) < 1e-10
        # first-pose alignment sees the rotation as real error
        assert metrics.ate_rmse(p, q) > 1.0

    def test_noise_floor(self):
        rng = np.random.default_rng(1)
        q = _with_theta(rng.normal(0.0, 5.0, (200, 2)))
        p = q.copy()
        p[:, :2] += rng.normal(0.0, 0.1, (200, 2))
        a = metrics.ate_rmse_aligned(p, q)
        assert 0.1 < a < 0.2  # ~sqrt(2)*0.1

    def test_aligned_never_exceeds_first_pose(self):
        rng = np.random.default_rng(2)
        q = _with_theta(np.cumsum(rng.normal(0, 0.3, (100, 2)), axis=0))
        p = q.copy()
        p[:, :2] += np.cumsum(rng.normal(0, 0.02, (100, 2)), axis=0)
        assert (metrics.ate_rmse_aligned(p, q)
                <= metrics.ate_rmse(p, q) + 1e-9)
