"""Scan-matcher tests: subsampling semantics, offset recovery, scoring.

The reference has no matcher unit tests; these encode the documented
behavior of ScanMatcherNDT (src/scan_matcher_ndt.cpp) — stride subsampling,
candidate lattice, correction recovery, score normalization — against
synthetic raycast scans.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching import matcher, registry
from ndt_2d_tpu.utils import sim

CFG = ScanMatcherConfig(grid_cells_x=128, grid_cells_y=128)


def make_scan(pose, world=None, n_beams=360, max_points=512):
    world = world if world is not None else sim.make_box_world(10.0, 8.0)
    msg = sim.scan_at_pose(world, np.asarray(pose, float), n_beams=n_beams,
                           range_max=15.0)
    pts, mask = sim.project_scan(msg, max_points)
    return pts, mask, int(mask.sum())


class TestSubsample:
    def test_stride_matches_reference(self):
        # n=250 points, 100 beams: step 2.5 -> idx floor(i*2.5)
        pts = jnp.arange(512, dtype=jnp.float32)[:, None].repeat(2, 1)
        mask = jnp.arange(512) < 250
        spts, smask, used = matcher.subsample(pts, mask, jnp.int32(250), 100)
        assert int(used) == 100
        expect = np.floor(np.arange(100) * 2.5).astype(int)
        np.testing.assert_array_equal(np.asarray(spts[:, 0]).astype(int), expect)
        assert bool(smask.all())

    def test_fewer_points_than_beams(self):
        pts = jnp.arange(512, dtype=jnp.float32)[:, None].repeat(2, 1)
        mask = jnp.arange(512) < 40
        spts, smask, used = matcher.subsample(pts, mask, jnp.int32(40), 100)
        assert int(used) == 40
        np.testing.assert_array_equal(np.asarray(smask),
                                      np.arange(100) < 40)
        np.testing.assert_array_equal(
            np.asarray(spts[:40, 0]).astype(int), np.arange(40))


class TestMatchScan:
    def setup_method(self):
        self.world = sim.make_box_world(10.0, 8.0)
        self.m = registry.create("ndt", CFG, range_max=15.0)
        # Map built from 3 scans near the room center.
        poses = np.asarray([[4.8, 3.9, 0.0], [5.0, 4.0, 0.05],
                            [5.2, 4.1, -0.05]], np.float32)
        pts, msk = [], []
        for p in poses:
            a, b, _ = make_scan(p, self.world)
            pts.append(a)
            msk.append(b)
        self.m.add_scans(poses, np.stack(pts), np.stack(msk))

    def test_recovers_known_offset(self):
        true_pose = np.asarray([5.0, 4.0, 0.0], np.float32)
        pts, mask, n = make_scan(true_pose, self.world)
        # Perturb the pose estimate; the matcher should find the correction.
        offset = np.asarray([0.03, -0.02, 0.02], np.float32)
        res = self.m.match_scan(pts, mask, n, true_pose + offset)
        corr = np.asarray(res.correction)
        assert float(res.score) < -0.3   # strong match
        np.testing.assert_allclose(corr[:2], -offset[:2], atol=0.011)
        np.testing.assert_allclose(corr[2], -offset[2], atol=0.006)

    def test_score_improves_after_correction(self):
        true_pose = np.asarray([5.0, 4.0, 0.0], np.float32)
        pts, mask, n = make_scan(true_pose, self.world)
        est = true_pose + np.asarray([0.04, 0.04, 0.0], np.float32)
        uncorrected = float(self.m.score_points(pts, mask, n, est))
        res = self.m.match_scan(pts, mask, n, est)
        corrected = float(self.m.score_points(
            pts, mask, n, est + np.asarray(res.correction)))
        assert corrected <= uncorrected
        # matchScan's normalized best score equals scorePoints at the
        # corrected pose (same subsample, same normalization).
        assert corrected == pytest.approx(float(res.score), abs=1e-4)

    def test_score_normalized_per_beam(self):
        true_pose = np.asarray([5.0, 4.0, 0.0], np.float32)
        pts, mask, n = make_scan(true_pose, self.world)
        res = self.m.match_scan(pts, mask, n, true_pose)
        assert -1.0 - 1e-5 <= float(res.score) <= 0.0

    def test_covariance_symmetric(self):
        true_pose = np.asarray([5.0, 4.0, 0.0], np.float32)
        pts, mask, n = make_scan(true_pose, self.world)
        res = self.m.match_scan(pts, mask, n, true_pose)
        cov = np.asarray(res.covariance)
        np.testing.assert_allclose(cov, cov.T, rtol=1e-4)

    def test_no_overlap_returns_zero_correction(self):
        # Scan far outside the mapped area: all candidates score 0, so the
        # correction must stay (0,0,0) (best_score init 0, strict <).
        pts, mask, n = make_scan([5.0, 4.0, 0.0], self.world)
        far = np.asarray([500.0, 500.0, 0.0], np.float32)
        res = self.m.match_scan(pts, mask, n, far)
        assert float(res.score) == 0.0
        np.testing.assert_array_equal(np.asarray(res.correction), np.zeros(3))

    def test_reset(self):
        self.m.reset()
        pts, mask, n = make_scan([5.0, 4.0, 0.0], self.world)
        res = self.m.match_scan(pts, mask, n, np.zeros(3, np.float32))
        assert float(res.score) == 0.0


class TestRegistry:
    def test_reference_type_string(self):
        m = registry.create("ndt_2d::ScanMatcherNDT", CFG, 30.0)
        assert isinstance(m, matcher.NDTScanMatcher)

    def test_unknown_type_raises(self):
        with pytest.raises(KeyError):
            registry.create("nope", CFG, 30.0)


class TestWindowCapacity:
    def test_oversized_window_raises(self):
        m = registry.create("ndt", dataclasses.replace(CFG, grid_cells_x=32,
                                                       grid_cells_y=32), 30.0)
        poses = np.asarray([[0, 0, 0], [200.0, 0, 0]], np.float32)
        pts = np.zeros((2, 8, 2), np.float32)
        msk = np.ones((2, 8), bool)
        with pytest.raises(ValueError):
            m.add_scans(poses, pts, msk)


class TestFastPathEquivalence:
    """The 2x2-locality fast path must match the general gather path."""

    def test_paths_agree(self):
        import jax.numpy as jnp
        import dataclasses as dc
        world = sim.make_box_world(10.0, 8.0)
        m = registry.create("ndt", CFG, range_max=15.0)
        poses = np.asarray([[5.0, 4.0, 0.0]], np.float32)
        pts, mask, n = make_scan(poses[0], world)
        m.add_scans(poses, pts[None], mask[None])
        qpts, qmask, qn = make_scan([5.1, 4.05, 0.02], world)
        pose = jnp.asarray([5.08, 4.0, 0.01], jnp.float32)

        spts, smask, used = matcher.subsample(
            jnp.asarray(qpts), jnp.asarray(qmask), jnp.int32(qn),
            CFG.laser_max_beams)
        dths, dls = matcher._search_offsets(CFG)
        assert 2 * CFG.search_linear_size <= CFG.ndt_resolution
        fast = matcher._candidate_scores_local(CFG, m.grid, spts, smask,
                                               pose, dths, dls)
        slow = matcher._candidate_scores_gather(CFG, m.grid, spts, smask,
                                                pose, dths, dls)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   rtol=1e-5, atol=1e-5)

    def test_paths_agree_at_grid_edges(self):
        """The single-patch-gather fast path clips its patch base to the
        grid; candidates straddling the grid BOUNDARY (cells -1/0 and
        W-1/W) must still match the gather oracle exactly (the edge case
        the candidate-level bounds mask exists for)."""
        import jax.numpy as jnp
        world = sim.make_box_world(10.0, 8.0)
        m = registry.create("ndt", CFG, range_max=15.0)
        poses = np.asarray([[5.0, 4.0, 0.0]], np.float32)
        pts, mask, n = make_scan(poses[0], world)
        m.add_scans(poses, pts[None], mask[None])

        spts, smask, used = matcher.subsample(
            jnp.asarray(pts), jnp.asarray(mask), jnp.int32(n),
            CFG.laser_max_beams)
        dths, dls = matcher._search_offsets(CFG)
        # Shift the grid origin so scan points land within one cell of the
        # grid edge (and some outside): exercises clipped patch bases.
        for dx, dy in [(7.45, 0.0), (0.0, 7.45), (7.4, 7.4), (-12.3, 0.0)]:
            g = m.grid._replace(origin=m.grid.origin + jnp.asarray(
                [dx, dy], m.grid.origin.dtype))
            fast = matcher._candidate_scores_local(CFG, g, spts, smask,
                                                   jnp.asarray(poses[0]),
                                                   dths, dls)
            slow = matcher._candidate_scores_gather(CFG, g, spts, smask,
                                                    jnp.asarray(poses[0]),
                                                    dths, dls)
            np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"origin shift ({dx},{dy})")

    def test_wide_window_uses_gather_path(self):
        import dataclasses as dc
        wide = dc.replace(CFG, search_linear_size=0.2,
                          search_linear_resolution=0.02)
        world = sim.make_box_world(10.0, 8.0)
        m = registry.create("ndt", wide, range_max=15.0)
        poses = np.asarray([[4.8, 3.9, 0.0], [5.0, 4.0, 0.05],
                            [5.2, 4.1, -0.05]], np.float32)
        pts, msk = [], []
        for p in poses:
            a, b, _ = make_scan(p, world)
            pts.append(a)
            msk.append(b)
        m.add_scans(poses, np.stack(pts), np.stack(msk))
        qpts, qmask, qn = make_scan([5.0, 4.0, 0.0], world)
        res = m.match_scan(qpts, qmask, qn, np.asarray([5.1, 4.05, 0.0],
                                                       np.float32))
        assert float(res.score) < -0.2  # recovers through the wide window
        np.testing.assert_allclose(np.asarray(res.correction)[:2],
                                   [-0.1, -0.05], atol=0.045)


class TestRollingWindowEquivalence:
    """The device-resident RollingWindow path must agree exactly with the
    plugin-interface path over identical window contents."""

    def test_rolling_matches_interface(self):
        world = sim.make_box_world(10.0, 8.0)
        poses = np.asarray([[4.8, 3.9, 0.0], [5.0, 4.0, 0.05],
                            [5.2, 4.1, -0.05]], np.float32)
        pts, msk = [], []
        for p in poses:
            a, b, _ = make_scan(p, world)
            pts.append(a)
            msk.append(b)
        qpts, qmask, qn = make_scan([5.05, 4.0, 0.01], world)
        qpose = np.asarray([5.1, 4.02, 0.0], np.float32)

        m = registry.create("ndt", CFG, range_max=15.0)
        m.add_scans(poses, np.stack(pts), np.stack(msk))
        ref = m.match_scan(qpts, qmask, qn, qpose)

        # Same window via append into a depth-5 RollingWindow (2 empty slots).
        w = matcher.make_window(5, 512)
        for p, a, b in zip(poses, pts, msk):
            w = matcher.window_append(w, jnp.asarray(p), jnp.asarray(a),
                                      jnp.asarray(b))
        unc, score, corr, cov = matcher.match_scan_rolling(
            CFG, w, jnp.float32(15.0), jnp.asarray(qpts), jnp.asarray(qmask),
            jnp.int32(qn), jnp.asarray(qpose))
        np.testing.assert_allclose(float(score), float(ref.score), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(corr),
                                   np.asarray(ref.correction), atol=1e-7)
        np.testing.assert_allclose(np.asarray(cov),
                                   np.asarray(ref.covariance), rtol=1e-5)

    def test_window_rolls_past_capacity(self):
        w = matcher.make_window(3, 8)
        for i in range(5):
            w = matcher.window_append(
                w, jnp.full(3, float(i)), jnp.zeros((8, 2)),
                jnp.ones(8, bool))
        np.testing.assert_array_equal(np.asarray(w.poses[:, 0]),
                                      [2.0, 3.0, 4.0])
        assert bool(np.asarray(w.mask).all())
