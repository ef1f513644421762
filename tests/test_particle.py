"""Particle filter tests, mirroring the reference suite (particle_tests.cpp):
KLD bin counting on duplicate inserts, statistical motion-model ensembles
(forward / rotate+translate / reverse / combined), init statistics, resample
invariance, and circular mean near +-pi."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndt_2d_tpu.config import ParticleFilterConfig, ScanMatcherConfig
from ndt_2d_tpu.filter import motion_model
from ndt_2d_tpu.filter.particle_filter import (ParticleFilter, kld_resample,
                                               update_statistics)

CFG = ParticleFilterConfig(min_particles=50, max_particles=200)


def _filter(seed=0, **kw):
    import dataclasses
    return ParticleFilter(dataclasses.replace(CFG, **kw), seed=seed)


class TestKldBinCounting:
    """The distinct-bin prefix count replaces the KD-tree leaf count
    (kd_tree.hpp:120-123; duplicate-bin inserts must not increase it,
    particle_tests.cpp:47-72)."""

    def test_duplicates_share_bins(self):
        # 4 particles in 2 distinct bins (bin size 0.5): k(m) = 1,1,2,2
        parts = jnp.asarray([[0.1, 0.1, 0.0], [0.2, 0.2, 0.0],
                             [1.1, 1.1, 0.0], [1.2, 1.2, 0.0]], jnp.float32)
        keys = jnp.trunc(parts / jnp.asarray([0.5, 0.5, 0.2671])).astype(int)
        same = jnp.all(keys[:, None, :] == keys[None, :, :], axis=-1)
        first = ~jnp.tril(same, k=-1).any(axis=1)
        k = np.asarray(jnp.cumsum(first.astype(int)))
        np.testing.assert_array_equal(k, [1, 1, 2, 2])

    def test_negative_truncation_toward_zero(self):
        # static_cast<int> truncates: -0.4/0.5 -> 0, same bin as +0.4
        # (kd_tree.hpp:99-102).
        parts = jnp.asarray([[0.4, 0.0, 0.0], [-0.4, 0.0, 0.0]], jnp.float32)
        keys = jnp.trunc(parts / jnp.asarray([0.5, 0.5, 0.2671])).astype(int)
        assert np.array_equal(np.asarray(keys[0]), np.asarray(keys[1]))


class TestMotionModel:
    """Statistical ensemble tests (particle_tests.cpp:74-158)."""

    def _sample(self, dx, dy, dth, n=500, theta0=0.0, alphas=(0.2,) * 4):
        poses = jnp.zeros((n, 3), jnp.float32).at[:, 2].set(theta0)
        out = motion_model.sample(jax.random.PRNGKey(42), poses,
                                  dx, dy, dth, *alphas)
        return np.asarray(out)

    def test_forward_motion(self):
        out = self._sample(1.0, 0.0, 0.0, alphas=(0.02,) * 4)
        assert abs(out[:, 0].mean() - 1.0) < 0.1
        assert abs(out[:, 1].mean()) < 0.1
        assert abs(out[:, 2].mean()) < 0.1
        assert out[:, 0].std() > 0.01  # noise actually applied

    def test_rotate_then_translate(self):
        out = self._sample(0.0, 1.0, np.pi / 2.0, alphas=(0.02,) * 4)
        assert abs(out[:, 0].mean()) < 0.15
        assert abs(out[:, 1].mean() - 1.0) < 0.15
        assert abs(out[:, 2].mean() - np.pi / 2.0) < 0.15

    def test_reverse_motion_small_variance(self):
        # Driving backwards must not blow up the noise
        # (motion_model.cpp:53-57).
        out = self._sample(-1.0, 0.0, 0.0, alphas=(0.01,) * 4)
        assert abs(out[:, 0].mean() + 1.0) < 0.1
        assert out[:, 0].std() < 0.3

    def test_combined_from_heading(self):
        out = self._sample(0.5, 0.5, 0.0, theta0=0.0, alphas=(0.01,) * 4)
        assert abs(out[:, 0].mean() - 0.5) < 0.1
        assert abs(out[:, 1].mean() - 0.5) < 0.1


class TestStatistics:
    def test_init_statistics(self):
        f = _filter()
        f.init(1.0, 2.0, 0.5, 0.2, 0.1, 0.05)
        mean = f.get_mean()
        np.testing.assert_allclose(mean, [1.0, 2.0, 0.5], atol=0.08)
        cov = f.get_covariance()
        assert abs(cov[0, 0] - 0.04) < 0.02
        assert abs(cov[1, 1] - 0.01) < 0.008

    def test_circular_mean_near_pi(self):
        # particles straddling +-pi must average to ~pi, not ~0
        # (particle_tests.cpp:160-204).
        f = _filter()
        f.init(0.0, 0.0, np.pi, 0.01, 0.01, 0.1)
        mean = f.get_mean()
        assert abs(abs(mean[2]) - np.pi) < 0.1

    def test_weight_normalization(self):
        parts = jnp.zeros((4, 3), jnp.float32)
        w = jnp.asarray([-0.2, -0.4, -0.1, -0.3])  # raw NDT scores (negative)
        wn, mean, cov = update_statistics(parts, w, jnp.ones(4, bool))
        np.testing.assert_allclose(float(jnp.sum(wn)), 1.0, atol=1e-6)
        assert float(wn[1]) > float(wn[2])  # better (more negative) scores win


class TestResample:
    def test_concentrated_particles_shrink_count(self):
        # All particles in one bin: k stays 1, Mx stays max -> draw to max?
        # No: with k==1 the bound keeps max_particles, so the loop fills to
        # max_particles (reference behavior when all particles coincide).
        f = _filter()
        f.init(0.0, 0.0, 0.0, 1e-4, 1e-4, 1e-4)
        f.resample()
        assert f.n_active == CFG.max_particles

    def test_spread_particles_grow_count(self):
        # Widely spread particles occupy many bins -> KLD wants more
        # particles than the minimum.
        f = _filter()
        f.init(0.0, 0.0, 0.0, 3.0, 3.0, 1.0)
        f.resample()
        assert f.n_active > CFG.min_particles

    def test_resample_preserves_mean(self):
        f = _filter()
        f.init(2.0, -1.0, 0.3, 0.3, 0.3, 0.1)
        before = f.get_mean()
        f.resample()
        after = f.get_mean()
        np.testing.assert_allclose(before, after, atol=0.15)

    def test_degenerate_weights_resample_to_one_particle_value(self):
        f = _filter()
        f.init(0.0, 0.0, 0.0, 1.0, 1.0, 0.5)
        # All weight on particle 0.
        w = jnp.zeros(CFG.max_particles).at[0].set(1.0)
        f.weights = w
        f.resample()
        cloud = f.cloud()
        assert np.allclose(cloud, cloud[0], atol=1e-6)


class TestMeasurement:
    def test_measure_prefers_true_pose(self):
        from ndt_2d_tpu.matching import registry
        from ndt_2d_tpu.utils import sim
        world = sim.make_box_world(10.0, 8.0)
        mcfg = ScanMatcherConfig(grid_cells_x=128, grid_cells_y=128)
        m = registry.create("ndt", mcfg, 15.0)
        poses = np.asarray([[5.0, 4.0, 0.0]], np.float32)
        msg = sim.scan_at_pose(world, poses[0], n_beams=360, range_max=15.0)
        pts, mask = sim.project_scan(msg, 512)
        m.add_scans(poses, pts[None], mask[None])

        f = _filter()
        f.init(5.0, 4.0, 0.0, 0.5, 0.5, 0.2)
        f.measure(m, pts, mask, int(mask.sum()))
        f.resample()
        mean = f.get_mean()
        # Measurement should pull the cloud toward the true pose.
        assert abs(mean[0] - 5.0) < 0.3
        assert abs(mean[1] - 4.0) < 0.3


class TestNegativeWeightResampling:
    """Regression: the reference uses raw *negative* NDT responses as
    weights (particle_filter.cpp:84-88); resampling must rank them
    correctly (more negative = better), not fall back to uniform — the
    fused pf_step feeds raw scores straight into kld_resample."""

    def test_kld_resample_ranks_negative_weights(self):
        import jax
        import jax.numpy as jnp

        from ndt_2d_tpu.filter.particle_filter import kld_resample
        n = 400
        particles = jnp.concatenate([
            jnp.zeros((n // 2, 3)),               # good cluster at origin
            jnp.full((n // 2, 3), 5.0)])          # bad cluster far away
        weights = jnp.concatenate([
            jnp.full((n // 2,), -0.5),            # strong (negative) response
            jnp.full((n // 2,), -0.01)])          # weak response
        p, w, na = kld_resample(
            jax.random.PRNGKey(0), particles, weights,
            jnp.ones(n, bool), jnp.float32(0.01), jnp.float32(2.3),
            jnp.asarray([0.5, 0.5, 0.2671]), 50, n)
        frac_good = float((np.asarray(p)[:, 0] < 1.0).mean())
        assert frac_good > 0.9, f"good-cluster fraction {frac_good}"


class TestSortedDedupEquivalence:
    """The O(M log M) first-occurrence marking must match the quadratic
    all-pairs definition exactly."""

    def test_matches_all_pairs(self):
        import jax
        import jax.numpy as jnp

        from ndt_2d_tpu.filter.particle_filter import kld_resample
        rng = np.random.default_rng(7)
        m = 512
        particles = jnp.asarray(
            rng.normal(0, 1.0, (m, 3)).astype(np.float32))
        weights = jnp.asarray(rng.random(m).astype(np.float32))
        bins = jnp.asarray([0.5, 0.5, 0.2671], jnp.float32)
        # run resample; independently recompute k(m) quadratically from the
        # same draw sequence and check the stopping count agrees
        key = jax.random.PRNGKey(5)
        p, w, n = kld_resample(key, particles, weights, jnp.ones(m, bool),
                               jnp.float32(0.01), jnp.float32(2.3), bins,
                               50, m)
        # reproduce the draw
        wn = weights / weights.sum()
        idx = jax.random.choice(key, m, shape=(m,), p=wn)
        samp = np.asarray(particles[idx])
        keys = np.trunc(samp / np.asarray(bins)).astype(np.int32)
        seen, first = set(), []
        for row in map(tuple, keys):
            first.append(row not in seen)
            seen.add(row)
        k = np.cumsum(first)
        kf = k.astype(float)
        a = (kf - 1.0) / (2.0 * 0.01)
        b = 2.0 / (9.0 * np.maximum(kf - 1.0, 1.0))
        c = 1.0 - b + np.sqrt(b) * 2.3
        mx = np.floor(a * c * c * c).astype(int)
        mx = np.where(k > 1, mx, m)
        mi = np.arange(1, m + 1)
        done = (mi >= 50) & (mi >= mx)
        expect = int(np.argmax(done) + 1) if done.any() else m
        assert int(n) == expect


class TestRecovery:
    """AMCL w_slow/w_fast recovery injection (pf_step_recovery) — a
    capability the reference explicitly lacks (README.md:123-127)."""

    def _world_fixture(self):
        from ndt_2d_tpu.matching import registry
        from ndt_2d_tpu.utils import sim
        # Symmetry-broken box so distinct poses are distinguishable.
        # NOTE: features must not map onto each other under the box's 180°
        # rotation symmetry, or the kidnapped filter locks onto the mirror
        # mode.
        world = np.concatenate([
            sim.make_box_world(12.0, 8.0),
            np.asarray([[[3.0, 0.0], [3.0, 3.0]]]),
            np.asarray([[[1.0, 6.0], [2.5, 7.5]]]),
            np.asarray([[[8.0, 8.0], [8.0, 6.8]]]),
        ], axis=0)
        mcfg = ScanMatcherConfig(grid_cells_x=192, grid_cells_y=160)
        m = registry.create("ndt", mcfg, 15.0)
        poses = np.asarray([[x, y, 0.0] for x in (1.5, 6.0, 10.5)
                            for y in (1.5, 6.5)], np.float32)
        pts, msk = [], []
        for p in poses:
            msg = sim.scan_at_pose(world, p, n_beams=240, range_max=15.0,
                                   noise=0.005,
                                   rng=np.random.default_rng(5))
            a, b = sim.project_scan(msg, 512)
            pts.append(a)
            msk.append(b)
        m.add_scans(poses, np.stack(pts), np.stack(msk))
        # Interior free-space pool on a coarse lattice.
        gx, gy = np.meshgrid(np.arange(0.5, 11.6, 0.5),
                             np.arange(0.5, 7.6, 0.5))
        free = np.stack([gx.ravel(), gy.ravel()], axis=-1)
        return world, m, free

    def _scan(self, world, pose, seed):
        from ndt_2d_tpu.utils import sim
        msg = sim.scan_at_pose(world, pose, n_beams=240, range_max=15.0,
                               noise=0.005, rng=np.random.default_rng(seed))
        return sim.project_scan(msg, 512)

    def test_zero_injection_bitwise_equals_pf_step(self):
        """With w_fast >= w_slow the recovery step must be bitwise pf_step."""
        from ndt_2d_tpu.filter.particle_filter import pf_step, pf_step_recovery
        world, m, free = self._world_fixture()
        pts, msk = self._scan(world, [6.0, 6.5, 0.0], 11)
        n_pts = jnp.int32(int(msk.sum()))
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
        mp = 256
        particles = jnp.asarray(
            np.random.default_rng(1).normal([6.0, 6.5, 0.0], 0.3, (mp, 3)),
            jnp.float32)
        mask = jnp.ones(mp, bool)
        ctl = jnp.zeros(3, jnp.float32)
        alphas = jnp.full(4, 0.05, jnp.float32)
        bins = jnp.asarray([0.5, 0.5, 0.2671], jnp.float32)
        args = (particles, mask, ctl, m.config, m.grid,
                jnp.asarray(pts), jnp.asarray(msk), n_pts, alphas,
                jnp.float32(0.01), jnp.float32(2.3), bins, 50, mp)
        base = pf_step(k1, k2, *args)
        rec = pf_step_recovery(
            k1, k2, k3, *args, jnp.asarray(free, jnp.float32),
            jnp.float32(0.5), jnp.float32(1.0), jnp.float32(1.0),
            jnp.float32(0.0), jnp.float32(0.0))
        for a, b in zip(base, rec[:5]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_injection_fraction_matches_probability(self):
        """w_fast/w_slow = 0.05 with frozen EWMAs → ~95% uniform draws."""
        from ndt_2d_tpu.filter.particle_filter import pf_step_recovery
        world, m, free = self._world_fixture()
        pts, msk = self._scan(world, [6.0, 6.5, 0.0], 12)
        n_pts = jnp.int32(int(msk.sum()))
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
        mp = 2048
        rng = np.random.default_rng(2)
        particles = jnp.asarray(
            rng.normal([6.0, 6.5, 0.0], 0.05, (mp, 3)), jnp.float32)
        mask = jnp.ones(mp, bool)
        alphas = jnp.full(4, 0.02, jnp.float32)
        bins = jnp.asarray([0.5, 0.5, 0.2671], jnp.float32)
        out = pf_step_recovery(
            k1, k2, k3, particles, mask, jnp.zeros(3, jnp.float32),
            m.config, m.grid, jnp.asarray(pts), jnp.asarray(msk), n_pts,
            alphas, jnp.float32(0.01), jnp.float32(2.3), bins, 200, mp,
            jnp.asarray(free, jnp.float32), jnp.float32(0.5),
            jnp.float32(1.0), jnp.float32(0.05),
            jnp.float32(0.0), jnp.float32(0.0))
        p, _, n = np.asarray(out[0]), out[1], int(out[2])
        # Injected particles scatter over the whole free space; survivors
        # stay within the tight initial cluster.
        far = np.hypot(p[:n, 0] - 6.0, p[:n, 1] - 6.5) > 1.0
        frac = far.mean()
        assert 0.85 < frac < 1.0, frac
        # EWMAs passed through unchanged (alpha = 0).
        assert float(out[5]) == 1.0 and abs(float(out[6]) - 0.05) < 1e-6

    def test_kidnapped_robot_recovers(self):
        """Track, kidnap, recover: with recovery armed the cloud re-localizes
        near the new true pose; without it the filter stays lost.

        Uses benchmark config 7's symmetry-broken office (the diagonal in
        the NW corner is the only feature distinguishing the four corridor
        arms); the kidnapped pose faces that feature, so the correct mode
        dominates the injected hypotheses.  The box world above is too
        symmetric: the NDT likelihood is forgiving enough that the filter
        locks onto 180°-mirror modes — AMCL behaves the same way.
        """
        import dataclasses as dc
        from ndt_2d_tpu.matching import registry
        from ndt_2d_tpu.utils import sim
        world = np.concatenate([
            sim.make_office_world(16.0),
            np.asarray([[[1.0, 13.0], [3.0, 15.0]]]),
        ], axis=0)
        mcfg = ScanMatcherConfig(grid_cells_x=192, grid_cells_y=192)
        m = registry.create("ndt", mcfg, 14.0)
        ring = ([(x, 2.0) for x in (2, 6, 10, 14)]
                + [(14.0, y) for y in (6, 10, 14)]
                + [(x, 14.0) for x in (10, 6, 2)]
                + [(2.0, y) for y in (10, 6)])
        poses = np.asarray([[x, y, 0.0] for x, y in ring], np.float32)
        pts_l, msk_l = [], []
        for i, p in enumerate(poses):
            msg = sim.scan_at_pose(world, p, n_beams=240, range_max=14.0,
                                   noise=0.005, rng=np.random.default_rng(i))
            a, b = sim.project_scan(msg, 512)
            pts_l.append(a)
            msk_l.append(b)
        m.add_scans(poses, np.stack(pts_l), np.stack(msk_l))
        free = np.asarray([(x, y)
                           for x in np.arange(0.75, 15.3, 0.5)
                           for y in np.arange(0.75, 15.3, 0.5)
                           if not (4.3 < x < 11.7 and 4.3 < y < 11.7)])

        start = np.asarray([8.0, 2.0, 0.0])
        kidnapped = np.asarray([2.0, 13.0, np.pi / 2])

        def scan(pose, seed):
            msg = sim.scan_at_pose(world, pose, n_beams=240, range_max=14.0,
                                   noise=0.005,
                                   rng=np.random.default_rng(seed))
            return sim.project_scan(msg, 512)

        def run(alpha_slow, alpha_fast, seed):
            f = ParticleFilter(dc.replace(
                CFG, min_particles=300, max_particles=3000,
                odom_alpha1=0.05, odom_alpha2=0.05, odom_alpha3=0.05,
                odom_alpha4=0.05, recovery_alpha_slow=alpha_slow,
                recovery_alpha_fast=alpha_fast), seed=seed)
            f.set_free_space(free, 0.5)
            f.init(start[0], start[1], start[2], 0.2, 0.2, 0.1)
            # Phase 1: track at the start pose (builds healthy w_slow).
            for t in range(5):
                pts, msk = scan(start, 100 + t)
                f.step(m, np.zeros(3), pts, msk, int(msk.sum()))
            # Phase 2: kidnapped — scans now come from elsewhere, odometry
            # reports no motion.
            for t in range(30):
                pts, msk = scan(kidnapped, 200 + t)
                f.step(m, np.zeros(3), pts, msk, int(msk.sum()))
            return f.get_mean()

        recovered = run(0.02, 0.9, seed=4)
        err_rec = float(np.hypot(*(recovered[:2] - kidnapped[:2])))
        lost = run(0.0, 0.0, seed=4)
        err_lost = float(np.hypot(*(lost[:2] - kidnapped[:2])))
        assert err_rec < 2.0, (err_rec, recovered)
        assert err_lost > 8.0, (err_lost, lost)

    def test_granular_path_injects(self):
        """The granular update/measure/resample sequence (the mesh-mode PF
        path in mapping/mapper.py) performs the same free-space injection as
        the fused pf_step_recovery — review finding r3: mesh mode silently
        bypassed recovery."""
        from ndt_2d_tpu.config import ParticleFilterConfig
        from ndt_2d_tpu.filter.particle_filter import ParticleFilter
        world, m, free = self._world_fixture()
        pts, msk = self._scan(world, [6.0, 6.5, 0.0], 13)
        cfg = ParticleFilterConfig(min_particles=200, max_particles=512,
                                   recovery_alpha_slow=1e-4,
                                   recovery_alpha_fast=1e-4)
        f = ParticleFilter(cfg, seed=4)
        f.init(6.0, 6.5, 0.0, 0.05, 0.05, 0.02)
        f.set_free_space(jnp.asarray(free, jnp.float32), 0.5)
        # Collapsed short-term quality (w_fast << w_slow): p_inject ~ 0.95.
        # Tiny alphas keep measure()'s EWMA update from moving them.
        f.w_slow = jnp.float32(1.0)
        f.w_fast = jnp.float32(0.05)
        f.update(0.0, 0.0, 0.0)
        f.measure(m, jnp.asarray(pts), jnp.asarray(msk),
                  jnp.int32(int(msk.sum())))
        f.resample()
        p = np.asarray(f.particles)
        n = f.n_active
        far = np.hypot(p[:n, 0] - 6.0, p[:n, 1] - 6.5) > 1.0
        assert far.mean() > 0.5, far.mean()
        # Without recovery armed the same sequence stays clustered.
        f2 = ParticleFilter(ParticleFilterConfig(min_particles=200,
                                                 max_particles=512), seed=4)
        f2.init(6.0, 6.5, 0.0, 0.05, 0.05, 0.02)
        f2.update(0.0, 0.0, 0.0)
        f2.measure(m, jnp.asarray(pts), jnp.asarray(msk),
                   jnp.int32(int(msk.sum())))
        f2.resample()
        p2 = np.asarray(f2.particles)
        n2 = f2.n_active
        far2 = np.hypot(p2[:n2, 0] - 6.0, p2[:n2, 1] - 6.5) > 1.0
        assert far2.mean() < 0.05, far2.mean()
