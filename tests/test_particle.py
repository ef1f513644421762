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
