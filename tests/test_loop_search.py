"""Descriptor-based loop-closure candidate search (parallel.loop_search)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from ndt_2d_tpu.parallel import loop_search, mesh as mesh_mod
from ndt_2d_tpu.utils import sim


def _scan_points(world, pose, n=256, range_max=12.0, seed=0):
    msg = sim.scan_at_pose(world, pose, n_beams=n, range_max=range_max,
                           noise=0.01, rng=np.random.default_rng(seed))
    return sim.project_scan(msg, 256)


class TestDescriptors:
    def test_rotation_invariance(self):
        world = sim.make_office_world(16.0)
        p1, m1 = _scan_points(world, [5.0, 5.0, 0.0])
        p2, m2 = _scan_points(world, [5.0, 5.0, 2.1])  # same place, rotated
        d = loop_search.descriptors(jnp.asarray(np.stack([p1, p2])),
                                    jnp.asarray(np.stack([m1, m2])),
                                    np.float32(12.0))
        sim_ = float(d[0] @ d[1])
        assert sim_ > 0.98, f"rotated same-place similarity {sim_}"

    def test_distinct_places_differ(self):
        """Geometrically distinct places separate well.  (Symmetric places —
        e.g. opposite corners of a symmetric office — can collide in a
        rotation-invariant descriptor; the NDT match + score gate is what
        disposes of such false candidates, as in the reference's accept
        test, ndt_mapper.cpp:645.)"""
        world = sim.make_office_world(16.0)
        pts, msks = [], []
        for pose in ([2.0, 2.0, 0.0], [8.0, 8.0, 0.5], [8.0, 2.3, 3.0]):
            p, m = _scan_points(world, pose)
            pts.append(p)
            msks.append(m)
        d = np.asarray(loop_search.descriptors(
            jnp.asarray(np.stack(pts)), jnp.asarray(np.stack(msks)),
            np.float32(12.0)))
        assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
        # corner vs. open center vs. corridor: all clearly below the
        # true-revisit level (>= 0.99); the spectrum's DC term keeps the
        # floor around ~0.86-0.93.
        s = d @ d.T
        assert s[0, 1] < 0.95 and s[0, 2] < 0.95 and s[1, 2] < 0.95

    def test_empty_scan_zero(self):
        d = loop_search.descriptors(jnp.zeros((1, 16, 2)),
                                    jnp.zeros((1, 16), bool),
                                    np.float32(10.0))
        assert float(jnp.abs(d).sum()) == 0.0


class TestSearch:
    def _table(self):
        """Keyframes along a loop: last pose revisits the first."""
        world = sim.make_office_world(16.0)
        poses = [[2.0, 2.0, 0.0], [6.0, 2.0, 0.0], [10.0, 2.0, 0.0],
                 [14.0, 2.0, 1.5], [14.0, 6.0, 1.5], [14.0, 10.0, 1.5],
                 [14.0, 14.0, 3.1], [10.0, 14.0, 3.1], [6.0, 14.0, 3.1],
                 [2.0, 14.0, -1.5], [2.0, 10.0, -1.5], [2.0, 6.0, -1.5],
                 [2.0, 2.2, 0.0]]  # index 12 revisits index 0
        pts, msks = [], []
        for i, p in enumerate(poses):
            a, b = _scan_points(world, p, seed=i)
            pts.append(a)
            msks.append(b)
        d = loop_search.descriptors(jnp.asarray(np.stack(pts)),
                                    jnp.asarray(np.stack(msks)),
                                    np.float32(12.0))
        return np.asarray(d)

    def test_dense_finds_revisit(self):
        d = self._table()
        idx, scores = loop_search.search_dense(
            jnp.asarray(d), jnp.ones(len(d), bool), 12, k=3,
            rolling_exclude=5)
        idx, scores = np.asarray(idx), np.asarray(scores)
        assert idx[0] == 0, f"top candidate {idx[0]} (scores {scores})"
        assert scores[0] > 0.97

    def test_rolling_window_excluded(self):
        d = self._table()
        idx, scores = loop_search.search_dense(
            jnp.asarray(d), jnp.ones(len(d), bool), 12, k=3,
            rolling_exclude=5)
        assert (np.asarray(idx)[np.isfinite(np.asarray(scores))] <= 7).all()

    def test_sharded_matches_dense(self):
        d = self._table()
        mesh = mesh_mod.make_mesh(8, shape=(1, 8))
        dp, vp = loop_search.pad_descriptors(d, np.ones(len(d), bool), 8)
        idx_s, score_s = loop_search.search_all_pairs_multichip(
            mesh, dp, vp, k=3, rolling_exclude=5)
        idx_s, score_s = np.asarray(idx_s), np.asarray(score_s)
        for q in range(len(d)):
            idx_d, score_d = loop_search.search_dense(
                jnp.asarray(d), jnp.ones(len(d), bool), q, k=3,
                rolling_exclude=5)
            score_d = np.asarray(score_d)
            finite = np.isfinite(score_d)
            assert np.allclose(score_s[q][finite], score_d[finite],
                               atol=1e-5), q
            assert (np.asarray(idx_s[q])[finite]
                    == np.asarray(idx_d)[finite]).all(), q


class TestAllPairs:
    def test_matches_search_dense_per_row(self):
        """The one-dispatch-per-pass all-pairs search must reproduce the
        per-query search_dense results (same top-k sets and scores)."""
        rng = np.random.default_rng(3)
        desc = rng.normal(size=(24, 16)).astype(np.float32)
        desc /= np.linalg.norm(desc, axis=-1, keepdims=True)
        valid = np.ones(24, bool)
        valid[20:] = False
        idx_all, score_all = loop_search.search_all_pairs(
            jnp.asarray(desc), jnp.asarray(valid), k=4, rolling_exclude=5)
        for q in range(5, 20):
            idx_q, score_q = loop_search.search_dense(
                jnp.asarray(desc), jnp.asarray(valid), q, k=4,
                rolling_exclude=5)
            np.testing.assert_allclose(np.asarray(score_q),
                                       np.asarray(score_all)[q], atol=1e-6)
            finite = np.isfinite(np.asarray(score_q))
            assert set(np.asarray(idx_q)[finite]) == set(
                np.asarray(idx_all)[q][finite])


class TestUnionMode:
    """loop_search='both': deduped union of radius and descriptor proposals,
    radius first (they carry the precise start pose)."""

    def _populated_mapper(self, loop_search):
        from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
        from ndt_2d_tpu.mapping.mapper import Mapper

        world = sim.make_office_world(16.0)
        cfg = MapperConfig(
            local_scan_matcher=ScanMatcherConfig(grid_cells_x=160,
                                                 grid_cells_y=160),
            global_scan_matcher=ScanMatcherConfig(grid_cells_x=160,
                                                  grid_cells_y=160),
            max_points_per_scan=512, loop_closure_every=10**9,
            global_search_size=4.0, global_search_limit=3,
            loop_search=loop_search, descriptor_min_similarity=0.5)
        mapper = Mapper(cfg)
        mapper.range_max = 12.0
        # A ring of keyframes whose tail revisits the start: radius finds
        # the geometric neighbors, the permissive similarity threshold lets
        # descriptors propose as well.
        ang = np.linspace(0, 2 * np.pi, 24, endpoint=False)
        poses = np.stack([8.0 + 3.0 * np.cos(ang), 8.0 + 3.0 * np.sin(ang),
                          ang + np.pi / 2], -1)
        poses = np.concatenate([poses, poses[:2]])  # revisit
        for t, p in enumerate(poses):
            msg = sim.scan_at_pose(world, p, n_beams=240, range_max=12.0,
                                   noise=0.01, rng=np.random.default_rng(t))
            pts, msk = sim.project_scan(msg, 512)
            mapper.graph.add_scan(p, pts, msk)
        return mapper

    def _candidates(self, mapper, idx):
        from ndt_2d_tpu.parallel import loop_search as ls
        g = mapper.graph
        desc_table = desc_valid = None
        if mapper.config.loop_search in ("descriptor", "both"):
            desc_table = ls.descriptors(g.points_padded, g.point_mask_padded,
                                        np.float32(mapper.range_max),
                                        mapper.config.descriptor_bins)
            desc_valid = (np.arange(g.points_padded.shape[0])
                          < g.num_scans)
        return mapper._loop_candidates(idx, desc_table, desc_valid)

    def test_union_dedup_and_order(self):
        idx = 25  # revisit keyframe
        radius = self._candidates(self._populated_mapper("radius"), idx)
        desc = self._candidates(self._populated_mapper("descriptor"), idx)
        both = self._candidates(self._populated_mapper("both"), idx)
        assert radius, "radius source must propose (geometric revisit)"
        assert desc, "descriptor source must propose (permissive threshold)"
        # Union semantics: radius proposals first and in order, descriptor
        # extras appended deduped.
        assert both[:len(radius)] == radius
        assert set(both) == set(radius) | set(desc)
        assert len(both) == len(set(both))

    def test_union_covers_drifted_revisit(self):
        """When the pose estimate is dragged outside the radius reach, the
        union still proposes the true revisit (via the descriptor arm) AND
        keeps whatever the radius arm sees near the drifted estimate."""
        mapper = self._populated_mapper("both")
        g = mapper.graph
        idx = 25
        poses = g.poses.copy()
        poses[idx, :2] += 5.0  # > sqrt(global_search_size)=2 m of drift
        g.set_poses(poses)
        both = self._candidates(mapper, idx)
        true_revisits = {idx - 24, (idx - 24) % 24 + 1}
        assert set(both) & true_revisits, (
            f"union missed the true revisit under drift: {both}")


class TestMapperIntegration:
    def test_descriptor_loop_closure_e2e(self):
        """Office loop with loop_search='descriptor' closes the loop."""
        from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
        from ndt_2d_tpu.mapping.mapper import Mapper

        world = sim.make_office_world(16.0)
        waypoints = [(2.0, 2.0, 0.0), (14.0, 2.0, np.pi / 2),
                     (14.0, 14.0, np.pi), (2.0, 14.0, -np.pi / 2),
                     (2.0, 2.6, 0.0), (8.0, 2.6, 0.0)]
        traj = []
        for i in range(len(waypoints) - 1):
            a = np.asarray(waypoints[i], float)
            b = np.asarray(waypoints[i + 1], float)
            steps = max(int(np.hypot(b[0] - a[0], b[1] - a[1]) / 0.35), 1)
            heading = np.arctan2(b[1] - a[1], b[0] - a[0])
            for s in range(steps):
                f = s / steps
                traj.append([a[0] + f * (b[0] - a[0]),
                             a[1] + f * (b[1] - a[1]), heading])
        truth = np.asarray(traj)
        odom = sim.drift_odometry(truth, trans_noise=0.006, rot_noise=0.002,
                                  seed=11)

        # Descriptor candidates are drift-agnostic; confirmation runs
        # coarse-to-fine (config.coarse_scan_matcher absorbs the drift, the
        # fine global matcher below produces the gating score).
        mcfg = ScanMatcherConfig(grid_cells_x=160, grid_cells_y=160)
        global_mcfg = dataclasses.replace(
            mcfg, ndt_resolution=0.35, search_linear_size=0.15,
            search_linear_resolution=0.01, search_angular_size=0.05)
        cfg = MapperConfig(
            local_scan_matcher=mcfg, global_scan_matcher=global_mcfg,
            max_points_per_scan=512, loop_closure_every=10**9,
            optimization_node_limit=10,
            loop_search="descriptor", descriptor_min_similarity=0.97)
        mapper = Mapper(cfg)
        for t in range(len(truth)):
            msg = sim.scan_at_pose(world, truth[t], n_beams=600,
                                   range_max=12.0, noise=0.01,
                                   rng=np.random.default_rng(t))
            mapper.process_scan(msg, odom[t])
        mapper.loop_closure()
        closures = int(mapper.graph.constraint_switchable.sum())
        assert closures >= 1, "descriptor search found no loop closure"
        # Regression: an accepted closure rewrites a pose that may sit in
        # the device rolling window — the window must be marked stale.
        assert mapper._window_synced == -1
