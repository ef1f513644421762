"""Far-candidate pruning mechanics (config.loop_closure_far_dedup /
loop_closure_reject_cache_margin / loop_closure_max_far_rows).

The descriptor-mode wall is spent coarse-confirming repeated appearance
aliases (BASELINE.md round 4: 24x the radius-mode wall); these pin the
pruning levers that remove the redundant rows — the per-pass spatial dedup,
the similarity-ranked cap, and the cross-pass negative cache — at the
mechanism level (the measured effect lives in benchmarks/results.json
config 6).
"""

import dataclasses

import numpy as np

from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
from ndt_2d_tpu.graph import pose_graph
from ndt_2d_tpu.mapping.mapper import Mapper

MCFG = ScanMatcherConfig(grid_cells_x=96, grid_cells_y=96)


def make_mapper(**over):
    cfg = MapperConfig(local_scan_matcher=MCFG, global_scan_matcher=MCFG,
                       max_points_per_scan=64, loop_search="descriptor",
                       global_search_size=1.0, loop_closure_every=10**9,
                       **over)
    mapper = Mapper(cfg)
    mapper.range_max = 10.0
    mapper._ensure_matchers(10.0)
    g = mapper.graph
    pts = np.zeros((64, 2), np.float32)
    mask = np.zeros(64, bool)
    mask[:8] = True
    # 40 keyframes on a line at 1 m spacing.
    for k in range(40):
        g.add_scan(np.asarray([float(k), 0.0, 0.0]), pts, mask)
        if k:
            pose_graph.make_constraint_np(g, k - 1, k,
                                          np.diag([1e-3, 1e-3, 1e-4]))
    return mapper


class TestPruneFarPass:
    def test_off_by_default(self):
        mapper = make_mapper()
        pending = [(30, [2, 3]), (31, [2])]
        for (j, cands) in pending:
            for i in cands:
                mapper._desc_sim[(j, i)] = 0.9
        assert mapper._prune_far_pass(pending) == pending
        assert mapper.stats.far_rows_pruned == 0

    def test_dedup_keeps_one_row_per_site_pair(self):
        mapper = make_mapper(loop_closure_far_dedup=1.5)
        # Queries 30/31 (1 m apart) both propose candidates 2/3 (1 m
        # apart): one site pair -> one surviving row, the highest-sim one.
        pending = [(30, [2, 3]), (31, [2])]
        sims = {(30, 2): 0.90, (30, 3): 0.95, (31, 2): 0.85}
        mapper._desc_sim.update(sims)
        out = mapper._prune_far_pass(pending)
        assert out == [(30, [3])]
        assert mapper.stats.far_rows_pruned == 2

    def test_near_rows_always_survive(self):
        mapper = make_mapper(loop_closure_far_dedup=1.5)
        # Candidate 29 is within sqrt(global_search_size)=1 m of query 30
        # -> near row, untouched by the far dedup.
        pending = [(30, [29, 2]), (31, [2])]
        mapper._desc_sim.update({(30, 2): 0.9, (31, 2): 0.95})
        out = mapper._prune_far_pass(pending)
        assert out == [(30, [29]), (31, [2])]

    def test_cap_ranks_by_similarity(self):
        mapper = make_mapper(loop_closure_max_far_rows=1)
        # Far site pairs: (30, 2) and (30, 20) are distinct candidate
        # sites; the cap keeps only the highest-similarity row.
        pending = [(30, [2, 20])]
        mapper._desc_sim.update({(30, 2): 0.80, (30, 20): 0.99})
        out = mapper._prune_far_pass(pending)
        assert out == [(30, [20])]

    def test_distinct_sites_survive_dedup(self):
        mapper = make_mapper(loop_closure_far_dedup=1.5)
        # Candidates 2 and 20 are 18 m apart: both survive.
        pending = [(30, [2, 20])]
        mapper._desc_sim.update({(30, 2): 0.9, (30, 20): 0.9})
        out = mapper._prune_far_pass(pending)
        assert out == [(30, [2, 20])]


class TestRejectCache:
    def test_clear_rejection_populates_and_accept_clears(self):
        mapper = make_mapper(loop_closure_reject_cache_margin=0.05)
        g = mapper.graph
        idx, far_i = g.num_scans - 1, 2
        start = g.poses[idx].copy()
        # Clear rejection: score far above the (negative) gate.
        assert not mapper._apply_gate(idx, far_i, start, -0.01,
                                      np.zeros(3), np.eye(3) * 1e-3)
        key = mapper._far_key(idx, far_i)
        assert key in mapper._reject_cache
        # A near rejection must NOT populate (only far rows are cached).
        assert not mapper._apply_gate(idx, idx - 1, start, -0.01,
                                      np.zeros(3), np.eye(3) * 1e-3)
        assert len(mapper._reject_cache) == 1
        # An acceptance invalidates the cache (graph moved).
        assert mapper._apply_gate(idx, 3, start, -10.0,
                                  np.zeros(3), np.eye(3) * 1e-3)
        assert not mapper._reject_cache

    def test_borderline_rejection_not_cached(self):
        mapper = make_mapper(loop_closure_reject_cache_margin=0.10)
        g = mapper.graph
        idx = g.num_scans - 1
        gate = mapper.typical_matcher_response  # gate_scale = 1.0
        # Missed the gate by less than 10% of |gate|: not a clear miss.
        score = gate + 0.05 * abs(gate)
        assert not mapper._apply_gate(idx, 2, g.poses[idx].copy(), score,
                                      np.zeros(3), np.eye(3) * 1e-3)
        assert not mapper._reject_cache

    def test_cached_site_skipped_in_candidates(self):
        mapper = make_mapper(loop_closure_reject_cache_margin=0.05,
                             descriptor_min_similarity=0.0)
        g = mapper.graph
        idx = g.num_scans - 1
        mapper._reject_cache[mapper._far_key(idx, 2)] = -0.01
        import jax.numpy as jnp
        # Descriptor table where candidate 2 would rank first.
        desc = np.zeros((g.points_padded.shape[0], 8), np.float32)
        desc[idx] = 1.0
        desc[2] = 1.0
        desc[20, 0] = 1.0
        valid = np.arange(len(desc)) < g.num_scans
        before = mapper.stats.far_rows_cache_skipped
        out = mapper._loop_candidates(idx, jnp.asarray(desc),
                                      jnp.asarray(valid))
        assert 2 not in out
        assert mapper.stats.far_rows_cache_skipped == before + 1
