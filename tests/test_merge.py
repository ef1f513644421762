"""Multi-session map merge tests (mapping/merge.py).

Two sessions map overlapping parts of one office; session B's map frame is
an arbitrary SE(2) away from A's (each session's frame is anchored at its
own first pose).  The merge must recover the relative transform from
appearance + full-heading NDT registration alone and fuse the graphs.
"""

import dataclasses

import numpy as np
import pytest

from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
from ndt_2d_tpu.core import pose as pose_ops
from ndt_2d_tpu.mapping import merge
from ndt_2d_tpu.mapping.mapper import Mapper
from ndt_2d_tpu.utils import metrics, sim

MCFG = ScanMatcherConfig(grid_cells_x=160, grid_cells_y=160)
CFG = MapperConfig(local_scan_matcher=MCFG, global_scan_matcher=MCFG,
                   max_points_per_scan=512, loop_closure_every=10**9)
RANGE_MAX = 14.0


def world():
    # Office with a symmetry-breaking wall (the bare ring is 4-fold
    # symmetric and would alias).
    return np.concatenate([
        sim.make_office_world(16.0),
        np.asarray([[[1.0, 13.0], [3.0, 15.0]]]),
    ], axis=0)


def run_session(w, truth):
    """Map a trajectory with clean odometry; returns the mapper's graph.
    The session's map frame is anchored at its first pose."""
    m = Mapper(CFG)
    for t in range(len(truth)):
        msg = sim.scan_at_pose(w, truth[t], n_beams=300,
                               range_max=RANGE_MAX, noise=0.01,
                               rng=np.random.default_rng(hash(t) % 2**31))
        m.process_scan(msg, truth[t])
    return m.graph


class TestMergeMaps:
    @pytest.fixture(scope="class")
    def sessions(self):
        w = world()
        n = 14
        # A: bottom corridor left->middle; B: middle->right, overlapping.
        truth_a = np.stack([np.linspace(2.0, 8.0, n),
                            np.full(n, 2.0), np.zeros(n)], axis=-1)
        # B drives the overlapping stretch the OPPOSITE way (heading pi):
        # the sessions' frames differ by an arbitrary rotation, exercising
        # the full-heading coarse search.
        truth_b = np.stack([np.linspace(12.0, 6.0, n),
                            np.full(n, 2.2), np.full(n, np.pi)], axis=-1)
        ga = run_session(w, truth_a)
        gb = run_session(w, truth_b)
        return w, truth_a, truth_b, ga, gb

    def test_merge_recovers_alignment(self, sessions):
        import jax.numpy as jnp
        w, truth_a, truth_b, ga, gb = sessions
        res = merge.merge_maps(ga, gb, range_max=RANGE_MAX,
                               score_threshold=-0.25)
        assert res.pairs_accepted >= 2
        assert res.graph.num_scans == ga.num_scans + gb.num_scans
        # Cross constraints are switchable.
        sw = res.graph.constraint_switchable
        assert int(sw.sum()) >= res.pairs_accepted

        # Ground truth: A's frame is anchored at truth_a[0], B's at
        # truth_b[0]; the true B->A transform maps B-frame poses to A-frame.
        rel_a = metrics.relative_to_first(truth_a)
        rel_b = metrics.relative_to_first(truth_b)
        t_true = np.asarray(pose_ops.compose(
            jnp.asarray(pose_ops.inverse(jnp.asarray(truth_a[0]))),
            jnp.asarray(truth_b[0])))
        err_xy = np.hypot(*(res.transform[:2] - t_true[:2]))
        err_th = abs(float(pose_ops.normalize_angle(
            res.transform[2] - t_true[2])))
        assert err_xy < 0.15
        assert err_th < 0.05

        # Merged B poses track B's ground truth expressed in A's frame.
        truth_b_in_a = np.asarray([
            np.asarray(pose_ops.compose(jnp.asarray(t_true),
                                        jnp.asarray(p))) for p in rel_b])
        est_b = res.graph.poses[ga.num_scans:]
        ate = metrics.ate_rmse(est_b, truth_b_in_a)
        assert ate < 0.2

    def test_merge_fails_cleanly_without_overlap(self, sessions):
        w, truth_a, truth_b, ga, gb = sessions
        # Session C maps the TOP corridor: no overlap with A's bottom run.
        n = 12
        truth_c = np.stack([np.linspace(12.0, 6.0, n),
                            np.full(n, 14.0), np.full(n, np.pi)], axis=-1)
        gc = run_session(world(), truth_c)
        with pytest.raises(ValueError):
            merge.merge_maps(ga, gc, range_max=RANGE_MAX,
                             min_similarity=0.97, score_threshold=-0.45)

    def test_merge_rejects_mismatched_capacity(self, sessions):
        from ndt_2d_tpu.graph.pose_graph import Graph
        _, _, _, ga, _ = sessions
        small = Graph(max_points_per_scan=64)
        small.add_scan(np.zeros(3), np.zeros((64, 2), np.float32),
                       np.ones(64, bool))
        with pytest.raises(ValueError):
            merge.merge_maps(ga, small, range_max=RANGE_MAX)
