"""Worker process for tests/test_distributed.py.

Each worker joins the jax.distributed multi-controller runtime (N processes
x K local CPU devices = N*K-device global mesh — the multi-process fake
backend SURVEY.md §4 prescribes), then runs three checks across the real
process boundary:

  solve       constraint-sharded LM/PCG == process-local single-device solve
  descriptor  sharded all-to-all top-k == process-local dense search
  slam        full office-loop SLAM through Mapper(mesh=...) with closures,
              optimization, occupancy export; final poses asserted bitwise
              replicated across processes

Prints one ``RESULT {json}`` line; the parent test parses it and compares
between processes.  Usage (from the repo root):

    python tests/distributed_worker.py <pid> <nproc> <port> <local_devices>
"""

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
_LOCAL = int(sys.argv[4]) if len(sys.argv) > 4 else 4
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_LOCAL}").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ring_graph(n=32, seed=3):
    from ndt_2d_tpu.graph import pose_graph
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    truth = np.stack([4 * np.cos(th), 4 * np.sin(th), th + np.pi / 2], -1)
    g = pose_graph.Graph(max_points_per_scan=4)
    pts = np.zeros((4, 2), np.float32)
    msk = np.zeros(4, bool)
    noisy = truth + rng.normal(0, [0.1, 0.1, 0.02], (n, 3))
    noisy[0] = truth[0]
    for p in noisy:
        g.add_scan(p, pts, msk)

    def rel(pa, pb, wrap=0.0):
        c, s = np.cos(pa[2]), np.sin(pa[2])
        d = pb[:2] - pa[:2]
        return np.asarray([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                           pb[2] - pa[2] + wrap])

    info = np.diag([1e3, 1e3, 1e4])
    for i in range(n - 1):
        g.add_constraint(i, i + 1, rel(truth[i], truth[i + 1]), info, False)
    g.add_constraint(n - 1, 0, rel(truth[-1], truth[0], 2 * np.pi), info,
                     True)
    return g, truth


def check_solve(mesh):
    import copy

    from ndt_2d_tpu.config import SolverConfig
    from ndt_2d_tpu.graph import solver
    from ndt_2d_tpu.parallel import runtime
    from ndt_2d_tpu.utils import metrics
    g_dist, truth = ring_graph()
    g_local = copy.deepcopy(g_dist)
    cfg = SolverConfig(max_iterations=50)
    assert solver.solve_graph(g_local, cfg), "local solve failed"
    assert runtime.solve_graph_multichip(g_dist, cfg, mesh), \
        "distributed solve failed"
    err = metrics.ate_rmse(g_dist.poses, truth)
    np.testing.assert_allclose(g_dist.poses, g_local.poses, atol=5e-3)
    return {"ate": round(float(err), 5),
            "poses_sum": float(np.sum(g_dist.poses))}


def check_descriptor(mesh):
    from ndt_2d_tpu.parallel import distributed, loop_search
    from ndt_2d_tpu.parallel.mesh import BATCH_AXIS
    from ndt_2d_tpu.utils import sim
    world = sim.make_box_world(10.0, 8.0)
    S, P = 32, 256
    pts = np.zeros((S, P, 2), np.float32)
    msk = np.zeros((S, P), bool)
    for i in range(S):
        pose = np.asarray([3.0 + 0.15 * i, 4.0, 0.1 * i])
        msg = sim.scan_at_pose(world, pose, n_beams=180, range_max=15.0,
                               noise=0.01, rng=np.random.default_rng(i))
        pts[i], msk[i] = sim.project_scan(msg, P)
    desc = np.asarray(loop_search.descriptors(pts, msk, np.float32(15.0)))
    valid = np.ones(S, bool)
    k, excl = 4, 5
    dp, vp = loop_search.pad_descriptors(desc, valid, mesh.shape[BATCH_AXIS])
    idx_d, score_d = distributed.fetch(loop_search.search_all_pairs_multichip(
        mesh, dp, vp, k=k, rolling_exclude=excl))
    import jax.numpy as jnp
    for q in range(excl, S):
        idx_l, score_l = loop_search.search_dense(
            jnp.asarray(desc), jnp.asarray(valid), q, k=k,
            rolling_exclude=excl)
        np.testing.assert_allclose(np.sort(np.asarray(score_l)),
                                   np.sort(score_d[q]), atol=1e-5)
    return {"topk_sum": int(np.sum(idx_d[excl:S])),
            "score_sum": round(float(np.sum(
                np.where(np.isfinite(score_d[excl:S]),
                         score_d[excl:S], 0.0))), 4)}


def check_slam(mesh):
    import dataclasses

    from ndt_2d_tpu.config import (MapperConfig, ScanMatcherConfig,
                                   SolverConfig)
    from ndt_2d_tpu.mapping.mapper import Mapper
    from ndt_2d_tpu.parallel import distributed
    from ndt_2d_tpu.utils import metrics, sim

    world = sim.make_office_world(16.0)
    waypoints = [(2.0, 2.0, 0.0), (14.0, 2.0, np.pi / 2),
                 (14.0, 14.0, np.pi), (2.0, 14.0, -np.pi / 2),
                 (2.0, 2.6, 0.0), (8.0, 2.6, 0.0)]
    traj = []
    for i in range(len(waypoints) - 1):
        a = np.asarray(waypoints[i], float)
        b = np.asarray(waypoints[i + 1], float)
        steps = max(int(np.hypot(b[0] - a[0], b[1] - a[1]) / 0.7), 1)
        heading = np.arctan2(b[1] - a[1], b[0] - a[0])
        for s in range(steps):
            f = s / steps
            traj.append([a[0] + f * (b[0] - a[0]),
                         a[1] + f * (b[1] - a[1]), heading])
    truth = np.asarray(traj)
    odom = sim.drift_odometry(truth, trans_noise=0.012, rot_noise=0.003,
                              seed=11)
    mcfg = ScanMatcherConfig(grid_cells_x=160, grid_cells_y=160)
    gcfg = ScanMatcherConfig(
        ndt_resolution=0.35, search_linear_size=0.15,
        search_linear_resolution=0.01, search_angular_size=0.05,
        grid_cells_x=160, grid_cells_y=160)
    cfg = MapperConfig(
        local_scan_matcher=mcfg, global_scan_matcher=gcfg,
        max_points_per_scan=512, global_search_size=4.0,
        optimization_node_limit=10, loop_closure_every=15,
        loop_closure_gate_scale=0.85, minimum_travel_distance=0.3,
        solver=dataclasses.replace(SolverConfig(),
                                   robust_loss="geman_mcclure"))
    mapper = Mapper(cfg, mesh=mesh)
    assert mapper._mp, "mesh must span processes"
    used_truth = []
    for t in range(len(truth)):
        msg = sim.scan_at_pose(world, truth[t], n_beams=600, range_max=12.0,
                               noise=0.01, rng=np.random.default_rng(t))
        res = mapper.process_scan(msg, odom[t])
        if res.accepted:
            used_truth.append(truth[t])
    mapper.loop_closure()
    used_truth = np.asarray(used_truth)
    poses = mapper.graph.poses[:len(used_truth)]
    # The SPMD invariant: every process computed the identical map.
    distributed.assert_replicated(poses, "final graph poses")
    ate = metrics.ate_rmse(poses, used_truth)
    grid = mapper.render_map()
    distributed.assert_replicated(grid.data, "occupancy grid")
    closures = int(mapper.graph.constraint_switchable.sum())
    assert closures >= 1, "scenario must fire loop closures"
    assert mapper.stats.optimizations >= 1
    assert ate < 0.35, f"ATE {ate}"
    return {"scans": int(mapper.graph.num_scans), "closures": closures,
            "optimizations": int(mapper.stats.optimizations),
            "ate": round(float(ate), 4),
            "grid_occupied": int(np.sum(grid.data == 100))}


def check_pipeline(mesh):
    """Round-5: max_inflight composes with a MULTI-PROCESS mesh — the
    window/pose chain threads through as replicated jit-output global
    arrays.  Sync-equivalence on a straight-line session (the same pin the
    single-process mesh test uses, test_mesh_mapper.py:105) + bitwise
    replication across processes."""
    import dataclasses

    from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
    from ndt_2d_tpu.mapping.mapper import Mapper
    from ndt_2d_tpu.parallel import distributed
    from ndt_2d_tpu.utils import sim

    world = sim.make_box_world(10.0, 8.0)
    truth = np.stack([np.linspace(2.5, 7.0, 16),
                      np.full(16, 4.0), np.zeros(16)], axis=-1)
    odom = sim.drift_odometry(truth, 0.008, 0.002, seed=5)
    mcfg = ScanMatcherConfig(grid_cells_x=160, grid_cells_y=160)
    base = MapperConfig(local_scan_matcher=mcfg, global_scan_matcher=mcfg,
                        max_points_per_scan=512,
                        loop_closure_every=10**9)
    results = {}
    for inflight in (0, 4):
        cfg = dataclasses.replace(base, max_inflight=inflight)
        mapper = Mapper(cfg, mesh=mesh)
        assert mapper._mp
        for t in range(len(truth)):
            msg = sim.scan_at_pose(world, truth[t], n_beams=240,
                                   range_max=12.0, noise=0.01,
                                   rng=np.random.default_rng(t))
            mapper.process_scan(msg, odom[t])
        mapper.flush()
        poses = mapper.graph.poses[:mapper.graph.num_scans].copy()
        distributed.assert_replicated(poses, f"pipelined poses {inflight}")
        results[inflight] = poses
    assert len(results[0]) == len(results[4]) == len(truth)
    np.testing.assert_allclose(results[4], results[0], atol=1e-4)
    return {"scans": len(results[4]),
            "poses_sum": round(float(np.sum(results[4])), 4)}


def check_pf(mesh):
    """Round-5: the PF measurement sharded over the GLOBAL multi-process
    mesh.  (a) the sharded scores equal the process-local dense scores
    (bitwise-level pin at the sharding boundary); (b) a full PF
    localization session through Mapper(mesh=...) tracks and its poses are
    replicated across processes (the resample draws stay in lockstep)."""
    import dataclasses

    from ndt_2d_tpu.config import (MapperConfig, ParticleFilterConfig,
                                   ScanMatcherConfig)
    from ndt_2d_tpu.mapping.mapper import LOAD_FROM_FILE, SAVE_TO_FILE, Mapper
    from ndt_2d_tpu.matching import matcher as matcher_mod
    from ndt_2d_tpu.parallel import distributed
    from ndt_2d_tpu.parallel import filter as pfilter
    from ndt_2d_tpu.parallel.mesh import BATCH_AXIS
    from ndt_2d_tpu.utils import metrics, sim

    world = sim.make_box_world(10.0, 8.0)
    truth = np.stack([np.linspace(3.0, 7.0, 12),
                      np.full(12, 4.0), np.zeros(12)], axis=-1)
    mcfg = ScanMatcherConfig(grid_cells_x=160, grid_cells_y=160)
    base = MapperConfig(local_scan_matcher=mcfg, global_scan_matcher=mcfg,
                        max_points_per_scan=512, loop_closure_every=10**9)
    mapper = Mapper(base)  # process-local replicated mapping run
    for t in range(len(truth)):
        msg = sim.scan_at_pose(world, truth[t], n_beams=240, range_max=14.0,
                               noise=0.01, rng=np.random.default_rng(t))
        mapper.process_scan(msg, truth[t])
    path = f"/tmp/ndt2d_dist_pf_map_{jax.process_index()}.npz"
    mapper.configure(SAVE_TO_FILE, path)

    cfg = dataclasses.replace(
        base, use_particle_filter=True,
        particle_filter=ParticleFilterConfig(
            min_particles=100, max_particles=500,
            odom_alpha1=0.05, odom_alpha2=0.05,
            odom_alpha3=0.05, odom_alpha4=0.05))
    loc = Mapper(cfg, mesh=mesh, seed=3)
    assert loc._mp
    loc.configure(LOAD_FROM_FILE, path)
    rel = metrics.relative_to_first(truth)
    loc.set_initial_pose(rel[0], np.diag([0.04, 0.04, 0.01]), truth[0])
    odom = sim.drift_odometry(truth, 0.01, 0.003, seed=9)

    # (a) sharded-vs-dense measurement pin at the exact sharding boundary.
    loc._ensure_matchers(14.0)
    f = loc.filter
    gm = loc.global_matcher
    msg = sim.scan_at_pose(world, truth[1], n_beams=240, range_max=14.0,
                           noise=0.01, rng=np.random.default_rng(100))
    pts, msk = sim.project_scan(msg, cfg.max_points_per_scan)
    n = int(msk.sum())
    m = f.particles.shape[0]
    nb = mesh.shape[BATCH_AXIS]
    m_pad = -(-m // nb) * nb
    parts = np.zeros((m_pad, 3), np.float32)
    parts[:m] = np.asarray(f.particles)
    sharded = distributed.fetch(pfilter.measure_multichip(
        gm.config, mesh, loc._mesh_grid(gm), np.asarray(pts, np.float32),
        np.asarray(msk), np.int32(n), parts))[:m]
    import jax.numpy as jnp
    dense = np.asarray(matcher_mod.score_points_batch(
        gm.config, gm.grid, jnp.asarray(pts), jnp.asarray(msk),
        jnp.asarray(n), f.particles))
    np.testing.assert_allclose(sharded, dense, atol=1e-6)

    # (b) the full sharded-measurement localization session.
    errs = []
    for t in range(1, len(truth)):
        msg = sim.scan_at_pose(world, truth[t], n_beams=240, range_max=14.0,
                               noise=0.01, rng=np.random.default_rng(100 + t))
        res = loc.process_scan(msg, odom[t])
        if res.accepted:
            errs.append(float(np.hypot(*(res.pose[:2] - rel[t][:2]))))
            distributed.assert_replicated(res.pose, f"pf pose {t}")
    assert len(errs) > 5
    mean_err = float(np.mean(errs))
    assert mean_err < 0.2, mean_err
    return {"updates": len(errs), "mean_err": round(mean_err, 4),
            "score_sum": round(float(np.sum(dense)), 3)}


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from ndt_2d_tpu.parallel import distributed
    distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * _LOCAL

    from ndt_2d_tpu.parallel import mesh as mesh_mod
    mesh = mesh_mod.make_mesh(jax.device_count())
    assert distributed.is_multiprocess(mesh)

    out = {"pid": pid, "nproc": nproc,
           "devices": jax.device_count(),
           "solve": check_solve(mesh),
           "descriptor": check_descriptor(mesh),
           "slam": check_slam(mesh),
           "pipeline": check_pipeline(mesh),
           "pf": check_pf(mesh)}
    distributed.barrier("done")
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
