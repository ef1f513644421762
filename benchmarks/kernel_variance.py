"""Characterize run-to-run spread of the headline match kernel.

VERDICT r3 weak #7: published chained-kernel times ranged 0.147-0.168 ms
across rounds with the spread uncharacterized.  This script runs the same
512-deep on-device match chain bench.py times, N rounds back-to-back in ONE
process plus fresh-process context via repeated invocation, and reports
min/median/max so BASELINE.md can state what is kernel and what is
environment.

Usage: python benchmarks/kernel_variance.py [N]   (default 10 rounds)
Appends one summary row to benchmarks/kernel_variance.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "kernel_variance.json")


def main() -> int:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    import jax
    import jax.numpy as jnp

    from ndt_2d_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    from ndt_2d_tpu.config import ScanMatcherConfig
    from ndt_2d_tpu.matching import matcher
    from ndt_2d_tpu.utils import sim

    config = ScanMatcherConfig(grid_cells_x=160, grid_cells_y=160)
    range_max = 15.0

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
    grid = matcher.build_window_ndt(
        config, jnp.asarray(poses), jnp.asarray(np.stack(pts)),
        jnp.asarray(np.stack(msk)), jnp.ones(10, bool),
        jnp.float32(range_max))
    jax.block_until_ready(grid)

    msg = sim.scan_at_pose(world, poses[-1] + [0.15, 0.0, 0.0], n_beams=360,
                           range_max=range_max)
    qpts, qmask = sim.project_scan(msg, 512)
    jpts, jmask = jnp.asarray(qpts), jnp.asarray(qmask)
    jn = jnp.int32(int(qmask.sum()))
    pose_dev = jnp.asarray(
        (poses[-1] + np.asarray([0.17, 0.01, 0.005])).astype(np.float32))

    K = 512
    pose_offsets = jnp.asarray(
        0.0005 * np.arange(K)[:, None] * np.ones(3, np.float32), jnp.float32)

    @jax.jit
    def run_chain(base_pose):
        def body(i, acc):
            r = matcher.match_scan(config, grid, jpts, jmask, jn,
                                   base_pose + pose_offsets[i],
                                   jnp.float32(range_max))
            return acc + r.score
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    jax.block_until_ready(run_chain(pose_dev))  # compile + warm load

    times_ms = []
    for i in range(n_rounds):
        t0 = time.perf_counter()
        jax.block_until_ready(run_chain(pose_dev))
        t = (time.perf_counter() - t0) / K * 1e3
        times_ms.append(t)
        print(f"round {i}: {t:.4f} ms/match", file=sys.stderr, flush=True)

    times_ms = np.asarray(times_ms)
    row = {
        "device": str(jax.devices()[0]),
        "rounds": n_rounds,
        "chain_depth": K,
        "min_ms": round(float(times_ms.min()), 4),
        "median_ms": round(float(np.median(times_ms)), 4),
        "max_ms": round(float(times_ms.max()), 4),
        "spread_pct": round(
            float((times_ms.max() - times_ms.min()) / times_ms.min() * 100),
            1),
        "all_ms": [round(float(t), 4) for t in times_ms],
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(row), flush=True)
    existing = []
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            existing = json.load(f)
    existing.append(row)
    with open(RESULTS, "w") as f:
        json.dump(existing, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
