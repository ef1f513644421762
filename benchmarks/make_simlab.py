"""Generate the committed CARMEN-format benchmark dataset (datasets/simlab).

This environment has no network egress, so the classic public CARMEN logs
(Intel Research Lab, ACES, MIT) cannot be fetched.  This script produces the
closest reproducible substitute: a 28 m lab floor plan
(sim.make_simlab_world) surveyed by a differential robot doing two full
corridor loops plus office excursions, recorded EXACTLY the way the public
logs are:

* ``FLASER`` lines with 180 beams over a 180-degree FOV (SICK LMS-200
  convention: angle_increment = pi/179), millimeter-quantized ranges,
  out-of-range readings marked 81.91;
* drifting odometry integrated from noisy relative motions — the log
  carries NO ground truth, exactly like the real datasets;
* ground truth saved SEPARATELY (datasets/simlab_truth.npz) for the
  benchmark's ATE report only; nothing downstream of import may touch it.

Deterministic: re-running reproduces the committed files bit-for-bit.

Usage:  python benchmarks/make_simlab.py [--out-dir datasets]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ndt_2d_tpu.io.bag import ScanBag            # noqa: E402
from ndt_2d_tpu.io.carmen import save_carmen     # noqa: E402
from ndt_2d_tpu.utils import sim                 # noqa: E402

N_BEAMS = 180
FOV = np.pi
RANGE_MAX = 10.0
STEP = 0.08          # m between scans (~10 Hz at 0.8 m/s)
SCAN_NOISE = 0.012   # SICK-ish range sigma (m)
ODOM_TRANS_NOISE = 0.011
ODOM_ROT_NOISE = 0.0035
SEED = 20260819


def survey_trajectory() -> np.ndarray:
    """Two corridor ring loops + three office excursions + core-room visit.

    The corridor centerline sits at 7 m from the outer wall (the ring
    between the office band at 5 m and the core block at 9 m).
    """
    ring = [(7.0, 7.0), (21.0, 7.0), (21.0, 21.0), (7.0, 21.0)]
    wp = []
    # Lap 1 with an excursion into a south office (door at x=13.1 on y=5).
    wp += [ring[0], (12.6, 7.0)]
    wp += [(13.1, 6.0), (13.1, 2.9), (13.8, 2.9), (13.2, 6.2), (13.5, 7.0)]
    wp += [ring[1], (21.0, 10.5)]
    # east office excursion (door at y=11.3 on the x=23 wall)
    wp += [(22.0, 11.2), (25.0, 11.1), (25.0, 11.9), (22.0, 11.4),
           (21.0, 13.0)]
    wp += [ring[2], (16.5, 21.0)]
    # core-room visit (door at x=16 on the y=19 core wall)
    wp += [(16.0, 20.0), (16.0, 17.5), (15.3, 15.3), (16.0, 17.8),
           (16.0, 20.2), (15.0, 21.2)]
    wp += [ring[3], (7.0, 14.0), ring[0]]
    # Lap 2: clean ring, closing the big loop twice.
    wp += [ring[1], ring[2], ring[3], ring[0], (10.0, 7.0)]
    return sim.resample_polyline(wp, STEP)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "datasets"))
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    world = sim.make_simlab_world()
    truth = survey_trajectory()
    rng = np.random.default_rng(SEED)

    # Beam angles use the IMPORTER's convention (fov/(n-1) increment) so the
    # committed log reprojects without quantization skew.
    inc = FOV / (N_BEAMS - 1)
    rel_angles = -FOV / 2.0 + inc * np.arange(N_BEAMS)
    ranges = np.empty((len(truth), N_BEAMS), np.float32)
    for t in range(len(truth)):
        r = sim.raycast(world, truth[t, :2], truth[t, 2] + rel_angles,
                        RANGE_MAX)
        r = r + rng.normal(0.0, SCAN_NOISE, N_BEAMS)
        ranges[t] = np.where(np.isnan(r), np.nan, np.maximum(r, 0.0))

    odom = sim.drift_odometry(truth, ODOM_TRANS_NOISE, ODOM_ROT_NOISE,
                              seed=SEED)
    bag = ScanBag(ranges=ranges, angle_min=-FOV / 2.0, angle_increment=inc,
                  time_increment=0.0, range_max=RANGE_MAX, odom=odom,
                  truth=None)

    log_path = os.path.join(args.out_dir, "simlab.clf.gz")
    save_carmen(bag, log_path)
    truth_path = os.path.join(args.out_dir, "simlab_truth.npz")
    np.savez_compressed(truth_path, truth=truth, world=world)
    print(f"wrote {log_path}: {len(truth)} scans x {N_BEAMS} beams, "
          f"{os.path.getsize(log_path)/1e6:.2f} MB")
    print(f"wrote {truth_path} (ATE reference only)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
