"""CARMEN dataset importer (io.carmen)."""

import json

import numpy as np

from ndt_2d_tpu import cli
from ndt_2d_tpu.io import bag as bag_mod, carmen


def _make_log(tmp_path, n_scans=12):
    """Synthesize a CARMEN file from a simulated 180-degree bag."""
    from ndt_2d_tpu.utils import sim
    world = sim.make_box_world(10.0, 8.0)
    rows, odom = [], []
    for t in range(n_scans):
        pose = np.asarray([3.0 + 0.25 * t, 4.0, 0.0])
        msg = sim.scan_at_pose(world, pose, n_beams=181, range_max=50.0,
                               noise=0.01, rng=np.random.default_rng(t))
        rows.append(msg.ranges)
        odom.append(pose)
    bag = bag_mod.ScanBag(
        ranges=np.stack(rows).astype(np.float32), angle_min=-np.pi / 2,
        angle_increment=np.pi / 180, time_increment=0.0, range_max=50.0,
        odom=np.asarray(odom), truth=None)
    # NOTE sim generates beams over [-pi, pi); for the round-trip test we
    # only care that ranges/odom survive, not geometric consistency.
    path = str(tmp_path / "log.clf")
    carmen.save_carmen(bag, path)
    return path, bag


class TestCarmen:
    def test_roundtrip(self, tmp_path):
        path, bag = _make_log(tmp_path)
        out = carmen.load_carmen(path, fov_degrees=180.0)
        assert out.ranges.shape == bag.ranges.shape
        valid = ~np.isnan(bag.ranges)
        np.testing.assert_allclose(out.ranges[valid], bag.ranges[valid],
                                   atol=5e-4)
        np.testing.assert_allclose(out.odom, bag.odom, atol=1e-5)
        assert abs(out.angle_min + np.pi / 2) < 1e-9
        assert abs(out.angle_increment - np.pi / 180) < 1e-9

    def test_out_of_range_markers_become_nan(self, tmp_path):
        path = str(tmp_path / "oor.clf")
        vals = " ".join(["2.0"] * 5 + ["81.91"] + ["2.0"] * 5)
        with open(path, "w") as f:
            f.write(f"FLASER 11 {vals} 0 0 0 0 0 0 0.0 host 0.0\n")
            f.write("ODOM 0 0 0 0 0 0 0.0 host 0.0\n")  # ignored
            f.write("FLASER garbage line\n")             # malformed, skipped
        bag = carmen.load_carmen(path)
        assert len(bag) == 1
        assert np.isnan(bag.ranges[0, 5])
        assert (~np.isnan(np.delete(bag.ranges[0], 5))).all()

    def test_cli_import_and_run(self, tmp_path, capsys):
        path, _ = _make_log(tmp_path, n_scans=10)
        out = str(tmp_path / "imported.npz")
        rc = cli.main(["import-carmen", "--log", path, "--out", out])
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["scans"] == 10 and info["beams"] == 181

        # the imported bag drives the normal SLAM pipeline (clip the long
        # CARMEN ranges so the static NDT window stays small)
        rc = cli.main(["run", "--bag", out, "--max-range", "12.0",
                       "--local_scan_matcher.grid_cells", "192",
                       "--loop-closure-every", "1000000"])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["scans_accepted"] >= 8
