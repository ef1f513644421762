"""CLI + runtime control channel tests (the reference's scripts/ surface)."""

import json
import threading
import time

import numpy as np
import pytest

from ndt_2d_tpu import cli
from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
from ndt_2d_tpu.io import bag as bag_mod
from ndt_2d_tpu.mapping import runtime
from ndt_2d_tpu.mapping.mapper import Mapper


@pytest.fixture(scope="module")
def small_bag(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bags") / "bag.npz")
    rc = cli.main(["simulate", "--world", "box", "--scans", "16",
                   "--beams", "180", "--range-max", "14.0", "--out", path])
    assert rc == 0
    return path


class TestCli:
    def test_simulate_reproducible(self, small_bag):
        bag = bag_mod.load_bag(small_bag)
        assert len(bag) == 16
        assert bag.truth is not None

    def test_run_and_info(self, small_bag, tmp_path, capsys):
        map_out = str(tmp_path / "map.npz")
        grid_out = str(tmp_path / "grid.npz")
        rc = cli.main(["run", "--bag", small_bag, "--map-out", map_out,
                       "--grid-out", grid_out,
                       "--local_scan_matcher.grid_cells", "160",
                       "--loop-closure-every", "1000000"])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["graph_scans"] >= 10
        assert stats["ate_rmse_m"] < 0.15

        rc = cli.main(["info", "--map", map_out])
        assert rc == 0
        info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert info["scans"] == stats["graph_scans"]

        grid = np.load(grid_out)
        assert (grid["data"] == 100).sum() > 10

    def test_viz_outputs(self, small_bag, tmp_path, capsys):
        map_out = str(tmp_path / "map.npz")
        viz_out = str(tmp_path / "session.png")
        rc = cli.main(["run", "--bag", small_bag, "--map-out", map_out,
                       "--viz-out", viz_out,
                       "--local_scan_matcher.grid_cells", "160",
                       "--loop-closure-every", "1000000"])
        assert rc == 0
        capsys.readouterr()
        with open(viz_out, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"

        map_png = str(tmp_path / "map.png")
        rc = cli.main(["viz", "--map", map_out, "--render-grid",
                       "--out", map_png])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["scans"] >= 10
        with open(map_png, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"

    def test_localize_against_map(self, small_bag, tmp_path, capsys):
        map_out = str(tmp_path / "map.npz")
        assert cli.main(["run", "--bag", small_bag, "--map-out", map_out,
                         "--local_scan_matcher.grid_cells", "160",
                         "--loop-closure-every", "1000000"]) == 0
        capsys.readouterr()
        rc = cli.main(["localize", "--bag", small_bag, "--map", map_out,
                       "--global_scan_matcher.grid_cells", "192"])
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # localization never grows the graph
        assert stats["graph_scans"] == stats["graph_constraints"] + 1


class TestControlChannel:
    def test_configure_roundtrip(self, tmp_path):
        cfg = MapperConfig(
            local_scan_matcher=ScanMatcherConfig(grid_cells_x=64,
                                                 grid_cells_y=64),
            max_points_per_scan=64)
        mapper = Mapper(cfg)
        sock = str(tmp_path / "ctl.sock")
        server = runtime.ControlServer(mapper, sock)
        try:
            time.sleep(0.05)
            out = runtime.send_configure(sock, 2)  # DISABLE_MAPPING
            assert out["ok"]
            assert mapper.enable_mapping is False
            out = runtime.send_configure(sock, 1)  # ENABLE_MAPPING
            assert out["ok"]
            assert mapper.enable_mapping is True

            # save/load through the channel
            pts = np.zeros((64, 2), np.float32)
            mask = np.zeros(64, bool)
            mapper.graph.add_scan([1.0, 2.0, 0.1], pts, mask)
            map_path = str(tmp_path / "m.npz")
            assert runtime.send_configure(sock, 8, map_path)["ok"]
            assert runtime.send_configure(sock, 4, map_path)["ok"]
            assert mapper.graph.num_scans == 1
            # load requires re-localization (ndt_mapper.cpp:178)
            assert mapper.prev_odom_pose_is_initialized is False
        finally:
            server.close()
