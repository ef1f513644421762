"""Live streaming runtime (mapping.server): scans over a socket, latched
map artifacts, Configure + initialpose on the same channel."""

import json
import os
import socket
import time

import numpy as np
import pytest

from ndt_2d_tpu.config import MapperConfig, ScanMatcherConfig
from ndt_2d_tpu.io import bag as bag_mod
from ndt_2d_tpu.mapping.mapper import Mapper
from ndt_2d_tpu.mapping import server as server_mod


@pytest.fixture()
def live(tmp_path):
    cfg = MapperConfig(
        local_scan_matcher=ScanMatcherConfig(grid_cells_x=160,
                                             grid_cells_y=160),
        global_scan_matcher=ScanMatcherConfig(grid_cells_x=160,
                                              grid_cells_y=160),
        max_points_per_scan=512, loop_closure_every=10**9)
    mapper = Mapper(cfg)
    sock = str(tmp_path / "scan.sock")
    pub = str(tmp_path / "pub")
    srv = server_mod.ScanServer(mapper, sock, publish_dir=pub)
    # shorten the publish cadence for the test
    srv.publisher.period = 0.02
    yield mapper, srv, sock, pub
    srv.close()


def _roundtrip(sock_path, req):
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(sock_path)
        f = s.makefile("rwb")
        f.write(json.dumps(req).encode() + b"\n")
        f.flush()
        return json.loads(f.readline())


class TestScanServer:
    def test_stream_bag_end_to_end(self, live):
        mapper, srv, sock, pub = live
        bag = bag_mod.record_synthetic("box", 10, n_beams=240, seed=4)
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "bag.npz")
            bag_mod.save_bag(bag, path)
            last = server_mod.stream_bag(path, sock)
        assert last["ok"] and last["accepted"]
        assert mapper.graph.num_scans >= 8
        assert len(last["pose"]) == 3 and len(last["map_to_odom"]) == 3

        # latched artifacts appear on the publish cadence
        # Latched artifacts appear on the publish cadence and converge to
        # the final graph (the latched-topic behavior: latest wins).
        deadline = time.time() + 5.0
        map_path = os.path.join(pub, "map.npz")
        state_path = os.path.join(pub, "state.json")
        state = None
        while time.time() < deadline:
            if os.path.exists(map_path) and os.path.exists(state_path):
                try:
                    state = json.load(open(state_path))
                except json.JSONDecodeError:  # mid-write
                    state = None
                if state and state["nodes"] == mapper.graph.num_scans:
                    break
            time.sleep(0.05)
        assert state is not None
        assert state["nodes"] == mapper.graph.num_scans
        grid = np.load(map_path)
        assert (grid["data"] == 100).sum() > 10

    def test_configure_and_error_on_same_channel(self, live, tmp_path):
        mapper, srv, sock, pub = live
        out = _roundtrip(sock, {"action": 2})  # DISABLE_MAPPING
        assert out["ok"] and mapper.enable_mapping is False
        out = _roundtrip(sock, {"action": 1})
        assert out["ok"] and mapper.enable_mapping is True

        out = _roundtrip(sock, {"garbage": True})
        assert out["ok"] is False and "error" in out

    def test_initial_pose_message(self, live):
        mapper, srv, sock, pub = live
        mapper.enable_mapping = False  # localization mode accepts seeds
        mapper.prev_odom_pose_is_initialized = False
        out = _roundtrip(sock, {"initial_pose": [1.0, 2.0, 0.1],
                                "odom": [0.0, 0.0, 0.0]})
        assert out["ok"]
        assert mapper.prev_odom_pose_is_initialized
        np.testing.assert_allclose(mapper.prev_robot_pose, [1.0, 2.0, 0.1])

    def test_nan_ranges_survive_json(self, live):
        mapper, srv, sock, pub = live
        ranges = [1.0, float("nan"), 2.0] * 80
        out = _roundtrip(sock, {
            "ranges": ranges, "angle_min": -np.pi,
            "angle_increment": 2 * np.pi / len(ranges), "range_max": 10.0,
            "odom": [0.0, 0.0, 0.0]})
        assert out["ok"]
