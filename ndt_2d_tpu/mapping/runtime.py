"""Session runtime: bag replay driver + runtime control channel.

The reference's runtime surface is ROS: a spinning node fed by topics plus a
``configure`` service that four one-shot scripts call
(scripts/{enable,disable}_mapping.py, {save,load}_map.py).  Here the runtime
is a deterministic replay/stream driver around ``Mapper`` plus a UNIX-socket
control channel speaking the same action bitmask as ``srv/Configure.srv``,
so mapping can be toggled and maps saved/loaded while a session runs.
"""

from __future__ import annotations

import json
import logging
import os
import socket
import threading
from typing import Callable, Optional

import numpy as np

from ndt_2d_tpu.io.bag import ScanBag
from ndt_2d_tpu.mapping.mapper import Mapper
from ndt_2d_tpu.utils import metrics

logger = logging.getLogger("ndt_2d_tpu.runtime")


class ControlServer:
    """UNIX-socket control channel: JSON lines {"action": int, "filename": str}.

    The action bitmask matches srv/Configure.srv: ENABLE_MAPPING=1,
    DISABLE_MAPPING=2, LOAD_FROM_FILE=4, SAVE_TO_FILE=8.
    """

    def __init__(self, mapper: Mapper, path: str):
        self.mapper = mapper
        self.path = path
        if os.path.exists(path):
            os.unlink(path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(path)
        self._sock.listen(4)
        self._lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            with conn:
                data = conn.makefile().readline()
                try:
                    req = json.loads(data)
                    with self._lock:
                        ok = self.mapper.configure(
                            int(req.get("action", 0)),
                            req.get("filename", ""))
                    conn.sendall(json.dumps({"ok": bool(ok)}).encode() + b"\n")
                except Exception as e:  # pragma: no cover
                    conn.sendall(json.dumps({"ok": False,
                                             "error": str(e)}).encode() + b"\n")

    def close(self):
        self._stop = True
        self._sock.close()
        if os.path.exists(self.path):
            os.unlink(self.path)


def send_configure(path: str, action: int, filename: str = "") -> dict:
    """One-shot client of the control channel (the scripts/ equivalent)."""
    with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
        s.connect(path)
        s.sendall(json.dumps({"action": action,
                              "filename": filename}).encode() + b"\n")
        return json.loads(s.makefile().readline())


def sweep_end_odom(bag: ScanBag, t: int, msg) -> Optional[np.ndarray]:
    """Odometry pose at the END of scan t's sweep, for motion de-skew.

    De-skew only applies when the sweep has real duration
    (time_increment > 0, cf. ndt_mapper.cpp:368-370); bags record odom at
    scan starts, so the sweep-end pose interpolates toward the next sample.
    With per-scan timestamps (imported logs, ScanBag.times) the sweep is
    placed at its true fraction of the inter-scan interval; without them the
    whole interval is assumed (sim bags record odom exactly at scan
    boundaries, making the two identical).  Returns None when de-skew does
    not apply.
    """
    sweep = msg.time_increment * (len(msg.ranges) - 1)
    if sweep <= 0 or t + 1 >= len(bag):
        return None
    nxt, cur = bag.odom[t + 1], bag.odom[t]
    d = nxt - cur
    d = np.asarray([d[0], d[1], np.arctan2(np.sin(d[2]), np.cos(d[2]))])
    frac = 1.0
    if bag.times is not None and bag.times[t + 1] > bag.times[t]:
        frac = min(sweep / float(bag.times[t + 1] - bag.times[t]), 1.0)
    return cur + d * frac


def run_bag(mapper: Mapper, bag: ScanBag,
            progress: Optional[Callable[[int, object], None]] = None,
            control: Optional[ControlServer] = None) -> dict:
    """Replay a bag through the mapper; returns session statistics.

    Computes ATE against ground truth when the bag carries it.
    """
    est, used_truth, accepted, deferred, est_t = [], [], 0, [], []
    lock = control._lock if control else threading.Lock()
    for t, (msg, odom_pose) in enumerate(bag):
        odom_end = sweep_end_odom(bag, t, msg)
        with lock:
            res = mapper.process_scan(msg, odom_pose, odom_end)
        if res.accepted:
            accepted += 1
            if res.pose is not None:
                est.append(res.pose)
                est_t.append(t)
                if bag.truth is not None:
                    used_truth.append(bag.truth[t])
            elif res.pose_future is not None:
                # Pipelined paths defer the pose; resolve after the final
                # flush below (the device->host copies are already in
                # flight, so this costs no extra round trips).
                deferred.append((res.pose_future, t))
        if progress:
            progress(t, res)
    with lock:
        mapper.flush()
        mapper.loop_closure()
    if deferred:
        import jax
        for fut, t in deferred:
            est.append(np.asarray(jax.device_get(fut), np.float64))
            est_t.append(t)
            if bag.truth is not None:
                used_truth.append(bag.truth[t])

    stats = {
        "scans_in": len(bag),
        "scans_accepted": accepted,
        "graph_scans": mapper.graph.num_scans,
        "graph_constraints": mapper.graph.num_constraints,
        "loop_closures": int(mapper.graph.constraint_switchable.sum()),
        "session": mapper.stats.summary(),
    }
    if bag.truth is not None and len(est) > 1:
        stats["ate_rmse_m"] = metrics.ate_rmse(
            np.asarray(est), np.asarray(used_truth))
        stats["odom_ate_rmse_m"] = metrics.ate_rmse(bag.odom, bag.truth)
    # Private keys (numpy, not JSON): the estimated trajectory, for
    # --traj-out export; callers pop these before serializing.
    stats["_est"] = np.asarray(est) if est else np.zeros((0, 3))
    stats["_est_t"] = np.asarray(est_t, np.int64)
    return stats
