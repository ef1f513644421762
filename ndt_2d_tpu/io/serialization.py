"""Map (graph) persistence.

The reference checkpoints the full graph — every scan (id, pose, points) and
every constraint — to a rosbag2 file (Graph::save / load ctor,
src/graph.cpp:49-165), with schema quirks (theta smuggled in orientation.w,
dtheta in translation.z; graph.cpp:125, :148).  We keep the same semantics
(full graph, resume mapping or seed localization) in a portable npz schema
without the quirks.  A faster native binary codec lives in
ndt_2d_tpu.io.native_codec and is used automatically when available.
"""

from __future__ import annotations

import numpy as np

from ndt_2d_tpu.graph.pose_graph import Graph

FORMAT_VERSION = 1


def save_graph(graph: Graph, filename: str) -> None:
    np.savez_compressed(
        filename,
        version=np.int32(FORMAT_VERSION),
        use_barycenter=np.bool_(graph.use_barycenter),
        poses=graph.poses,
        points=graph.points,
        point_mask=graph.point_mask,
        constraint_begin=graph.constraint_begin,
        constraint_end=graph.constraint_end,
        constraint_transform=graph.constraint_transform,
        constraint_information=graph.constraint_information,
        constraint_switchable=graph.constraint_switchable,
    )


def load_graph(filename: str, max_points_per_scan: int,
               use_barycenter: bool = True) -> Graph:
    with np.load(filename) as data:
        graph = Graph(max_points_per_scan, bool(data["use_barycenter"]))
        points = data["points"]
        mask = data["point_mask"]
        if points.shape[1] != max_points_per_scan:
            # Re-pad to the configured capacity.
            s = points.shape[0]
            p = min(points.shape[1], max_points_per_scan)
            np_points = np.zeros((s, max_points_per_scan, 2), np.float32)
            np_mask = np.zeros((s, max_points_per_scan), bool)
            np_points[:, :p] = points[:, :p]
            np_mask[:, :p] = mask[:, :p]
            points, mask = np_points, np_mask
        for i in range(points.shape[0]):
            graph.add_scan(data["poses"][i], points[i], mask[i])
        for j in range(data["constraint_begin"].shape[0]):
            graph.add_constraint(
                int(data["constraint_begin"][j]),
                int(data["constraint_end"][j]),
                data["constraint_transform"][j],
                data["constraint_information"][j],
                bool(data["constraint_switchable"][j]))
    graph.use_barycenter = use_barycenter
    return graph
