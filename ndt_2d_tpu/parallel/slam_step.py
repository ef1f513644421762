"""A fully device-resident multichip SLAM step, jitted over a device mesh.

This is the framework's "training step" analog: one accepted scan drives

  1. window-NDT build (scatter over the rolling window's points),
  2. the sharded 3-DoF candidate search (angle axis over ``space``),
  3. functional scan + odometry-constraint append into padded device buffers
     (through the SHARED makeConstraint math, core.constraint),
  4. a constraint-sharded LM pose-graph refinement (over ``batch``).

Everything is static-shape: the scan batch, constraint buffers, and window
are fixed-capacity with masks, so the step compiles once and runs for the
whole session.

Scope note: the PRODUCT path for multichip SLAM is ``Mapper(mesh=...)``
(mapping/mapper.py + parallel/runtime.py), which runs the complete pipeline
— loop-closure search, vmapped confirmation, acceptance gate, sharded solve,
occupancy export — with the same host orchestration as single-device mode.
This module remains the zero-host-roundtrip core-step demonstration (match +
append + periodic solve in ONE jitted dispatch), the shape a fully
device-resident ingest loop would take.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndt_2d_tpu.config import MapperConfig
from ndt_2d_tpu.core import constraint as constraint_ops
from ndt_2d_tpu.graph import solver as base_solver
from ndt_2d_tpu.matching import matcher
from ndt_2d_tpu.parallel import matcher as pmatcher
from ndt_2d_tpu.parallel import solver as psolver
from ndt_2d_tpu.parallel.mesh import BATCH_AXIS, SPACE_AXIS


class SlamState(NamedTuple):
    """Device-resident SLAM state (padded, fixed shape)."""

    poses: jnp.ndarray           # [S, 3]
    points: jnp.ndarray          # [S, P, 2]
    point_mask: jnp.ndarray      # [S, P]
    num_scans: jnp.ndarray       # scalar int32
    c_begin: jnp.ndarray         # [C]
    c_end: jnp.ndarray           # [C]
    c_transform: jnp.ndarray     # [C, 3]
    c_information: jnp.ndarray   # [C, 3, 3]
    c_num: jnp.ndarray           # scalar int32
    prev_pose: jnp.ndarray       # [3] last corrected robot pose


def init_state(max_scans: int, max_points: int,
               max_constraints: int) -> SlamState:
    return SlamState(
        poses=jnp.zeros((max_scans, 3), jnp.float32),
        points=jnp.zeros((max_scans, max_points, 2), jnp.float32),
        point_mask=jnp.zeros((max_scans, max_points), bool),
        num_scans=jnp.zeros((), jnp.int32),
        c_begin=jnp.zeros((max_constraints,), jnp.int32),
        c_end=jnp.zeros((max_constraints,), jnp.int32),
        c_transform=jnp.zeros((max_constraints, 3), jnp.float32),
        c_information=jnp.zeros((max_constraints, 3, 3), jnp.float32),
        c_num=jnp.zeros((), jnp.int32),
        prev_pose=jnp.zeros((3,), jnp.float32),
    )


def make_slam_step(mesh, config: MapperConfig, range_max: float,
                   optimize_every: int = 8):
    """Build the jitted multichip SLAM step for the given mesh/config."""
    mcfg = config.local_scan_matcher
    depth = config.rolling_depth

    def window_mask(state: SlamState):
        idx = jnp.arange(state.poses.shape[0])
        return (idx < state.num_scans) & (idx >= state.num_scans - depth)

    @jax.jit
    def step(state: SlamState, scan_points, scan_mask, odom_delta):
        """One accepted scan: match, append, optionally optimize.

        Args:
          scan_points: [P, 2] robot-frame points; scan_mask: [P];
          odom_delta: [3] dead-reckoned pose delta since the last scan
            (already heading-corrected, cf. ndt_mapper.cpp:357-364).
        """
        num_points = jnp.sum(scan_mask).astype(jnp.int32)
        est_pose = state.prev_pose + odom_delta

        # 1. Rolling-window NDT build (ScanMatcherNDT::addScans analog).
        wmask = window_mask(state)
        grid = matcher.build_window_ndt(
            mcfg, state.poses, state.points, state.point_mask, wmask,
            jnp.float32(range_max))

        # 2. Sharded candidate search.
        res = pmatcher.match_scan_multichip(
            mcfg, mesh, grid, scan_points, scan_mask, num_points, est_pose)
        has_prior = state.num_scans > 0
        corrected = jnp.where(has_prior, est_pose + res.correction, est_pose)

        # 3. Append scan + odometry constraint through the SHARED
        #    makeConstraint math (core.constraint.make_constraint, the jax
        #    twin of graph.pose_graph.make_constraint_np) so this step
        #    cannot drift from the real mapper's constraint semantics.
        i = state.num_scans
        poses = state.poses.at[i].set(corrected)
        points = state.points.at[i].set(scan_points)
        pmask = state.point_mask.at[i].set(scan_mask)

        _, _, transform, information, _ = constraint_ops.make_constraint(
            jnp.maximum(i - 1, 0), i, state.prev_pose, corrected,
            res.covariance)
        j = state.c_num
        cb = state.c_begin.at[j].set(jnp.maximum(i - 1, 0))
        ce = state.c_end.at[j].set(i)
        ct = state.c_transform.at[j].set(transform)
        ci = state.c_information.at[j].set(information.astype(jnp.float32))
        c_num = jnp.where(has_prior, j + 1, j)

        state = SlamState(poses=poses, points=points, point_mask=pmask,
                          num_scans=i + 1, c_begin=cb, c_end=ce,
                          c_transform=ct, c_information=ci, c_num=c_num,
                          prev_pose=corrected)

        # 4. Periodic distributed pose-graph refinement.
        def do_opt(st: SlamState):
            node_mask = jnp.arange(st.poses.shape[0]) < st.num_scans
            cmask = jnp.arange(st.c_begin.shape[0]) < st.c_num
            out = psolver.solve_multichip(
                config.solver, mesh, st.poses, st.c_begin, st.c_end,
                st.c_transform, st.c_information, cmask, node_mask)
            return st._replace(
                poses=out.poses,
                prev_pose=out.poses[jnp.maximum(st.num_scans - 1, 0)])

        state = jax.lax.cond(
            (state.num_scans % optimize_every == 0) & (state.c_num > 0),
            do_opt, lambda st: st, state)
        return state, res

    return step
