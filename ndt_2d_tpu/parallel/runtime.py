"""Mesh-sharded device kernels for the REAL mapper runtime.

Round 2 left multichip SLAM as a library + reduced demo
(``parallel/slam_step.py``): sharded pieces existed but the product runtime
(``mapping/mapper.py``) was single-device.  This module provides mesh-aware
equivalents of every device entry point the Mapper dispatches, so the full
pipeline — rolling match, loop-closure confirmation, pose-graph solve,
occupancy export — runs sharded over a ``jax.sharding.Mesh`` while reusing
the Mapper's host-side gate/constraint/cadence logic unchanged (the scope the
reference's whole node covers, src/ndt_mapper.cpp:267-744).

Sharding layout (see parallel/mesh.py):
  * candidate ANGLES over the ``space`` axis (the match's parallel dimension,
    psum/all_gather reductions — parallel/matcher.py's scheme),
  * loop-closure CANDIDATE WINDOWS over the ``batch`` axis (independent
    builds+matches; each match's angle block additionally sharded over
    ``space``, so a confirmation uses the whole mesh),
  * pose-graph CONSTRAINTS over ``batch`` (parallel/solver.py),
  * occupancy RAYS over the flattened mesh (hit/empty counts psum exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ndt_2d_tpu.config import ScanMatcherConfig, SolverConfig
from ndt_2d_tpu.matching import matcher
from ndt_2d_tpu.parallel import matcher as pmatcher
from ndt_2d_tpu.parallel import solver as psolver
from ndt_2d_tpu.parallel.mesh import BATCH_AXIS, SPACE_AXIS


# ---------------------------------------------------------------------------
# Rolling-window mapping match (Mapper._process_mapping's device step).
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def match_scan_rolling_multichip(config: ScanMatcherConfig, mesh,
                                 window: matcher.RollingWindow, range_max,
                                 points, mask, num_points, pose):
    """match_scan_rolling with the candidate search angle-sharded.

    The window-NDT build and the uncorrected score are replicated (they are
    a tiny fraction of the match FLOPs); the 35k-candidate search shards its
    angle axis over ``space`` (parallel.matcher.match_scan_multichip).
    Returns the same (unc, score, correction, covariance) tuple as the
    single-device fused path so the Mapper's fetch logic is shared.
    """
    grid = matcher.build_window_ndt(
        config, window.poses, window.points, window.point_mask, window.mask,
        range_max)
    unc = matcher.score_points_at_pose(config, grid, points, mask,
                                       num_points, pose)
    res = pmatcher.match_scan_multichip(config, mesh, grid, points, mask,
                                        num_points, pose)
    return unc, res.score, res.correction, res.covariance


@functools.partial(jax.jit, static_argnames=("config", "mesh"),
                   donate_argnums=(2, 3))
def mapping_step_async_multichip(config: ScanMatcherConfig, mesh,
                                 window: matcher.RollingWindow, prev_pose,
                                 range_max, points, mask, num_points, delta):
    """matcher.mapping_step_async with the candidate search angle-sharded
    over the mesh 'space' axis — mesh mode and pipelining composed.

    The pose chain and rolling window stay device-resident (replicated over
    the mesh) exactly like the single-device pipelined path; only the 35k-
    candidate search is sharded, and its reduction is the exact psum /
    first-hit-wins all_gather of parallel.matcher.match_scan_multichip, so
    the drained results equal the synchronous mesh path's.  Works under
    multi-process meshes too (round 5): the first step's window/pose feed
    as process-replicated numpy, every later step threads the replicated
    jit-output global arrays back in, and drains read the process-local
    replica (parallel.distributed.fetch).
    Returns (window', pose', (unc, score, corr, cov, pose'))."""
    c, s = jnp.cos(prev_pose[2]), jnp.sin(prev_pose[2])
    th = prev_pose[2] + delta[2]
    pose = jnp.stack([prev_pose[0] + c * delta[0] - s * delta[1],
                      prev_pose[1] + s * delta[0] + c * delta[1],
                      jnp.arctan2(jnp.sin(th), jnp.cos(th))])
    grid = matcher.build_window_ndt(
        config, window.poses, window.points, window.point_mask, window.mask,
        range_max)
    unc = matcher.score_points_at_pose(config, grid, points, mask,
                                       num_points, pose)
    res = pmatcher.match_scan_multichip(config, mesh, grid, points, mask,
                                        num_points, pose)
    new_pose = pose + res.correction
    window2 = matcher.window_append(window, new_pose, points, mask)
    return window2, new_pose, (unc, res.score, res.correction,
                               res.covariance, new_pose)


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def match_scan_global_multichip(config: ScanMatcherConfig, mesh, grid,
                                points, mask, num_points, pose):
    """Fused scoreScan+matchScan against a prebuilt global grid, sharded
    (the scan-match localization branch, ndt_mapper.cpp:547-566)."""
    unc = matcher.score_points_at_pose(config, grid, points, mask,
                                       num_points, pose)
    res = pmatcher.match_scan_multichip(config, mesh, grid, points, mask,
                                        num_points, pose)
    return unc, res.score, res.correction, res.covariance


# ---------------------------------------------------------------------------
# Loop-closure confirmation: candidates over `batch`, angles over `space`.
# ---------------------------------------------------------------------------
def _sharded_match_one(config: ScanMatcherConfig, axis_space: str,
                       poses, pts, pmask, wmask, start, spts, smask,
                       range_max, dths_blk, valid_blk, dls):
    """One candidate's window build + angle-sharded match inside a shard_map
    body.  Each device in the ``space`` group scores its angle block; K/u/s
    psum exactly and the global best all_gathers with lowest-shard (= lowest
    angle, first-hit-wins) tie-breaking — the reduction scheme of
    parallel.matcher.match_scan_multichip, reusable under an outer vmap over
    the device-local candidate block.  Returns (best, correction, k, u, s).
    """
    grid = matcher.build_window_ndt(config, poses, pts, pmask, wmask,
                                    range_max)
    cand = matcher.candidate_scores(config, grid, spts, smask, start,
                                    dths_blk, dls)
    cand = jnp.where(valid_blk[:, None, None], cand, 0.0)
    best, corr, k, u, s = matcher.reduce_candidates(cand, dths_blk, dls)
    k = jax.lax.psum(k, axis_space)
    u = jax.lax.psum(u, axis_space)
    s = jax.lax.psum(s, axis_space)
    bests = jax.lax.all_gather(best, axis_space)
    corrs = jax.lax.all_gather(corr, axis_space)
    win = jnp.argmin(bests)
    best_w, corr_w = bests[win], corrs[win]
    if config.refine_iterations > 0:
        # Newton polish parity with the single-device match_scan (the grid
        # is replicated across the space group, so every device ascends the
        # same surface from the same lattice winner — replicated compute).
        from ndt_2d_tpu.matching import newton
        refined, best_f = newton.refine_pose(config, grid, spts, smask,
                                             start + corr_w,
                                             config.refine_iterations)
        best_w = best_f
        corr_w = refined - start
    return best_w, corr_w, k, u, s


@functools.partial(jax.jit,
                   static_argnames=("config", "mesh", "axis_batch",
                                    "axis_space"))
def confirm_batch_multichip(config: ScanMatcherConfig, mesh, poses, points,
                            point_mask, window_mask, range_max, scan_points,
                            scan_mask, num_points, start_poses,
                            axis_batch: str = BATCH_AXIS,
                            axis_space: str = SPACE_AXIS):
    """match_scan_batch with candidates sharded over ``batch`` and each
    match's angle lattice sharded over ``space`` — a whole confirmation pass
    uses every device in the mesh.

    Args are match_scan_batch's ([K, 2, ...] candidate windows, one query
    scan, [K, 3] starts); K must divide mesh.shape[axis_batch] (pad with
    all-False window_mask rows — their empty grids score 0 and never pass
    the gate).  Returns (scores [K], corrections [K, 3], covs [K, 3, 3]).
    """
    n_space = mesh.shape[axis_space]
    dtype = scan_points.dtype
    dths, dth_valid, _ = pmatcher._padded_angles(config, n_space, dtype)
    dls = (-config.search_linear_size
           + jnp.arange(config.num_linear, dtype=dtype)
           * config.search_linear_resolution)
    spts, smask, used = matcher.subsample(scan_points, scan_mask, num_points,
                                          config.laser_max_beams)

    cand_spec = P(axis_batch)
    ang_spec = P(axis_space)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(cand_spec, cand_spec, cand_spec, cand_spec, cand_spec,
                  rep, rep, rep, ang_spec, ang_spec, rep),
        out_specs=(cand_spec, cand_spec, cand_spec, cand_spec, cand_spec),
        check_vma=False)
    def _sharded(poses_b, pts_b, pmask_b, wmask_b, starts_b, spts_, smask_,
                 rmax_, dths_blk, valid_blk, dls_):
        fn = functools.partial(_sharded_match_one, config, axis_space)
        return jax.vmap(
            fn, in_axes=(0, 0, 0, 0, 0, None, None, None, None, None, None))(
                poses_b, pts_b, pmask_b, wmask_b, starts_b, spts_, smask_,
                rmax_, dths_blk, valid_blk, dls_)

    best, corr, k, u, s = _sharded(poses, points, point_mask, window_mask,
                                   start_poses, spts, smask,
                                   jnp.asarray(range_max, dtype), dths,
                                   dth_valid, dls)
    res = jax.vmap(matcher.finalize_match,
                   in_axes=(0, 0, 0, 0, 0, None))(best, corr, k, u, s, used)
    return res.score, res.correction, res.covariance


@functools.partial(jax.jit,
                   static_argnames=("coarse_config", "fine_config", "mesh",
                                    "axis_batch", "axis_space"))
def confirm_batch_coarse_fine_multichip(coarse_config: ScanMatcherConfig,
                                        fine_config: ScanMatcherConfig, mesh,
                                        poses, points, point_mask,
                                        window_mask, range_max, scan_points,
                                        scan_mask, num_points, start_poses,
                                        axis_batch: str = BATCH_AXIS,
                                        axis_space: str = SPACE_AXIS):
    """Descriptor-mode coarse-to-fine confirmation, fully mesh-sharded
    (the sharded analog of matcher.match_scan_batch_coarse_fine).  Returns
    (fine_starts [K, 3], scores [K], corrections [K, 3], covs [K, 3, 3])."""
    n_space = mesh.shape[axis_space]
    dtype = scan_points.dtype
    cdths, cvalid, _ = pmatcher._padded_angles(coarse_config, n_space, dtype)
    fdths, fvalid, _ = pmatcher._padded_angles(fine_config, n_space, dtype)
    cdls = (-coarse_config.search_linear_size
            + jnp.arange(coarse_config.num_linear, dtype=dtype)
            * coarse_config.search_linear_resolution)
    fdls = (-fine_config.search_linear_size
            + jnp.arange(fine_config.num_linear, dtype=dtype)
            * fine_config.search_linear_resolution)
    # Per-config subsample, matching the single-device
    # match_scan_batch_coarse_fine whose match_scan calls subsample with
    # each stage's own laser_max_beams.
    cspts, csmask, _ = matcher.subsample(scan_points, scan_mask, num_points,
                                         coarse_config.laser_max_beams)
    spts, smask, used = matcher.subsample(scan_points, scan_mask, num_points,
                                          fine_config.laser_max_beams)

    cand_spec = P(axis_batch)
    ang_spec = P(axis_space)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(cand_spec, cand_spec, cand_spec, cand_spec, cand_spec,
                  rep, rep, rep, rep, rep,
                  ang_spec, ang_spec, rep, ang_spec, ang_spec, rep),
        out_specs=(cand_spec,) * 6, check_vma=False)
    def _sharded(poses_b, pts_b, pmask_b, wmask_b, starts_b, cspts_, csmask_,
                 spts_, smask_, rmax_, cdths_blk, cvalid_blk, cdls_,
                 fdths_blk, fvalid_blk, fdls_):
        def one(poses_c, pts_c, pmask_c, wmask_c, start):
            cbest, ccorr, _, _, _ = _sharded_match_one(
                coarse_config, axis_space, poses_c, pts_c, pmask_c, wmask_c,
                start, cspts_, csmask_, rmax_, cdths_blk, cvalid_blk, cdls_)
            # reduce_candidates already zeroes the correction when no
            # candidate scored (< 0), matching the single-device
            # match_scan_batch_coarse_fine's st + cres.correction.
            st2 = start + ccorr
            best, corr, k, u, s = _sharded_match_one(
                fine_config, axis_space, poses_c, pts_c, pmask_c, wmask_c,
                st2, spts_, smask_, rmax_, fdths_blk, fvalid_blk, fdls_)
            return st2, best, corr, k, u, s
        return jax.vmap(one)(poses_b, pts_b, pmask_b, wmask_b, starts_b)

    st2, best, corr, k, u, s = _sharded(
        poses, points, point_mask, window_mask, start_poses, cspts, csmask,
        spts, smask, jnp.asarray(range_max, dtype), cdths, cvalid, cdls,
        fdths, fvalid, fdls)
    res = jax.vmap(matcher.finalize_match,
                   in_axes=(0, 0, 0, 0, 0, None))(best, corr, k, u, s, used)
    return st2, res.score, res.correction, res.covariance


def _sharded_match_row(config: ScanMatcherConfig, axis_space: str,
                       poses, pts, pmask, wmask, start, qpts, qmask, qnum,
                       range_max, dths_blk, valid_blk, dls):
    """_sharded_match_one with a per-row query scan: subsample inside, so
    rows of a multi-query confirmation batch can vmap over this.  Returns
    (best, correction, k, u, s, used)."""
    spts, smask, used = matcher.subsample(qpts, qmask, qnum,
                                          config.laser_max_beams)
    best, corr, k, u, s = _sharded_match_one(
        config, axis_space, poses, pts, pmask, wmask, start, spts, smask,
        range_max, dths_blk, valid_blk, dls)
    return best, corr, k, u, s, used


@functools.partial(jax.jit,
                   static_argnames=("config", "mesh", "axis_batch",
                                    "axis_space"))
def confirm_rows_multichip(config: ScanMatcherConfig, mesh, poses, points,
                           point_mask, window_mask, range_max, query_points,
                           query_mask, query_num, start_poses,
                           axis_batch: str = BATCH_AXIS,
                           axis_space: str = SPACE_AXIS):
    """Multi-query confirmation rows sharded over ``batch``, each row's
    angle lattice over ``space`` (the mesh analog of
    matcher.match_scan_batch_multi).  query_points [N, P, 2] /
    query_mask [N, P] / query_num [N] are per-row.
    mesh.shape[axis_batch] must divide N (pad rows with all-False
    window_mask).  Returns (scores [N], corrections [N, 3],
    covs [N, 3, 3])."""
    n_space = mesh.shape[axis_space]
    dtype = query_points.dtype
    dths, dth_valid, _ = pmatcher._padded_angles(config, n_space, dtype)
    dls = (-config.search_linear_size
           + jnp.arange(config.num_linear, dtype=dtype)
           * config.search_linear_resolution)

    cand_spec = P(axis_batch)
    ang_spec = P(axis_space)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(cand_spec,) * 5 + (cand_spec, cand_spec, cand_spec, rep,
                                     ang_spec, ang_spec, rep),
        out_specs=(cand_spec,) * 6, check_vma=False)
    def _sharded(poses_b, pts_b, pmask_b, wmask_b, starts_b, qpts_b, qmask_b,
                 qnum_b, rmax_, dths_blk, valid_blk, dls_):
        fn = functools.partial(_sharded_match_row, config, axis_space)
        return jax.vmap(
            fn, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None, None, None, None))(
                poses_b, pts_b, pmask_b, wmask_b, starts_b, qpts_b, qmask_b,
                qnum_b, rmax_, dths_blk, valid_blk, dls_)

    best, corr, k, u, s, used = _sharded(
        poses, points, point_mask, window_mask, start_poses, query_points,
        query_mask, query_num, jnp.asarray(range_max, dtype), dths,
        dth_valid, dls)
    res = jax.vmap(matcher.finalize_match)(best, corr, k, u, s, used)
    return res.score, res.correction, res.covariance


@functools.partial(jax.jit,
                   static_argnames=("coarse_config", "fine_config", "mesh",
                                    "axis_batch", "axis_space"))
def confirm_rows_coarse_fine_multichip(coarse_config: ScanMatcherConfig,
                                       fine_config: ScanMatcherConfig, mesh,
                                       poses, points, point_mask,
                                       window_mask, range_max, query_points,
                                       query_mask, query_num, start_poses,
                                       axis_batch: str = BATCH_AXIS,
                                       axis_space: str = SPACE_AXIS):
    """Far-candidate (coarse-to-fine) confirmation rows, mesh-sharded; the
    mesh analog of matcher.match_scan_batch_multi_coarse_fine.  Returns
    (fine_starts [N, 3], scores [N], corrections [N, 3], covs [N, 3, 3])."""
    n_space = mesh.shape[axis_space]
    dtype = query_points.dtype
    cdths, cvalid, _ = pmatcher._padded_angles(coarse_config, n_space, dtype)
    fdths, fvalid, _ = pmatcher._padded_angles(fine_config, n_space, dtype)
    cdls = (-coarse_config.search_linear_size
            + jnp.arange(coarse_config.num_linear, dtype=dtype)
            * coarse_config.search_linear_resolution)
    fdls = (-fine_config.search_linear_size
            + jnp.arange(fine_config.num_linear, dtype=dtype)
            * fine_config.search_linear_resolution)

    cand_spec = P(axis_batch)
    ang_spec = P(axis_space)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(cand_spec,) * 5 + (cand_spec, cand_spec, cand_spec, rep,
                                     ang_spec, ang_spec, rep, ang_spec,
                                     ang_spec, rep),
        out_specs=(cand_spec,) * 7, check_vma=False)
    def _sharded(poses_b, pts_b, pmask_b, wmask_b, starts_b, qpts_b, qmask_b,
                 qnum_b, rmax_, cdths_blk, cvalid_blk, cdls_, fdths_blk,
                 fvalid_blk, fdls_):
        def one(poses_c, pts_c, pmask_c, wmask_c, st, qp, qm, qn):
            # Per-config subsample, matching match_scan_batch_multi_
            # coarse_fine whose match_scan subsamples per stage.
            cpts, cmsk, _ = matcher.subsample(
                qp, qm, qn, coarse_config.laser_max_beams)
            spts, smask, used = matcher.subsample(
                qp, qm, qn, fine_config.laser_max_beams)
            _, ccorr, _, _, _ = _sharded_match_one(
                coarse_config, axis_space, poses_c, pts_c, pmask_c, wmask_c,
                st, cpts, cmsk, rmax_, cdths_blk, cvalid_blk, cdls_)
            st2 = st + ccorr
            best, corr, k, u, s = _sharded_match_one(
                fine_config, axis_space, poses_c, pts_c, pmask_c, wmask_c,
                st2, spts, smask, rmax_, fdths_blk, fvalid_blk, fdls_)
            return st2, best, corr, k, u, s, used
        return jax.vmap(one)(poses_b, pts_b, pmask_b, wmask_b, starts_b,
                             qpts_b, qmask_b, qnum_b)

    st2, best, corr, k, u, s, used = _sharded(
        poses, points, point_mask, window_mask, start_poses, query_points,
        query_mask, query_num, jnp.asarray(range_max, dtype), cdths, cvalid,
        cdls, fdths, fvalid, fdls)
    res = jax.vmap(matcher.finalize_match)(best, corr, k, u, s, used)
    return st2, res.score, res.correction, res.covariance


# ---------------------------------------------------------------------------
# Pose-graph solve: constraints sharded over `batch`.
# ---------------------------------------------------------------------------
def solve_graph_multichip(graph, config: SolverConfig, mesh,
                          fixed_index: int = 0,
                          axis: str = BATCH_AXIS) -> bool:
    """Mesh analog of graph.solver.solve_graph: optimize a host Graph in
    place with the constraint-sharded distributed LM/PCG solver.

    Same padding/bucketing policy as the single-device wrapper (power-of-two
    buckets reuse a handful of compiled programs); buckets are additionally
    rounded to the shard count.  Returns True on success.
    """
    if graph.num_scans == 0 or graph.num_constraints == 0:
        return False
    n = graph.num_scans
    c = graph.num_constraints
    n_shards = mesh.shape[axis]
    np_ = max(64, 1 << (n - 1).bit_length())
    cp = max(64, 1 << (c - 1).bit_length(), n_shards)
    cp = -(-cp // n_shards) * n_shards
    poses = np.zeros((np_, 3), np.float32)
    poses[:n] = graph.poses
    begin = np.zeros(cp, np.int32)
    begin[:c] = graph.constraint_begin
    end = np.zeros(cp, np.int32)
    end[:c] = graph.constraint_end
    transform = np.zeros((cp, 3), np.float32)
    transform[:c] = graph.constraint_transform
    information = np.zeros((cp, 3, 3), np.float32)
    information[:c] = graph.constraint_information
    cmask = np.arange(cp) < c
    nmask = np.arange(np_) < n
    switchable = np.zeros(cp, bool)
    switchable[:c] = graph.constraint_switchable
    # Inputs stay host-numpy: in multi-controller mode they are treated as
    # process-replicated and each process feeds its addressable shards
    # (committed jnp arrays would pin to one process's device 0).
    res = psolver.solve_multichip(
        config, mesh, poses, begin, end, transform, information, cmask,
        nmask, fixed_index=fixed_index, axis=axis, robust_mask=switchable)
    if not bool(np.asarray(res.success)):
        return False
    graph.set_poses(np.asarray(res.poses[:n], np.float64))
    return True


# ---------------------------------------------------------------------------
# Occupancy export: rays sharded over the flattened mesh.
# ---------------------------------------------------------------------------
@functools.partial(jax.jit,
                   static_argnames=("mesh", "width", "height",
                                    "num_samples"))
def raymarch_counts_multichip(mesh, starts, ends, beam_mask, origin,
                              resolution, width: int, height: int,
                              num_samples: int):
    """mapping.occupancy._raymarch_counts with the ray batch sharded over
    every mesh axis; integer hit/empty images psum exactly, so the sharded
    render is bit-identical to the single-device one.

    The ray count must divide the total device count (pad with
    beam_mask=False rows).
    """
    from ndt_2d_tpu.mapping import occupancy
    axes = tuple(mesh.axis_names)
    ray_spec = P(axes)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(ray_spec, ray_spec, ray_spec, rep, rep),
        out_specs=(rep, rep), check_vma=False)
    def _go(st, en, bm, og, res):
        hit, empty = occupancy._raymarch_counts(
            st, en, bm, og, res, width, height, num_samples)
        return (jax.lax.psum(hit, axes), jax.lax.psum(empty, axes))

    return _go(starts, ends, beam_mask, origin, resolution)
