"""Multi-device scan matching: the candidate search sharded over the mesh.

The candidate lattice (angles x translations) is embarrassingly parallel;
we shard the *angle* axis over the mesh's ``space`` axis with ``shard_map``.
Each device scores its angle block against a replicated NDT grid, reduces
locally (partial argmin + the Olson covariance accumulators K/u/s), then one
``psum``/all-gather round combines: K/u/s sum exactly, and the global best
picks the lowest score with the lowest angle index winning ties — the same
first-hit-wins order as the reference's sequential loop
(src/scan_matcher_ndt.cpp:103-143).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching import matcher
from ndt_2d_tpu.ndt import grid as ndt_grid
from ndt_2d_tpu.parallel.mesh import SPACE_AXIS


def _padded_angles(config: ScanMatcherConfig, n_shards: int, dtype):
    """Full angle lattice padded to a multiple of the shard count.

    Padded slots get angle 0 and are masked by zeroing their scores (a zero
    candidate score contributes nothing to K/u/s and can never win the
    strict `< 0` best test... except against an all-zero field, where the
    tie-break keeps the real first candidate).
    """
    import numpy as np
    a = config.num_angles
    a_pad = -(-a // n_shards) * n_shards
    dths = np.full(a_pad, 0.0, dtype)
    dths[:a] = (-config.search_angular_size
                + np.arange(a) * config.search_angular_resolution)
    valid = np.zeros(a_pad, bool)
    valid[:a] = True
    return jnp.asarray(dths), jnp.asarray(valid), a_pad


@functools.partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def match_scan_multichip(config: ScanMatcherConfig, mesh,
                         grid: ndt_grid.NDTGrid, points, point_mask,
                         num_points, pose,
                         axis: str = SPACE_AXIS) -> matcher.MatchResult:
    """matchScan with the angle axis sharded over ``mesh[axis]``.

    The grid/scan inputs are replicated; only the candidate lattice is
    partitioned, so the only collectives are three scalar-ish psums and one
    small all-gather on the reduction — pure ICI traffic.

    jit with (config, mesh) static: without it the shard_map closure is
    rebuilt — re-traced and re-lowered — on EVERY call (measured ~10 s/scan
    on the virtual-CPU mesh vs ~0.15 s once compiled).
    """
    n_shards = mesh.shape[axis]
    dtype = points.dtype
    dths, dth_valid, a_pad = _padded_angles(config, n_shards, dtype)
    dls = (-config.search_linear_size
           + jnp.arange(config.num_linear, dtype=dtype)
           * config.search_linear_resolution)

    spts, smask, used = matcher.subsample(points, point_mask, num_points,
                                          config.laser_max_beams)

    spec_angles = P(axis)
    replicated = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_angles, spec_angles, replicated, replicated,
                  replicated, replicated, replicated),
        out_specs=replicated, check_vma=False)
    def _sharded(dths_blk, valid_blk, grid_, spts_, smask_, pose_, dls_):
        cand = matcher.candidate_scores(config, grid_, spts_, smask_, pose_,
                                        dths_blk, dls_)
        cand = jnp.where(valid_blk[:, None, None], cand, 0.0)
        best, corr, k, u, s = matcher.reduce_candidates(cand, dths_blk, dls_)

        # Covariance accumulators sum exactly across shards.  psum only over
        # the angle axis: values are replicated along any unused mesh axes,
        # so a psum there would overcount.
        k = jax.lax.psum(k, axis)
        u = jax.lax.psum(u, axis)
        s = jax.lax.psum(s, axis)

        # Global best: gather per-shard (best, correction) and pick the
        # lowest score; ties resolve to the lowest shard id = lowest angle,
        # matching the sequential first-hit-wins order.
        bests = jax.lax.all_gather(best, axis)          # [n_shards]
        corrs = jax.lax.all_gather(corr, axis)          # [n_shards, 3]
        win = jnp.argmin(bests)
        return bests[win], corrs[win], k, u, s

    best, corr, k, u, s = _sharded(dths, dth_valid, grid, spts, smask,
                                   pose, dls)
    res = matcher.finalize_match(best, corr, k, u, s, used)
    if config.refine_iterations > 0:
        # Newton polish parity with the single-device match_scan: the
        # refinement is replicated compute (every device ascends the same
        # surface from the same lattice winner) — no collectives needed.
        from ndt_2d_tpu.matching import newton
        refined, best_f = newton.refine_pose(config, grid, spts, smask,
                                             pose + res.correction,
                                             config.refine_iterations)
        used_f = jnp.maximum(used, 1).astype(best_f.dtype)
        res = matcher.MatchResult(score=best_f / used_f,
                                  correction=refined - pose,
                                  covariance=res.covariance)
    return res
