"""Spatially-sharded NDT: the global map split into blocks across devices.

The reference's localization modes build ONE dense NDT over the whole map
(ndt_mapper.cpp:296-303) — fine for a building, impossible for a district.
Here the grid's rows (y-stripes) are sharded over the mesh's ``space`` axis
(BASELINE.json north-star: "the global NDT map is sharded into spatial
blocks per host"):

* **build**: scan points are replicated (points are tiny next to the grid);
  each device bins only the points falling in its stripe and builds its
  block with the same closed-form cell math — collective-free.
* **score / measure**: each device scores the query points that land in its
  stripe (others contribute 0) and one ``psum`` combines — so a particle
  measurement against a city-block map is one all-reduce.
* **match**: each device accumulates per-candidate partial scores for its
  stripe over the full (angle x dx x dy) lattice; one psum over the [A, L,
  L] score field, then the standard argmin + Olson reduction (replicated).

The dense and sharded paths share all cell math (ndt.grid) and are
cross-checked in tests/test_ndt_blocks.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.core import pose as pose_ops
from ndt_2d_tpu.matching import matcher as ndt_matcher
from ndt_2d_tpu.ndt import grid as ndt_grid
from ndt_2d_tpu.parallel.mesh import SPACE_AXIS


def _stripe_params(height: int, n_shards: int):
    if height % n_shards:
        raise ValueError(f"grid height {height} must divide the shard "
                         f"count {n_shards}")
    return height // n_shards


def build_ndt_sharded(mesh, poses, points, point_mask, window_mask, origin,
                      cell_size, width: int, height: int,
                      axis: str = SPACE_AXIS) -> ndt_grid.NDTGrid:
    """Build a y-stripe-sharded NDT grid (cells sharded over ``axis``).

    Returns an NDTGrid whose [H*W] cell arrays are laid out stripe-major and
    sharded over the mesh; origin/cell_size are replicated.  Inputs are
    replicated (points are O(scans x beams); the grid is O(H x W)).
    """
    n_shards = mesh.shape[axis]
    h_loc = _stripe_params(height, n_shards)

    world = pose_ops.transform_points(poses, points).reshape(-1, 2)
    mask = (point_mask & window_mask[:, None]).reshape(-1)
    origin = jnp.asarray(origin, world.dtype)
    cell = jnp.asarray(cell_size, world.dtype)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), P(), P(), P()),
                       out_specs=(P(axis), P(axis), P(axis), P(axis)),
                       check_vma=False)
    def _build(w, m, org, cs):
        i = jax.lax.axis_index(axis)
        # GLOBAL binning (bitwise identical to the dense grid), then offset
        # into this device's stripe of rows [i*h_loc, (i+1)*h_loc).
        ix, iy = ndt_grid.cell_ij(org, cs, w)
        row0 = i * h_loc
        valid = (m & (ix >= 0) & (ix < width)
                 & (iy >= row0) & (iy < row0 + h_loc))
        flat = (jnp.clip(iy - row0, 0, h_loc - 1) * width
                + jnp.clip(ix, 0, width - 1))
        g = ndt_grid.build_ndt_binned(w, valid, flat, org, cs, h_loc * width)
        return g.mean, g.information, g.count, g.covariance

    mean, information, count, covariance = _build(world, mask, origin, cell)
    # The returned grid carries the GLOBAL origin; the sharded score/match
    # entry points re-derive each stripe's origin from the axis index.
    return ndt_grid.NDTGrid(origin=origin, cell_size=cell, mean=mean,
                            information=information, count=count,
                            covariance=covariance)


def score_points_sharded(mesh, grid: ndt_grid.NDTGrid, points, mask,
                         width: int, height: int, axis: str = SPACE_AXIS):
    """Summed likelihood of world points against the sharded grid: scalar.

    Each device scores the points inside its stripe; one psum combines.
    """
    n_shards = mesh.shape[axis]
    h_loc = _stripe_params(height, n_shards)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    def _score(mean, info, count, org, cs, pts, msk):
        i = jax.lax.axis_index(axis)
        ix, iy = ndt_grid.cell_ij(org, cs, pts)
        row0 = i * h_loc
        valid = (msk & (ix >= 0) & (ix < width)
                 & (iy >= row0) & (iy < row0 + h_loc))
        flat = (jnp.clip(iy - row0, 0, h_loc - 1) * width
                + jnp.clip(ix, 0, width - 1))
        s = ndt_grid.score_at_cells(mean, info, count, pts, valid, flat)
        return jax.lax.psum(jnp.sum(s), axis)

    return _score(grid.mean, grid.information, grid.count, grid.origin,
                  grid.cell_size, points, mask)


def score_particles_sharded_map(config: ScanMatcherConfig, mesh,
                                grid: ndt_grid.NDTGrid, points, point_mask,
                                num_points, particle_poses,
                                space_axis: str = SPACE_AXIS,
                                batch_axis: str = "batch"):
    """Particle measurement over BOTH mesh axes: particles sharded over
    ``batch``, map stripes over ``space``.

    The district-localization kernel: every device scores its particle shard
    against its map stripe; one psum over ``space`` completes each
    particle's score.  Returns [N] mean negative scores (the PF weight
    convention, particle_filter.cpp:84-88), sharded over ``batch``.

    ``particle_poses`` [N, 3] with N divisible by the batch shard count.
    """
    n_batch = mesh.shape[batch_axis]
    if particle_poses.shape[0] % n_batch:
        raise ValueError(
            f"particle count {particle_poses.shape[0]} must divide the "
            f"{batch_axis!r} shard count {n_batch}")
    W, H = config.grid_cells_x, config.grid_cells_y
    h_loc = _stripe_params(H, mesh.shape[space_axis])
    B = config.laser_max_beams
    spts, smask, used = ndt_matcher.subsample(points, point_mask, num_points,
                                              B)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(space_axis), P(space_axis), P(space_axis),
                  P(), P(), P(), P(), P(batch_axis)),
        out_specs=P(batch_axis), check_vma=False)
    def _measure(mean, info, count, org, cs, sp, sm, poses):
        i = jax.lax.axis_index(space_axis)
        row0 = i * h_loc
        c, s = jnp.cos(poses[:, 2])[:, None], jnp.sin(poses[:, 2])[:, None]
        px, py = sp[:, 0][None, :], sp[:, 1][None, :]
        wx = c * px - s * py + poses[:, 0:1]              # [n_loc, B]
        wy = s * px + c * py + poses[:, 1:2]
        pts = jnp.stack([wx, wy], axis=-1)
        ix, iy = ndt_grid.cell_ij(org, cs, pts)
        valid = (sm[None, :] & (ix >= 0) & (ix < W)
                 & (iy >= row0) & (iy < row0 + h_loc))
        flat = (jnp.clip(iy - row0, 0, h_loc - 1) * W
                + jnp.clip(ix, 0, W - 1))
        sc = ndt_grid.score_at_cells(mean, info, count, pts, valid, flat)
        partial = -jnp.sum(sc, axis=-1)                   # [n_loc]
        total = jax.lax.psum(partial, space_axis)
        return total / jnp.maximum(used, 1).astype(sp.dtype)

    return _measure(grid.mean, grid.information, grid.count, grid.origin,
                    grid.cell_size, spts, smask, particle_poses)


def match_scan_sharded_map(config: ScanMatcherConfig, mesh,
                           grid: ndt_grid.NDTGrid, points, point_mask,
                           num_points, pose, axis: str = SPACE_AXIS
                           ) -> ndt_matcher.MatchResult:
    """matchScan against a spatially-sharded map NDT.

    Every device evaluates the full candidate lattice against ITS stripe
    (the per-candidate partial likelihood sums), one psum combines the
    [A, L, L] score field, and the argmin + Olson covariance reduction runs
    replicated — bitwise the same result as the dense matcher.
    """
    n_shards = mesh.shape[axis]
    W, H = config.grid_cells_x, config.grid_cells_y
    h_loc = _stripe_params(H, n_shards)
    B = config.laser_max_beams
    spts, smask, used = ndt_matcher.subsample(points, point_mask, num_points,
                                              B)
    dths, dls = ndt_matcher._search_offsets(config, spts.dtype)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)
    def _cand(mean, info, count, org, cs, sp, sm, ps):
        i = jax.lax.axis_index(axis)
        row0 = i * h_loc
        # Candidate world positions [A, L(dx), L(dy), B] (the general
        # gather path, matcher._candidate_scores_gather), bound to this
        # device's stripe via GLOBAL indices.
        th = ps[2] + dths
        c_, s_ = jnp.cos(th)[:, None], jnp.sin(th)[:, None]
        px, py = sp[:, 0][None, :], sp[:, 1][None, :]
        rx = c_ * px - s_ * py + ps[0]
        ry = s_ * px + c_ * py + ps[1]
        wx = rx[:, None, None, :] + dls[None, :, None, None]
        wy = ry[:, None, None, :] + dls[None, None, :, None]
        pts = jnp.stack(jnp.broadcast_arrays(wx, wy), axis=-1)
        ix, iy = ndt_grid.cell_ij(org, cs, pts)
        valid = (sm[None, None, None, :] & (ix >= 0) & (ix < W)
                 & (iy >= row0) & (iy < row0 + h_loc))
        flat = (jnp.clip(iy - row0, 0, h_loc - 1) * W
                + jnp.clip(ix, 0, W - 1))
        scores = ndt_grid.score_at_cells(mean, info, count, pts, valid, flat)
        return jax.lax.psum(-jnp.sum(scores, axis=-1), axis)

    cand = _cand(grid.mean, grid.information, grid.count, grid.origin,
                 grid.cell_size, spts, smask, pose)
    best, correction, k, u, s = ndt_matcher.reduce_candidates(cand, dths, dls)
    return ndt_matcher.finalize_match(best, correction, k, u, s, used)
