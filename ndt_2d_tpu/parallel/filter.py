"""Multi-device particle-filter measurement: particles sharded over ``batch``.

The measurement model (scorePoints per particle against the global NDT,
particle_filter.cpp:78-89) is pure data parallelism: each device scores its
particle shard against a replicated NDT grid; no collectives are needed until
the statistics reduce (which psums three scalars).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching import matcher
from ndt_2d_tpu.parallel.mesh import BATCH_AXIS


@functools.partial(jax.jit, static_argnames=("config", "mesh", "axis"))
def measure_multichip(config: ScanMatcherConfig, mesh, grid, points,
                      point_mask, num_points, particles,
                      axis: str = BATCH_AXIS):
    """[M] measurement scores with the particle axis sharded over the mesh.

    ``particles.shape[0]`` must divide evenly by ``mesh.shape[axis]`` (pad
    with masked particles otherwise).
    """
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, rep, rep, P(axis)),
        out_specs=P(axis), check_vma=False)
    def _measure(grid_, pts, msk, n, parts):
        return matcher.score_points_batch(config, grid_, pts, msk, n, parts)

    return _measure(grid, points, point_mask, num_points, particles)
