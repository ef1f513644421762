"""Pose-graph constraint batch pytree.

The reference represents a pose-graph edge as ``Constraint{begin, end,
transform(3), information(3x3), switchable}`` (include/ndt_2d/constraint.hpp:39-48)
with the factory ``makeConstraint`` (src/constraint.cpp:35-56).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ndt_2d_tpu.core import pose as pose_ops


class ConstraintBatch(NamedTuple):
    """Padded batch of constraints.

    Attributes:
      begin:        [C] int32 scan id of the 'from' node.
      end:          [C] int32 scan id of the 'to' node.
      transform:    [C, 3] relative (dx, dy, dtheta) in begin's frame.
      information:  [C, 3, 3] information (inverse covariance) matrix.
      switchable:   [C] bool; True for loop-closure edges.
      num:          scalar int32 count of live constraints.
    """

    begin: jnp.ndarray
    end: jnp.ndarray
    transform: jnp.ndarray
    information: jnp.ndarray
    switchable: jnp.ndarray
    num: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.begin.shape[0]

    @property
    def mask(self):
        return jnp.arange(self.capacity) < self.num


def empty_constraint_batch(capacity: int, dtype=jnp.float32) -> ConstraintBatch:
    return ConstraintBatch(
        begin=jnp.zeros((capacity,), jnp.int32),
        end=jnp.zeros((capacity,), jnp.int32),
        transform=jnp.zeros((capacity, 3), dtype),
        information=jnp.zeros((capacity, 3, 3), dtype),
        switchable=jnp.zeros((capacity,), jnp.bool_),
        num=jnp.zeros((), jnp.int32),
    )


def make_constraint(begin_id, end_id, begin_pose, end_pose, covariance,
                    switchable=False):
    """Build one constraint; mirrors makeConstraint (src/constraint.cpp:35-56).

    The relative transform rotates the world-frame delta into begin's frame;
    theta is the raw pose difference (unnormalized, as in the reference).
    The information matrix is the inverse of the supplied covariance.

    Returns (begin, end, transform[3], information[3,3], switchable).
    """
    transform = pose_ops.relative(begin_pose, end_pose)
    information = jnp.linalg.inv(covariance)
    return (jnp.asarray(begin_id, jnp.int32), jnp.asarray(end_id, jnp.int32),
            transform, information, jnp.asarray(switchable, jnp.bool_))


def append_constraint(batch: ConstraintBatch, begin_id, end_id, transform,
                      information, switchable) -> ConstraintBatch:
    i = batch.num
    return ConstraintBatch(
        begin=batch.begin.at[i].set(begin_id),
        end=batch.end.at[i].set(end_id),
        transform=batch.transform.at[i].set(transform),
        information=batch.information.at[i].set(information),
        switchable=batch.switchable.at[i].set(switchable),
        num=i + 1,
    )
