"""SE(2) pose utilities (batched, jit-friendly).

The reference represents a pose as ``Pose2d{x, y, theta}``
(include/ndt_2d/pose_2d.hpp:35-55).  Here a pose is a ``[..., 3]`` array of
``(x, y, theta)`` so every operation vectorizes over arbitrary batch
dimensions on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def normalize_angle(theta):
    """Normalize angle(s) to [-pi, pi).

    Matches ``NormalizeAngle`` in the reference solver
    (include/ndt_2d/ceres_solver_pose.hpp:59-65) and
    ``angles::normalize_angle`` used throughout the mapper.
    """
    return theta - TWO_PI * jnp.floor((theta + jnp.pi) / TWO_PI)


def shortest_angular_distance(frm, to):
    """normalize(to - frm); matches angles::shortest_angular_distance."""
    return normalize_angle(to - frm)


def rotation_matrix(theta):
    """[..., 2, 2] rotation matrix for angle(s) theta."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2)


def rotate(theta, points):
    """Rotate [..., 2] points by angle(s) theta (broadcasting)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = points[..., 0], points[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def transform_points(pose, points):
    """Apply SE(2) pose [..., 3] to robot-frame points [..., P, 2].

    World point = R(theta) p + (x, y); the same math as the reference's
    NDT::addScan point transform (src/ndt_model.cpp:135-143).  The pose's
    batch dims broadcast against the points' batch dims.
    """
    return rotate(pose[..., 2:3], points) + pose[..., None, :2]


def compose(a, b):
    """Pose composition a*b: apply b in a's frame. [..., 3] each."""
    xy = rotate(a[..., 2], b[..., :2]) + a[..., :2]
    th = a[..., 2] + b[..., 2]
    return jnp.concatenate([xy, th[..., None]], axis=-1)


def inverse(pose):
    """SE(2) inverse of [..., 3] pose."""
    th = pose[..., 2]
    xy = -rotate(-th, pose[..., :2])
    return jnp.concatenate([xy, -th[..., None]], axis=-1)


def relative(frm, to):
    """Relative transform of ``to`` expressed in ``frm``'s frame.

    Matches makeConstraint's delta computation (src/constraint.cpp:42-50):
    rotate the world-frame delta into frm's frame; theta is the *raw*
    (unnormalized) difference, as in the reference.
    """
    d = to[..., :2] - frm[..., :2]
    xy = rotate(-frm[..., 2], d)
    th = to[..., 2] - frm[..., 2]
    return jnp.concatenate([xy, th[..., None]], axis=-1)
