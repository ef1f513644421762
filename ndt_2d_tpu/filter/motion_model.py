"""Sample-based odometry motion model, fully vectorized.

The reference (src/motion_model.cpp:45-83, Probabilistic Robotics ch.5)
decomposes the relative motion into rotate-translate-rotate, guards against
reverse motion, and draws per-particle Gaussian samples with std::mt19937.
Here the whole particle set samples in one ``jax.random.normal`` call with an
explicit PRNG key.

Note: alpha5 is stored but unused by the reference sampler
(src/motion_model.cpp:60-66); we keep the same behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ndt_2d_tpu.core.pose import normalize_angle


def sample(key, poses, dx, dy, dth, a1, a2, a3, a4):
    """Propagate particles [M, 3] through the noisy motion model.

    Mirrors MotionModel::sample (src/motion_model.cpp:45-83).
    """
    trans = jnp.hypot(dx, dy)
    rot1 = jnp.where(trans > 0.01, jnp.arctan2(dy, dx), 0.0)
    # angle_diff(from, to) = normalize(to - from)
    rot2 = normalize_angle(dth - rot1)

    # Reverse-motion guard (src/motion_model.cpp:53-57).
    rot1_ = jnp.minimum(jnp.abs(normalize_angle(-rot1)),
                        jnp.abs(normalize_angle(jnp.pi - rot1)))
    rot2_ = jnp.minimum(jnp.abs(normalize_angle(-rot2)),
                        jnp.abs(normalize_angle(jnp.pi - rot2)))

    sigma_rot1 = jnp.sqrt(a1 * rot1_ * rot1_ + a2 * trans * trans)
    sigma_trans = jnp.sqrt(a3 * trans * trans
                           + a4 * rot1_ * rot1_ + a4 * rot2_ * rot2_)
    sigma_rot2 = jnp.sqrt(a1 * rot2_ * rot2_ + a2 * trans * trans)

    m = poses.shape[0]
    noise = jax.random.normal(key, (m, 3), poses.dtype)
    r1 = rot1 + noise[:, 0] * sigma_rot1
    t = trans + noise[:, 1] * sigma_trans
    r2 = rot2 + noise[:, 2] * sigma_rot2

    x = poses[:, 0] + t * jnp.cos(poses[:, 2] + r1)
    y = poses[:, 1] + t * jnp.sin(poses[:, 2] + r1)
    th = normalize_angle(poses[:, 2] + r1 + r2)
    return jnp.stack([x, y, th], axis=-1)
