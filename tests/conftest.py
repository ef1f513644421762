"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the driver separately dry-runs the
multi-chip path, and benchmarks run on the real TPU chip.

Note: the environment pre-imports jax and pins JAX_PLATFORMS to the TPU
backend, so we must override via jax.config before any backend initializes
(env-var edits alone are too late).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
