"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
xla_force_host_platform_device_count (the bench path still runs on the real
chip outside the test suite).  Note: the axon TPU plugin overrides the
JAX_PLATFORMS env var, so the platform must be forced through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
