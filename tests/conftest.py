"""Test configuration: run everything on an 8-device virtual CPU mesh.

The image's sitecustomize pre-imports jax and registers the axon TPU
backend, so env vars alone don't steer platform selection — use
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
