"""Test configuration: run everything on an 8-device virtual CPU mesh.

The image's sitecustomize pre-imports jax and registers the axon TPU
backend, so env vars alone don't steer platform selection — use
jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    # tests are compile-bound on the single CPU core; O0 cuts the heavy
    # model-graph compiles ~5x (131 s -> 26 s measured) without touching
    # numerics-sensitive paths (tolerance-based oracles still pass)
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
