"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding tests run against ``xla_force_host_platform_device_count``
per the build environment contract (no multi-chip TPU hardware available).
"""

import os

# The harness presets JAX_PLATFORMS=axon (TPU); tests must run on CPU with a
# virtual 8-device mesh, so force it. The axon sitecustomize registers the
# TPU backend before conftest runs, so the env var alone is not enough —
# jax.config must be updated too (before any jax computation).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
