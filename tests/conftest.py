"""Test harness config: run on CPU with a virtual 8-device mesh.

Multi-chip sharding tests run on virtual CPU devices (SURVEY.md §4); these
env vars must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pre-sets jax_platforms before conftest runs;
# override via config (env var alone is read too early to help).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
