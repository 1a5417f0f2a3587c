"""Test configuration: force CPU with 8 virtual devices so sharding
tests run anywhere (ref build plan: SURVEY.md §7 M6)."""

import os

# The image's sitecustomize registers the axon TPU backend in every
# interpreter and pins JAX_PLATFORMS=axon, so the env var alone is not
# enough — jax.config must be updated after import.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
