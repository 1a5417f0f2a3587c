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

# The suite is compile-bound (2 host cores, 8 virtual devices): cache
# compiled executables across runs so re-runs are cheap.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/arendur_jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass
