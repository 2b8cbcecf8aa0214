"""Test configuration: CPU backend with 8 virtual devices so that the
multi-chip sharding paths (mesh/pjit/shard_map) are exercised without TPU
hardware, and float64 enabled for reference-parity numerics.

IMPORTANT (this host): the axon sitecustomize imports jax at interpreter
start, so JAX_PLATFORMS set via os.environ here is too late — the platform
must be forced through jax.config.  XLA_FLAGS is still read at backend
init, so the virtual device count works from the environment."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: XLA-CPU compiles cost ~1s/op on this host;
# caching them across pytest runs keeps the suite fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
