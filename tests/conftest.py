"""Test configuration: CPU backend with 8 virtual devices so that the
multi-chip sharding paths (mesh/pjit/shard_map) are exercised without TPU
hardware, and float64 enabled for reference-parity numerics."""
import os

# force CPU: the shell exports JAX_PLATFORMS=axon (TPU tunnel) which would
# route every test compile through the remote TPU compiler
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: XLA-CPU compiles cost ~1s/op on this host;
# caching them across pytest runs keeps the suite fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
