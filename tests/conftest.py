"""Test configuration: CPU backend, 8 virtual devices, float64.

Unit tests run the full TPU code paths on the CPU backend (the axon TPU
tunnel is reserved for benchmarks); an 8-device virtual mesh exercises the
sample-sharded collectives without hardware, per SURVEY.md section 4's
"multi-node without a cluster" strategy.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the suite is compile-dominated (each jitted
# FEM/solver program costs seconds); repeat runs hit the cache and the full
# suite drops from ~18 min to a few minutes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "HIPPYFLOW_TEST_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
