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
