"""Global configuration for hippyflow_tpu.

Numerics policy
---------------
The library is dtype-parametric everywhere. On CPU (unit tests, parity runs
against the hIPPYlib reference semantics) we run with ``jax_enable_x64`` for
float64; on TPU the default compute dtype is float32 with float64 emulation
available only where XLA supports it. Call :func:`enable_x64` before any jax
computation for parity-accurate runs.

Reference: hippylib drives all spectral computations in PETSc double
precision; the accuracy baselines in the reference test-suite
(`hippyflow/test/test_KLEProjector.py:92`) assume f64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_x64() -> None:
    """Enable 64-bit mode (call before any computation)."""
    jax.config.update("jax_enable_x64", True)


def default_dtype():
    """Library default floating dtype: f64 when x64 is enabled, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_int_dtype():
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
