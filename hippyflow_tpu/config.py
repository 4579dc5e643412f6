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


# ---------------------------------------------------------------------------
# Mixed-precision banded-solve policy (VERDICT r3 item 1)
# ---------------------------------------------------------------------------
# On v5e every f32 matmul at the session default precision 'highest' is
# emulated with 6 bf16 MXU passes.  The banded factorizations/back-solves
# (`ops/structured.py`) tolerate fewer passes: their matmuls can run at
# 'high' (3 passes, ~2e-6 effective epsilon) or 'default' (1 pass) with the
# lost accuracy recovered by iterative refinement — each sweep computes the
# residual with the banded matvec at 'highest' and re-solves for the
# correction (backward-stable: the refined solve is as accurate as the
# residual evaluation).  Newton forward solves additionally self-correct.
#
# Policy is trace-time global state (read inside the factorize/solve
# functions), defaulting to exact ('highest', 0 sweeps) so CPU tests and
# f64 parity runs are unaffected.  Bench lanes opt in per-run.  The
# library's program caches (`models.sampling._jit_cache`) key every entry
# on the CURRENT (precision, refine_steps) pair, so changing the policy
# after programs have been traced re-traces rather than silently reusing
# stale-precision executables.  Raw `jax.jit` users must still set the
# policy before tracing.
_solver_precision: str | None = None  # None = inherit the session default
_solver_refine_steps: int = 0


def set_solver_precision(precision: str | None = None, refine_steps: int = 0):
    """Set the matmul precision used INSIDE banded factorize/solve ops and
    the number of iterative-refinement sweeps wrapped around their solves.

    precision in {None (inherit), 'highest', 'high', 'default'};
    refine_steps >= 0.  Returns the previous (precision, refine_steps) pair
    so callers can restore it."""
    global _solver_precision, _solver_refine_steps
    assert precision in (None, "highest", "high", "default")
    prev = (_solver_precision, _solver_refine_steps)
    _solver_precision = precision
    _solver_refine_steps = int(refine_steps)
    return prev


def solver_precision() -> str | None:
    return _solver_precision


def solver_refine_steps() -> int:
    return _solver_refine_steps


# ---------------------------------------------------------------------------
# Parallel program pre-compilation (VERDICT r3 item 3: first-run compile time)
# ---------------------------------------------------------------------------
# The pipeline's XLA programs (coarse warm-start chain, fine Newton solve,
# Jacobian materialization, randomized GHEP) are independent; compiling them
# serially — the natural consequence of execute-to-compile warmup — costs
# their SUM (530 s cold at nx=192 over the axon remote-compile tunnel) when
# the wall-clock floor is their MAX.  `precompile_parallel` overlaps them in
# threads.  Opt-out knob for transports that serialize or reject concurrent
# compile requests.
_parallel_precompile: bool = True


def set_parallel_precompile(enabled: bool) -> bool:
    """Enable/disable threaded AOT pre-compilation of independent pipeline
    programs (returns the previous setting).  Env override:
    HF_PARALLEL_PRECOMPILE=0 disables regardless."""
    global _parallel_precompile
    prev = _parallel_precompile
    _parallel_precompile = bool(enabled)
    return prev


def parallel_precompile() -> bool:
    import os

    if os.environ.get("HF_PARALLEL_PRECOMPILE", "") == "0":
        return False
    return _parallel_precompile


# ---------------------------------------------------------------------------
# Fused Pallas banded back-solve (VERDICT r4 item 4)
# ---------------------------------------------------------------------------
# Routes `InverseThomasFactor.solve` through the fused Pallas sweep kernels
# (`ops/pallas_kernels.banded_solve_batch`) instead of the 2*nb-step XLA
# scan.  'auto' (default) enables it on the TPU backend for multi-rhs solves
# (k >= 8: the Jacobian/adjoint stages), where the scan is latency-bound;
# 'on' forces it for every batched solve on TPU; 'off' disables.  CPU
# backends always use the scan (the kernels run there only in interpret
# mode, via tests).  Trace-time state: program caches key on it.
_pallas_band_solve: str = "auto"


def set_pallas_band_solve(mode: str) -> str:
    assert mode in ("auto", "on", "off")
    global _pallas_band_solve
    prev = _pallas_band_solve
    _pallas_band_solve = mode
    return prev


def pallas_band_solve() -> str:
    import os

    env = os.environ.get("HF_PALLAS_BAND_SOLVE", "")
    if env in ("auto", "on", "off"):
        return env
    return _pallas_band_solve


# Block-size ceiling for the fused band kernels.  Their in-kernel blocked
# Gauss-Jordan unrolls ~s elimination steps into the Mosaic program
# (`ops/pallas_kernels._gj_invert_ref`), so compile time grows linearly in
# s: measured fine through s=193 (nx=192 lane, probe_pallas_band.py) but
# pathological at the helmholtz lane's s=516 (>25 min remote compile vs the
# scan path's 49 s round-4 lane).  Above the cap the XLA-scan solve runs —
# at s=516 each scan step is already a well-shaped 516x516 matmul batch, so
# the latency argument for fusing is weak there anyway.
_pallas_band_max_block: int = 256


def set_pallas_band_max_block(s: int) -> int:
    global _pallas_band_max_block
    prev = _pallas_band_max_block
    _pallas_band_max_block = int(s)
    return prev


def pallas_band_max_block() -> int:
    import os

    env = os.environ.get("HF_PALLAS_BAND_MAX_BLOCK", "")
    if env:
        return int(env)
    return _pallas_band_max_block


def default_dtype():
    """Library default floating dtype: f64 when x64 is enabled, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_int_dtype():
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
