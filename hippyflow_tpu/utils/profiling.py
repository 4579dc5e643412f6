"""Phase timing and TPU profiler integration.

The reference instruments with wall-clock deltas stored per phase and printed
per stage (`activeSubspaceProjector.py:471-473,836-845`, metadata.pkl in the
drivers — SURVEY.md section 5.1).  This module provides the same per-phase
timing dict plus optional `jax.profiler` traces for TensorBoard, the
TPU-native observability path.
"""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    """Accumulates named phase durations; prints like the reference when
    verbose.  ``.timings`` is the metadata dict drivers pickle."""

    def __init__(self, verbose: bool = False):
        self.timings: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        """Time a phase.  Pass the phase's output as ``block_on`` (or set it
        via ``set_result``) so async dispatch doesn't under-report."""
        t0 = time.time()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("result", block_on)
            if out is not None:
                import jax

                jax.block_until_ready(out)
            dt = time.time() - t0
            self.timings[name] = self.timings.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            if self.verbose:
                print(f"{name} took {dt:.3f}s")

    def report(self) -> str:
        lines = [
            f"{name:<40s} {t:>10.3f}s  (x{self.counts[name]})"
            for name, t in sorted(self.timings.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hippyflow_tpu_trace"):
    """jax.profiler trace context: view with TensorBoard's profile plugin.
    No-op if the profiler is unavailable on this backend."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        pass
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named profiler region (shows up in the TPU trace timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


# -- utilization / MFU ------------------------------------------------------

# Peak dense-matmul throughput per chip, TFLOP/s.  v5e ("v5 lite"): 197
# bf16 / ~99 with f32 accumulation; v4: 275/137.5.  Fallback covers CPU.
_PEAK_TFLOPS = {
    "v5 lite": 98.5,
    "v5e": 98.5,
    "v5p": 229.5,
    "v4": 137.5,
    "v6": 459.0,
}


def device_peak_tflops(device=None) -> float:
    """Best-effort peak (f32-accumulation) TFLOP/s of the current device."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, val in _PEAK_TFLOPS.items():
        if key in kind:
            return val
    return 1.0  # CPU-ish fallback; keeps ratios meaningful, not absolute


# Peak HBM bandwidth per chip, GB/s (public spec sheets).  The right
# roofline axis for this library: direct banded solves move their factors
# through HBM and deliberately MINIMIZE flops, so MFU is structurally tiny
# even at a bandwidth-saturated solve (SURVEY.md perf notes; PERF.md).
_PEAK_HBM_GBS = {
    "v5 lite": 819.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,
}


def device_peak_hbm_gbs(device=None) -> float:
    """Best-effort peak HBM GB/s of the current device."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, val in _PEAK_HBM_GBS.items():
        if key in kind:
            return val
    return 50.0  # CPU-ish fallback; keeps ratios meaningful, not absolute


def _cost_analysis(fn, *args) -> dict:
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        return dict(cost or {})
    except Exception:
        return {}


def flops_of(fn, *args) -> float:
    """XLA's own FLOP count for a jitted callable at these args.

    Uses the AOT path (`jax.jit(fn).lower(...).compile().cost_analysis()`),
    i.e. the post-optimization HLO — the honest numerator for MFU.
    Returns 0.0 when the backend reports no analysis.
    """
    return float(_cost_analysis(fn, *args).get("flops", 0.0))


def bytes_of(fn, *args) -> float:
    """XLA's post-optimization 'bytes accessed' for a jitted callable —
    the numerator for the HBM-bandwidth roofline.  Approximation caveats:
    fused intermediates never touch HBM (over-count) and operands reused
    across ops from caches are counted per use (over-count), while
    while-loop bodies are counted ONCE (under-count — scale by the trip
    count, as bench.py does for the Newton loop).  Returns 0.0 when the
    backend reports no analysis."""
    return float(_cost_analysis(fn, *args).get("bytes accessed", 0.0))


def mfu_report(fn, *args, iters: int = 3, name: str = "fn") -> dict:
    """Measure a jitted callable's achieved TFLOP/s and GB/s against the
    device's compute AND memory-bandwidth peaks.  For this library's
    banded direct solves the bandwidth axis is the binding roofline — the
    algorithms exist to minimize the flop axis.  The bytes numerator is
    XLA's "bytes accessed", which is NOT physical HBM traffic (fused
    intermediates and cache-resident reuse are over-counted, while-loop
    bodies counted once — see `bytes_of`), so the bandwidth ratio is
    published as `xla_bytes_ratio`, a diagnostic that can exceed 1.0, not
    a utilization.  For a true utilization use an analytic traffic model
    (e.g. `ops.structured.thomas_inv_bytes`).  Returns a dict (also
    printable): {flops, bytes, seconds, tflops, mfu, gbs,
    xla_bytes_ratio, device}."""
    import time as _time

    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = _time.time()
    for _ in range(iters):
        out = jfn(*args)
        jax.block_until_ready(out)
    dt = (_time.time() - t0) / iters
    cost = _cost_analysis(fn, *args)
    fl = float(cost.get("flops", 0.0))
    by = float(cost.get("bytes accessed", 0.0))
    peak = device_peak_tflops()
    peak_bw = device_peak_hbm_gbs()
    tflops = fl / dt / 1e12 if dt > 0 else 0.0
    gbs = by / dt / 1e9 if dt > 0 else 0.0
    return {
        "name": name,
        "flops": fl,
        "bytes": by,
        "seconds": dt,
        "tflops": tflops,
        "mfu": tflops / peak if peak else 0.0,
        "gbs": gbs,
        "xla_bytes_ratio": gbs / peak_bw if peak_bw else 0.0,
        "device": str(jax.devices()[0]),
    }
