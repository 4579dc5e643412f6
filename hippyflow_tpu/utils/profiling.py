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
