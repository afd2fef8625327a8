"""Tracing / profiling instrumentation (SURVEY §5.1).

The reference has no profiling beyond progress prints; here each pipeline
phase can be timed and annotated, with optional ``jax.profiler`` traces
for Perfetto/TensorBoard.  ``PhaseProfiler`` collects wall-clock plus
derived throughput (cells/s, permutations/s) — the numbers the benchmark
configs report.

Usage:
    prof = PhaseProfiler(enabled=True)
    with prof.phase("diffusion", cells=n_cells):
        ...
    prof.report()
"""

from __future__ import annotations

import contextlib
import time

import jax


class PhaseProfiler:
    """Per-phase wall-clock collection with optional XLA trace annotation."""

    def __init__(self, enabled: bool = True, trace_dir: str | None = None):
        self.enabled = enabled
        self.trace_dir = trace_dir
        self.phases: list[dict] = []
        self._tracing = False

    @contextlib.contextmanager
    def phase(self, name: str, **counters):
        """Time a pipeline phase; counters (e.g. cells=N) derive rates."""
        if not self.enabled:
            yield
            return
        ctx = (jax.profiler.TraceAnnotation(name)
               if self._tracing else contextlib.nullcontext())
        t0 = time.perf_counter()
        with ctx:
            yield
        dt = time.perf_counter() - t0
        rec = {"phase": name, "seconds": dt}
        for key, val in counters.items():
            rec[key] = val
            rec[f"{key}_per_s"] = val / dt if dt > 0 else float("inf")
        self.phases.append(rec)

    @contextlib.contextmanager
    def trace(self):
        """Capture a full device trace (viewable in Perfetto/TensorBoard)."""
        if not self.enabled or self.trace_dir is None:
            yield
            return
        jax.profiler.start_trace(self.trace_dir)
        self._tracing = True
        try:
            yield
        finally:
            self._tracing = False
            jax.profiler.stop_trace()

    def report(self, out=print):
        total = sum(p["seconds"] for p in self.phases)
        for p in self.phases:
            rates = "  ".join(
                f"{k[:-6]}/s={p[k]:.3g}" for k in p if k.endswith("_per_s"))
            out(f"  {p['phase']:<24s} {p['seconds']*1000:9.1f} ms  {rates}")
        out(f"  {'TOTAL':<24s} {total*1000:9.1f} ms")
        return self.phases


_GLOBAL = PhaseProfiler(enabled=False)


def global_profiler() -> PhaseProfiler:
    return _GLOBAL


def enable_profiling(trace_dir: str | None = None) -> PhaseProfiler:
    global _GLOBAL
    _GLOBAL = PhaseProfiler(enabled=True, trace_dir=trace_dir)
    return _GLOBAL
