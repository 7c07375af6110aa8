"""Profiling as a first-class module (the reference has only ad-hoc wall
clocks and a commented-out autograd profiler — SURVEY.md §5): named phase
timers with block_until_ready-accurate device timing, and a thin wrapper
over jax.profiler for XLA traces."""
import time
from collections import defaultdict
from contextlib import contextmanager

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; device work is fenced so the
    numbers mean what they say."""

    def __init__(self, sync: bool = True):
        self.totals = defaultdict(float)
        self.cpu_totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.sync = sync

    @contextmanager
    def phase(self, name, fence=None):
        t0 = time.perf_counter()
        c0 = time.thread_time()
        try:
            yield
        finally:
            if fence is not None and self.sync:
                jax.block_until_ready(fence)
            self.cpu_totals[name] += time.thread_time() - c0
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self):
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            c = self.cpu_totals[name]
            lines.append(f"{name}: {t:.3f}s total, {t / n * 1000:.1f}ms/call x{n}"
                         f" (cpu {c / n * 1000:.1f}ms/call)")
        return "\n".join(lines)

    def stats(self):
        """Programmatic phase stats (consumers must not scrape report() —
        its human format changes): {phase: {total_s, ms_per_call,
        cpu_ms_per_call, count}}."""
        return {name: {
            "total_s": self.totals[name],
            "ms_per_call": self.totals[name] / self.counts[name] * 1000.0,
            "cpu_ms_per_call": self.cpu_totals[name] / self.counts[name] * 1000.0,
            "count": self.counts[name],
        } for name in self.totals}

    def add(self, name, seconds, cpu_seconds=0.0):
        """Record one pre-measured interval (for regions that can't nest a
        context manager, e.g. a loop timed across restructure-hostile code)."""
        self.totals[name] += seconds
        self.cpu_totals[name] += cpu_seconds
        self.counts[name] += 1

    def reset(self):
        self.totals.clear()
        self.cpu_totals.clear()
        self.counts.clear()


@contextmanager
def xla_trace(log_dir):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
