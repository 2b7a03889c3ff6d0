"""Tracing/profiling hooks (SURVEY.md §5: the reference has none beyond
perf_counter timing; here: jax.profiler traces + throughput counters).

Usage:
    with trace("/tmp/tb"):          # XLA trace viewable in TensorBoard/Perfetto
        run_generation(...)

    tm = Throughput()
    tm.tick(n_env_steps)            # call per generation
    tm.rate()                       # env-steps/s over the window
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; safe no-op if the profiler is unavailable."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """TraceAnnotation context for labeling regions inside traces."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:
        return contextlib.nullcontext()


class Throughput:
    """Sliding-window steps/s counter."""

    def __init__(self, window: int = 20):
        self.window = window
        self.samples: list[tuple[float, float]] = []

    def tick(self, n_steps: float):
        self.samples.append((time.perf_counter(), float(n_steps)))
        if len(self.samples) > self.window:
            self.samples.pop(0)

    def rate(self) -> float:
        if len(self.samples) < 2:
            return 0.0
        dt = self.samples[-1][0] - self.samples[0][0]
        steps = sum(s for _, s in self.samples[1:])
        return steps / dt if dt > 0 else 0.0
