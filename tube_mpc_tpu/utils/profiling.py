"""Profiling / tracing utilities (SURVEY.md §5: the reference has none — prints only).

- `trace(dir)`: context manager around jax.profiler.trace — produces a TensorBoard-
  loadable XLA trace of everything executed inside (kernel timings, fusion layout).
- `Timer`: lightweight named phase timer with block_until_ready barriers, for
  per-phase wall-clock breakdowns (compile vs. steady-state, solve vs. gradient).
- `annotate(name)`: TraceAnnotation wrapper so custom phases show up in the trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Named wall-clock phases with device synchronization.

        timer = Timer()
        with timer.phase("compile"):
            out = fn(x)        # first call
        with timer.phase("steady"):
            out = fn(x)
        print(timer.report())
    """

    def __init__(self) -> None:
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.times.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} total={total * 1e3:9.2f}ms  n={n}  mean={total / n * 1e3:9.2f}ms")
        return "\n".join(lines)
