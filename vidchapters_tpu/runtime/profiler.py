"""Profiling + step timing.

TPU-native upgrade of the reference's ad-hoc timers (util/metrics.py:109-180
iter/data timers + torch.cuda.max_memory_allocated; moment_detr
train.py:46-73 phase timers): a ``StepTimer`` with named phases, a
``trace`` context manager around ``jax.profiler`` for real XLA traces
(viewable in TensorBoard/XProf), and device-memory introspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StepTimer:
    """Accumulates wall time per named phase; matches the reference's
    dataloading/forward/backward breakdown."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def averages(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def summary(self) -> str:
        return "  ".join(f"{k}: {v * 1000:.1f}ms"
                         for k, v in self.averages().items())


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """XLA profiler trace (jax.profiler.start_trace/stop_trace)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, int]:
    """Per-device memory stats where the backend exposes them (the analog of
    torch.cuda.max_memory_allocated at util/metrics.py:175)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
