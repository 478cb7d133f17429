"""Per-stage timing + jax profiler hooks.

The reference's only instrumentation is one perf_counter around
``botsort.update`` rendered onto the frame (demo_bottrack_onnx_tflite.py:
2129-2133). Here: a stage-timer registry for host-visible breakdowns plus
an opt-in jax.profiler trace for device-level analysis (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


class StageTimers:
    """Accumulates wall-clock per named stage; report() -> ms averages."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, float]:
        return {
            name: 1000.0 * self.totals[name] / max(self.counts[name], 1)
            for name in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace for TensorBoard / xprof (opt-in)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
