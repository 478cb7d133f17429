"""Measured per-chip serving envelope.

The reference is strictly one-process/one-GPU/one-stream (SURVEY.md §2;
its README pitches a single RTX-30xx holding ~30 FPS). Our serving
topology batches B streams through one chip (pipeline/frame_step.py::
frame_step_batched); this module records what one chip has actually
been measured to sustain so the serving CLIs can enforce a real-time
envelope instead of silently degrading every stream.

``MEASURED_AGGREGATE_FPS`` is the single-v5e aggregate throughput at
the reference-typical moderate-16 operating point, taken from the last
bench run (bench.py ``batched_8stream_aggregate_fps``; method +
history in docs/PERF.md). Update it when the bench moves — the bench
prints the live number every round (BENCH_r*.json).
"""

from __future__ import annotations

import math
import os

# v5e single chip, b=8 streams, 16-det scenes, bf16 (BENCH round 3).
MEASURED_AGGREGATE_FPS = 221.9

_ENV_OVERRIDE = "BOTSORT_TPU_AGGREGATE_FPS"


def aggregate_fps() -> float:
    """Measured per-chip aggregate FPS (env-overridable for tests /
    other chip generations)."""
    raw = os.environ.get(_ENV_OVERRIDE)
    if raw:
        try:
            return float(raw)
        except ValueError:
            pass
    return MEASURED_AGGREGATE_FPS


def max_realtime_streams(per_stream_fps: float = 30.0) -> int:
    """How many streams one chip holds at ``per_stream_fps`` each."""
    return max(int(aggregate_fps() // per_stream_fps), 1)


def stream_envelope_warning(n_streams: int, backend: str,
                            per_stream_fps: float = 30.0):
    """Warning string when ``n_streams`` exceeds the measured per-chip
    real-time envelope, else None.

    Only the TPU backend has a measured envelope (CPU is a functional
    path, not a serving target); the env override applies regardless so
    tests and other deployments can exercise the check.
    """
    if backend != "tpu" and not os.environ.get(_ENV_OVERRIDE):
        return None
    cap = max_realtime_streams(per_stream_fps)
    if n_streams <= cap:
        return None
    chips = math.ceil(n_streams / cap)
    return (
        f"WARNING: {n_streams} streams exceed the measured single-chip "
        f"real-time envelope ({cap} streams at {per_stream_fps:.0f} "
        f"FPS/stream from {aggregate_fps():.0f} FPS aggregate, "
        f"docs/PERF.md); expect <{per_stream_fps:.0f} FPS/stream. "
        f"Shard across {chips} chips (examples/multi_stream.py) or "
        f"accept the degraded rate."
    )
