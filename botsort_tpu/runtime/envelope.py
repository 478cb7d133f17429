"""Measured per-chip serving envelope, keyed by operating point.

The reference is strictly one-process/one-GPU/one-stream (SURVEY.md §2;
its README pitches a single RTX-30xx holding ~30 FPS). Our serving
topology batches B streams through one chip (pipeline/frame_step.py::
frame_step_batched); this module records what one chip has actually
been measured to sustain so the serving CLIs can enforce a real-time
envelope instead of silently degrading every stream.

One constant was not enough (VERDICT r3): BASELINE config 5 pairs
8x1080p streams with the mot20 384x128 body-ReID geometry, which is a
1.5x ReID pixel load and a measurably lower aggregate than the default
256x128 point. The envelope is therefore keyed by
``body_reid_input_hw``; unmeasured points interpolate linearly in ReID
pixel count between the measured ones (clamped at the ends — larger
crops never get credited with more throughput).

Numbers come from the last bench run (bench.py
``batched_8stream_aggregate_fps`` / ``batched_8stream_mot20_384_fps``;
method + history in docs/PERF.md). Update them when the bench moves —
the bench prints both every round (BENCH_r*.json).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

# v5e single chip, b=8 streams, 16-det scenes, bf16, keyed by body-ReID
# input (driver-measured BENCH_r03.json; update from BENCH_r04 when the
# lockstep-cascade numbers land).
MEASURED_AGGREGATE_FPS = {
    (256, 128): 221.9,   # batched_8stream_aggregate_fps
    (384, 128): 175.9,   # batched_8stream_mot20_384_fps (BASELINE cfg 5)
}
DEFAULT_POINT = (256, 128)

_ENV_OVERRIDE = "BOTSORT_TPU_AGGREGATE_FPS"


def aggregate_fps(
        body_reid_input_hw: Tuple[int, int] = DEFAULT_POINT) -> float:
    """Measured per-chip aggregate FPS at the given body-ReID operating
    point (env-overridable for tests / other chip generations)."""
    raw = os.environ.get(_ENV_OVERRIDE)
    if raw:
        try:
            return float(raw)
        except ValueError:
            pass
    hw = tuple(body_reid_input_hw)
    if hw in MEASURED_AGGREGATE_FPS:
        return MEASURED_AGGREGATE_FPS[hw]
    # Interpolate in ReID pixel count, clamped to the measured range.
    pts = sorted((h * w, fps) for (h, w), fps
                 in MEASURED_AGGREGATE_FPS.items())
    px = hw[0] * hw[1]
    if px <= pts[0][0]:
        return pts[0][1]
    if px >= pts[-1][0]:
        return pts[-1][1]
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        if x0 <= px <= x1:
            t = (px - x0) / (x1 - x0)
            return y0 + t * (y1 - y0)
    return pts[-1][1]  # unreachable


def max_realtime_streams(
        per_stream_fps: float = 30.0,
        body_reid_input_hw: Tuple[int, int] = DEFAULT_POINT) -> int:
    """How many streams one chip holds at ``per_stream_fps`` each."""
    return max(int(aggregate_fps(body_reid_input_hw) // per_stream_fps),
               1)


def stream_envelope_warning(
        n_streams: int, backend: str, per_stream_fps: float = 30.0,
        body_reid_input_hw: Optional[Tuple[int, int]] = None):
    """Warning string when ``n_streams`` exceeds the measured per-chip
    real-time envelope at this operating point, else None.

    Only the TPU backend has a measured envelope (CPU is a functional
    path, not a serving target); the env override applies regardless so
    tests and other deployments can exercise the check.
    """
    if backend != "tpu" and not os.environ.get(_ENV_OVERRIDE):
        return None
    hw = tuple(body_reid_input_hw or DEFAULT_POINT)
    cap = max_realtime_streams(per_stream_fps, hw)
    if n_streams <= cap:
        return None
    chips = math.ceil(n_streams / cap)
    return (
        f"WARNING: {n_streams} streams exceed the measured single-chip "
        f"real-time envelope at ReID {hw[0]}x{hw[1]} "
        f"({cap} streams at {per_stream_fps:.0f} FPS/stream from "
        f"{aggregate_fps(hw):.0f} FPS aggregate, docs/PERF.md); expect "
        f"<{per_stream_fps:.0f} FPS/stream. Shard across {chips} chips "
        f"(examples/multi_stream.py) or accept the degraded rate."
    )
