"""One-off: tune the batched step at the mot20 384x128 ReID geometry.

BASELINE config 5 at its literal operating point (8 streams, body ReID
384x128) measured 206.4 aggregate in BENCH_r04 — short of the >=240
real-time bar the 256x128 point clears. Every prior lowering decision
(dgfa stage set, stream batch b) was tuned at 256x128; this sweep
re-tunes them at the 1.5x ReID pixel load.

Run alone on the TPU (CLAUDE.md: never two TPU processes).
  python tools/sweep384.py [dgfa|b|both]
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import run_batched, tunnel_floor_s
    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.pipeline.frame_step import ModelBundle
    from botsort_tpu.runtime.assets import build_bundle
    from botsort_tpu.runtime.device import setup_compilation_cache
    from botsort_tpu.track.state import empty_store

    setup_compilation_cache()
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    nms_cfg = NMSConfig()
    pipe_384 = dataclasses.replace(
        PipelineConfig(), body_reid_input_hw=(384, 128))
    # Matches bench.py's moderate_cfg exactly (loaded_cfg + max_dets=16)
    # so the winner transfers to the driver's measurement verbatim.
    moderate_cfg = dataclasses.replace(
        TrackerConfig(det_score_threshold=0.2, track_high_thresh=0.15,
                      track_low_thresh=0.05, new_track_thresh=0.2),
        max_dets=16)
    bundle = build_bundle(weights_dir="weights", fake_params=True)
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)
              for _ in range(4)]
    floor = tunnel_floor_s()
    print(json.dumps({"floor_ms": round(floor * 1e3, 1)}), flush=True)

    def with_dgfa(stages):
        return ModelBundle(
            bundle.detector, bundle.detector_params,
            bundle.body_encoder.clone(dgfa_stages=tuple(stages)),
            bundle.body_params,
            bundle.face_encoder, bundle.face_params)

    def run(bb, b, k=16, label=""):
        st = run_batched(bb, moderate_cfg, nms_cfg, pipe_384, frames,
                         empty_store, b=b, k=k, floor_s=floor,
                         reid_bucket=16, return_stats=True)
        print(json.dumps({
            "sweep": label, "b": b,
            "aggregate_fps": round(st["median"], 1),
            "best": round(st["best"], 1),
            "spread_pct": round(st["spread_pct"], 2),
            "per_stream": round(st["median"] / b, 2)}), flush=True)
        return st["median"]

    if mode in ("dgfa", "both"):
        for stages in [(0, 1), (0, 1, 2), (0,), (1, 2)]:
            run(with_dgfa(stages), b=8, label=f"dgfa{stages}")
    if mode in ("b", "both"):
        for b in (6, 10):
            run(bundle, b=b, label="bsweep")
    if mode == "extra":
        # Follow-up after the first pass found dgfa(0,) > (0, 1) at 384:
        # no-dgfa control, and the b re-tune at the winning stage set.
        run(with_dgfa(()), b=8, label="dgfa()")
        for b in (6, 8, 10):
            run(with_dgfa((0,)), b=b, label="bsweep_dgfa(0,)")


if __name__ == "__main__":
    main()
