"""One-off: batched-stream b-sweep at the moderate-16 operating point.

Re-tunes stream batching post focus-fold/dgfa/splitsum (docs/PERF.md
round-3). Prints one JSON line per b with aggregate + per-stream FPS.
Run alone on the TPU (CLAUDE.md: never two TPU processes).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import dataclasses

    from bench import run_batched, tunnel_floor_s
    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.runtime.assets import build_bundle
    from botsort_tpu.runtime.device import setup_compilation_cache
    from botsort_tpu.track.state import empty_store

    setup_compilation_cache()
    nms_cfg = NMSConfig()
    pipe_cfg = PipelineConfig()
    moderate_cfg = dataclasses.replace(
        TrackerConfig(det_score_threshold=0.2, track_high_thresh=0.15,
                      track_low_thresh=0.02, new_track_thresh=0.2),
        max_dets=16)
    bundle = build_bundle(weights_dir="weights", fake_params=True)
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)
              for _ in range(4)]
    floor = tunnel_floor_s()
    print(json.dumps({"floor_ms": round(floor * 1e3, 1)}), flush=True)
    bs = tuple(int(x) for x in sys.argv[1].split(",")) \
        if len(sys.argv) > 1 else (6, 8, 12, 16)
    for b in bs:
        fps = run_batched(bundle, moderate_cfg, nms_cfg, pipe_cfg,
                          frames, empty_store, b=b, k=8,
                          floor_s=floor, reid_bucket=16)
        print(json.dumps({"b": b, "aggregate_fps": round(fps, 1),
                          "per_stream": round(fps / b, 2)}), flush=True)


if __name__ == "__main__":
    main()
