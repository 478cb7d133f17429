"""End-to-end tracking benchmark on the real TPU.

Measures steady-state frames/second of the FULL fused pipeline — resize,
YOLOX-X detection (1x3x480x640, the reference's flagship detector input),
NMS, hierarchy, 16-crop FastReID SBS-S50 + face-ReID encoders, and the
association cascade — on synthetic 1080p BGR frames (weights are randomly
initialized; compute cost is identical to trained weights).

Baseline: the reference publishes no FPS table (BASELINE.md); its
operating point is real-time 30 FPS on an RTX-30xx with TensorRT fp16
engines (latency overlays in its demo videos, README.md:41-163).
``vs_baseline`` is therefore measured FPS / 30.

Prints ONE JSON line:
  {"metric": "e2e_tracked_fps_480x640", "value": N, "unit": "fps",
   "vs_baseline": N/30, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.pipeline.frame_step import frame_step
    from botsort_tpu.runtime.assets import build_bundle
    from botsort_tpu.runtime.device import setup_compilation_cache
    from botsort_tpu.track.state import empty_store

    setup_compilation_cache()
    backend = jax.default_backend()

    tracker_cfg = TrackerConfig()
    nms_cfg = NMSConfig()
    pipe_cfg = PipelineConfig()

    bundle = build_bundle(weights_dir="weights", fake_params=True)
    store = empty_store(tracker_cfg)

    rng = np.random.default_rng(0)
    # 1080p source frames (the reference demos stream 1080p mp4s).
    frames = [
        jnp.asarray(rng.integers(0, 255, (1080, 1920, 3), dtype=np.uint8))
        for _ in range(4)
    ]

    # Warmup / compile.
    t0 = time.time()
    store, result = frame_step(bundle, store, frames[0], tracker_cfg,
                               nms_cfg, pipe_cfg)
    jax.block_until_ready(result.tracks.valid)
    compile_s = time.time() - t0

    # Steady state: issue frames back-to-back, sync at the end.
    n = 50
    t0 = time.perf_counter()
    for i in range(n):
        store, result = frame_step(bundle, store, frames[i % len(frames)],
                                   tracker_cfg, nms_cfg, pipe_cfg)
    jax.block_until_ready(result.tracks.valid)
    dt = time.perf_counter() - t0
    fps = n / dt

    print(json.dumps({
        "metric": "e2e_tracked_fps_480x640",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "backend": backend,
        "compile_s": round(compile_s, 1),
        "frame_ms": round(1000.0 / fps, 3),
        "notes": "full pipeline: YOLOX-X det + 16x SBS-S50 body ReID + "
                 "face ReID + fused cascade, 1080p source frames, "
                 "baseline=30fps RTX-30xx TRT reference operating point",
    }))


if __name__ == "__main__":
    main()
