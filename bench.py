"""End-to-end tracking benchmark on the real TPU.

Measures steady-state frames/second of the FULL fused pipeline — resize,
YOLOX-X detection (1x3x480x640, the reference's flagship detector input),
NMS, hierarchy, 16-crop FastReID SBS-S50 + face-ReID encoders, and the
association cascade — on synthetic 1080p BGR frames.

Weights are randomly initialized (identical compute cost to trained
weights). To make the tracker do REAL work (live tracks, non-empty
assignment problems, KF updates, ReID cost fusion) rather than idling on
an empty scene, the headline config lowers the score thresholds so every
frame carries a full detection load through the cascade; the empty-scene
number is also reported.

Baseline: the reference publishes no FPS table (BASELINE.md); its
operating point is real-time 30 FPS on an RTX-30xx with TensorRT fp16
engines (latency overlays in its demo videos, README.md:41-163).
``vs_baseline`` is therefore measured FPS / 30.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "fps", "vs_baseline": N/30, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np


def run_config(frame_step, bundle, tracker_cfg, nms_cfg, pipe_cfg, frames,
               empty_store, k=32, reps=5):
    """Device-side throughput: scan K frame-steps inside ONE program.

    The development TPU is reached through a tunnel whose latency varies
    wildly (host-timed per-call numbers ranged 2.5-46 ms for the same
    program depending on tunnel weather); a single dispatch of K chained
    steps with one forced readback amortizes the transport and measures
    what the chip actually does. Run-to-run spread observed < 2%.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_k(store, frames_k):
        def body(s, f):
            s2, out = frame_step(bundle, s, f, tracker_cfg, nms_cfg,
                                 pipe_cfg)
            return s2, out.tracks.valid
        return jax.lax.scan(body, store, frames_k)

    frames_k = jnp.stack(frames * (k // len(frames)))
    store = empty_store(tracker_cfg)
    t0 = time.time()
    store, valid = run_k(store, frames_k)
    _ = jax.device_get(valid)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        store, valid = run_k(store, frames_k)
        valid_np = jax.device_get(valid)
        best = min(best, time.perf_counter() - t0)
    n_tracks = int(np.asarray(valid_np)[-1].sum())
    return k / best, compile_s, n_tracks


def run_batched(bundle, tracker_cfg, nms_cfg, pipe_cfg, frames,
                empty_store, b=4, k=8, reps=4):
    """Aggregate FPS for b streams batched through one chip."""
    import jax
    import jax.numpy as jnp

    from botsort_tpu.pipeline.frame_step import frame_step_batched

    frames_k = jnp.stack(
        [jnp.stack(frames[:b] if len(frames) >= b else frames * b)[:b]
         for _ in range(k)])

    @jax.jit
    def run_k(stores, fk):
        def body(s, f):
            s2, out = frame_step_batched(bundle, s, f, tracker_cfg,
                                         nms_cfg, pipe_cfg)
            return s2, out.tracks.valid
        return jax.lax.scan(body, stores, fk)

    one = empty_store(tracker_cfg)
    stores = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape), one)
    stores, v = run_k(stores, frames_k)
    _ = jax.device_get(v)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        stores, v = run_k(stores, frames_k)
        _ = jax.device_get(v)
        best = min(best, time.perf_counter() - t0)
    return b * k / best


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

    nms_cfg = NMSConfig()
    pipe_cfg = PipelineConfig()
    bundle = build_bundle(weights_dir="weights", fake_params=True)

    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.integers(0, 255, (1080, 1920, 3), dtype=np.uint8))
        for _ in range(4)
    ]

    # Loaded config: zero-init weights emit uniform 0.25 class scores, so
    # thresholds at 0.2 put a full 16-detection load with a live track
    # pool through every cascade pass.
    loaded_cfg = TrackerConfig(
        det_score_threshold=0.2, track_high_thresh=0.15,
        track_low_thresh=0.05, new_track_thresh=0.2)
    fps_loaded, compile_s, n_tracks = run_config(
        frame_step, bundle, loaded_cfg, nms_cfg, pipe_cfg, frames,
        empty_store)

    # Reference-default config (empty scene with random weights).
    fps_empty, _, _ = run_config(
        frame_step, bundle, TrackerConfig(), nms_cfg, pipe_cfg, frames,
        empty_store)

    # Multi-stream throughput: B streams batched through one chip
    # (pipeline/frame_step.py::frame_step_batched). B=8 amortizes the
    # batch-1 detector best (measured 170 -> 237 -> 260 FPS at 1/4/8).
    fps_batched = run_batched(bundle, loaded_cfg, nms_cfg, pipe_cfg,
                              frames, empty_store, b=8, k=4)

    print(json.dumps({
        "metric": "e2e_tracked_fps_480x640_loaded",
        "value": round(fps_loaded, 2),
        "unit": "fps",
        "vs_baseline": round(fps_loaded / 30.0, 3),
        "backend": backend,
        "compile_s": round(compile_s, 1),
        "frame_ms": round(1000.0 / fps_loaded, 3),
        "live_tracks": n_tracks,
        "empty_scene_fps": round(fps_empty, 2),
        "batched_8stream_aggregate_fps": round(fps_batched, 2),
        "notes": "device-side throughput (32-step in-program scan, best "
                 "of 5): full pipeline under load — YOLOX-X det + 16x "
                 "SBS-S50 body ReID + face ReID + fused cascade with "
                 "live track pool, 1080p source frames; baseline=30fps "
                 "RTX-30xx TRT reference operating point",
    }))


if __name__ == "__main__":
    main()
