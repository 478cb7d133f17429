"""One-off: temporal batching at the LOADED single-stream geometry.

Round 4 measured temporal batching a LOSS at B=8 (detector batch 8*T
tiles worse than 8 — docs/PERF.md "Temporal batching does NOT help the
8-stream aggregate"), but the loaded headline runs ONE stream: T>1
moves the detector TOWARD the known batch-8 sweet spot (b re-tune:
batch 8 optimal, 12/16 collapse) and multiplies the 50-crop ReID batch
by T. If the perception stages tile meaningfully better at batch 4-8,
single-stream THROUGHPUT rises at a cost of T-1 frames of latency —
a legitimate near-real-time serving point (runtime/envelope.py records
latency alongside throughput for exactly this reason).

Run alone on the TPU (CLAUDE.md: never two TPU processes).
  python tools/sweep_loaded_temporal.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import fps_stats, tunnel_floor_s
    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.pipeline.frame_step import (
        _det_width, frame_step, frame_step_batched,
        frame_step_batched_temporal, reid_bucket_set)
    from botsort_tpu.pipeline.host import (
        _live_and_face_counts, face_bucket_need)
    from botsort_tpu.runtime.assets import build_bundle
    from botsort_tpu.runtime.device import setup_compilation_cache
    from botsort_tpu.track.state import empty_store

    setup_compilation_cache()
    nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
    loaded_cfg = TrackerConfig(
        det_score_threshold=0.2, track_high_thresh=0.15,
        track_low_thresh=0.05, new_track_thresh=0.2)
    bundle = build_bundle(weights_dir="weights", fake_params=True)
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 255, (1080, 1920, 3)).astype(np.uint8)
              for _ in range(4)]
    floor = tunnel_floor_s()
    print(json.dumps({"floor_ms": round(floor * 1e3, 1)}), flush=True)

    buckets = reid_bucket_set(loaded_cfg, nms_cfg, pipe_cfg)
    d_width = _det_width(loaded_cfg, nms_cfg)
    probe_store = empty_store(loaded_cfg)
    face_need = 0
    for f in frames:
        probe_store, res = frame_step(
            bundle, probe_store, f, loaded_cfg, nms_cfg, pipe_cfg,
            None, buckets[-1], buckets[-1])
        res_h = jax.device_get(res)
        n_live, n_face = _live_and_face_counts(res_h, d_width)
        face_need = max(face_need, face_bucket_need(n_face, n_live))
    face_bucket = next(b for b in buckets if face_need <= b)
    print(json.dumps({"face_bucket": face_bucket}), flush=True)

    from botsort_tpu.models.quantize import quantize_bundle
    qbundle = quantize_bundle(bundle, which=("body",), pipe_cfg=pipe_cfg)

    one = empty_store(loaded_cfg)
    stores1 = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape),
                           one)

    variants = [(t, bundle, "bf16") for t in (1, 2, 3, 4, 8)]
    variants += [(t, qbundle, "int8mid") for t in (2, 4)]
    for t, bund, tag in variants:
        k = max(96 // t, 12)  # ~same device work per rep across T

        if t == 1:
            fk = jnp.stack(
                [jnp.asarray(frames[i % 4])[None] for i in range(k)])

            @jax.jit
            def run_k(bundle, stores, fk):
                def body(s, f):
                    s2, out = frame_step_batched(
                        bundle, s, f, loaded_cfg, nms_cfg, pipe_cfg,
                        None, buckets[-1], face_bucket)
                    return s2, out.tracks.valid
                return jax.lax.scan(body, stores, fk)
        else:
            fk = jnp.stack([
                jnp.stack([jnp.asarray(frames[(i * t + j) % 4])
                           for j in range(t)])[None]
                for i in range(k)])

            @jax.jit
            def run_k(bundle, stores, fk):
                def body(s, f):
                    s2, out = frame_step_batched_temporal(
                        bundle, s, f, loaded_cfg, nms_cfg, pipe_cfg,
                        None, buckets[-1], face_bucket)
                    return s2, out.tracks.valid
                return jax.lax.scan(body, stores, fk)

        stores, v = run_k(bund, stores1, fk)
        _ = jax.device_get(v)
        times = []
        for _ in range(5):
            t0 = __import__("time").perf_counter()
            stores, v = run_k(bund, stores1, fk)
            _ = jax.device_get(v)
            times.append(__import__("time").perf_counter() - t0)
        st = fps_stats(times, k * t, floor)
        print(json.dumps({
            "sweep": f"loaded_{tag}_T{t}", "fps": round(st["median"], 2),
            "best": round(st["best"], 2),
            "spread_pct": round(st["spread_pct"], 2),
            "latency_frames": t - 1}), flush=True)


if __name__ == "__main__":
    main()
