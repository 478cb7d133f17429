"""One-off: re-tune the dgfa stage set at the LOADED single-stream
geometry (50-crop body bucket, 256x128).

The production dgfa_stages=(0, 1) was adopted from b=64 standalone
encoder races (docs/PERF.md "SplAt lowering"); the loaded headline runs
the encoder at bucket 50 INSIDE the full frame step, where relayout
and fusion economics can differ. VERDICT r4 next #1 asks for the
remaining loaded residuals to be harvested — this measures the one
config knob that needs no new code, in-context, at the exact bench
operating point (same cfg, k=96, bucket 50 + probed face bucket).

Run alone on the TPU (CLAUDE.md: never two TPU processes).
  python tools/sweep_loaded.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from bench import run_config, tunnel_floor_s
    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.pipeline.frame_step import (
        ModelBundle, _det_width, frame_step, reid_bucket_set)
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

    def with_dgfa(stages):
        return ModelBundle(
            bundle.detector, bundle.detector_params,
            bundle.body_encoder.clone(dgfa_stages=tuple(stages)),
            bundle.body_params,
            bundle.face_encoder, bundle.face_params)

    for stages in [(0, 1), (0, 1, 2), (0, 1, 2, 3), (1, 2), (0,)]:
        st, _, n_tracks = run_config(
            frame_step, with_dgfa(stages), loaded_cfg, nms_cfg, pipe_cfg,
            frames, empty_store, k=96, floor_s=floor,
            reid_bucket=buckets[-1], face_bucket=face_bucket,
            return_stats=True)
        print(json.dumps({
            "sweep": f"dgfa{stages}", "loaded_fps": round(st["median"], 2),
            "best": round(st["best"], 2),
            "spread_pct": round(st["spread_pct"], 2),
            "live_tracks": n_tracks}), flush=True)


if __name__ == "__main__":
    main()
