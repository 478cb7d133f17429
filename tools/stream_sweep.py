"""Batched multi-stream aggregate-FPS sweep over the stream count b.

Re-tunes the per-chip stream batching (VERDICT r2 #3 / ROADMAP "bf16
8-stream >= 240"): measures bench.run_batched at the moderate-16
operating point for several b, reporting aggregate and per-stream FPS.
Run on the real TPU from the repo root:

    python tools/stream_sweep.py [--b 8,12] [--int8]

One TPU process at a time (CLAUDE.md).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--b", default="8,12")
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--ab_splitsum", action="store_true",
                        help="interleave splitsum-on/off detector A/B at "
                             "each b (same params, same session/floor)")
    parser.add_argument("--k_frames", type=int, default=128,
                        help="total frames per measurement (k = this // b)")
    args = parser.parse_args()

    import numpy as np
    import jax.numpy as jnp

    import bench
    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.runtime.assets import build_bundle
    from botsort_tpu.runtime.device import setup_compilation_cache
    from botsort_tpu.track.state import empty_store

    setup_compilation_cache()
    nms_cfg = NMSConfig()
    pipe_cfg = PipelineConfig()
    bundle = build_bundle(weights_dir="weights", fake_params=True)
    if args.int8:
        from botsort_tpu.models.quantize import quantize_bundle
        bundle = quantize_bundle(bundle, which=("body",), pipe_cfg=pipe_cfg)

    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(rng.integers(0, 255, (1080, 1920, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    loaded_cfg = TrackerConfig(
        det_score_threshold=0.2, track_high_thresh=0.15,
        track_low_thresh=0.05, new_track_thresh=0.2)
    moderate_cfg = dataclasses.replace(loaded_cfg, max_dets=16)

    variants = [("", bundle)]
    if args.ab_splitsum:
        import dataclasses as _dc

        from botsort_tpu.models.yolox import YOLOX
        det_plain = YOLOX(dtype=jnp.bfloat16, splitsum_csp=(),
                          num_classes=4, depth=1.33, width=1.25)
        variants.append((" (splitsum OFF)",
                         _dc.replace(bundle, detector=det_plain)))

    floor_s = bench.tunnel_floor_s()
    print(f"tunnel floor {floor_s*1e3:.1f} ms")
    for b in [int(x) for x in args.b.split(",")]:
        k = max(8, args.k_frames // b)
        for tag, bdl in variants:
            fps = bench.run_batched(
                bdl, moderate_cfg, nms_cfg, pipe_cfg, frames, empty_store,
                b=b, k=k, floor_s=floor_s, reid_bucket=16)
            print(f"b={b:2d} k={k:3d}{tag}: aggregate {fps:7.1f} FPS, "
                  f"per-stream {fps / b:5.1f} FPS "
                  f"({'real-time' if fps / b >= 30.0 else 'below 30'})")


if __name__ == "__main__":
    main()
