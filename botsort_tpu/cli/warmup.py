"""Pre-compile the pipeline into the persistent XLA cache.

The analog of the reference's optimize_*_tensorrt_engine.sh scripts,
which grind sit4onnx over every batch shape to populate the TensorRT
engine cache (221 s for the detector, 24,284 s for body ReID batches
1..100 — README.md:108-111). Our shapes are static, so warmup is ONE
compile per (source resolution, model set) — minutes, not hours; later
process starts hit the persistent cache (runtime/device.py).

Run: python -m botsort_tpu.cli.warmup --resolutions 1080x1920 480x640
"""

from __future__ import annotations

import time
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument(
        "--resolutions", nargs="+", default=["1080x1920"],
        help="Source frame HxW resolutions to precompile.")
    parser.add_argument("--weights_dir", type=str, default="weights")
    parser.add_argument(
        "-bfem", "--body_feature_extractor_model", type=str,
        default=None,
        help="Body-ReID model name; its NMx3xHxW geometry selects the "
             "crop size to precompile (e.g. the mot20_sbs_S50 384x128 "
             "variant — the reference grinds separate TensorRT engines "
             "per geometry, optimize_reid_tensorrt_engine.sh).")
    parser.add_argument(
        "-ep", "--execution_provider", type=str,
        choices=["tpu", "cpu"], default="tpu",
        help="Compute backend to warm (mirrors demo.py -ep).")
    parser.add_argument("--mini", action="store_true")
    args = parser.parse_args(argv)

    import os

    import jax

    if (args.execution_provider == "cpu"
            or os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"):
        # The axon TPU plugin IGNORES the JAX_PLATFORMS env var; only
        # the config update reliably forces CPU. Without this, a
        # subprocess warmup (e.g. tests/test_warmup_cli.py) silently
        # seizes the real TPU and contends with any live process on it.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.pipeline.frame_step import frame_step
    from botsort_tpu.runtime.assets import build_bundle
    from botsort_tpu.runtime.device import setup_compilation_cache
    from botsort_tpu.track.state import empty_store
    from botsort_tpu.utils.colors import green

    cache = setup_compilation_cache()
    bundle = build_bundle(weights_dir=args.weights_dir, mini=args.mini)
    tracker_cfg = TrackerConfig() if not args.mini else TrackerConfig(
        max_tracks=16, max_dets=8, body_feature_dim=256,
        face_feature_dim=256)
    nms_cfg = NMSConfig()
    if args.mini:
        pipe_cfg = PipelineConfig(
            detector_input_hw=(96, 128), body_reid_input_hw=(64, 32),
            face_reid_input_hw=(32, 32), max_reid_batch=4)
    else:
        from botsort_tpu.runtime.assets import (
            DEFAULT_BODY_REID,
            parse_body_reid_input_hw,
        )

        pipe_cfg = PipelineConfig(
            body_reid_input_hw=parse_body_reid_input_hw(
                args.body_feature_extractor_model or DEFAULT_BODY_REID))

    # The host facade dispatches static ReID-bucket programs (see
    # pipeline/host.py); pre-compile every (body, face) bucket pair it
    # can pick so no live frame pays a first compile.
    from botsort_tpu.pipeline.frame_step import reid_bucket_set

    buckets = reid_bucket_set(tracker_cfg, nms_cfg, pipe_cfg)
    pairs = [(b, fb) for b in buckets for fb in buckets if fb <= b]

    for res in args.resolutions:
        h, w = (int(v) for v in res.split("x"))
        frame = jnp.zeros((h, w, 3), jnp.uint8)
        for b, fb in pairs:
            store = empty_store(tracker_cfg)
            t0 = time.time()
            store, result = frame_step(bundle, store, frame, tracker_cfg,
                                       nms_cfg, pipe_cfg, None,
                                       reid_bucket=b, face_bucket=fb)
            jax.block_until_ready(result.tracks.valid)
            print(green(
                f"compiled {h}x{w} buckets ({b},{fb}) in "
                f"{time.time() - t0:.1f}s (cache: {cache})"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
