"""Export AOT frame-step artifacts (the TRT-engine-file analog).

The reference pre-builds and ships TensorRT engines per GPU
(demo_bottrack_onnx_tflite.py:33-51 manifest; optimize_*.sh grind);
deployment hosts download engines instead of compiling. This CLI writes
the TPU-native equivalent: one serialized StableHLO program
(jax.export) per (source resolution, host-dispatch bucket pair), plus a
manifest. A serving host loads them with
``runtime.exported.load_frame_step`` — no re-trace, no Python model
code; weights load separately from orbax checkpoints.

Run: python -m botsort_tpu.cli.export --out exported/ \
         --resolutions 1080x1920 [--mini] [-ep cpu]
"""

from __future__ import annotations

import json
import os
import time
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--out", required=True,
                        help="Output directory for artifacts.")
    parser.add_argument("--resolutions", nargs="+", default=["1080x1920"],
                        help="Source frame HxW resolutions to export.")
    parser.add_argument("--weights_dir", type=str, default="weights")
    parser.add_argument(
        "-ep", "--execution_provider", type=str,
        choices=["tpu", "cpu"], default="tpu",
        help="Lowering target. A tpu export embeds TPU custom calls "
             "(Pallas cascade solver) and must be served on TPU.")
    parser.add_argument(
        "--streams", type=int, default=0,
        help="Also export batched multi-stream programs for B streams "
             "per chip (frame_step_batched; served via "
             "runtime.exported.load_batched_pipeline / cli.multitrack "
             "--artifact_dir). 0 = single-stream only.")
    parser.add_argument("--mini", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if (args.execution_provider == "cpu"
            or os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"):
        # The axon TPU plugin ignores the env var; see cli/warmup.py.
        jax.config.update("jax_platforms", "cpu")

    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.pipeline.frame_step import reid_bucket_set
    from botsort_tpu.runtime.assets import build_bundle
    from botsort_tpu.runtime.exported import artifact_name, export_frame_step
    from botsort_tpu.utils.colors import green

    bundle = build_bundle(weights_dir=args.weights_dir, mini=args.mini)
    tracker_cfg = TrackerConfig() if not args.mini else TrackerConfig(
        max_tracks=16, max_dets=8, body_feature_dim=256,
        face_feature_dim=256)
    nms_cfg = NMSConfig()
    pipe_cfg = PipelineConfig() if not args.mini else PipelineConfig(
        detector_input_hw=(96, 128), body_reid_input_hw=(64, 32),
        face_reid_input_hw=(32, 32), max_reid_batch=4)

    buckets = reid_bucket_set(tracker_cfg, nms_cfg, pipe_cfg)
    pairs = [(b, fb) for b in buckets for fb in buckets if fb <= b]
    os.makedirs(args.out, exist_ok=True)

    entries = []
    batched_entries = []
    for res in args.resolutions:
        h, w = (int(v) for v in res.split("x"))
        for b, fb in pairs:
            t0 = time.time()
            blob = export_frame_step(bundle, tracker_cfg, nms_cfg,
                                     pipe_cfg, (h, w), b, fb)
            name = artifact_name((h, w), b, fb)
            with open(os.path.join(args.out, name), "wb") as f:
                f.write(blob)
            entries.append({"file": name, "frame_hw": [h, w],
                            "reid_bucket": b, "face_bucket": fb,
                            "bytes": len(blob)})
            print(green(f"exported {name} ({len(blob) / 1e6:.1f} MB, "
                        f"{time.time() - t0:.1f}s)"))
            if args.streams > 0:
                from botsort_tpu.runtime.exported import (
                    batched_artifact_name,
                    export_frame_step_batched,
                )

                t0 = time.time()
                blob = export_frame_step_batched(
                    bundle, tracker_cfg, nms_cfg, pipe_cfg,
                    args.streams, (h, w), b, fb)
                name = batched_artifact_name(args.streams, (h, w), b, fb)
                with open(os.path.join(args.out, name), "wb") as f:
                    f.write(blob)
                batched_entries.append(
                    {"file": name, "streams": args.streams,
                     "frame_hw": [h, w], "reid_bucket": b,
                     "face_bucket": fb, "bytes": len(blob)})
                print(green(
                    f"exported {name} ({len(blob) / 1e6:.1f} MB, "
                    f"{time.time() - t0:.1f}s)"))

    import dataclasses

    manifest = {
        "format": "jax.export serialized Exported (StableHLO)",
        "tracker_cfg": dataclasses.asdict(tracker_cfg),
        "nms_cfg": dataclasses.asdict(nms_cfg),
        "pipe_cfg": dataclasses.asdict(pipe_cfg),
        "call": "fn(params3, store, frame_bgr) -> (store, FrameResult); "
                "params3 = (detector, body, face) orbax param trees",
        "platform": jax.default_backend(),
        "jax_version": jax.__version__,
        "mini": args.mini,
        "artifacts": entries,
        "batched_artifacts": batched_entries,
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(green(f"wrote {len(entries) + len(batched_entries)} artifacts "
                f"+ manifest to {args.out}"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
