"""Demo CLI: track people in a video/camera stream on TPU.

Mirrors the reference's CLI surface (demo_bottrack_onnx_tflite.py:
1896-2203): ``-odm/-bfem/-ffem`` accept the same model file names (mapped
to our architectures + checkpoints), ``-v`` video path or camera index,
``-dvw`` disables the always-on output.mp4 writer, ``-fm`` enables the
face mosaic. ``-ep`` selects the JAX backend (tpu/cpu) instead of an
onnxruntime execution provider. ``-tc/--track_target_classes`` — which
the reference README documents (README.md:71,86-88) but the reference
never implements — is implemented here.

Run: python -m botsort_tpu.cli.demo -v video.mp4
"""

from __future__ import annotations

import os
import time
from argparse import ArgumentParser

import cv2

from botsort_tpu.config import (
    NMSConfig,
    PipelineConfig,
    TrackerConfig,
)
from botsort_tpu.io.draw import draw_latency, draw_tracks
from botsort_tpu.io.video import PrefetchingCapture, make_writer
from botsort_tpu.runtime import assets
from botsort_tpu.runtime.device import platform_summary, setup_compilation_cache
from botsort_tpu.utils.colors import cyan, green


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument(
        "-odm", "--object_detection_model",
        type=str, default=assets.DEFAULT_DETECTOR,
        help="Detector model name (reference ONNX names accepted; maps to "
             "a YOLOX checkpoint under --weights_dir).")
    parser.add_argument(
        "-bfem", "--body_feature_extractor_model",
        type=str, default=assets.DEFAULT_BODY_REID,
        help="Body ReID model name (mot17/mot20 sbs_S50 variants).")
    parser.add_argument(
        "-ffem", "--face_feature_extractor_model",
        type=str, default=assets.DEFAULT_FACE_REID,
        help="Face ReID model name.")
    parser.add_argument(
        "-v", "--video", type=str, default="0",
        help="Video file path or camera index.")
    parser.add_argument(
        "-ep", "--execution_provider", type=str,
        choices=["tpu", "cpu"], default="tpu",
        help="Compute backend (the reference's tensorrt/cuda/cpu EP "
             "choices map to TPU vs CPU here).")
    parser.add_argument(
        "-dvw", "--disable_video_writer", action="store_true",
        help="Disable the output.mp4 writer (removes file-IO load).")
    parser.add_argument(
        "-fm", "--face_mosaic", action="store_true", help="Face mosaic.")
    parser.add_argument(
        "-tc", "--track_target_classes", type=int, nargs="+",
        default=[0, 1, 2, 3], choices=[0, 1, 2, 3],
        help="Classes rendered/attached in outputs (0 body, 1 head, "
             "2 hand, 3 face).")
    parser.add_argument("--weights_dir", type=str, default="weights")
    parser.add_argument("--output", type=str, default="output.mp4")
    parser.add_argument(
        "--headless", action="store_true",
        help="No GUI window (no cv2.imshow); default when no DISPLAY.")
    parser.add_argument(
        "--max_frames", type=int, default=0,
        help="Stop after N frames (0 = entire stream).")
    parser.add_argument(
        "--mini", action="store_true",
        help="Use miniature model architectures (smoke tests).")
    parser.add_argument(
        "--no_reid", action="store_true",
        help="IoU-only association (BASELINE config 1): skip both ReID "
             "encoders. Exact — with zero features the reference's "
             "min(iou, masked-emb) cost fusion (demo:1538-1556) "
             "degenerates to IoU; large speedup on the cpu EP.")
    parser.add_argument(
        "--gmc", action="store_true",
        help="Enable camera-motion compensation (sparse-flow estimator; "
             "the reference's multi_gmc is dead code — we implement it).")
    parser.add_argument(
        "--int8", action="store_true",
        help="Serve the body ReID encoder with int8 convolutions scoped "
             "to the mid-network (post-training quantization, "
             "calibrated on the stream's first frames; measured ~10%% "
             "faster than bf16 at b64 on v5e — the TPU analog of the "
             "reference's TensorRT int8 option; the detector stays "
             "bf16: int8 measured a loss there, docs/PERF.md).")
    parser.add_argument(
        "--int8_calib_frames", type=int, default=4,
        help="Frames read for int8 activation calibration.")
    parser.add_argument(
        "--profile", action="store_true",
        help="Print per-stage timing averages at exit. For device-level "
             "traces use botsort_tpu.utils.profiling.device_trace.")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    # Fail fast on a bad video path (model construction takes minutes;
    # don't pay it for a typo). Camera indices are checked at open time.
    if not args.video.isdigit() and not os.path.isfile(args.video):
        print(f"ERROR: video file not found: {args.video}")
        return 1
    if args.execution_provider == "cpu":
        # Some TPU platform plugins ignore the JAX_PLATFORMS env var;
        # the config update reliably forces the CPU backend.
        import jax

        jax.config.update("jax_platforms", "cpu")
    setup_compilation_cache()
    # Import after backend selection.
    from botsort_tpu.pipeline.host import BoTSORTPipeline

    print(cyan(f"backend: {platform_summary()}"))
    bundle = assets.build_bundle(
        detector_name=args.object_detection_model,
        body_reid_name=args.body_feature_extractor_model,
        face_reid_name=args.face_feature_extractor_model,
        weights_dir=args.weights_dir,
        mini=args.mini,
    )
    pipe_cfg = PipelineConfig(
        detector_input_hw=assets.parse_detector_input_hw(
            args.object_detection_model) if not args.mini else (96, 128),
        body_reid_input_hw=assets.parse_body_reid_input_hw(
            args.body_feature_extractor_model) if not args.mini else (64, 32),
        face_reid_input_hw=(128, 128) if not args.mini else (32, 32),
        track_target_classes=tuple(args.track_target_classes),
        enable_gmc=args.gmc,
        disable_reid=args.no_reid,
    )
    tracker_cfg = TrackerConfig(
        body_feature_dim=2048 if not args.mini else 256,
        face_feature_dim=256,
        # mini = smoke geometry: 8 det slots keeps compiled programs
        # small (the 50-slot width dominated CI compile time).
        max_dets=TrackerConfig().max_dets if not args.mini else 8,
    )
    if args.int8:
        import numpy as np

        from botsort_tpu.models.quantize import quantize_bundle

        calib = []
        peek = cv2.VideoCapture(
            int(args.video) if args.video.isdigit() else args.video)
        for _ in range(max(args.int8_calib_frames, 1)):
            ok, f = peek.read()
            if not ok:
                break
            calib.append(f)
        peek.release()
        print(cyan(f"int8: calibrating on {len(calib)} frames"))
        bundle = quantize_bundle(
            bundle, np.stack(calib) if calib else None, pipe_cfg=pipe_cfg)
    pipeline = BoTSORTPipeline(bundle, tracker_cfg, NMSConfig(), pipe_cfg)

    cap = PrefetchingCapture(args.video)
    writer = None
    if not args.disable_video_writer:
        writer = make_writer(args.output, cap.fps, cap.frame_size)
    headless = args.headless or not os.environ.get("DISPLAY")

    n = 0
    try:
        for frame in cap.frames():
            t0 = time.perf_counter()
            tracks = pipeline.update(frame)
            dt = time.perf_counter() - t0

            draw_latency(frame, dt)
            draw_tracks(frame, tracks, face_mosaic=args.face_mosaic)
            if writer is not None:
                writer.write(frame)
            if not headless:
                cv2.imshow("botsort_tpu", frame)
                if cv2.waitKey(1) == 27:  # ESC
                    break
            n += 1
            if args.max_frames and n >= args.max_frames:
                break
    finally:
        if writer is not None:
            writer.release()
        cap.release()
    print(green(f"processed {n} frames"))
    if args.profile:
        report = pipeline.timers.report()
        for name, ms in sorted(report.items()):
            print(cyan(f"  {name}: {ms:.2f} ms avg"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
