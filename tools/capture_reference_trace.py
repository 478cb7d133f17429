"""Capture a per-frame MOT trace from the REFERENCE implementation.

Run this in an environment where the reference works (onnxruntime +
its downloaded ONNX files — e.g. the reference repo's own Docker
image); it drives the reference's public ``BoTSORT.update`` API
(/root/reference/demo_bottrack_onnx_tflite.py:1252-1291) frame by frame
and writes the MOT challenge CSV our ``cli/eval_mot.py`` consumes:

    frame,id,x,y,w,h,score,class,visibility

This is the reference half of the BASELINE.json parity check; our half
comes from ``python -m botsort_tpu.cli.eval_trace`` on the same video.
Diff the two with ``python -m botsort_tpu.cli.eval_mot --gt ref.csv
--hyp ours.csv``. Full recipe: docs/TRACE_PARITY.md.

Usage (from anywhere; --ref-repo points at the reference checkout):

  python tools/capture_reference_trace.py \
      --ref-repo /path/to/BoT-SORT-ONNX-TensorRT \
      --video MOT17-04.mp4 -o ref_trace.csv \
      [--ep cpu|cuda|tensorrt] [--max-frames N]

No reference code is vendored here: the module is imported from
--ref-repo at runtime and only its public classes are called.
"""

from __future__ import annotations

import argparse
import importlib
import os
import sys


DET_MODEL = "yolox_x_body_head_hand_face_0076_0.5228_post_1x3x480x640.onnx"
BODY_MODEL = "mot17_sbs_S50_NMx3x256x128_post_feature_only.onnx"
FACE_MODEL = (
    "face-reidentification-retail-0095_NMx3x128x128_post_feature_only.onnx")


def build_tracker(ref, args):
    """Construct the reference's model wrappers + BoTSORT (mirrors the
    provider selection of its main(), demo:2049-2099)."""
    if args.ep == "cpu":
        providers = ["CPUExecutionProvider"]
    elif args.ep == "cuda":
        providers = ["CUDAExecutionProvider", "CPUExecutionProvider"]
    else:
        providers = [
            ("TensorrtExecutionProvider", {
                "trt_engine_cache_enable": True,
                "trt_engine_cache_path": ".",
                "trt_fp16_enable": True,
            }),
            "CUDAExecutionProvider",
            "CPUExecutionProvider",
        ]
    runtime = "onnx"
    det = ref.YOLOX(runtime=runtime, model_path=args.detector,
                    providers=providers)
    body = ref.FastReID(runtime=runtime, model_path=args.body_reid,
                        providers=providers)
    face = ref.FaceReidentificationRetail0095(
        runtime=runtime, model_path=args.face_reid, providers=providers)
    return ref.BoTSORT(object_detection_model=det,
                       body_feature_extractor_model=body,
                       face_feature_extractor_model=face,
                       frame_rate=30)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref-repo", required=True,
                        help="path to the reference checkout (contains "
                             "demo_bottrack_onnx_tflite.py + ONNX files)")
    parser.add_argument("--video", "-v", required=True)
    parser.add_argument("--output", "-o", default="ref_trace.csv")
    parser.add_argument("--ep", choices=["cpu", "cuda", "tensorrt"],
                        default="cuda")
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--detector", default=DET_MODEL)
    parser.add_argument("--body-reid", default=BODY_MODEL)
    parser.add_argument("--face-reid", default=FACE_MODEL)
    args = parser.parse_args(argv)

    sys.path.insert(0, args.ref_repo)
    os.chdir(args.ref_repo)  # the reference resolves model paths cwd-relative
    ref = importlib.import_module("demo_bottrack_onnx_tflite")

    import cv2

    tracker = build_tracker(ref, args)
    cap = cv2.VideoCapture(args.video)
    n = 0
    with open(args.output, "w") as f:
        while cap.isOpened():
            ok, image = cap.read()
            if not ok:
                break
            n += 1
            for t in tracker.update(image):
                x1, y1, x2, y2 = t.tlbr
                f.write(f"{n},{t.track_id},{x1:.2f},{y1:.2f},"
                        f"{x2 - x1:.2f},{y2 - y1:.2f},{t.score:.4f},1,1\n")
            if args.max_frames and n >= args.max_frames:
                break
    cap.release()
    print(f"{n} frames -> {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
