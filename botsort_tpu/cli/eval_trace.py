"""Export per-frame track traces (MOT challenge CSV format).

Runs the tracker over a video and writes one row per (frame, track):
``frame,id,x,y,w,h,score,class,visibility`` — the format used for
MOT17/MOT20 evaluation, enabling MOTA/IDF1 parity comparison against a
trace captured from the reference implementation (BASELINE.json metric).

Run: python -m botsort_tpu.cli.eval_trace -v video.mp4 -o trace.csv
"""

from __future__ import annotations

import time
from argparse import ArgumentParser

from botsort_tpu.cli.demo import build_parser
from botsort_tpu.utils.colors import green


def main(argv=None):
    parser = build_parser()
    parser.add_argument("-o", "--trace_output", type=str,
                        default="trace.csv")
    args = parser.parse_args(argv)

    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.io.video import PrefetchingCapture
    from botsort_tpu.pipeline.host import BoTSORTPipeline
    from botsort_tpu.runtime import assets
    from botsort_tpu.runtime.device import setup_compilation_cache

    setup_compilation_cache()
    bundle = assets.build_bundle(
        detector_name=args.object_detection_model,
        body_reid_name=args.body_feature_extractor_model,
        face_reid_name=args.face_feature_extractor_model,
        weights_dir=args.weights_dir, mini=args.mini)
    pipe_cfg = PipelineConfig(
        detector_input_hw=assets.parse_detector_input_hw(
            args.object_detection_model) if not args.mini else (96, 128),
        body_reid_input_hw=assets.parse_body_reid_input_hw(
            args.body_feature_extractor_model) if not args.mini else (64, 32),
        face_reid_input_hw=(128, 128) if not args.mini else (32, 32),
        track_target_classes=tuple(args.track_target_classes))
    tracker_cfg = TrackerConfig(
        body_feature_dim=2048 if not args.mini else 256,
        face_feature_dim=256)
    pipeline = BoTSORTPipeline(bundle, tracker_cfg, NMSConfig(), pipe_cfg)

    cap = PrefetchingCapture(args.video)
    n = 0
    t0 = time.perf_counter()
    with open(args.trace_output, "w") as f:
        for frame in cap.frames():
            n += 1
            for t in pipeline.update(frame):
                x1, y1, x2, y2 = t.tlbr
                f.write(f"{n},{t.track_id},{x1:.2f},{y1:.2f},"
                        f"{x2 - x1:.2f},{y2 - y1:.2f},{t.score:.4f},1,1\n")
            if args.max_frames and n >= args.max_frames:
                break
    cap.release()
    dt = time.perf_counter() - t0
    print(green(f"{n} frames -> {args.trace_output} "
                f"({n / max(dt, 1e-9):.1f} fps)"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
