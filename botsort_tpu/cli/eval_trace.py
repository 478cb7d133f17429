"""Export per-frame track traces (MOT challenge CSV format).

Runs the tracker over a video and writes one row per (frame, track):
``frame,id,x,y,w,h,score,class,visibility`` — the format used for
MOT17/MOT20 evaluation, enabling MOTA/IDF1 parity comparison against a
trace captured from the reference implementation (BASELINE.json metric).

Run: python -m botsort_tpu.cli.eval_trace -v video.mp4 -o trace.csv
"""

from __future__ import annotations

import time
from botsort_tpu.cli.demo import build_parser
from botsort_tpu.utils.colors import green


def main(argv=None):
    parser = build_parser()
    parser.add_argument("-o", "--trace_output", type=str,
                        default="trace.csv")
    parser.add_argument(
        "-tb", "--temporal_batch", type=int, default=1,
        help="Process T consecutive frames per device dispatch "
             "(offline throughput mode; identical outputs; see "
             "pipeline/frame_step.py::frame_step_temporal).")
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
        track_target_classes=tuple(args.track_target_classes),
        disable_reid=args.no_reid)
    tracker_cfg = TrackerConfig(
        body_feature_dim=2048 if not args.mini else 256,
        face_feature_dim=256,
        max_dets=TrackerConfig().max_dets if not args.mini else 8)
    pipeline = BoTSORTPipeline(bundle, tracker_cfg, NMSConfig(), pipe_cfg)

    cap = PrefetchingCapture(args.video)
    n = 0
    t0 = time.perf_counter()

    def write_tracks(f, frame_no, tracks):
        for t in tracks:
            x1, y1, x2, y2 = t.tlbr
            f.write(f"{frame_no},{t.track_id},{x1:.2f},{y1:.2f},"
                    f"{x2 - x1:.2f},{y2 - y1:.2f},{t.score:.4f},1,1\n")

    tb = max(args.temporal_batch, 1)
    with open(args.trace_output, "w") as f:
        if tb == 1:
            for frame in cap.frames():
                n += 1
                write_tracks(f, n, pipeline.update(frame))
                if args.max_frames and n >= args.max_frames:
                    break
        else:
            import jax
            import jax.numpy as jnp
            import numpy as np

            from botsort_tpu.pipeline.frame_step import frame_step_temporal

            buf = []
            done = False
            frames_iter = cap.frames()
            while not done:
                buf.clear()
                for frame in frames_iter:
                    buf.append(frame)
                    if len(buf) == tb or (
                            args.max_frames
                            and n + len(buf) >= args.max_frames):
                        break
                if not buf:
                    break
                if len(buf) == tb:
                    # disable_reid must reach the direct temporal call
                    # too (bucket 0 == IoU-only, config.py note).
                    tbuckets = (0, 0) if args.no_reid else (None, None)
                    pipeline.store, res = frame_step_temporal(
                        pipeline.bundle, pipeline.store,
                        jnp.asarray(np.stack(buf)), pipeline.tracker_cfg,
                        pipeline.nms_cfg, pipeline.pipe_cfg,
                        *tbuckets)
                    res = jax.device_get(res)
                    for t in range(tb):
                        n += 1
                        res_t = jax.tree.map(lambda x: x[t], res)
                        write_tracks(f, n, pipeline._assemble(res_t))
                else:
                    # Tail shorter than the batch: plain per-frame steps
                    # (avoids polluting tracker state with padding).
                    for frame in buf:
                        n += 1
                        write_tracks(f, n, pipeline.update(frame))
                    done = True
                if args.max_frames and n >= args.max_frames:
                    done = True
    cap.release()
    dt = time.perf_counter() - t0
    print(green(f"{n} frames -> {args.trace_output} "
                f"({n / max(dt, 1e-9):.1f} fps)"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
