"""Multi-stream tracking CLI: N videos batched through one chip.

The reference is strictly one-process/one-GPU/one-stream
(SURVEY.md §2); this surface is the TPU serving topology: B videos ride
one chip as a single batched program (pipeline/frame_step.py::
frame_step_batched — perception natively batched, per-stream cascades
vmapped, tracker outputs bitwise-identical to B single-stream runs).
For multi-CHIP scale-out see examples/multi_stream.py (mesh sharding,
one or more streams per device).

Run:
  python -m botsort_tpu.cli.multitrack -v a.mp4 b.mp4 [...] \
      [--output_dir out/] [--max_frames N]

Writes one annotated {stem}_tracked.mp4 per input (unless -dvw) and
prints aggregate throughput. All videos must share one resolution
(one compiled program per (B, H, W)); streams that end early are fed
their last frame (their tracker state keeps coasting, outputs ignored).
"""

from __future__ import annotations

import os
import time
from argparse import ArgumentParser

import cv2
import numpy as np

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.io.draw import draw_tracks
from botsort_tpu.io.video import make_writer
from botsort_tpu.runtime import assets
from botsort_tpu.runtime.device import platform_summary, setup_compilation_cache
from botsort_tpu.utils.colors import cyan, green, yellow


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("-v", "--videos", nargs="+", required=True,
                        help="Video files (one stream each; same WxH).")
    parser.add_argument(
        "-ep", "--execution_provider", type=str,
        choices=["tpu", "cpu"], default="tpu")
    parser.add_argument("-dvw", "--disable_video_writer",
                        action="store_true")
    parser.add_argument("--output_dir", type=str, default=".")
    parser.add_argument("--weights_dir", type=str, default="weights")
    parser.add_argument("--max_frames", type=int, default=0)
    parser.add_argument(
        "--artifact_dir", type=str, default="",
        help="Serve from AOT export artifacts (cli/export.py --streams "
             "N, N = number of videos) instead of live-jitted models.")
    parser.add_argument("--mini", action="store_true",
                        help="Miniature architectures (smoke tests).")
    parser.add_argument(
        "--chips", default="auto",
        help="Devices to shard streams over (N, or 'auto' = just enough "
             "chips that each stays inside the measured real-time "
             "envelope, runtime/envelope.py). Each chip runs the same "
             "batched per-chip program on its stream slice "
             "(pipeline/host.py::MeshBatchedBoTSORTPipeline).")
    parser.add_argument(
        "--temporal", type=int, default=1, metavar="T",
        help="Batch T consecutive frames per stream into each dispatch "
             "(near-real-time mode: +7%% throughput at T=2 for one "
             "frame of added latency on the measured single-stream "
             "loaded config — docs/PERF.md 'temporal batching at B=1'; "
             "outputs are bitwise-identical to T=1). Single-chip, "
             "live-jitted serving only.")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    for p in args.videos:
        if not os.path.isfile(p):
            print(f"ERROR: video file not found: {p}")
            return 1
    if args.execution_provider == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    setup_compilation_cache()
    from botsort_tpu.pipeline.host import BatchedBoTSORTPipeline

    print(cyan(f"backend: {platform_summary()}"))
    bundle = assets.build_bundle(weights_dir=args.weights_dir,
                                 mini=args.mini)
    pipe_cfg = PipelineConfig() if not args.mini else PipelineConfig(
        detector_input_hw=(96, 128), body_reid_input_hw=(64, 32),
        face_reid_input_hw=(32, 32), max_reid_batch=4)
    tracker_cfg = TrackerConfig(
        body_feature_dim=2048 if not args.mini else 256,
        face_feature_dim=256,
        max_dets=TrackerConfig().max_dets if not args.mini else 8)

    b = len(args.videos)
    import math

    import jax

    from botsort_tpu.runtime.envelope import (
        max_realtime_streams,
        stream_envelope_warning,
    )

    backend = jax.default_backend()
    n_dev = len(jax.devices())
    # Envelope-aware chip count: spread the streams over just enough
    # devices that each chip's slice fits its measured real-time
    # envelope (the reference has no multi-stream surface at all;
    # SURVEY §2 names stream-sharding as the one parallelism axis).
    if str(args.chips).lower() == "auto":
        chips = 1
        if not args.artifact_dir and stream_envelope_warning(
                b, backend,
                body_reid_input_hw=pipe_cfg.body_reid_input_hw):
            cap = max_realtime_streams(
                30.0, pipe_cfg.body_reid_input_hw)
            chips = min(math.ceil(b / cap), n_dev, b)
    else:
        chips = max(1, min(int(args.chips), n_dev, b))
        if args.artifact_dir and chips > 1:
            print(yellow(
                "WARNING: --artifact_dir serving is single-chip "
                "(exported programs are unsharded); ignoring --chips."))
            chips = 1
    per_chip = math.ceil(b / chips)
    env_warn = stream_envelope_warning(
        per_chip, backend,
        body_reid_input_hw=pipe_cfg.body_reid_input_hw)
    if env_warn:
        print(yellow(env_warn))
    t_batch = max(1, int(args.temporal))
    if t_batch > 1 and (args.artifact_dir or chips > 1):
        print(yellow(
            "WARNING: --temporal is single-chip live-jitted serving; "
            "ignoring it here."))
        t_batch = 1
    if t_batch > 1:
        from botsort_tpu.pipeline.host import (
            TemporalBatchedBoTSORTPipeline,
        )

        print(cyan(f"temporal batching: {t_batch} frames/stream per "
                   f"dispatch ({t_batch - 1} frame(s) added latency)"))
        pipeline = TemporalBatchedBoTSORTPipeline(
            bundle, b, t_batch=t_batch, tracker_cfg=tracker_cfg,
            nms_cfg=NMSConfig(), pipe_cfg=pipe_cfg)
    elif args.artifact_dir:
        from botsort_tpu.runtime.exported import load_batched_pipeline

        pipeline = load_batched_pipeline(
            args.artifact_dir,
            (bundle.detector_params, bundle.body_params,
             bundle.face_params), b)
    elif chips > 1:
        from botsort_tpu.pipeline.host import MeshBatchedBoTSORTPipeline

        print(cyan(f"sharding {b} streams over {chips} chips "
                   f"({per_chip}/chip, pure DP over the mesh)"))
        pipeline = MeshBatchedBoTSORTPipeline(
            bundle, b, n_chips=chips, tracker_cfg=tracker_cfg,
            nms_cfg=NMSConfig(), pipe_cfg=pipe_cfg)
    else:
        pipeline = BatchedBoTSORTPipeline(bundle, b, tracker_cfg,
                                          NMSConfig(), pipe_cfg)

    caps = [cv2.VideoCapture(p) for p in args.videos]
    writers = [None] * b
    last = [None] * b
    live = [True] * b
    n = 0
    live_frames = 0  # live-stream frames only (ended streams coast on
    #                  frozen last frames; their outputs are ignored and
    #                  must not inflate the reported aggregate)
    t_start = None
    prev = None  # (frames, live flags, tracks) of the previous step

    def _emit(entry):
        # entry: (frames[t][s], real_t[s] = # real frames this group,
        # tracks[t][s]); coasted group tail frames (t >= real_t[s]) of
        # an ended stream are dropped, exactly like the T=1 loop
        # dropped dead streams' outputs.
        p_frames, p_real, p_tracks = entry
        for tt in range(len(p_frames)):
            for s in range(b):
                if tt >= p_real[s]:
                    continue
                if writers[s] is None and not args.disable_video_writer:
                    stem = os.path.splitext(
                        os.path.basename(args.videos[s]))[0]
                    h, w = p_frames[tt][s].shape[:2]
                    writers[s] = make_writer(
                        os.path.join(args.output_dir,
                                     f"{stem}_tracked.mp4"),
                        caps[s].get(cv2.CAP_PROP_FPS) or 30.0, (w, h))
                draw_tracks(p_frames[tt][s], p_tracks[tt][s])
                if writers[s] is not None:
                    writers[s].write(p_frames[tt][s])

    try:
        while any(live):
            # Read one GROUP: t_batch frames per stream (t_batch=1 is
            # the classic loop). Streams that end mid-group coast on
            # their last frame; real_t counts the genuine frames.
            group = []          # [T][B] frames
            real_t = [0] * b
            for tt in range(t_batch):
                row = []
                for s, cap in enumerate(caps):
                    ok, f = (cap.read() if live[s] else (False, None))
                    if not ok:
                        live[s] = False
                        f = last[s]
                        if f is None:
                            break
                    else:
                        real_t[s] = tt + 1
                    last[s] = f
                    row.append(f)
                if len(row) < b:
                    break
                group.append(row)
            if len(group) < t_batch or not any(real_t):
                break
            shapes = {f.shape[:2] for row in group for f in row}
            if len(shapes) > 1:
                print(f"ERROR: all videos must share one resolution; "
                      f"got {sorted(shapes)} (HxW).")
                if prev is not None:
                    _emit(prev)  # the resolved previous step is real
                    prev = None  # work — don't truncate the outputs
                return 1
            step_real = sum(real_t)
            # Dispatch this step, then draw/encode the PREVIOUS step's
            # tracks while the device computes (JAX dispatch is async;
            # BatchedBoTSORTPipeline.update_async) — the host-side
            # drawing + mp4 encode no longer serializes with compute.
            if t_batch == 1:
                handle = pipeline.update_async(np.stack(group[0]))
            else:
                # [T][B] -> [B, T, H, W, 3]
                handle = pipeline.update_async(
                    np.stack([np.stack([group[tt][s]
                                        for tt in range(t_batch)])
                              for s in range(b)]))
            if prev is not None:
                _emit(prev)
            tracks = handle.result()
            if t_batch == 1:
                prev = (group, real_t, [tracks])
            else:
                prev = (group, real_t, tracks)
            if t_start is None:
                t_start = time.perf_counter()  # exclude first compile
            else:
                live_frames += step_real
            n += 1
            if args.max_frames and n * t_batch >= args.max_frames:
                break
        if prev is not None:
            _emit(prev)
    finally:
        for wtr in writers:
            if wtr is not None:
                wtr.release()
        for cap in caps:
            cap.release()
    dt = (time.perf_counter() - t_start) if t_start else 0.0
    agg = live_frames / dt if dt > 0 else float("nan")
    print(green(f"processed {n} steps x {b} streams "
                f"({agg:.1f} FPS aggregate over live streams, "
                "steady-state)"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
