"""Tracking service: frames in over TCP, track JSON out.

A minimal production-serving surface over the fused pipeline (the
reference is a demo script only). Protocol, per connection (one
connection = one tracking stream with its own TrackStore):

  client -> server:  [4-byte big-endian length][JPEG or PNG bytes]
  server -> client:  [4-byte big-endian length][JSON line]

JSON: {"frame": n, "tracks": [{"id": i, "tlbr": [x1,y1,x2,y2],
"score": s, "class": 0}, ...]}. A zero-length frame closes the stream.

Connections are served sequentially from a single worker (one TPU chip
executes one program at a time anyway); each connection's tracker state
is isolated. Run: python -m botsort_tpu.cli.serve --port 8700 [--mini]
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
from argparse import ArgumentParser

import numpy as np


def recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def tracks_to_json(frame_no: int, tracks) -> bytes:
    return json.dumps({
        "frame": frame_no,
        "tracks": [
            {"id": t.track_id,
             "tlbr": [round(float(v), 2) for v in t.tlbr],
             "score": round(t.score, 4), "class": 0}
            for t in tracks
        ],
    }).encode()


def make_handler(pipeline_factory):
    import cv2

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            pipeline = pipeline_factory()
            frame_no = 0
            sock = self.request
            while True:
                try:
                    (length,) = struct.unpack(">I", recv_exact(sock, 4))
                except ConnectionError:
                    return
                if length == 0:
                    return
                data = recv_exact(sock, length)
                img = cv2.imdecode(
                    np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
                if img is None:
                    payload = json.dumps({"error": "decode failed"}).encode()
                else:
                    frame_no += 1
                    payload = tracks_to_json(frame_no,
                                             pipeline.update(img))
                sock.sendall(struct.pack(">I", len(payload)) + payload)

    return Handler


def build_pipeline_factory(args):
    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.pipeline.host import BoTSORTPipeline
    from botsort_tpu.runtime import assets
    from botsort_tpu.runtime.device import setup_compilation_cache

    setup_compilation_cache()
    if getattr(args, "artifact_dir", ""):
        # AOT-artifact serving: deserialized StableHLO programs
        # (cli/export.py) + checkpoint params — no model re-trace, no
        # first-compile stall; configs come from the manifest.
        if getattr(args, "int8", False):
            raise SystemExit(
                "ERROR: --int8 cannot apply to --artifact_dir serving "
                "(the programs are already lowered); export int8 "
                "artifacts instead, or serve live models with --int8.")
        from botsort_tpu.runtime.exported import load_pipeline

        bundle = assets.build_bundle(weights_dir=args.weights_dir,
                                     mini=args.mini)
        params3 = (bundle.detector_params, bundle.body_params,
                   bundle.face_params)
        # One deserialize per program for the whole server — new
        # connections share the compiled-program cache and only get
        # fresh tracker state.
        shared_programs = {}

        def factory():
            return load_pipeline(args.artifact_dir, params3,
                                 program_cache=shared_programs)

        return factory
    bundle = assets.build_bundle(weights_dir=args.weights_dir,
                                 mini=args.mini)
    pipe_cfg = PipelineConfig() if not args.mini else PipelineConfig(
        detector_input_hw=(96, 128), body_reid_input_hw=(64, 32),
        face_reid_input_hw=(32, 32), max_reid_batch=4)
    if getattr(args, "int8", False):
        import sys

        from botsort_tpu.models.quantize import quantize_bundle

        # No stream yet at startup: calibrate on synthetic frames (the
        # conservative amax envelope); recalibrate offline with
        # quantize_bundle(frames=...) for production deployments.
        print(
            "WARNING: --int8 activation scales were calibrated on "
            "SYNTHETIC random frames (no stream is available at serve "
            "startup); per-tensor scales may mismatch real camera "
            "statistics and degrade accuracy. Recalibrate offline with "
            "quantize_bundle(frames=<real frames>) for production.",
            file=sys.stderr)
        bundle = quantize_bundle(bundle, pipe_cfg=pipe_cfg)
    tracker_cfg = TrackerConfig(
        body_feature_dim=2048 if not args.mini else 256,
        face_feature_dim=256,
        # mini = CI/smoke geometry: 8 det slots keeps the compiled
        # cascade/NMS/bucket programs small (the full 50-slot width at
        # mini model scale dominated suite compile time).
        max_dets=TrackerConfig().max_dets if not args.mini else 8)

    def factory():
        return BoTSORTPipeline(bundle, tracker_cfg, NMSConfig(), pipe_cfg)

    return factory


def main(argv=None):
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8700)
    parser.add_argument("--weights_dir", default="weights")
    parser.add_argument("--mini", action="store_true")
    parser.add_argument(
        "--int8", action="store_true",
        help="Serve the body ReID encoder with int8 convolutions scoped "
             "to the mid-network (models/quantize.py scope='mid' — "
             "measured ~10%% faster than bf16 at b64 on v5e; the "
             "detector stays bf16: int8 measured a loss there in every "
             "configuration, docs/PERF.md).")
    parser.add_argument(
        "--artifact_dir", type=str, default="",
        help="Serve from AOT export artifacts (cli/export.py) instead "
             "of live-jitted models: no re-trace, no first-compile "
             "stall; frame resolution must match an exported artifact.")
    parser.add_argument(
        "--max_connections", type=int, default=0,
        help="Exit after serving N connections (0 = forever; testing).")
    parser.add_argument(
        "--warmup_hw", type=str, default="",
        help="HxW (e.g. 1080x1920) to pre-compile before accepting "
             "connections, so the first client request isn't stalled by "
             "the first-compile (use with a cold compilation cache).")
    args = parser.parse_args(argv)

    factory = build_pipeline_factory(args)
    if args.warmup_hw:
        h, w = (int(v) for v in args.warmup_hw.split("x"))
        warm = factory()
        warm.update(np.zeros((h, w, 3), np.uint8))
        print(f"warmed {h}x{w}")
    served = 0

    class Server(socketserver.TCPServer):
        allow_reuse_address = True

        def process_request(self, request, client_address):
            nonlocal served
            super().process_request(request, client_address)
            served += 1
            if args.max_connections and served >= args.max_connections:
                raise KeyboardInterrupt

    with Server((args.host, args.port), make_handler(factory)) as srv:
        import jax

        from botsort_tpu.runtime.envelope import (
            aggregate_fps,
            max_realtime_streams,
        )

        if jax.default_backend() == "tpu":
            # Connections are served sequentially (one chip, one
            # program); the measured envelope documents how many
            # concurrent real-time streams this chip could hold if
            # batched via cli.multitrack instead.
            from botsort_tpu.config import PipelineConfig

            reid_hw = PipelineConfig().body_reid_input_hw
            print(f"capacity: ~{max_realtime_streams(body_reid_input_hw=reid_hw)} "
                  f"real-time streams/chip batched via cli.multitrack "
                  f"({aggregate_fps(reid_hw):.0f} FPS aggregate at ReID "
                  f"{reid_hw[0]}x{reid_hw[1]} measured, docs/PERF.md)")
        print(f"serving on {args.host}:{srv.server_address[1]}")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
