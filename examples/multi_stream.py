"""Multi-stream scale-out: N videos data-parallel over a TPU mesh.

One stream per device via jax.sharding (parallel/streams.py); within a
device you can additionally batch streams with frame_step_batched. Run:

  python examples/multi_stream.py a.mp4 b.mp4 ...   (#videos = #devices)
"""

import sys

import cv2
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.parallel.streams import (
    init_stream_stores,
    make_mesh,
    make_multi_stream_step,
)
from botsort_tpu.runtime.assets import build_bundle


def main(paths):
    n = len(paths)
    mesh = make_mesh(n)
    tracker_cfg = TrackerConfig()
    nms_cfg = NMSConfig()
    pipe_cfg = PipelineConfig()

    bundle = build_bundle(weights_dir="weights")
    stores = init_stream_stores(mesh, n, tracker_cfg)
    step = make_multi_stream_step(mesh, tracker_cfg, nms_cfg, pipe_cfg)

    caps = [cv2.VideoCapture(p) for p in paths]
    frame_no = 0
    while True:
        frames = []
        for cap in caps:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f)
        if len(frames) < n:
            break
        frame_no += 1
        batch = jax.device_put(
            jnp.asarray(np.stack(frames)), NamedSharding(mesh, P("stream")))
        stores, result = step(bundle, stores, batch)
        valid = np.asarray(result.tracks.valid)
        ids = np.asarray(result.tracks.track_id)
        for s in range(n):
            print(f"frame {frame_no} stream {s}: "
                  f"ids {ids[s][valid[s]].tolist()}")
    for cap in caps:
        cap.release()


if __name__ == "__main__":
    main(sys.argv[1:])
