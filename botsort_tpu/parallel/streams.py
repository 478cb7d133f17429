"""Multi-stream tracking over a TPU mesh (data parallelism over streams).

The reference is strictly single-process single-GPU (SURVEY.md §2: no
distributed execution of any kind). The TPU-native scale-out axis for
this workload is *independent video streams*: per-stream tracker state
has no cross-stream coupling, so the natural mapping is pure data
parallelism — model params replicated, stream state and frames sharded
over devices via `jax.sharding.Mesh` + `shard_map`, with zero collectives
in the steady state (BASELINE.json config 5: 8 concurrent 1080p streams
on v5e-8; ICI is only used at init to broadcast params).

Within each device, multiple streams vmap into one batched program, so a
v5e-8 serving 32 streams runs 4 streams/chip batched through the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.pipeline.frame_step import frame_step_batched
from botsort_tpu.track.state import TrackStore, empty_store


def make_mesh(n_devices: Optional[int] = None,
              backend: Optional[str] = None) -> Mesh:
    """1-D mesh over (the first n) devices, axis name "stream"."""
    import numpy as np

    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("stream",))


def _local_step(bundle, stores, frames, tracker_cfg, nms_cfg, pipe_cfg,
                reid_bucket=None, face_bucket=None):
    # The per-device slice runs the natively-batched step (NOT a vmap of
    # frame_step: vmap would turn the cond-gated ReID chunking into a
    # select that always pays for crowds, and batch-1 convs underuse the
    # MXU).
    return frame_step_batched(bundle, stores, frames, tracker_cfg,
                              nms_cfg, pipe_cfg, None,
                              reid_bucket, face_bucket)


def make_multi_stream_step(
    mesh: Mesh,
    tracker_cfg: TrackerConfig,
    nms_cfg: NMSConfig,
    pipe_cfg: PipelineConfig,
):
    """Build the sharded multi-stream step.

    Returned fn: (bundle, stores, frames [S, H, W, 3],
    reid_bucket=None, face_bucket=None) -> (stores, FrameResult with
    leading stream dim). S must be a multiple of the mesh size; each
    device runs the natively-batched per-chip program on its
    S/n_devices-stream slice (the serving topology: b streams/chip x N
    chips); streams shard across devices, params replicate. The static
    bucket pair is shared by every device (the host dispatcher sizes it
    by the max live count across ALL streams, so per-device re-runs
    can't diverge)."""

    @functools.partial(
        jax.jit,
        static_argnames=("tracker_cfg", "nms_cfg", "pipe_cfg",
                         "reid_bucket", "face_bucket"),
        donate_argnames=("stores",),
    )
    def step(bundle, stores, frames, tracker_cfg, nms_cfg, pipe_cfg,
             reid_bucket, face_bucket):
        sharded = jax.shard_map(
            functools.partial(
                _local_step,
                tracker_cfg=tracker_cfg,
                nms_cfg=nms_cfg,
                pipe_cfg=pipe_cfg,
                reid_bucket=reid_bucket,
                face_bucket=face_bucket,
            ),
            mesh=mesh,
            in_specs=(P(), P("stream"), P("stream")),
            out_specs=P("stream"),
            check_vma=False,
        )
        return sharded(bundle, stores, frames)

    def run(bundle, stores, frames, reid_bucket=None, face_bucket=None):
        return step(bundle, stores, frames, tracker_cfg, nms_cfg,
                    pipe_cfg, reid_bucket, face_bucket)

    return run


def init_stream_stores(
    mesh: Mesh, n_streams: int, tracker_cfg: TrackerConfig
) -> TrackStore:
    """Per-stream track stores, sharded over the mesh's stream axis."""
    one = empty_store(tracker_cfg)
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape), one)
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(*(("stream",) + (None,) * (x.ndim - 1))))
        ),
        stacked,
    )
