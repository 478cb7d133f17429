"""Tracker-state checkpoint/resume.

The reference never persists tracker state — IDs reset every run
(BaseTrack.clear_count(), demo_bottrack_onnx_tflite.py:1264); its only
persistence is the TRT engine cache (SURVEY.md §5). This module adds a
capability the TPU rebuild gets nearly for free: the whole SoA TrackStore
is one pytree of arrays, so a live tracking session (track ids, Kalman
state, appearance features, frame counter) can be snapshotted to disk and
resumed — useful for stream migration, elastic restarts, and debugging.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from botsort_tpu.config import TrackerConfig
from botsort_tpu.track.state import TrackStore, empty_store


def save_store(path: str, store: TrackStore) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    host_store = jax.device_get(store)
    payload = {k: v for k, v in host_store._asdict().items()
               if v is not None}
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_store(path: str, cfg: TrackerConfig) -> Optional[TrackStore]:
    """Restore a TrackStore; returns None if no checkpoint exists."""
    if not os.path.isdir(path):
        return None
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    template = {k: v for k, v in empty_store(cfg)._asdict().items()
                if v is not None}
    payload = ckptr.restore(os.path.abspath(path), template)
    full = {**{k: None for k in TrackStore._fields}, **payload}
    return TrackStore(**full)
