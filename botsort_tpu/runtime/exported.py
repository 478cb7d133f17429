"""AOT export/load of the fused frame step (jax.export, StableHLO).

The reference ships pre-built TensorRT engine/profile files per GPU
model (``ONNX_TRTENGINE_SETS``, demo_bottrack_onnx_tflite.py:33-51) so
deployment hosts never pay the 6h45m engine grind. The TPU-native
analog: serialize the traced-and-lowered frame step per (resolution,
bucket pair) into a versioned artifact that a serving host deserializes
and calls — no Python model code, no re-trace. This complements the
persistent XLA compile cache (runtime/device.py): the cache speeds up
the SAME machine across process restarts; an export is a *shippable*
artifact. Weights ride separately (orbax checkpoints) and are passed as
call arguments, so one artifact serves any fine-tune of the same
architecture.

Artifact layout (written by cli/export.py)::

    exported/
      manifest.json                 resolutions, buckets, configs, jax version
      step_{H}x{W}_b{B}_f{F}.jaxexp serialized jax.export.Exported

Call convention: ``fn(params3, store, frame_bgr) -> (store, FrameResult)``
where ``params3 = (detector_params, body_params, face_params)``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from botsort_tpu.pipeline import frame_step as fs
from botsort_tpu.track.cascade import TrackOutputs
from botsort_tpu.track.state import TrackStore, empty_store

_registered = False


def _ensure_registered() -> None:
    """Register the NamedTuple pytree containers with jax.export.

    Idempotent; required on BOTH the export and the load side (the
    deserialized calling convention refers to these by name).
    """
    global _registered
    if _registered:
        return
    for cls in (TrackStore, TrackOutputs, fs.FrameResult):
        try:
            jexport.register_namedtuple_serialization(
                cls, serialized_name=f"botsort_tpu.{cls.__name__}")
        except ValueError:
            pass  # this process already registered it
    _registered = True


def _avals(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        tree)


def export_frame_step(
    bundle,
    tracker_cfg,
    nms_cfg,
    pipe_cfg,
    frame_hw: Tuple[int, int],
    reid_bucket: int,
    face_bucket: int,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize one (resolution, bucket-pair) frame-step program.

    platforms: lowering targets (default: the current backend). A TPU
    export embeds TPU custom calls (the Pallas cascade solver) and must
    be loaded on TPU — same contract as the reference's sm86-only
    engine files.
    """
    _ensure_registered()
    det = bundle.detector
    body = bundle.body_encoder
    face = bundle.face_encoder

    def step(params3, store, frame_bgr):
        b = fs.ModelBundle(det, params3[0], body, params3[1],
                           face, params3[2])
        return fs.frame_step(b, store, frame_bgr, tracker_cfg, nms_cfg,
                             pipe_cfg, None, reid_bucket, face_bucket)

    params3 = (bundle.detector_params, bundle.body_params,
               bundle.face_params)
    h, w = frame_hw
    exp = jexport.export(jax.jit(step), platforms=platforms)(
        _avals(params3), _avals(empty_store(tracker_cfg)),
        jax.ShapeDtypeStruct((h, w, 3), jnp.uint8))
    return exp.serialize()


def load_frame_step(blob: bytes):
    """Deserialize an exported step; returns
    ``fn(params3, store, frame_bgr) -> (TrackStore, FrameResult)``."""
    _ensure_registered()
    exp = jexport.deserialize(blob)
    return exp.call


def export_frame_step_batched(
    bundle,
    tracker_cfg,
    nms_cfg,
    pipe_cfg,
    n_streams: int,
    frame_hw: Tuple[int, int],
    reid_bucket: int,
    face_bucket: int,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize one batched-streams program (frame_step_batched):
    ``fn(params3, stores[B], frames[B,H,W,3]) -> (stores, results)``."""
    _ensure_registered()
    det = bundle.detector
    body = bundle.body_encoder
    face = bundle.face_encoder

    def step(params3, stores, frames_bgr):
        b = fs.ModelBundle(det, params3[0], body, params3[1],
                           face, params3[2])
        return fs.frame_step_batched(b, stores, frames_bgr, tracker_cfg,
                                     nms_cfg, pipe_cfg, None,
                                     reid_bucket, face_bucket)

    params3 = (bundle.detector_params, bundle.body_params,
               bundle.face_params)
    one = empty_store(tracker_cfg)
    stores = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_streams,) + jnp.shape(x)), one)
    h, w = frame_hw
    exp = jexport.export(jax.jit(step), platforms=platforms)(
        _avals(params3), _avals(stores),
        jax.ShapeDtypeStruct((n_streams, h, w, 3), jnp.uint8))
    return exp.serialize()


def artifact_name(frame_hw: Tuple[int, int], reid_bucket: int,
                  face_bucket: int) -> str:
    h, w = frame_hw
    return f"step_{h}x{w}_b{reid_bucket}_f{face_bucket}.jaxexp"


def batched_artifact_name(n_streams: int, frame_hw: Tuple[int, int],
                          reid_bucket: int, face_bucket: int) -> str:
    h, w = frame_hw
    return (f"step_s{n_streams}_{h}x{w}"
            f"_b{reid_bucket}_f{face_bucket}.jaxexp")


def _cfg_from_dict(cls, d):
    """Rebuild a config dataclass from its manifest JSON dict (JSON
    turns tuples into lists; the configs contain no true list fields)."""
    return cls(**{k: tuple(v) if isinstance(v, list) else v
                  for k, v in d.items()})


def load_pipeline(artifact_dir: str, params3, program_cache=None):
    """A BoTSORTPipeline served from AOT artifacts instead of live jit.

    A deployment host needs only: an export directory (cli/export.py)
    and the weights (orbax / in-memory param trees; ``params3 =
    (detector, body, face)``). The tracker, bucket dispatch, overflow
    re-run, and track assembly are the SAME host logic as the live
    pipeline (pipeline/host.py) — only the device step is swapped for
    deserialized programs, one per (resolution, bucket pair). Configs
    come from the manifest, so the runtime cannot drift from what the
    programs were traced with.

    Constraints vs the live pipeline: the frame resolution must match
    an exported artifact, and GMC is unsupported (the programs were
    traced with gmc_affine=None).

    program_cache: optional dict shared across load_pipeline calls so
    multiple pipelines (e.g. one per serve connection) deserialize each
    program once; tracker state stays per-pipeline.
    """
    import json
    import os

    from botsort_tpu.config import (
        NMSConfig,
        PipelineConfig,
        TrackerConfig,
    )
    from botsort_tpu.pipeline.host import BoTSORTPipeline

    with open(os.path.join(artifact_dir, "manifest.json")) as f:
        manifest = json.load(f)
    tracker_cfg = _cfg_from_dict(TrackerConfig, manifest["tracker_cfg"])
    nms_cfg = _cfg_from_dict(NMSConfig, manifest["nms_cfg"])
    pipe_cfg = _cfg_from_dict(PipelineConfig, manifest["pipe_cfg"])
    if pipe_cfg.enable_gmc:
        raise ValueError(
            "exported artifacts were traced without GMC; re-export "
            "with enable_gmc=False or use the live pipeline")
    if not pipe_cfg.host_bucket_dispatch:
        raise ValueError(
            "exported serving requires host_bucket_dispatch=True "
            "(one program per bucket pair)")

    class ExportedPipeline(BoTSORTPipeline):
        def __init__(self):
            # bundle=None: _dispatch (the only bundle consumer on the
            # host-dispatch path) is overridden below.
            super().__init__(None, tracker_cfg, nms_cfg, pipe_cfg)
            self._params3 = params3
            self._by_key = {
                (tuple(e["frame_hw"]), e["reid_bucket"],
                 e["face_bucket"]): e["file"]
                for e in manifest["artifacts"]
            }
            self._loaded = (program_cache if program_cache is not None
                            else {})

        def _program(self, hw, b, fb):
            key = (hw, b, fb)
            fn = self._loaded.get(key)
            if fn is None:
                name = self._by_key.get(key)
                if name is None:
                    res = sorted({k[0] for k in self._by_key})
                    raise KeyError(
                        f"no exported artifact for frame {hw} buckets "
                        f"({b},{fb}); exported resolutions: {res} "
                        f"(re-run cli/export.py)")
                with open(os.path.join(artifact_dir, name), "rb") as f:
                    fn = load_frame_step(f.read())
                self._loaded[key] = fn
            return fn

        def _dispatch(self, store, frame_dev, gmc_affine, reid_bucket,
                      face_bucket):
            assert gmc_affine is None
            hw = (int(frame_dev.shape[0]), int(frame_dev.shape[1]))
            fn = self._program(hw, reid_bucket, face_bucket)
            return fn(self._params3, store, frame_dev)

    return ExportedPipeline()


def load_batched_pipeline(artifact_dir: str, params3, n_streams: int):
    """A BatchedBoTSORTPipeline served from AOT artifacts
    (cli/export.py --streams); the multi-stream analog of
    :func:`load_pipeline`. Same host logic (shared bucket dispatch,
    overflow re-run, per-stream assembly); only the batched device step
    is swapped for deserialized programs keyed on
    (n_streams, resolution, bucket pair)."""
    import json
    import os

    from botsort_tpu.config import (
        NMSConfig,
        PipelineConfig,
        TrackerConfig,
    )
    from botsort_tpu.pipeline.host import BatchedBoTSORTPipeline

    with open(os.path.join(artifact_dir, "manifest.json")) as f:
        manifest = json.load(f)
    tracker_cfg = _cfg_from_dict(TrackerConfig, manifest["tracker_cfg"])
    nms_cfg = _cfg_from_dict(NMSConfig, manifest["nms_cfg"])
    pipe_cfg = _cfg_from_dict(PipelineConfig, manifest["pipe_cfg"])
    if not pipe_cfg.host_bucket_dispatch:
        raise ValueError(
            "exported serving requires host_bucket_dispatch=True "
            "(one program per bucket pair)")
    by_key = {
        (e["streams"], tuple(e["frame_hw"]), e["reid_bucket"],
         e["face_bucket"]): e["file"]
        for e in manifest.get("batched_artifacts", [])
    }
    loaded = {}

    def step(_bundle, stores, frames, _t, _n, _p,
             gmc_affines=None, reid_bucket=None, face_bucket=None):
        assert gmc_affines is None
        key = (n_streams,
               (int(frames.shape[1]), int(frames.shape[2])),
               reid_bucket, face_bucket)
        fn = loaded.get(key)
        if fn is None:
            name = by_key.get(key)
            if name is None:
                raise KeyError(
                    f"no batched artifact for streams={key[0]} frame "
                    f"{key[1]} buckets {key[2:]} — re-run cli/export.py "
                    f"--streams {n_streams}")
            with open(os.path.join(artifact_dir, name), "rb") as f:
                fn = load_frame_step(f.read())
            loaded[key] = fn
        return fn(params3, stores, frames)

    pipe = BatchedBoTSORTPipeline(None, n_streams, tracker_cfg, nms_cfg,
                                  pipe_cfg)
    pipe._step = step
    return pipe
