"""botsort_tpu — a TPU-native (JAX/XLA/Pallas) multi-object tracking framework.

A ground-up rebuild of the capabilities of PINTO0309/BoT-SORT-ONNX-TensorRT
(reference: /root/reference/demo_bottrack_onnx_tflite.py) designed for TPU:

- YOLOX-X body/head/hand/face detection, FastReID SBS-S50 body ReID and
  face-reidentification-retail-0095 face ReID implemented natively in JAX
  (reference runs ONNX graphs through onnxruntime's TensorRT EP).
- The entire per-frame tracker step — preprocessing, detection, NMS, box
  hierarchy, ReID crops + embeddings, cost fusion, linear assignment, Kalman
  predict/update, and track-store bookkeeping — compiles as ONE jitted
  function over fixed max-track/max-detection slots: one host->device image
  upload and one small readback per frame.
- Multi-stream scale-out via `jax.sharding.Mesh` + `shard_map` (pure data
  parallelism over independent video streams; no collectives needed).

Package layout:
  ops/        batched Kalman filter, IoU, NMS, linear assignment, crops
  models/     YOLOX, FastReID(SBS-S50), FaceReID — pure functions + params
  track/      SoA track store + BoT-SORT association cascade (jittable)
  pipeline/   fused frame step, on-device preprocessing
  parallel/   multi-stream mesh sharding
  runtime/    device/cache management, native-extension loading, assets
  io/         OpenCV video capture/writer, drawing (host side)
  cli/        demo entrypoint mirroring the reference CLI flags
  utils/      logging helpers
"""

__version__ = "0.1.0"

from botsort_tpu.config import (  # noqa: F401
    TrackerConfig,
    NMSConfig,
    PipelineConfig,
)

_LAZY = {
    # Heavy imports (jax/flax) loaded on first access, so that
    # `import botsort_tpu` stays light and backend selection is still
    # possible afterwards.
    "BoTSORTPipeline": ("botsort_tpu.pipeline.host", "BoTSORTPipeline"),
    "build_bundle": ("botsort_tpu.runtime.assets", "build_bundle"),
    "frame_step": ("botsort_tpu.pipeline.frame_step", "frame_step"),
    "frame_step_batched": ("botsort_tpu.pipeline.frame_step",
                           "frame_step_batched"),
    "frame_step_temporal": ("botsort_tpu.pipeline.frame_step",
                            "frame_step_temporal"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'botsort_tpu' has no attribute {name!r}")
