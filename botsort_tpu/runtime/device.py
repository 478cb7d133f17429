"""Device and compilation-cache management.

The reference's only persistence is its TensorRT engine cache
(``trt_engine_cache_enable/path='.'``, demo_bottrack_onnx_tflite.py:
2064-2068; first compile ~15 min, README.md:101) plus pre-built engines
downloaded per GPU model. The TPU analog is XLA's persistent compilation
cache: first jit of the fused frame step compiles in tens of seconds and
every later process start replays from cache — no per-batch-size engine
grind (the reference pre-builds 100 body-ReID engines over 6h45m,
optimize_reid_tensorrt_engine.sh:19-21; our ReID batch shape is static).
"""

from __future__ import annotations

import os

import jax

_CACHE_INITIALIZED = False


def setup_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent XLA compilation cache (idempotent)."""
    global _CACHE_INITIALIZED
    cache_dir = cache_dir or os.environ.get(
        "BOTSORT_TPU_CACHE", os.path.expanduser("~/.cache/botsort_tpu/xla"))
    if not _CACHE_INITIALIZED:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _CACHE_INITIALIZED = True
    return cache_dir


def platform_summary() -> dict:
    """Hardware probe — the analog of the reference's nvidia-smi parse
    (demo:1840-1850), reporting the JAX backend instead."""
    try:
        devices = jax.devices()
        return {
            "backend": jax.default_backend(),
            "device_count": len(devices),
            "devices": [str(d) for d in devices],
        }
    except Exception as e:  # pragma: no cover - env specific
        return {"backend": "unavailable", "error": str(e), "devices": []}
