"""Warmup CLI: compiles the configured resolutions into the cache."""

import os
import subprocess
import sys


def test_warmup_mini():
    # Run in a SUBPROCESS: this environment's jaxlib segfaults when yet
    # more programs are compiled late in a process that has already
    # compiled the suite's hundreds (reproduced inside
    # backend_compile_and_load and in the persistent-cache
    # serialize/deserialize paths; standalone runs are always fine).
    # Warmup compiles one program per host-dispatch bucket pair and
    # runs near the end of the suite, which reliably crossed the
    # threshold. A subprocess also covers the real CLI entry.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # -ep cpu is load-bearing: the axon TPU plugin ignores the
    # JAX_PLATFORMS env var, so without the flag this subprocess would
    # seize the real TPU (and collide with any process using it).
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "botsort_tpu.cli.warmup", "--mini",
         "-ep", "cpu", "--resolutions", "120x160"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "compiled 120x160" in proc.stdout
    # One line per (body, face) bucket pair the host dispatcher uses —
    # derive the expected count from the same bucket-set helper the
    # warmup CLI uses (hardcoding it broke when the set gained a mid
    # bucket).
    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.pipeline.frame_step import reid_bucket_set

    buckets = reid_bucket_set(
        TrackerConfig(max_tracks=16, max_dets=8, body_feature_dim=256,
                      face_feature_dim=256),
        NMSConfig(),
        PipelineConfig(detector_input_hw=(96, 128),
                       body_reid_input_hw=(64, 32),
                       face_reid_input_hw=(32, 32), max_reid_batch=4))
    n_pairs = sum(1 for b in buckets for fb in buckets if fb <= b)
    assert proc.stdout.count("compiled 120x160 buckets") == n_pairs, \
        proc.stdout
