"""AOT export/load of the frame step (runtime/exported.py, cli/export.py).

The TPU-native analog of the reference's shipped TensorRT engine files
(demo_bottrack_onnx_tflite.py:33-51): serialize the lowered program,
reload it elsewhere, call it with (params, store, frame) — outputs must
match the live jitted path exactly (same lowering, same arithmetic).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.pipeline.frame_step import frame_step
from botsort_tpu.runtime.assets import build_bundle
from botsort_tpu.runtime.exported import (
    artifact_name,
    export_frame_step,
    load_frame_step,
)
from botsort_tpu.track.state import empty_store

TRACKER = TrackerConfig(max_tracks=16, body_feature_dim=256,
                        face_feature_dim=256)
PIPE = PipelineConfig(detector_input_hw=(96, 128),
                      body_reid_input_hw=(64, 32),
                      face_reid_input_hw=(32, 32), max_reid_batch=4)
HW = (192, 256)
BUCKET = 4


@pytest.fixture(scope="module")
def bundle():
    return build_bundle(mini=True)


@pytest.fixture(scope="module")
def blob(bundle):
    return export_frame_step(bundle, TRACKER, NMSConfig(), PIPE, HW,
                             BUCKET, BUCKET)


def _frame():
    rng = np.random.RandomState(7)
    f = np.full((*HW, 3), 60, np.uint8)
    f[40:120, 60:120] = rng.randint(0, 255, (80, 60, 3), np.uint8)
    return jnp.asarray(f)


def test_export_load_matches_live_path(bundle, blob):
    fn = load_frame_step(blob)
    params3 = (bundle.detector_params, bundle.body_params,
               bundle.face_params)
    frame = _frame()

    s_live, r_live = frame_step(bundle, empty_store(TRACKER), frame,
                                TRACKER, NMSConfig(), PIPE, None,
                                BUCKET, BUCKET)
    s_exp, r_exp = fn(params3, empty_store(TRACKER), frame)

    assert type(s_exp).__name__ == "TrackStore"
    assert type(r_exp).__name__ == "FrameResult"
    for a, b in zip(jax.tree.leaves(s_live), jax.tree.leaves(s_exp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(r_live), jax.tree.leaves(r_exp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_is_stateless_across_calls(bundle, blob):
    """The artifact must thread store state functionally — two chained
    calls equal two chained live steps (frame counter advances)."""
    fn = load_frame_step(blob)
    params3 = (bundle.detector_params, bundle.body_params,
               bundle.face_params)
    frame = _frame()
    s1, _ = fn(params3, empty_store(TRACKER), frame)
    s2, _ = fn(params3, s1, frame)
    assert int(s2.frame_count) == 2


def test_serialized_roundtrip_via_file(bundle, blob, tmp_path):
    p = tmp_path / artifact_name(HW, BUCKET, BUCKET)
    p.write_bytes(blob)
    fn = load_frame_step(p.read_bytes())
    params3 = (bundle.detector_params, bundle.body_params,
               bundle.face_params)
    s, r = fn(params3, empty_store(TRACKER), _frame())
    assert int(s.frame_count) == 1
    assert r.det_valid.shape[0] == 4  # C classes


def test_cli_writes_manifest_and_artifacts(tmp_path, capsys):
    from botsort_tpu.cli import export as export_cli

    out = tmp_path / "exported"
    rc = export_cli.main(["--out", str(out), "--mini", "-ep", "cpu",
                          "--resolutions", "120x160"])
    assert rc == 0
    manifest = json.loads((out / "manifest.json").read_text())
    assert manifest["platform"] == "cpu"
    assert len(manifest["artifacts"]) >= 1
    for e in manifest["artifacts"]:
        path = out / e["file"]
        assert path.is_file() and path.stat().st_size == e["bytes"]
    # Every artifact actually loads.
    fn = load_frame_step((out / manifest["artifacts"][0]["file"]
                          ).read_bytes())
    assert callable(fn)
