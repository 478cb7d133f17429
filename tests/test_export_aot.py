"""AOT export/load of the frame step (runtime/exported.py, cli/export.py).

The TPU-native analog of the reference's shipped TensorRT engine files
(demo_bottrack_onnx_tflite.py:33-51): serialize the lowered program,
reload it elsewhere, call it with (params, store, frame) — outputs must
match the live jitted path exactly (same lowering, same arithmetic).
"""

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
import pytest

pytestmark = pytest.mark.slow

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

TRACKER = TrackerConfig(max_tracks=16, max_dets=8,
                        body_feature_dim=256, face_feature_dim=256)
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


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    from botsort_tpu.cli import export as export_cli

    out = tmp_path_factory.mktemp("aot") / "exported"
    rc = export_cli.main(["--out", str(out), "--mini", "-ep", "cpu",
                          "--resolutions", "120x160", "--streams", "2"])
    assert rc == 0
    return out


def test_cli_writes_manifest_and_artifacts(export_dir):
    manifest = json.loads((export_dir / "manifest.json").read_text())
    assert manifest["platform"] == "cpu"
    assert manifest["tracker_cfg"]["max_tracks"] == 16
    assert tuple(manifest["pipe_cfg"]["detector_input_hw"]) == (96, 128)
    assert len(manifest["artifacts"]) >= 1
    for e in manifest["artifacts"]:
        path = export_dir / e["file"]
        assert path.is_file() and path.stat().st_size == e["bytes"]
    # Every artifact actually loads.
    fn = load_frame_step(
        (export_dir / manifest["artifacts"][0]["file"]).read_bytes())
    assert callable(fn)


def test_exported_pipeline_matches_live(export_dir, bundle):
    """Full serving loop from artifacts: load_pipeline must produce the
    SAME tracks as the live-jitted BoTSORTPipeline, frame for frame
    (same programs, same host dispatch/overflow logic)."""
    from botsort_tpu.pipeline.host import BoTSORTPipeline
    from botsort_tpu.runtime.exported import _cfg_from_dict, load_pipeline

    manifest = json.loads((export_dir / "manifest.json").read_text())
    tracker_cfg = _cfg_from_dict(TrackerConfig, manifest["tracker_cfg"])
    nms_cfg = _cfg_from_dict(NMSConfig, manifest["nms_cfg"])
    pipe_cfg = _cfg_from_dict(PipelineConfig, manifest["pipe_cfg"])

    params3 = (bundle.detector_params, bundle.body_params,
               bundle.face_params)
    exported = load_pipeline(str(export_dir), params3)
    live = BoTSORTPipeline(bundle, tracker_cfg, nms_cfg, pipe_cfg)

    rng = np.random.RandomState(3)
    for t in range(3):
        f = np.full((120, 160, 3), 70, np.uint8)
        f[30 + 2 * t:90 + 2 * t, 40:90] = rng.randint(
            0, 255, (60, 50, 3), np.uint8)
        tr_live = live.update(f)
        tr_exp = exported.update(f)
        assert [v.track_id for v in tr_exp] == \
            [v.track_id for v in tr_live]
        for a, b in zip(tr_live, tr_exp):
            np.testing.assert_array_equal(a.tlbr, b.tlbr)


def test_exported_batched_pipeline_matches_live(export_dir, bundle):
    """Multi-stream artifact serving: load_batched_pipeline equals the
    live BatchedBoTSORTPipeline per stream, per frame."""
    from botsort_tpu.pipeline.host import BatchedBoTSORTPipeline
    from botsort_tpu.runtime.exported import (
        _cfg_from_dict,
        load_batched_pipeline,
    )

    manifest = json.loads((export_dir / "manifest.json").read_text())
    assert len(manifest["batched_artifacts"]) >= 1
    tracker_cfg = _cfg_from_dict(TrackerConfig, manifest["tracker_cfg"])
    nms_cfg = _cfg_from_dict(NMSConfig, manifest["nms_cfg"])
    pipe_cfg = _cfg_from_dict(PipelineConfig, manifest["pipe_cfg"])

    params3 = (bundle.detector_params, bundle.body_params,
               bundle.face_params)
    exported = load_batched_pipeline(str(export_dir), params3, 2)
    live = BatchedBoTSORTPipeline(bundle, 2, tracker_cfg, nms_cfg,
                                  pipe_cfg)

    rng = np.random.RandomState(5)
    for t in range(2):
        frames = []
        for s in range(2):
            f = np.full((120, 160, 3), 70, np.uint8)
            f[20 + 10 * s + 2 * t:80 + 10 * s + 2 * t, 40:90] = \
                rng.randint(0, 255, (60, 50, 3), np.uint8)
            frames.append(f)
        tr_live = live.update(np.stack(frames))
        tr_exp = exported.update(np.stack(frames))
        for s in range(2):
            assert [v.track_id for v in tr_exp[s]] == \
                [v.track_id for v in tr_live[s]]
            for a, b in zip(tr_live[s], tr_exp[s]):
                np.testing.assert_array_equal(a.tlbr, b.tlbr)


def test_multitrack_cli_artifact_mode(export_dir, tmp_path, capsys):
    """multitrack --artifact_dir drives the batched AOT path end to end
    (videos at an exported resolution, per-stream outputs written)."""
    import cv2

    from botsort_tpu.cli import multitrack

    paths = []
    for i in range(2):
        p = tmp_path / f"v{i}.mp4"
        w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"),
                            30, (160, 120))
        for t in range(4):
            img = np.full((120, 160, 3), 70, np.uint8)
            img[30 + 4 * t:80 + 4 * t, 40 + 10 * i:90 + 10 * i] = 200
            w.write(img)
        w.release()
        paths.append(str(p))

    rc = multitrack.main(
        ["-v", *paths, "--mini", "-ep", "cpu",
         "--artifact_dir", str(export_dir),
         "--max_frames", "3", "--output_dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "processed" in out
    for i in range(2):
        assert (tmp_path / f"v{i}_tracked.mp4").is_file()


def test_exported_pipeline_unknown_resolution_errors(export_dir, bundle):
    from botsort_tpu.runtime.exported import load_pipeline

    params3 = (bundle.detector_params, bundle.body_params,
               bundle.face_params)
    exported = load_pipeline(str(export_dir), params3)
    with pytest.raises(KeyError, match="no exported artifact"):
        exported.update(np.zeros((64, 64, 3), np.uint8))
