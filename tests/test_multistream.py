"""Multi-stream sharded step on the 8-virtual-device CPU mesh.

Verifies (a) the sharded program compiles and executes over a real Mesh,
and (b) stream independence: every stream's track outputs must equal a
single-stream run on the same frames (pure data parallelism, no
cross-stream coupling).
"""

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.parallel.streams import (
    init_stream_stores,
    make_mesh,
    make_multi_stream_step,
)
from botsort_tpu.pipeline.frame_step import frame_step
from botsort_tpu.runtime.assets import build_bundle
from botsort_tpu.track.state import empty_store

TRK = TrackerConfig(max_tracks=16, body_feature_dim=256,
                    face_feature_dim=256)
NMSC = NMSConfig(max_boxes_per_class=8, score_threshold=0.01)
PIPE = PipelineConfig(detector_input_hw=(96, 128),
                      body_reid_input_hw=(64, 32),
                      face_reid_input_hw=(32, 32),
                      max_reid_batch=4)

N_STREAMS = 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_streams_match_single_stream():
    bundle = build_bundle(mini=True)
    mesh = make_mesh(8)
    stores = init_stream_stores(mesh, N_STREAMS, TRK)
    step = make_multi_stream_step(mesh, TRK, NMSC, PIPE)

    rng = np.random.default_rng(0)
    all_frames = [
        rng.integers(0, 255, (N_STREAMS, 120, 160, 3), dtype=np.uint8)
        for _ in range(3)
    ]

    sharded_out = []
    for f in all_frames:
        frames = jax.device_put(
            jnp.asarray(f), NamedSharding(mesh, P("stream")))
        stores, result = step(bundle, stores, frames)
        sharded_out.append(jax.device_get(result.tracks))

    # Single-stream reference for each stream.
    for s in range(N_STREAMS):
        store = empty_store(TRK)
        for t, f in enumerate(all_frames):
            store, result = frame_step(
                bundle, store, jnp.asarray(f[s]), TRK, NMSC, PIPE)
            ref = jax.device_get(result.tracks)
            got_valid = sharded_out[t].valid[s]
            np.testing.assert_array_equal(got_valid, ref.valid)
            np.testing.assert_array_equal(
                sharded_out[t].track_id[s][got_valid],
                ref.track_id[ref.valid])
            np.testing.assert_allclose(
                sharded_out[t].tlbr[s][got_valid],
                ref.tlbr[ref.valid], rtol=1e-5, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
@pytest.mark.parametrize("n_streams", [8, 6])
def test_mesh_pipeline_matches_single_chip_batched(n_streams):
    """The multi-chip serving topology (b streams/chip x N chips,
    MeshBatchedBoTSORTPipeline) returns the SAME track lists as the
    single-chip batched pipeline — including when the stream count
    doesn't divide the mesh (padded slice, outputs dropped)."""
    from botsort_tpu.pipeline.host import (
        BatchedBoTSORTPipeline,
        MeshBatchedBoTSORTPipeline,
    )

    bundle = build_bundle(mini=True)
    single = BatchedBoTSORTPipeline(bundle, n_streams, TRK, NMSC, PIPE)
    mesh = MeshBatchedBoTSORTPipeline(bundle, n_streams, n_chips=4,
                                      tracker_cfg=TRK, nms_cfg=NMSC,
                                      pipe_cfg=PIPE)
    assert mesh.n_chips == 4
    assert mesh.n_streams % 4 == 0  # padded to the mesh

    rng = np.random.default_rng(1)
    for _ in range(3):
        frames = rng.integers(0, 255, (n_streams, 120, 160, 3),
                              dtype=np.uint8)
        ref = single.update(frames)
        got = mesh.update(list(frames))
        assert len(got) == n_streams
        for s in range(n_streams):
            assert [t.track_id for t in got[s]] == \
                [t.track_id for t in ref[s]]
            for tg, tr in zip(got[s], ref[s]):
                np.testing.assert_allclose(tg.tlbr, tr.tlbr,
                                           rtol=1e-5, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_multitrack_auto_shards_over_mesh(tmp_path, monkeypatch, capsys):
    """multitrack --chips auto spreads streams over just enough chips
    to fit the measured envelope (VERDICT r4 #6)."""
    import cv2

    from botsort_tpu.cli import multitrack
    from botsort_tpu.runtime import envelope

    paths = []
    for i in range(2):
        p = tmp_path / f"v{i}.mp4"
        w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"),
                            30, (160, 120))
        for _ in range(3):
            w.write(np.full((120, 160, 3), 90, np.uint8))
        w.release()
        paths.append(str(p))

    monkeypatch.setenv(envelope._ENV_OVERRIDE, "30")  # cap = 1/chip
    rc = multitrack.main(
        ["-v", *paths, "--mini", "-ep", "cpu",
         "--max_frames", "2", "--output_dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "sharding 2 streams over 2 chips" in out
    # Sharded to 1 stream/chip, the per-chip envelope is met: no warning.
    assert "exceed the measured single-chip" not in out
    for i in range(2):
        assert (tmp_path / f"v{i}_tracked.mp4").exists()
