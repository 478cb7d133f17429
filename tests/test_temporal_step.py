"""frame_step_temporal (T chained frames, one dispatch) vs sequential
frame_step calls — outputs must be identical."""

import pytest

# Compile-heavy integration module: full tier. The core tier
# (pytest -m 'not slow', <15 min cold) covers the same semantics
# via the cheap unit/oracle tests; run the full tier once per
# round (docs/TESTING.md).
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
from botsort_tpu.pipeline.frame_step import frame_step, frame_step_temporal
from botsort_tpu.runtime.assets import build_bundle
from botsort_tpu.track.state import empty_store

TRK = TrackerConfig(max_tracks=16, body_feature_dim=256,
                    face_feature_dim=256)
NMSC = NMSConfig(max_boxes_per_class=8, score_threshold=0.01)
PIPE = PipelineConfig(detector_input_hw=(96, 128),
                      body_reid_input_hw=(64, 32),
                      face_reid_input_hw=(32, 32),
                      max_reid_batch=4)

T = 3


def test_temporal_matches_sequential():
    bundle = build_bundle(mini=True)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (T, 120, 160, 3), dtype=np.uint8)

    store_t = empty_store(TRK)
    store_t, res_t = frame_step_temporal(
        bundle, store_t, jnp.asarray(frames), TRK, NMSC, PIPE)
    temporal = jax.device_get(res_t.tracks)

    store_s = empty_store(TRK)
    for t in range(T):
        store_s, res_s = frame_step(bundle, store_s,
                                    jnp.asarray(frames[t]), TRK, NMSC,
                                    PIPE)
        ref = jax.device_get(res_s.tracks)
        np.testing.assert_array_equal(temporal.valid[t], ref.valid)
        np.testing.assert_array_equal(temporal.track_id[t][ref.valid],
                                      ref.track_id[ref.valid])
        np.testing.assert_allclose(temporal.tlbr[t][ref.valid],
                                   ref.tlbr[ref.valid],
                                   rtol=1e-5, atol=1e-3)
    # Final stores equal too (chained state).
    for a, b in zip(jax.tree.leaves(jax.device_get(store_t)),
                    jax.tree.leaves(jax.device_get(store_s))):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)
