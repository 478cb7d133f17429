"""ReID encode bucketing + face compaction (pipeline/frame_step.py).

The bucket helpers must be semantically invisible: whatever bucket
runs, every slot's feature equals a direct full-width encode — real
faces get their own embedding, faceless slots get encoder(zero box)
(the reference's zero-image convention, demo:1437-1441).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from botsort_tpu.pipeline import frame_step as fs


def fake_encode(tlbr):
    """Per-crop deterministic 'embedding' (batch-size independent)."""
    base = jnp.stack([tlbr.sum(-1), tlbr[..., 0] - tlbr[..., 2],
                      tlbr[..., 1] * 2.0, jnp.cos(tlbr[..., 3])], axis=-1)
    return base.astype(jnp.float32)


@pytest.mark.parametrize("n_live", [0, 3, 16, 17, 50, 64])
def test_encode_chunked_matches_full(n_live):
    rng = np.random.default_rng(n_live)
    tlbr = jnp.asarray(rng.uniform(0, 100, (64, 4)).astype(np.float32))
    got = fs._encode_chunked(fake_encode, tlbr, jnp.asarray(n_live), 16, 4)
    if n_live == 0:
        np.testing.assert_array_equal(np.asarray(got), 0.0)
        return
    full = fake_encode(tlbr)
    lim = 16 if n_live <= 16 else 64
    np.testing.assert_allclose(np.asarray(got[:lim]),
                               np.asarray(full[:lim]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[lim:]), 0.0)


@pytest.mark.parametrize("faces", [[], [2], [0, 5, 9], list(range(20)),
                                   list(range(64))])
def test_encode_faces_semantics(faces):
    """Every slot must get exactly the reference's value: encode(box)
    for real faces, encode(zero box) for faceless slots."""
    rng = np.random.default_rng(len(faces))
    dp = 64
    has_face = np.zeros(dp, bool)
    has_face[faces] = True
    tlbr = np.where(has_face[:, None],
                    rng.uniform(1, 100, (dp, 4)), 0.0).astype(np.float32)
    got = np.asarray(fs._encode_faces(
        fake_encode, jnp.asarray(tlbr), jnp.asarray(has_face),
        jnp.asarray(30), 16, 4))
    want = np.asarray(fake_encode(jnp.asarray(tlbr)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_encode_faces_empty_scene_skips():
    got = np.asarray(fs._encode_faces(
        fake_encode, jnp.zeros((64, 4)), jnp.zeros(64, bool),
        jnp.asarray(0), 16, 4))
    np.testing.assert_array_equal(got, 0.0)


def test_encode_faces_axis1_matches_per_stream():
    rng = np.random.default_rng(7)
    b, dp = 3, 64
    has_face = rng.uniform(size=(b, dp)) < 0.2
    tlbr = np.where(has_face[..., None],
                    rng.uniform(1, 100, (b, dp, 4)), 0.0).astype(np.float32)
    got = np.asarray(fs._encode_faces_axis1(
        fake_encode, jnp.asarray(tlbr), jnp.asarray(has_face),
        jnp.asarray(10), 16, 4))
    want = np.asarray(fake_encode(jnp.asarray(tlbr)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
