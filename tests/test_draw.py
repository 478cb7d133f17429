"""Host drawing: annotates frames without exceptions, mosaic pixelates."""

import numpy as np

from botsort_tpu.io import draw
from botsort_tpu.pipeline.boxes import Body, Face, Hand, Head, make_box
from botsort_tpu.pipeline.host import STrackView


def make_track(tid=3):
    face = make_box(Face, 3, 0.9, (60, 30, 100, 70), trackid=tid)
    head = make_box(Head, 1, 0.9, (50, 20, 110, 80), trackid=tid,
                    face=face)
    hand = make_box(Hand, 2, 0.8, (30, 120, 60, 150), trackid=tid)
    body = make_box(Body, 0, 0.95, (40, 10, 120, 200), trackid=tid,
                    head=head, hand1=hand, hand2=None)
    return STrackView(track_id=tid, score=0.95,
                      tlbr=np.array([40, 10, 120, 200], np.float32),
                      body=body)


def test_draw_tracks_annotates():
    img = np.zeros((240, 320, 3), np.uint8)
    draw.draw_tracks(img, [make_track()], face_mosaic=False)
    draw.draw_latency(img, 0.0123)
    assert img.sum() > 0  # something was drawn


def test_mosaic_pixelates_face():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
    before = img[30:70, 60:100].copy()
    draw.draw_tracks(img, [make_track()], face_mosaic=True)
    region = img[31:69, 61:99]  # inside, excluding drawn border
    # Pixelated region (2x2 downsample, bilinear upsample) has far fewer
    # distinct colors than the original noise.
    assert len(np.unique(region.reshape(-1, 3), axis=0)) < \
        len(np.unique(before.reshape(-1, 3), axis=0)) / 2


def test_track_without_body():
    img = np.zeros((100, 100, 3), np.uint8)
    t = STrackView(track_id=1, score=0.5,
                   tlbr=np.array([10, 10, 40, 60], np.float32), body=None)
    draw.draw_tracks(img, [t])
    assert img.sum() > 0
