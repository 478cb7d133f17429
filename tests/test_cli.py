"""CLI smoke tests: demo over a synthetic mp4 (headless) + trace export."""

import os

import cv2
import numpy as np
import pytest


def make_video(path, frames=6, hw=(120, 160)):
    h, w = hw
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 15,
                             (w, h))
    rng = np.random.default_rng(0)
    for t in range(frames):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.rectangle(img, (10 + 3 * t, 20), (60 + 3 * t, 100),
                      (255, 255, 255), -1)
        writer.write(img)
    writer.release()
    return path


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    return make_video(path)


def test_demo_headless(video, tmp_path, monkeypatch):
    from botsort_tpu.cli import demo

    monkeypatch.chdir(tmp_path)
    out = str(tmp_path / "out.mp4")
    rc = demo.main([
        "-v", video, "--mini", "--headless", "--max_frames", "4",
        "--output", out, "-fm", "-tc", "0", "1", "3",
    ])
    assert rc == 0
    assert os.path.exists(out)
    cap = cv2.VideoCapture(out)
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) >= 4
    cap.release()


def test_trace_export(video, tmp_path, monkeypatch):
    from botsort_tpu.cli import eval_trace

    monkeypatch.chdir(tmp_path)
    trace = str(tmp_path / "trace.csv")
    rc = eval_trace.main([
        "-v", video, "--mini", "--max_frames", "4", "-o", trace, "-dvw",
    ])
    assert rc == 0
    assert os.path.exists(trace)
    with open(trace) as f:
        for line in f:
            parts = line.strip().split(",")
            assert len(parts) == 9
            assert int(parts[0]) >= 1


def test_trace_export_temporal_batch(video, tmp_path, monkeypatch):
    """-tb chunking must produce the same trace as per-frame mode,
    including the tail chunk handled frame-by-frame."""
    from botsort_tpu.cli import eval_trace

    monkeypatch.chdir(tmp_path)
    plain = str(tmp_path / "plain.csv")
    rc = eval_trace.main(
        ["-v", video, "--mini", "--max_frames", "5", "-o", plain, "-dvw"])
    assert rc == 0
    batched = str(tmp_path / "batched.csv")
    rc = eval_trace.main(
        ["-v", video, "--mini", "--max_frames", "5", "-o", batched,
         "-dvw", "-tb", "2"])
    assert rc == 0
    assert open(plain).read() == open(batched).read()
