"""Per-chip stream envelope (runtime/envelope.py).

The reference serves one stream per GPU (SURVEY.md §2 — no
multi-stream surface at all); our serving CLIs batch B streams per
chip and must warn when B exceeds what the chip has been MEASURED to
sustain in real time, instead of silently degrading every stream
(VERDICT r2 #3: "a documented per-chip stream envelope that
multitrack/serve enforce by default").
"""

import math

import pytest

from botsort_tpu.runtime import envelope


def test_max_realtime_streams_from_measured():
    cap = envelope.max_realtime_streams(30.0)
    assert cap == int(envelope.MEASURED_AGGREGATE_FPS // 30.0)
    assert cap >= 1


def test_within_envelope_no_warning():
    assert envelope.stream_envelope_warning(1, "tpu") is None
    cap = envelope.max_realtime_streams()
    assert envelope.stream_envelope_warning(cap, "tpu") is None


def test_over_envelope_warns_with_chip_count():
    cap = envelope.max_realtime_streams()
    msg = envelope.stream_envelope_warning(3 * cap + 1, "tpu")
    assert msg is not None and "WARNING" in msg
    assert f"Shard across {math.ceil((3 * cap + 1) / cap)} chips" in msg


def test_cpu_backend_silent_without_override(monkeypatch):
    monkeypatch.delenv(envelope._ENV_OVERRIDE, raising=False)
    assert envelope.stream_envelope_warning(1000, "cpu") is None


def test_env_override_applies_on_any_backend(monkeypatch):
    monkeypatch.setenv(envelope._ENV_OVERRIDE, "60")
    assert envelope.max_realtime_streams() == 2
    msg = envelope.stream_envelope_warning(3, "cpu")
    assert msg is not None and "2 streams" in msg


def test_env_override_garbage_falls_back(monkeypatch):
    monkeypatch.setenv(envelope._ENV_OVERRIDE, "not-a-number")
    assert envelope.aggregate_fps() == envelope.MEASURED_AGGREGATE_FPS


def test_multitrack_prints_envelope_warning(tmp_path, monkeypatch, capsys):
    """The multitrack CLI surfaces the warning by default (env override
    lets the CPU test path exercise the TPU-only check)."""
    import cv2
    import numpy as np

    from botsort_tpu.cli import multitrack

    paths = []
    for i in range(2):
        p = tmp_path / f"v{i}.mp4"
        w = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"),
                            30, (128, 96))
        for _ in range(3):
            w.write(np.full((96, 128, 3), 90, np.uint8))
        w.release()
        paths.append(str(p))

    monkeypatch.setenv(envelope._ENV_OVERRIDE, "30")  # cap = 1 stream
    rc = multitrack.main(
        ["-v", *paths, "--mini", "-ep", "cpu", "-dvw",
         "--max_frames", "2", "--output_dir", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "exceed the measured single-chip real-time envelope" in out
