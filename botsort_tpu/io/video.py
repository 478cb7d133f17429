"""Video capture/writer helpers with a decode-prefetch thread.

The reference reads frames synchronously in its main loop
(demo_bottrack_onnx_tflite.py:2101-2123) and writes `output.mp4` unless
``-dvw`` (2104-2116). We keep OpenCV (its decode/encode is C++ and not
the bottleneck) but add a small prefetch thread so video decode overlaps
TPU compute — the host loop should never stall on cv2.read().
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import cv2
import numpy as np


def open_capture(source: str) -> cv2.VideoCapture:
    """Camera index or file path (demo:2101-2103)."""
    try:
        return cv2.VideoCapture(int(source))
    except ValueError:
        return cv2.VideoCapture(source)


class PrefetchingCapture:
    """Background-decodes frames into a bounded queue."""

    def __init__(self, source: str, depth: int = 4):
        self.cap = open_capture(source)
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(depth)
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._stopped = threading.Event()
        self._thread.start()

    @property
    def fps(self) -> float:
        return self.cap.get(cv2.CAP_PROP_FPS) or 30.0

    @property
    def frame_size(self) -> Tuple[int, int]:
        return (
            int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
        )

    def _pump(self):
        while not self._stopped.is_set():
            ok, frame = self.cap.read()
            if not ok:
                self._q.put(None)
                return
            self._q.put(frame)

    def frames(self) -> Iterator[np.ndarray]:
        while True:
            frame = self._q.get()
            if frame is None:
                return
            yield frame

    def release(self):
        self._stopped.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self.cap.release()


def make_writer(path: str, fps: float,
                frame_size: Tuple[int, int]) -> cv2.VideoWriter:
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    return cv2.VideoWriter(path, fourcc, fps, frame_size)
