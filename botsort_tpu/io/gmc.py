"""Host-side camera-motion estimation (sparse optical flow).

The reference defines Kalman-state camera-motion compensation
(``STrack.multi_gmc``, demo_bottrack_onnx_tflite.py:538-554) but never
calls it (call sites commented out, demo:1534-1536) and ships no motion
estimator. This provides the full capability, upstream-BoT-SORT style:
sparse features + pyramidal Lucas-Kanade between downscaled grayscale
frames, robust partial-affine fit. The resulting 2x3 matrix feeds the
device-side state transform in ops/kalman.py::apply_affine.
"""

from __future__ import annotations

from typing import Optional

import cv2
import numpy as np

IDENTITY = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=np.float32)


class GMCEstimator:
    """Estimates the prev->current frame affine motion."""

    def __init__(self, downscale: int = 4, max_corners: int = 300):
        self.downscale = downscale
        self.max_corners = max_corners
        self._prev_gray: Optional[np.ndarray] = None
        self._prev_pts: Optional[np.ndarray] = None

    def reset(self):
        self._prev_gray = None
        self._prev_pts = None

    def estimate(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Returns a 2x3 affine H mapping previous-frame coordinates to
        current-frame coordinates (identity for the first frame or when
        estimation fails)."""
        gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(
                gray, (gray.shape[1] // self.downscale,
                       gray.shape[0] // self.downscale))
        h = IDENTITY.copy()
        if self._prev_gray is not None and self._prev_pts is not None \
                and len(self._prev_pts) >= 6:
            nxt, status, _ = cv2.calcOpticalFlowPyrLK(
                self._prev_gray, gray, self._prev_pts, None)
            if nxt is not None:
                ok = status.reshape(-1).astype(bool)
                p0 = self._prev_pts[ok]
                p1 = nxt[ok]
                if len(p0) >= 6:
                    mat, _ = cv2.estimateAffinePartial2D(
                        p0, p1, method=cv2.RANSAC)
                    if mat is not None:
                        mat = mat.astype(np.float32)
                        # Undo the downscale on the translation part.
                        mat[:, 2] *= self.downscale
                        h = mat
        self._prev_gray = gray
        self._prev_pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=self.max_corners, qualityLevel=0.01,
            minDistance=7, blockSize=7)
        return h
