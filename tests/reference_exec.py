"""Execute the reference's OWN BoTSORT implementation as a parity authority.

Loads ``/root/reference/demo_bottrack_onnx_tflite.py`` as a module (its
``main()`` is __main__-guarded and onnxruntime is imported lazily inside
``AbstractModel.__init__`` at demo:754, so importing pulls no GPU deps),
shims the one missing dependency ``lap`` (demo:16) with this repo's
native C++ LAPJV (native/lapjv.cpp — same extend_cost/cost_limit
semantics as lap.lapjv, already cross-validated in
tests/test_native_lapjv.py), and instantiates ``BoTSORT`` (demo:1252)
with stub model objects that return pre-computed detections/features.

This makes the reference's actual ``BoTSORT.update`` (demo:1291-1639)
drivable on the exact same synthetic inputs our cascade and the numpy
oracle consume, so the oracle stops being the sole parity authority.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types
from typing import List

import numpy as np

from botsort_tpu.runtime import native

REFERENCE_PATH = os.environ.get(
    "BOTSORT_REFERENCE",
    "/root/reference/demo_bottrack_onnx_tflite.py")

_MODULE_NAME = "_botsort_reference_demo"


def reference_available() -> bool:
    return os.path.exists(REFERENCE_PATH)


def _lapjv_shim(cost, extend_cost=False, cost_limit=np.inf):
    """lap.lapjv-compatible wrapper over native/lapjv.cpp.

    The reference only ever calls lap.lapjv(cost, extend_cost=True,
    cost_limit=thresh) with a finite thresh (demo:1686); other modes are
    rejected loudly rather than silently mis-solved.
    """
    if not extend_cost or not np.isfinite(cost_limit):
        raise NotImplementedError(
            "shim supports the reference's extend_cost=True + finite "
            "cost_limit mode only")
    cost = np.asarray(cost, dtype=np.float64)
    x, y = native.lapjv_cost_limit(cost, float(cost_limit))
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    matched = x >= 0
    # lap returns the extended-problem objective: matched pairs at their
    # cost, every unmatched real row/col at cost_limit/2. The reference
    # discards it; computed anyway for fidelity.
    total = float(cost[np.arange(len(x))[matched], x[matched]].sum())
    total += (cost_limit / 2.0) * (
        int((~matched).sum()) + int((y < 0).sum()))
    return total, x, y


def load_reference():
    """Import the reference demo with the lap shim injected."""
    if _MODULE_NAME in sys.modules:
        return sys.modules[_MODULE_NAME]
    if "lap" not in sys.modules:
        lap_mod = types.ModuleType("lap")
        lap_mod.lapjv = _lapjv_shim
        sys.modules["lap"] = lap_mod
    spec = importlib.util.spec_from_file_location(
        _MODULE_NAME, REFERENCE_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[_MODULE_NAME] = mod
    spec.loader.exec_module(mod)
    return mod


class _StubDetector:
    """Duck-typed YOLOX stand-in: returns pre-set Box-shaped records."""

    def __init__(self):
        self._boxes: List[object] = []

    def set_frame(self, det_tlbr, det_score, det_class=None):
        """det_class: optional per-detection classid (0=body 1=head
        2=hand 3=face, demo:1304-1370); defaults to all bodies."""
        if det_class is None:
            det_class = [0] * len(det_tlbr)
        self._boxes = []
        self.index_of = {}
        n_body = 0
        for tlbr, score, cid in zip(det_tlbr, det_score, det_class):
            x1, y1, x2, y2 = (int(v) for v in tlbr)
            if cid == 0:
                key = (x1, y1, x2, y2, float(score))
                # BoTSORT.update re-wraps detections into fresh Body
                # objects (demo:1304-1320), so the det index is recovered
                # by exact coordinate+score lookup; scenarios must not
                # emit duplicate boxes. Index is within the BODY subset
                # (identical to the full-list index for the body-only
                # scenarios).
                assert key not in self.index_of, f"duplicate det {key}"
                self.index_of[key] = n_body
                n_body += 1
            self._boxes.append(types.SimpleNamespace(
                classid=int(cid), score=float(score),
                x1=x1, y1=y1, x2=x2, y2=y2,
                cx=(x1 + x2) // 2, cy=(y1 + y2) // 2))

    def __call__(self, image):
        return list(self._boxes)


class _StubBodyEncoder:
    """FastReID stand-in: emits pre-set per-detection features.

    Mirrors the real graph's contract (README.md:185-195): returns
    (similarities [N, M], L2-normalized base_features [N, D]) where the
    similarity is current-vs-target cosine. Features fed in are already
    unit-norm, so normalization is the identity.
    """

    def __init__(self, feature_size):
        self.feature_size = feature_size
        self._feats = np.zeros((0, feature_size), np.float32)

    def set_frame(self, feats):
        self._feats = np.asarray(feats, np.float64).reshape(
            -1, self.feature_size)

    def __call__(self, base_images, target_features):
        assert len(base_images) == len(self._feats)
        tf = np.asarray(target_features, np.float64).reshape(
            -1, self.feature_size)
        sims = self._feats @ tf.T
        return sims, self._feats.copy()


class _StubFaceEncoder:
    """face-reidentification-retail-0095 stand-in.

    The real face graph's output order is swapped vs the body graph —
    (features, similarities) — which BoTSORT un-swaps at the call site
    (demo:1170, 1478-1480); the stub reproduces that order. Degenerate
    pairs (bit-identical inputs, e.g. the shared zero no-face image) come
    out of the real fp16 graph as ~0.9999999 rather than 1.0 — that is
    why the reference's anomaly mask exists (demo:1481-1483) — so the
    stub snaps exact-1.0 similarities to 0.9999999 to reproduce the
    numeric behavior the mask was written against.
    """

    def __init__(self, feature_size, hw=(128, 128)):
        self.feature_size = feature_size
        self._input_shapes = [[1, 3, hw[0], hw[1]]]
        self._feats = np.zeros((0, feature_size), np.float32)

    def set_frame(self, feats):
        self._feats = np.asarray(feats, np.float64).reshape(
            -1, self.feature_size)

    def __call__(self, base_images, target_features):
        assert len(base_images) == len(self._feats)
        tf = np.asarray(target_features, np.float64).reshape(
            -1, self.feature_size)
        sims = self._feats @ tf.T
        sims[np.isclose(sims, 1.0, rtol=0.0, atol=1e-9)] = 0.9999999
        return self._feats.copy(), sims


class ReferenceTracker:
    """Drives the reference's BoTSORT.update on pre-computed inputs.

    update() takes the same (det_tlbr, det_score, bfeats, ffeats) the
    numpy oracle takes (integer-valued tlbr required — the reference
    slices crop images with them, demo:1434-1441) and returns
    {track_id: (tlbr, det_index)} for the returned tracked stracks.
    """

    def __init__(self, body_dim=32, face_dim=16, frame_rate=30,
                 max_time_lost=None, image_hw=(8, 8)):
        self.mod = load_reference()
        self.det = _StubDetector()
        self.body = _StubBodyEncoder(body_dim)
        self.face = _StubFaceEncoder(face_dim)
        self.tracker = self.mod.BoTSORT(
            object_detection_model=self.det,
            body_feature_extractor_model=self.body,
            face_feature_extractor_model=self.face,
            frame_rate=frame_rate)
        if max_time_lost is not None:
            # The reference hardcodes track_buffer=300 (demo:1272); tests
            # use a short buffer so expiry is reachable in a few frames.
            self.tracker.track_buffer = max_time_lost
            self.tracker.buffer_size = max_time_lost
            self.tracker.max_time_lost = max_time_lost
        self._image = np.zeros((image_hw[0], image_hw[1], 3), np.uint8)
        self.frame = 0

    def update(self, det_tlbr, det_score, bfeats, ffeats):
        self.frame += 1
        self.det.set_frame(det_tlbr, det_score)
        self.body.set_frame(bfeats)
        self.face.set_frame(ffeats)
        out = self.tracker.update(self._image)
        res = {}
        for t in out:
            assert t.frame_id == self.frame, (
                "returned strack not updated this frame")
            b = t.body
            det_idx = self.det.index_of[
                (b.x1, b.y1, b.x2, b.y2, float(b.score))]
            res[int(t.track_id)] = (
                np.asarray(t.tlbr, np.float64), det_idx)
        return res

    def update_multiclass(self, body_tlbr, head_tlbr, hand_tlbr,
                          face_tlbr, score=0.9):
        """Drive one update() with MULTI-CLASS detections and return the
        reference-computed box hierarchy (demo:1372-1411): per body,
        (head_idx, face_idx, hand1_idx, hand2_idx) into the respective
        class lists, -1 = unattached. All scores are high so every body
        activates on frame 1 and its attachment is readable off the
        returned stracks (the face of an unattached head is unreachable
        from update()'s return value — covered per attached body only).
        Boxes must be integer-valued and inside image_hw (update() slices
        face crops from the frame, demo:1434-1441)."""
        self.frame += 1
        n_b = len(body_tlbr)
        tlbr = (list(body_tlbr) + list(head_tlbr) + list(hand_tlbr)
                + list(face_tlbr))
        cls = ([0] * len(body_tlbr) + [1] * len(head_tlbr)
               + [2] * len(hand_tlbr) + [3] * len(face_tlbr))
        self.det.set_frame(tlbr, [score] * len(tlbr), cls)
        basis = np.eye(self.body.feature_size, dtype=np.float64)
        self.body.set_frame([basis[i % len(basis)] for i in range(n_b)])
        fbasis = np.eye(self.face.feature_size, dtype=np.float64)
        self.face.set_frame([fbasis[i % len(fbasis)] for i in range(n_b)])

        def index_map(boxes):
            m = {}
            for i, bx in enumerate(boxes):
                key = tuple(int(v) for v in bx)
                assert key not in m, f"duplicate box {key}"
                m[key] = i
            return m

        h_ix = index_map(head_tlbr)
        n_ix = index_map(hand_tlbr)
        f_ix = index_map(face_tlbr)

        def lookup(obj, m):
            if obj is None:
                return -1
            return m[(obj.x1, obj.y1, obj.x2, obj.y2)]

        out = self.tracker.update(self._image)
        res = {}
        for t in out:
            b = t.body
            bi = self.det.index_of[(b.x1, b.y1, b.x2, b.y2, float(b.score))]
            hd = lookup(b.head, h_ix)
            fc = lookup(b.head.face, f_ix) if b.head is not None else -1
            res[bi] = (hd, fc, lookup(b.hand1, n_ix), lookup(b.hand2, n_ix))
        assert len(res) == n_b, (
            f"expected every body activated on frame 1: {sorted(res)}")
        return [res[i] for i in range(n_b)]
