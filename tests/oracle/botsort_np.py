"""Numpy oracle: dynamic-list BoT-SORT cascade with reference semantics.

A fresh implementation of the per-frame logic of ``BoTSORT.update``
(demo_bottrack_onnx_tflite.py:1291-1639) using Python lists + numpy +
the scipy-based exact lapjv oracle, written from the algorithm for
validating the fixed-shape TPU cascade. Matches the reference's
thresholds, pass structure, lifecycle transitions, merge set-algebra and
dedup rule; uses the same face-similarity degenerate mask (>0.99999 -> 0)
as the TPU implementation (the reference's bit-pattern isclose workaround,
demo:1481-1483, is model-specific).
"""

import numpy as np

from tests.oracle import assignment_np, boxes_np, kalman_np


def _xywh(tlbr):
    return np.array([
        (tlbr[0] + tlbr[2]) / 2.0, (tlbr[1] + tlbr[3]) / 2.0,
        tlbr[2] - tlbr[0], tlbr[3] - tlbr[1]])


class Track:
    def __init__(self, tlbr, score, bfeat, ffeat, frame, tid, is_act,
                 alpha):
        self.tid = tid
        self.alpha = alpha
        self.mean, self.cov = kalman_np.initiate(_xywh(tlbr))
        self.state = "tracked"
        self.is_act = is_act
        self.score = score
        self.frame_id = frame
        self.start_frame = frame
        self.tracklet_len = 0
        self.bfeat = bfeat.copy()
        self.bsmooth = bfeat / max(np.linalg.norm(bfeat), 1e-12)
        self.ffeat = ffeat.copy()
        self.fsmooth = ffeat / max(np.linalg.norm(ffeat), 1e-12)
        self.last_det = -1

    @property
    def tlbr(self):
        cx, cy, w, h = self.mean[:4]
        return np.array([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])

    def _feats(self, bfeat, ffeat):
        self.bfeat = bfeat.copy()
        s = self.alpha * self.bsmooth + (1 - self.alpha) * bfeat
        self.bsmooth = s / max(np.linalg.norm(s), 1e-12)
        self.ffeat = ffeat.copy()
        s = self.alpha * self.fsmooth + (1 - self.alpha) * ffeat
        self.fsmooth = s / max(np.linalg.norm(s), 1e-12)

    def apply_det(self, tlbr, score, bfeat, ffeat, frame, det_idx,
                  reactivated):
        self.mean, self.cov = kalman_np.update(self.mean, self.cov,
                                               _xywh(tlbr))
        self._feats(bfeat, ffeat)
        self.tracklet_len = 0 if reactivated else self.tracklet_len + 1
        self.state = "tracked"
        self.is_act = True
        self.frame_id = frame
        self.score = score
        self.last_det = det_idx


class NpBoTSORT:
    def __init__(self, high=0.40, low=0.10, new=0.90, match=0.80,
                 second=0.50, unconf=0.70, buffer=300, prox=0.50,
                 app=0.25, alpha=0.90):
        self.high, self.low, self.new = high, low, new
        self.match, self.second, self.unconf = match, second, unconf
        self.buffer, self.prox, self.app, self.alpha = (
            buffer, prox, app, alpha)
        self.tracked = []
        self.lost = []
        self.removed_ids = set()
        self.frame = 0
        self.count = 0

    def update(self, det_tlbr, det_score, bfeats, ffeats):
        self.frame += 1
        f = self.frame
        det_tlbr = np.asarray(det_tlbr, dtype=np.float64)
        det_score = np.asarray(det_score, dtype=np.float64)
        for t in self.tracked + self.lost:
            t.last_det = -1

        unconfirmed = [t for t in self.tracked if not t.is_act]
        confirmed = [t for t in self.tracked if t.is_act]
        pool = confirmed + [t for t in self.lost
                            if t.tid not in {x.tid for x in confirmed}]

        # KF predict over the pool; lost tracks zero vw,vh first.
        for t in pool:
            m = t.mean.copy()
            if t.state != "tracked":
                m[6] = 0.0
                m[7] = 0.0
            t.mean, t.cov = kalman_np.predict(m, t.cov)

        high_idx = [i for i in range(len(det_score))
                    if det_score[i] > self.high]
        low_idx = [i for i in range(len(det_score))
                   if self.low <= det_score[i] <= self.high]

        # Pass 1: pool x high dets.
        activated, refind, lost_new = [], [], []
        ph = [t.tlbr for t in pool]
        dh = [det_tlbr[i] for i in high_idx]
        iou_d = boxes_np.iou_distance(ph, dh)
        bsim = np.array([[t.bfeat @ bfeats[i] for i in high_idx]
                         for t in pool]).reshape(len(pool), len(high_idx))
        fsim = np.array([[t.ffeat @ ffeats[i] for i in high_idx]
                         for t in pool]).reshape(len(pool), len(high_idx))
        fsim[fsim > 0.99999] = 0.0
        body_d = 1.0 - bsim
        face_d = 1.0 - fsim
        gate = np.minimum(body_d, face_d) > self.app
        emb = np.where(gate, 1.0, body_d)
        dists = np.minimum(iou_d, emb)
        cfr, _ = assignment_np.lapjv_cost_limit(dists, self.match)
        matched_det = set()
        for pi, t in enumerate(pool):
            c = cfr[pi] if pi < len(cfr) else -1
            if c >= 0:
                di = high_idx[c]
                matched_det.add(di)
                reac = t.state != "tracked"
                t.apply_det(det_tlbr[di], det_score[di], bfeats[di],
                            ffeats[di], f, di, reac)
                (refind if reac else activated).append(t)
        u_pool = [pi for pi in range(len(pool)) if cfr.size == 0 or
                  cfr[pi] < 0] if len(pool) else []
        u_high = [c for ci, c in enumerate(high_idx)
                  if c not in matched_det]

        # Pass 2: unmatched still-tracked x low dets, IoU only.
        r_tracked = [pool[pi] for pi in u_pool
                     if pool[pi].state == "tracked"]
        dl = [det_tlbr[i] for i in low_idx]
        dists2 = boxes_np.iou_distance([t.tlbr for t in r_tracked], dl)
        cfr2, _ = assignment_np.lapjv_cost_limit(dists2, self.second)
        for ri, t in enumerate(r_tracked):
            c = cfr2[ri] if ri < len(cfr2) else -1
            if c >= 0:
                di = low_idx[c]
                reac = t.state != "tracked"
                t.apply_det(det_tlbr[di], det_score[di], bfeats[di],
                            ffeats[di], f, di, reac)
                (refind if reac else activated).append(t)
            elif t.state != "lost":
                t.state = "lost"
                lost_new.append(t)

        # Pass 3: unconfirmed x leftover high dets.
        du = [det_tlbr[i] for i in u_high]
        iou3 = boxes_np.iou_distance([t.tlbr for t in unconfirmed], du)
        emb3 = 1.0 - np.maximum(
            0.0,
            np.array([[t.bfeat @ bfeats[i] for i in u_high]
                      for t in unconfirmed]).reshape(len(unconfirmed),
                                                     len(u_high)))
        emb3[emb3 > self.app] = 1.0
        emb3[iou3 > self.prox] = 1.0
        dists3 = np.minimum(iou3, emb3)
        cfr3, _ = assignment_np.lapjv_cost_limit(dists3, self.unconf)
        removed = []
        matched3 = set()
        for ui, t in enumerate(unconfirmed):
            c = cfr3[ui] if ui < len(cfr3) else -1
            if c >= 0:
                di = u_high[c]
                matched3.add(di)
                t.apply_det(det_tlbr[di], det_score[di], bfeats[di],
                            ffeats[di], f, di, False)
                activated.append(t)
            else:
                t.state = "removed"  # mark_removed (demo:432-433,1611)
                removed.append(t)
                self.removed_ids.add(t.tid)

        # New tracks.
        for di in u_high:
            if di in matched3 or det_score[di] < self.new:
                continue
            self.count += 1
            t = Track(det_tlbr[di], det_score[di], bfeats[di], ffeats[di],
                      f, self.count, f == 1, self.alpha)
            t.last_det = di
            activated.append(t)

        # Expire lost.
        for t in self.lost:
            if f - t.frame_id > self.buffer:
                self.removed_ids.add(t.tid)

        # Merge (reference set-algebra by track id).
        keep = [t for t in self.tracked if t.state == "tracked"]
        ids = {t.tid for t in keep}
        for t in activated + refind:
            if t.tid not in ids:
                keep.append(t)
                ids.add(t.tid)
        self.tracked = keep
        lost = [t for t in self.lost if t.tid not in ids
                and t.tid not in self.removed_ids]
        lost += [t for t in lost_new if t.tid not in self.removed_ids
                 and t.tid not in {x.tid for x in lost}]
        self.lost = lost

        # Dedup tracked vs lost by IoU distance < 0.15.
        pd = boxes_np.iou_distance([t.tlbr for t in self.tracked],
                                   [t.tlbr for t in self.lost])
        dupa, dupb = set(), set()
        ps, qs = np.where(pd < 0.15)
        for p, q in zip(ps, qs):
            tp = self.tracked[p].frame_id - self.tracked[p].start_frame
            tq = self.lost[q].frame_id - self.lost[q].start_frame
            if tp > tq:
                dupb.add(q)
            else:
                dupa.add(p)
        self.tracked = [t for i, t in enumerate(self.tracked)
                        if i not in dupa]
        self.lost = [t for i, t in enumerate(self.lost) if i not in dupb]

        return [(t.tid, t.tlbr.copy(), t.score, t.last_det)
                for t in self.tracked]
