"""Host-side tracker facade: the TPU analog of the reference's BoTSORT.

Owns the model bundle + device track store, invokes the fused frame step
(one upload, one readback per frame), and assembles the host-visible
track list + box hierarchy (API parity with ``BoTSORT.update(image) ->
List[STrack]``, demo_bottrack_onnx_tflite.py:1252-1639).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from botsort_tpu.config import (
    DEFAULT_NMS,
    DEFAULT_PIPELINE,
    DEFAULT_TRACKER,
    NMSConfig,
    PipelineConfig,
    TrackerConfig,
)
from botsort_tpu.pipeline.boxes import Body, Face, Hand, Head, make_box
from botsort_tpu.pipeline.frame_step import ModelBundle, frame_step
from botsort_tpu.track.state import empty_store


@jax.jit
def _copy_store(store):
    """Device-side store snapshot in ONE dispatch (frame_step donates
    its store input, so overflow re-runs need a pre-step copy)."""
    return jax.tree.map(jnp.copy, store)


def face_bucket_need(n_face: int, n_live: int) -> int:
    """Face-bucket requirement for a frame with ``n_live`` live bodies
    and ``n_face`` attached faces: the face count plus one zero-crop
    slot (the encoder(0) constant source) whenever a faceless live body
    exists. THE single definition — the single-stream and batched
    dispatchers and the bench must all pick buckets with the same rule
    or their overflow re-runs diverge."""
    if n_live == 0:
        return 0
    return n_face + (1 if n_face < n_live else 0)


def _live_and_face_counts(res_host, d: int):
    """(live bodies, bodies with an attached face) among the first d
    body det slots of one FrameResult."""
    valid = np.asarray(res_host.det_valid[0][:d])
    hb = np.asarray(res_host.head_for_body[:d])
    ffh = np.asarray(res_host.face_for_head)
    has_face = (hb >= 0) & (ffh[np.clip(hb, 0, None)] >= 0) & valid
    return int(valid.sum()), int(has_face.sum())


@dataclasses.dataclass
class STrackView:
    """Host view of one live track (the reference returns STrack objects;
    we return lightweight views assembled from the device readback)."""

    track_id: int
    score: float
    tlbr: np.ndarray          # [4] float32
    body: Optional[Body]      # attached hierarchy for this frame

    @property
    def tlwh(self) -> np.ndarray:
        out = self.tlbr.copy()
        out[2:] -= out[:2]
        return out


class BoTSORTPipeline:
    """End-to-end tracker over one video stream."""

    def __init__(
        self,
        bundle: ModelBundle,
        tracker_cfg: TrackerConfig = DEFAULT_TRACKER,
        nms_cfg: NMSConfig = DEFAULT_NMS,
        pipe_cfg: PipelineConfig = DEFAULT_PIPELINE,
    ):
        self.bundle = bundle
        self.tracker_cfg = tracker_cfg
        self.nms_cfg = nms_cfg
        self.pipe_cfg = pipe_cfg
        if pipe_cfg.disable_reid and not pipe_cfg.host_bucket_dispatch:
            raise ValueError(
                "disable_reid (IoU-only mode) requires "
                "host_bucket_dispatch=True — the in-program dynamic "
                "bucketing path would still run the encoders")
        self.store = empty_store(tracker_cfg)
        self.frame_id = 0
        from botsort_tpu.utils.profiling import StageTimers

        self.timers = StageTimers()
        self.gmc = None
        if pipe_cfg.enable_gmc:
            from botsort_tpu.io.gmc import GMCEstimator

            self.gmc = GMCEstimator()
        # Host-side static ReID bucket dispatch. Measured on v5e: an
        # in-program lax.switch whose untaken branch holds a CNN costs
        # ~the branch's execution time anyway (see _encode_chunked), so
        # the host picks a branch-free compiled bucket from the LAST
        # frame's live count and re-runs the rare frame whose count
        # overflows it (exactness preserved; per-sample encoder outputs
        # are batch-size invariant). One compiled program per bucket,
        # all cached.
        from botsort_tpu.pipeline.frame_step import (
            _det_width,
            reid_bucket_set,
        )

        self._buckets = reid_bucket_set(tracker_cfg, nms_cfg, pipe_cfg)
        self._last_n_live = None
        self._last_n_face = 0
        self._det_width = _det_width(tracker_cfg, nms_cfg)

    def _pick_bucket(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def _face_need(self, n_face: int, n_live: int) -> int:
        return face_bucket_need(n_face, n_live)

    def reset(self):
        self.store = empty_store(self.tracker_cfg)
        self.frame_id = 0
        self._last_n_live = None
        self.timers.reset()
        if self.gmc is not None:
            self.gmc.reset()

    def _dispatch(self, store, frame_dev, gmc_affine, reid_bucket,
                  face_bucket):
        """One device step at a static bucket pair. Overridable: the
        AOT-artifact pipeline (runtime/exported.py::ExportedPipeline)
        swaps in deserialized programs here; every other host behavior
        (bucket picking, overflow re-run, assembly, warnings) is
        shared."""
        return frame_step(
            self.bundle, store, frame_dev, self.tracker_cfg,
            self.nms_cfg, self.pipe_cfg, gmc_affine,
            reid_bucket=reid_bucket, face_bucket=face_bucket)

    def update(self, frame_bgr: np.ndarray) -> List[STrackView]:
        """One frame. frame_bgr: [H, W, 3] uint8 (OpenCV layout)."""
        self.frame_id += 1
        gmc_affine = None
        if self.gmc is not None:
            with self.timers.stage("gmc"):
                gmc_affine = jnp.asarray(self.gmc.estimate(frame_bgr))
        with self.timers.stage("upload"):
            frame_dev = jnp.asarray(frame_bgr)
        with self.timers.stage("device_step"):
            if not self.pipe_cfg.host_bucket_dispatch:
                self.store, result = frame_step(
                    self.bundle, self.store, frame_dev,
                    self.tracker_cfg, self.nms_cfg, self.pipe_cfg,
                    gmc_affine)
                result_host = jax.device_get(result)
            else:
                no_reid = self.pipe_cfg.disable_reid
                if no_reid:
                    # IoU-only mode: bucket 0 == zero features ==
                    # exactly the reference's IoU-only cost (config.py
                    # disable_reid note); no overflow re-run possible.
                    bucket = fbucket = 0
                elif self._last_n_live is None:
                    # First frame: no count yet — the safe full bucket.
                    bucket = fbucket = self._buckets[-1]
                else:
                    bucket = self._pick_bucket(self._last_n_live)
                    fbucket = self._pick_bucket(self._face_need(
                        self._last_n_face, self._last_n_live))
                backup = None
                if not no_reid and (bucket < self._buckets[-1]
                                    or fbucket < self._buckets[-1]):
                    # frame_step donates the store; keep a device-side
                    # copy (one fused dispatch, ~1 MB) so an overflow
                    # frame can re-run with a bigger bucket.
                    backup = _copy_store(self.store)
                self.store, result = self._dispatch(
                    self.store, frame_dev, gmc_affine, bucket, fbucket)
                result_host = jax.device_get(result)
                if not no_reid:
                    n_live, n_face = _live_and_face_counts(
                        result_host, self._det_width)
                    if n_live > bucket or \
                            self._face_need(n_face, n_live) > fbucket:
                        self.store, result = self._dispatch(
                            backup, frame_dev, gmc_affine,
                            self._pick_bucket(n_live),
                            self._pick_bucket(
                                self._face_need(n_face, n_live)))
                        result_host = jax.device_get(result)
                    self._last_n_live = n_live
                    self._last_n_face = n_face
        with self.timers.stage("assemble"):
            return self._assemble(result_host)

    def _assemble(self, res) -> List[STrackView]:
        return assemble_tracks(res, self.tracker_cfg, self.nms_cfg,
                               self.pipe_cfg, warn_state=self)


def assemble_tracks(res, tracker_cfg: TrackerConfig, nms_cfg: NMSConfig,
                    pipe_cfg: PipelineConfig,
                    warn_state=None) -> List[STrackView]:
    """Host-side track-list + hierarchy assembly from one FrameResult.

    warn_state: any object on which once-only warning flags may be set
    (each pipeline/stream passes itself so capacity warnings fire once
    per stream, matching the reference's per-process behavior).
    """
    tc = pipe_cfg.track_target_classes
    det_boxes = res.det_boxes
    det_scores = res.det_scores
    det_valid = res.det_valid
    n_bodies = int(np.asarray(det_valid[0]).sum())
    d = min(tracker_cfg.max_dets, nms_cfg.max_boxes_per_class)
    if warn_state is None:
        warn_state = assemble_tracks  # global once-only fallback
    if n_bodies > d and not getattr(warn_state, "_warned_capacity", False):
        warn_state._warned_capacity = True
        import sys

        print(
            f"WARNING: {n_bodies} bodies detected but "
            f"TrackerConfig.max_dets={tracker_cfg.max_dets}; only "
            f"the {d} highest-scoring reach the tracker (raise "
            "max_dets).", file=sys.stderr)
    dropped = int(np.asarray(res.tracks.dropped_new))
    if dropped > 0 and not getattr(warn_state, "_warned_slots", False):
        warn_state._warned_slots = True
        import sys

        print(
            f"WARNING: {dropped} new track(s) dropped this frame — all "
            f"TrackerConfig.max_tracks={tracker_cfg.max_tracks} "
            "slots occupied (raise max_tracks; the reference has no "
            "slot limit).", file=sys.stderr)
    if bool(np.asarray(res.nms_clipped).any()) and \
            not getattr(warn_state, "_warned_nms_clip", False):
        warn_state._warned_nms_clip = True
        import sys

        print(
            "WARNING: NMS pre_nms_top_k saturated for at least one "
            "class this frame — suppression was approximate (raise "
            "NMSConfig.pre_nms_top_k).", file=sys.stderr)
    bodies_cls, heads_cls, hands_cls, faces_cls = 0, 1, 2, 3

    def opt_box(cls_ctor, classid, slot, trackid):
        if classid not in tc or slot < 0 or not det_valid[classid][slot]:
            return None
        return make_box(cls_ctor, classid, det_scores[classid][slot],
                        det_boxes[classid][slot], trackid=trackid)

    tracks: List[STrackView] = []
    t = res.tracks
    for k in range(len(t.valid)):
        if not t.valid[k]:
            continue
        tid = int(t.track_id[k])
        di = int(t.det_index[k])
        body = None
        if di >= 0 and bodies_cls in tc:
            body = make_box(Body, bodies_cls, det_scores[bodies_cls][di],
                            det_boxes[bodies_cls][di], trackid=tid)
            hs = int(res.head_for_body[di])
            head = opt_box(Head, heads_cls, hs, tid)
            if head is not None:
                fs = int(res.face_for_head[hs])
                head.face = opt_box(Face, faces_cls, fs, tid)
            body.head = head
            body.hand1 = opt_box(Hand, hands_cls,
                                 int(res.hand1_for_body[di]), tid)
            body.hand2 = opt_box(Hand, hands_cls,
                                 int(res.hand2_for_body[di]), tid)
        tracks.append(STrackView(
            track_id=tid,
            score=float(t.score[k]),
            tlbr=np.asarray(t.tlbr[k], dtype=np.float32),
            body=body,
        ))
    return tracks


class BatchedBoTSORTPipeline:
    """B independent streams batched through ONE chip.

    The per-chip serving topology (BASELINE.json config 5 pairs it with
    mesh sharding for multi-chip): perception runs natively batched over
    the stream axis, cascades vmapped — one compiled program, outputs
    bitwise-identical to B single-stream pipelines
    (tests/test_batched_step.py). All frames of one update() must share
    one resolution (one compiled program per (B, H, W)).
    """

    def __init__(
        self,
        bundle: ModelBundle,
        n_streams: int,
        tracker_cfg: TrackerConfig = DEFAULT_TRACKER,
        nms_cfg: NMSConfig = DEFAULT_NMS,
        pipe_cfg: PipelineConfig = DEFAULT_PIPELINE,
    ):
        from botsort_tpu.pipeline.frame_step import frame_step_batched

        self._step = frame_step_batched
        self.bundle = bundle
        self.n_streams = n_streams
        self.tracker_cfg = tracker_cfg
        self.nms_cfg = nms_cfg
        self.pipe_cfg = pipe_cfg
        if pipe_cfg.disable_reid and not pipe_cfg.host_bucket_dispatch:
            raise ValueError(
                "disable_reid (IoU-only mode) requires "
                "host_bucket_dispatch=True — the in-program dynamic "
                "bucketing path would still run the encoders")
        one = empty_store(tracker_cfg)
        self.stores = jax.tree.map(
            lambda x: jnp.stack([x] * n_streams), one)
        self.frame_id = 0
        # Per-stream once-only warning state.
        self._warn = [type("W", (), {})() for _ in range(n_streams)]
        # Shared static ReID bucket (see BoTSORTPipeline): sized by the
        # max live count across streams last frame.
        from botsort_tpu.pipeline.frame_step import (
            _det_width,
            reid_bucket_set,
        )

        self._buckets = reid_bucket_set(tracker_cfg, nms_cfg, pipe_cfg)
        self._last_max_live = None
        self._last_max_face = 0
        self._det_width = _det_width(tracker_cfg, nms_cfg)

    def _pick_bucket(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        return self._buckets[-1]

    def _counts(self, res_host):
        """(max live bodies, max attached faces) across streams."""
        live = face = 0
        for s in range(self.n_streams):
            res_s = jax.tree.map(lambda x: x[s], res_host)
            nl, nf = _live_and_face_counts(res_s, self._det_width)
            live, face = max(live, nl), max(face, nf)
        return live, face

    def update(self, frames_bgr) -> List[List[STrackView]]:
        """frames_bgr: [B, H, W, 3] uint8 (list or array; one frame per
        stream). Returns per-stream track lists."""
        return self.update_async(frames_bgr).result()

    def update_async(self, frames_bgr) -> "PendingBatch":
        """Dispatch one batched step WITHOUT blocking on the readback.

        JAX dispatch is asynchronous: the device computes this step
        while the host keeps running — draw/encode the PREVIOUS frame's
        tracks, then call ``.result()`` (which reads back, handles the
        rare bucket-overflow re-run, and assembles the track lists).
        Exactly one batch may be in flight: dispatching the next step
        before resolving this one would commit the store before the
        overflow check ran (``result()`` enforces nothing; callers
        simply must resolve in order — update() does)."""
        self.frame_id += 1
        frames = jnp.asarray(np.stack(frames_bgr))
        if frames.shape[0] != self.n_streams:
            raise ValueError(
                f"expected {self.n_streams} frames, got {frames.shape[0]}")
        if not self.pipe_cfg.host_bucket_dispatch:
            self.stores, result = self._step(
                self.bundle, self.stores, frames,
                self.tracker_cfg, self.nms_cfg, self.pipe_cfg)
            return PendingBatch(self, frames, result, None, None, None)
        if self.pipe_cfg.disable_reid:
            # IoU-only mode: bucket 0 == zero features (see
            # config.py::PipelineConfig.disable_reid). bucket=None in
            # the pending handle skips the overflow logic (none can
            # occur at a pinned bucket).
            self.stores, result = self._step(
                self.bundle, self.stores, frames,
                self.tracker_cfg, self.nms_cfg, self.pipe_cfg,
                None, 0, 0)
            return PendingBatch(self, frames, result, None, None, None)
        if self._last_max_live is None:
            bucket = fbucket = self._buckets[-1]
        else:
            bucket = self._pick_bucket(self._last_max_live)
            fbucket = self._pick_bucket(face_bucket_need(
                self._last_max_face, self._last_max_live))
        backup = None
        if bucket < self._buckets[-1] or fbucket < self._buckets[-1]:
            backup = _copy_store(self.stores)
        self.stores, result = self._step(
            self.bundle, self.stores, frames,
            self.tracker_cfg, self.nms_cfg, self.pipe_cfg,
            None, bucket, fbucket)
        return PendingBatch(self, frames, result, backup, bucket, fbucket)

    def _resolve(self, frames, result, backup, bucket, fbucket):
        res_host = jax.device_get(result)
        if bucket is not None:
            max_live, max_face = self._counts(res_host)
            need = face_bucket_need(max_face, max_live)
            if max_live > bucket or need > fbucket:
                self.stores, result = self._step(
                    self.bundle, backup, frames,
                    self.tracker_cfg, self.nms_cfg, self.pipe_cfg,
                    None, self._pick_bucket(max_live),
                    self._pick_bucket(need))
                res_host = jax.device_get(result)
            self._last_max_live = max_live
            self._last_max_face = max_face
        out = []
        for s in range(self.n_streams):
            res_s = jax.tree.map(lambda x: x[s], res_host)
            out.append(assemble_tracks(res_s, self.tracker_cfg,
                                       self.nms_cfg, self.pipe_cfg,
                                       warn_state=self._warn[s]))
        return out


class TemporalBatchedBoTSORTPipeline(BatchedBoTSORTPipeline):
    """B streams x T consecutive frames per dispatch.

    The near-real-time serving point (docs/PERF.md "temporal batching
    at B=1"): perception runs batched over all B*T frames — at B=1,
    T=2 this is +7% throughput bf16 (+10% with --int8) for ONE frame of
    added latency; the STEP is bitwise-identical to T sequential
    batched steps at equal buckets (frame_step_batched_temporal,
    tests/test_batched_step.py). One facade-level nuance: host bucket
    dispatch picks the ReID bucket per GROUP (from the previous
    group's max counts) where the frame-at-a-time facade picks per
    FRAME — when the two schedules pick different buckets, the
    different encoder batch shape shifts features by XLA's
    batch-dependent float rounding (~1e-3, up to ~1 px on boxes; same
    effect as the bucket-4 parity pin). Track identities are
    unaffected. The reference has no analog (its loop is strictly
    frame-at-a-time, demo:1986-2006); TRT users get the same trade
    only by rebuilding engines at batch T.

    update()/update_async() take [B, T, H, W, 3] (or a list of B
    [T, H, W, 3] stacks) and resolve to ``out[t][s]`` = stream s's
    tracks at group-frame t — time-major so serving loops can emit
    frame t for every stream before touching t+1.
    """

    def __init__(
        self,
        bundle: ModelBundle,
        n_streams: int,
        t_batch: int = 2,
        tracker_cfg: TrackerConfig = DEFAULT_TRACKER,
        nms_cfg: NMSConfig = DEFAULT_NMS,
        pipe_cfg: PipelineConfig = DEFAULT_PIPELINE,
    ):
        from botsort_tpu.pipeline.frame_step import (
            frame_step_batched_temporal,
        )

        super().__init__(bundle, n_streams, tracker_cfg, nms_cfg,
                         pipe_cfg)
        if t_batch < 1:
            raise ValueError(f"t_batch must be >= 1, got {t_batch}")
        self.t_batch = t_batch
        self._step = frame_step_batched_temporal

    def update_async(self, frames_bgr) -> "PendingBatch":
        frames = np.stack(frames_bgr)
        if frames.shape[:2] != (self.n_streams, self.t_batch):
            raise ValueError(
                f"expected [B={self.n_streams}, T={self.t_batch}, H, W, "
                f"3] frames, got {frames.shape}")
        # The temporal step consumes the [B, T, ...] layout directly,
        # so the inherited dispatch/bucket/overflow logic applies as-is
        # (the base class only checks shape[0] == n_streams).
        return super().update_async(frames)

    def _counts(self, res_host):
        """(max live bodies, max attached faces) across streams AND the
        T group frames (fields are [B, T, ...])."""
        live = face = 0
        for s in range(self.n_streams):
            for tt in range(self.t_batch):
                res_st = jax.tree.map(lambda x: x[s][tt], res_host)
                nl, nf = _live_and_face_counts(res_st, self._det_width)
                live, face = max(live, nl), max(face, nf)
        return live, face

    def _resolve(self, frames, result, backup, bucket, fbucket):
        res_host = jax.device_get(result)
        if bucket is not None:
            max_live, max_face = self._counts(res_host)
            need = face_bucket_need(max_face, max_live)
            if max_live > bucket or need > fbucket:
                self.stores, result = self._step(
                    self.bundle, backup, frames,
                    self.tracker_cfg, self.nms_cfg, self.pipe_cfg,
                    None, self._pick_bucket(max_live),
                    self._pick_bucket(need))
                res_host = jax.device_get(result)
            self._last_max_live = max_live
            self._last_max_face = max_face
        out = []
        for tt in range(self.t_batch):
            per_stream = []
            for s in range(self.n_streams):
                res_st = jax.tree.map(lambda x: x[s][tt], res_host)
                per_stream.append(assemble_tracks(
                    res_st, self.tracker_cfg, self.nms_cfg,
                    self.pipe_cfg, warn_state=self._warn[s]))
            out.append(per_stream)
        return out


class MeshBatchedBoTSORTPipeline(BatchedBoTSORTPipeline):
    """S streams sharded over a device mesh, b = S/chips per chip.

    The multi-chip serving topology (SURVEY §2 "shard concurrent
    streams over chips"; BASELINE config 5 at scale): each device runs
    the SAME natively-batched per-chip program (frame_step_batched) on
    its stream slice via shard_map — pure data parallelism, zero
    collectives in the steady state (parallel/streams.py). Per-slice
    outputs are bitwise-identical to the single-chip batched pipeline
    (tests/test_multistream.py; __graft_entry__.dryrun_multichip
    asserts it every driver round). Host-side bucket dispatch is shared
    across all streams — sized by the global max live count — so every
    device compiles the same program and overflow re-runs stay in
    lockstep.

    If n_streams doesn't divide the mesh, the stream axis is padded
    with copies of stream 0 (their tracker state evolves but their
    outputs are dropped); callers see exactly n_streams track lists.
    """

    def __init__(
        self,
        bundle: ModelBundle,
        n_streams: int,
        mesh=None,
        n_chips: Optional[int] = None,
        tracker_cfg: TrackerConfig = DEFAULT_TRACKER,
        nms_cfg: NMSConfig = DEFAULT_NMS,
        pipe_cfg: PipelineConfig = DEFAULT_PIPELINE,
    ):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from botsort_tpu.parallel.streams import (
            make_mesh,
            make_multi_stream_step,
        )

        if mesh is None:
            mesh = make_mesh(n_chips)
        chips = int(mesh.devices.size)
        pad = (-n_streams) % chips
        super().__init__(bundle, n_streams + pad, tracker_cfg, nms_cfg,
                         pipe_cfg)
        self.real_streams = n_streams
        self.mesh = mesh
        self.n_chips = chips
        self.stores = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(
                    mesh, P(*(("stream",) + (None,) * (x.ndim - 1))))),
            self.stores)
        ms_step = make_multi_stream_step(mesh, tracker_cfg, nms_cfg,
                                         pipe_cfg)

        def _sharded_step(bundle, stores, frames, _tc, _nc, _pc,
                          gmc=None, reid_bucket=None, face_bucket=None):
            assert gmc is None, "GMC is a single-stream (demo) feature"
            return ms_step(bundle, stores, frames, reid_bucket,
                           face_bucket)

        self._step = _sharded_step

    def update_async(self, frames_bgr) -> "PendingBatch":
        frames = list(frames_bgr)
        if len(frames) != self.real_streams:
            raise ValueError(
                f"expected {self.real_streams} frames, got {len(frames)}")
        frames += [frames[0]] * (self.n_streams - self.real_streams)
        return super().update_async(frames)

    def _resolve(self, frames, result, backup, bucket, fbucket):
        out = super()._resolve(frames, result, backup, bucket, fbucket)
        return out[:self.real_streams]


class PendingBatch:
    """Handle for one in-flight BatchedBoTSORTPipeline step."""

    def __init__(self, pipeline, frames, result, backup, bucket, fbucket):
        self._args = (pipeline, frames, result, backup, bucket, fbucket)
        self._out = None

    def result(self) -> List[List[STrackView]]:
        if self._out is None:
            p, frames, result, backup, bucket, fbucket = self._args
            self._out = p._resolve(frames, result, backup, bucket,
                                   fbucket)
            self._args = None
        return self._out
