"""Fixed-shape class-aware non-maximum suppression.

The reference bakes NMS into the detector ONNX graph and executes it with
TensorRT (README.md:183, 199-244: tunable max_output_boxes_per_class /
iou_threshold / score_threshold via sam4onnx). On TPU the NMS is ours:
a static-shape top-k + IoU suppression sweep that jits into the detector's
postprocess, emitting padded per-class slots plus validity masks.

Algorithm (per class): take the top-K boxes by score, compute the K x K
IoU matrix once (one small matmul-free VPU block), then run the standard
greedy sweep as a K-step ``lax.scan`` over precomputed rows — each step is
O(K) vector work, no data-dependent shapes. Matches ONNX
NonMaxSuppression semantics (suppress when IoU > threshold with an
already-kept higher-scoring box).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from botsort_tpu.ops.boxes import iou_matrix


class Detections(NamedTuple):
    """Padded detector output, per class.

    boxes: [C, K, 4] tlbr in input-image coordinates.
    scores: [C, K] float32.
    valid: [C, K] bool.
    clipped: [C] bool — more than pre_nms_top_k candidates cleared the
      score threshold, so the sweep dropped the overflow (approximate
      result for that class this frame).
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    valid: jnp.ndarray
    clipped: jnp.ndarray


def nms_single_class(
    boxes_tlbr: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float,
    max_outputs: int,
    pre_nms_top_k: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS over one class's padded candidates.

    boxes_tlbr: [N, 4]; scores: [N]; valid: [N] -> (boxes [K,4],
    scores [K], valid [K], clipped []) sorted by descending score.

    The suppression sweep runs over the top `pre_nms_top_k` candidates
    (standard accelerator practice; exact when the candidate count above
    the score threshold is <= pre_nms_top_k — `clipped` reports when it
    is not), then the first `max_outputs` survivors are compacted into
    the output slots — matching ONNX NonMaxSuppression's
    max_output_boxes_per_class.
    """
    neg = jnp.float32(-1.0)
    above = valid & (scores > score_threshold)
    s = jnp.where(above, scores, neg)
    p = min(pre_nms_top_k, s.shape[0])
    k = max_outputs
    clipped = jnp.sum(above) > p
    top_s, top_i = jax.lax.top_k(s, p)
    top_boxes = boxes_tlbr[top_i]
    top_valid = top_s > neg

    iou = iou_matrix(top_boxes, top_boxes)
    # dominates[i, j]: higher-ranked box i suppresses j if kept.
    rank = jnp.arange(p)
    dominates = (
        (iou > iou_threshold)
        & (rank[:, None] < rank[None, :])
        & top_valid[:, None] & top_valid[None, :]
    )

    # Greedy NMS as a fixpoint: keep[j] = valid[j] and no kept dominator.
    # Iterating from keep0=valid converges to the unique greedy solution
    # in <= (longest suppression chain) iterations — each iteration is
    # ONE [P, P] masked reduction instead of P sequential scan steps
    # (the dependency graph is a DAG ordered by rank; after t iterations
    # every box whose longest dominator chain is <= t is final).
    def fix_cond(st):
        keep, prev, it = st
        return jnp.logical_and(jnp.any(keep != prev), it < p)

    def fix_body(st):
        keep, _, it = st
        new = top_valid & jnp.logical_not(
            jnp.any(dominates & keep[:, None], axis=0))
        return new, keep, it + 1

    keep0 = top_valid
    keep, _, _ = jax.lax.while_loop(
        fix_cond, fix_body,
        (keep0, jnp.logical_not(keep0), jnp.int32(0)))

    # Compact the first K survivors (score order) into fixed slots.
    rank = jnp.cumsum(keep) - 1
    dest = jnp.where(keep & (rank < k), rank, k)
    out_boxes = jnp.zeros((k + 1, 4), dtype=top_boxes.dtype).at[dest].set(
        top_boxes)[:k]
    out_scores = jnp.zeros((k + 1,), dtype=top_s.dtype).at[dest].set(
        jnp.where(keep, top_s, 0.0))[:k]
    out_valid = jnp.arange(k) < jnp.minimum(jnp.sum(keep), k)
    return out_boxes, out_scores, out_valid, clipped


def multiclass_nms(
    boxes_tlbr: jnp.ndarray,
    scores: jnp.ndarray,
    class_ids: jnp.ndarray,
    valid: jnp.ndarray,
    num_classes: int,
    iou_threshold: float,
    score_threshold: float,
    max_per_class: int,
    pre_nms_top_k: int = 512,
) -> Detections:
    """Class-aware NMS over a flat padded candidate set.

    boxes_tlbr: [N, 4]; scores: [N]; class_ids: [N] int32; valid: [N].
    """

    def per_class(c):
        mask = valid & (class_ids == c)
        return nms_single_class(
            boxes_tlbr, scores, mask, iou_threshold, score_threshold,
            max_per_class, pre_nms_top_k)

    b, s, v, cl = jax.vmap(per_class)(jnp.arange(num_classes))
    return Detections(boxes=b, scores=s, valid=v, clipped=cl)


def multiclass_nms_dense(
    boxes_tlbr: jnp.ndarray,
    class_scores: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float,
    max_per_class: int,
    pre_nms_top_k: int = 512,
) -> Detections:
    """Class-aware NMS where every candidate has a score per class
    (ONNX NonMaxSuppression's input layout — the detector's decode
    produces [A, C] scores, each anchor participating in every class).

    boxes_tlbr: [A, 4]; class_scores: [A, C] -> Detections with K =
    max_per_class slots per class.
    """
    a, c = class_scores.shape
    valid = jnp.ones((a,), dtype=bool)

    def per_class(scores_c):
        return nms_single_class(
            boxes_tlbr, scores_c, valid, iou_threshold, score_threshold,
            max_per_class, pre_nms_top_k)

    b, s, v, cl = jax.vmap(per_class)(class_scores.T)
    return Detections(boxes=b, scores=s, valid=v, clipped=cl)
