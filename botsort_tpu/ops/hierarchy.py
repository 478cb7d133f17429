"""Greedy box-hierarchy association (face->head, head->body, hands->body).

The reference walks Python object lists calling
``find_most_relevant_object`` per base box
(demo_bottrack_onnx_tflite.py:1372-1411, 1763-1791): pick the unused
target with the highest IoU, tie-broken by smaller center distance, then
mark it used. Order matters (bases claim targets first-come-first-served),
so this is inherently sequential over bases — but each step is a fully
vectorized masked argmax over target slots, which maps to a short
``lax.scan`` with [T]-wide VPU work per step.

Center coordinates: the reference computes box centers with an integer-
division bug (``cx = x_min // x_max``, demo:1013-1014), which only affects
this tie-break. We use true geometric centers ((x1+x2)/2) — a documented
deviation; ties in IoU are rare and the reference's tie-break values are
effectively noise (0 or 1).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from botsort_tpu.ops.boxes import iou_matrix


def greedy_assign(
    base_tlbr: jnp.ndarray,
    base_valid: jnp.ndarray,
    target_tlbr: jnp.ndarray,
    target_valid: jnp.ndarray,
    rounds: int = 1,
) -> Tuple[jnp.ndarray, ...]:
    """Assign each base box its best unused target, in base order.

    base_tlbr: [B, 4]; target_tlbr: [T, 4]; masks [B], [T].
    rounds: how many targets each base may claim (2 for hands->body,
      demo:1394-1411 runs find_most_relevant_object twice per body).
    Returns `rounds` arrays of shape [B] int32: target index or -1.
    """
    b = base_tlbr.shape[0]
    iou = iou_matrix(base_tlbr, target_tlbr)
    iou = jnp.where(base_valid[:, None] & target_valid[None, :], iou, 0.0)

    bc = (base_tlbr[:, :2] + base_tlbr[:, 2:4]) / 2.0
    tc = (target_tlbr[:, :2] + target_tlbr[:, 2:4]) / 2.0
    dist = jnp.linalg.norm(bc[:, None, :] - tc[None, :, :], axis=-1)

    def claim(used, bi):
        # Highest IoU among unused targets; tie-break by center distance.
        row_iou = jnp.where(used, 0.0, iou[bi])
        best_iou = jnp.max(row_iou)
        cand = (row_iou == best_iou) & (best_iou > 0.0)
        row_d = jnp.where(cand, dist[bi], jnp.inf)
        choice = jnp.argmin(row_d).astype(jnp.int32)
        found = best_iou > 0.0
        choice = jnp.where(found, choice, -1)
        used = jnp.where(found, used.at[jnp.maximum(choice, 0)].set(True),
                         used)
        return used, choice

    def step(used, bi):
        # Each base claims `rounds` targets back-to-back before the next
        # base runs — matching the reference's interleaving for
        # hands->body (demo:1394-1411: hand1 then hand2 per body).
        picks = []
        for _ in range(rounds):
            used, choice = claim(used, bi)
            picks.append(choice)
        return used, jnp.stack(picks)

    used0 = jnp.logical_not(target_valid)
    _, picks = jax.lax.scan(step, used0, jnp.arange(b))
    return tuple(picks[:, r] for r in range(rounds))


def greedy_assign_batch(problems):
    """Run several independent greedy_assign problems in ONE scan.

    problems: list of (base_tlbr [B,4], base_valid [B], target_tlbr [T,4],
    target_valid [T], rounds) with identical B, T and max rounds R. The
    per-base sequential claiming of all problems advances in lockstep —
    one [P, ...]-vectorized scan instead of P scans (the frame step runs
    faces->heads, heads->bodies, hands->bodies; sequential-scan steps are
    the expensive unit on TPU, so batching them is ~P x cheaper).

    Returns a list of tuples of pick arrays (as greedy_assign).
    """
    p = len(problems)
    b = problems[0][0].shape[0]
    max_rounds = max(pr[4] for pr in problems)
    base = jnp.stack([pr[0] for pr in problems])            # [P, B, 4]
    base_valid = jnp.stack([pr[1] for pr in problems])      # [P, B]
    target = jnp.stack([pr[2] for pr in problems])          # [P, T, 4]
    target_valid = jnp.stack([pr[3] for pr in problems])    # [P, T]
    # Rounds beyond a problem's own count claim nothing (round mask).
    round_active = jnp.asarray(
        [[r < pr[4] for r in range(max_rounds)] for pr in problems])

    iou = jax.vmap(iou_matrix)(base, target)                # [P, B, T]
    iou = jnp.where(base_valid[:, :, None] & target_valid[:, None, :],
                    iou, 0.0)
    bc = (base[..., :2] + base[..., 2:4]) / 2.0
    tc = (target[..., :2] + target[..., 2:4]) / 2.0
    dist = jnp.linalg.norm(bc[:, :, None, :] - tc[:, None, :, :], axis=-1)

    def claim(used, bi, active):
        row_iou = jnp.where(used, 0.0, iou[:, bi, :])       # [P, T]
        best_iou = jnp.max(row_iou, axis=-1, keepdims=True)
        cand = (row_iou == best_iou) & (best_iou > 0.0)
        row_d = jnp.where(cand, dist[:, bi, :], jnp.inf)
        choice = jnp.argmin(row_d, axis=-1).astype(jnp.int32)
        found = (best_iou[:, 0] > 0.0) & active
        choice = jnp.where(found, choice, -1)
        claim_mask = (
            jnp.arange(used.shape[-1])[None, :]
            == jnp.maximum(choice, 0)[:, None]) & found[:, None]
        return used | claim_mask, choice

    def step(used, bi):
        picks = []
        for r in range(max_rounds):
            used, choice = claim(used, bi, round_active[:, r])
            picks.append(choice)
        return used, jnp.stack(picks, axis=-1)              # [P, R]

    used0 = jnp.logical_not(target_valid)
    _, picks = jax.lax.scan(step, used0, jnp.arange(b))     # [B, P, R]
    out = []
    for pi, pr in enumerate(problems):
        out.append(tuple(picks[:, pi, r] for r in range(pr[4])))
    return out
