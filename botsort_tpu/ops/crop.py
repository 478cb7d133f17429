"""On-device batched crop-and-resize for ReID inputs.

The reference crops detection regions on the host with numpy slicing and
resizes each with cv2.resize (demo_bottrack_onnx_tflite.py:1434-1441,
1127-1139), then re-uploads the batch. Here the full frame is uploaded
once and all MAX_N crops are extracted on-device as one vectorized
bilinear gather — fixed output shape [N, H, W, 3], so the ReID encoders
always see one compiled batch shape (vs the reference's 100 TensorRT
engines for batch 1..100).

Resize semantics mirror cv2.resize INTER_LINEAR on an integer-cropped
region: half-pixel-aligned source coordinates
    src = (dst + 0.5) * region_size / out_size - 0.5
with edge clamping, which is also what cv2 does at borders.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sample_grid(image, boxes_tlbr, out_hw):
    """Shared bilinear sample-coordinate computation.

    Returns (y0, x0, y1i, x1i, wy, wx, good): integer tap indices
    [N, out] (two taps per output row/col, edge-clamped to the cropped
    region then the image, cv2-style), fractional weights, and the
    per-box validity mask (w and h >= 1)."""
    img_h, img_w = image.shape[0], image.shape[1]
    out_h, out_w = out_hw
    x1 = boxes_tlbr[:, 0]
    y1 = boxes_tlbr[:, 1]
    w = boxes_tlbr[:, 2] - x1
    h = boxes_tlbr[:, 3] - y1
    good = (w >= 1.0) & (h >= 1.0)

    # Half-pixel-aligned sample grid inside each region. [N, out] coords.
    gy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5)[None, :]
    gx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5)[None, :]
    sy = y1[:, None] + gy * (h[:, None] / out_h) - 0.5
    sx = x1[:, None] + gx * (w[:, None] / out_w) - 0.5
    # cv2 clamps sampling to the cropped region, not the full image:
    # emulate by clamping to [y1, y2-1] / [x1, x2-1] then to the image.
    sy = jnp.clip(sy, y1[:, None], y1[:, None] + h[:, None] - 1.0)
    sx = jnp.clip(sx, x1[:, None], x1[:, None] + w[:, None] - 1.0)
    sy = jnp.clip(sy, 0.0, img_h - 1.0)
    sx = jnp.clip(sx, 0.0, img_w - 1.0)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0                               # [N, out_h]
    wx = sx - x0                               # [N, out_w]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, img_h - 1)
    x1i = jnp.minimum(x0 + 1, img_w - 1)
    return y0, x0, y1i, x1i, wy, wx, good


def crop_and_resize(
    image: jnp.ndarray,
    boxes_tlbr: jnp.ndarray,
    out_hw: tuple[int, int],
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Extract and bilinearly resize N crops from one image.

    image: [H, W, 3] (any float/int dtype; output is float32).
    boxes_tlbr: [N, 4] float32 pixel corners (x1, y1, x2, y2); callers pass
      integer-valued corners to match the reference's integer slicing.
    out_hw: static (out_h, out_w).
    compute_dtype: dtype of the two interpolation contractions
      (accumulation is always float32 via preferred_element_type). The
      pipeline passes bfloat16 on TPU: uint8 pixel values are exact in
      bfloat16 and the 2-tap weights round to ~2^-9 relative, so crops
      differ from the float32 path by <~0.7 intensity levels while the
      matmuls run at the MXU's bf16 rate with half the HBM traffic (the
      weight matrices against a 1080p frame are the dominant preprocess
      cost — ~100 GFLOP per 64-crop batch).
    Returns [N, out_h, out_w, 3] float32. Degenerate boxes (w or h < 1)
    produce zeros.
    """
    img_h, img_w = image.shape[0], image.shape[1]
    out_h, out_w = out_hw
    y0, x0, y1i, x1i, wy, wx, good = _sample_grid(image, boxes_tlbr, out_hw)

    # Bilinear resize is a separable linear map, so the whole batched
    # crop-resize is TWO matmul contractions on the MXU instead of ~2M
    # random-access gathers (which are ~20x slower on TPU):
    #   Wx [N, out_w, W] (two taps per row), Wy [N, out_h, H]
    #   out[n, r, x, c] = Wy[n, r, :] @ img[:, :, c] @ Wx[n, x, :]^T
    # Horizontal first (cheaper contraction order for tall sources).
    img = image.astype(compute_dtype)
    col_ids = jnp.arange(img_w, dtype=jnp.int32)
    wx_mat = (
        (col_ids[None, None, :] == x0[:, :, None]) * (1.0 - wx[:, :, None])
        + (col_ids[None, None, :] == x1i[:, :, None]) * wx[:, :, None]
    ).astype(compute_dtype)                     # [N, out_w, W]
    # (When x0 == x1i at the clamped edge the two one-hot terms target the
    # same column and sum to (1-wx)+wx = 1 — no special-casing needed.)

    row_ids = jnp.arange(img_h, dtype=jnp.int32)
    wy_mat = (
        (row_ids[None, None, :] == y0[:, :, None]) * (1.0 - wy[:, :, None])
        + (row_ids[None, None, :] == y1i[:, :, None]) * wy[:, :, None]
    ).astype(compute_dtype)                     # [N, out_h, H]

    # [N, out_w, W] x [H, W, 3] -> [N, H, out_w, 3]. The intermediate is
    # stored in compute_dtype: at b=128 crops it is a 212 MB array in
    # f32 vs 106 MB in bf16 (~0.25 ms of pure HBM either way), and the
    # x-phase result is a 2-tap convex combination of uint8 pixels
    # accumulated in f32 by the MXU — the bf16 store rounds it by at
    # most ~0.5 intensity level before the (still f32-accumulated)
    # y phase.
    tmp = jnp.einsum("nxw,hwc->nhxc", wx_mat, img,
                     preferred_element_type=compute_dtype
                     if compute_dtype == jnp.bfloat16 else jnp.float32)
    # [N, out_h, H] x [N, H, out_w, 3] -> [N, out_h, out_w, 3]
    out = jnp.einsum("nrh,nhxc->nrxc", wy_mat, tmp,
                     preferred_element_type=jnp.float32)
    return jnp.where(good[:, None, None, None], out, 0.0)


def crop_and_resize_int8(
    image: jnp.ndarray,
    boxes_tlbr: jnp.ndarray,
    out_hw: tuple[int, int],
    compute_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """crop_and_resize with the x-phase contraction on the int8 MXU.

    The x phase is the crop's FLOP bulk (it contracts every output
    column against the full frame width); v5e's int8 MXU rate is 2x
    bf16. uint8 pixels shift exactly to s8 (p - 128); the 2-tap weights
    (1-wx, wx) quantize to (127-q, q)/127, whose per-row sum is exactly
    127, so dequantization is (acc + 128*127)/127 with NO approximation
    beyond the weight rounding: |wx - q/127| <= 1/254, i.e. <= ~1
    intensity level on the output (the bf16 y phase adds <= ~0.5 more).
    Measured: 128-crop face batch 2.28 -> 1.22 ms, body 3.02 -> 2.57
    (tools/perf_probe.py --stages cropvar, k >= 64).

    Requires a uint8 source image (the production path: BGR camera
    frames); callers with float sources use crop_and_resize.
    """
    assert image.dtype == jnp.uint8, "int8 crop expects a uint8 frame"
    img_h, img_w = image.shape[0], image.shape[1]
    out_h, out_w = out_hw
    y0, x0, y1i, x1i, wy, wx, good = _sample_grid(image, boxes_tlbr, out_hw)

    imgq = (image.astype(jnp.int16) - 128).astype(jnp.int8)
    qx = jnp.round(wx * 127.0).astype(jnp.int8)
    col_ids = jnp.arange(img_w, dtype=jnp.int32)
    wx_q = (
        (col_ids[None, None, :] == x0[:, :, None]) * (127 - qx[:, :, None])
        + (col_ids[None, None, :] == x1i[:, :, None]) * qx[:, :, None]
    ).astype(jnp.int8)                          # [N, out_w, W]
    acc = jnp.einsum("nxw,hwc->nhxc", wx_q, imgq,
                     preferred_element_type=jnp.int32)
    tmp = ((acc.astype(jnp.float32) + 128.0 * 127.0) / 127.0).astype(
        jnp.bfloat16)                           # [N, H, out_w, 3]

    row_ids = jnp.arange(img_h, dtype=jnp.int32)
    wy_mat = (
        (row_ids[None, None, :] == y0[:, :, None]) * (1.0 - wy[:, :, None])
        + (row_ids[None, None, :] == y1i[:, :, None]) * wy[:, :, None]
    ).astype(jnp.bfloat16)                      # [N, out_h, H]
    out = jnp.einsum("nrh,nhxc->nrxc", wy_mat, tmp,
                     preferred_element_type=jnp.float32)
    return jnp.where(good[:, None, None, None], out, 0.0)


def crop_and_resize_gather(
    image: jnp.ndarray,
    boxes_tlbr: jnp.ndarray,
    out_hw: tuple[int, int],
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """crop_and_resize as two-tap GATHERS + lerps instead of one-hot
    matmuls.

    The matmul form contracts every output column against the full
    1920-wide frame (~1.6 GFLOP/crop at 256x128 from 1080p) even though
    each output pixel reads exactly 4 source pixels. Here the x phase
    gathers the two tap COLUMNS per output column (rows of the
    transposed frame — contiguous ~6 KB reads) and lerps; the y phase
    gathers the two tap rows of the per-crop intermediate and lerps.
    O(pixels-touched) HBM traffic, no MXU.

    Numerics: the taps are exact pixel values (uint8 exact in bf16);
    each lerp computes t0 + w*(t1 - t0) in compute_dtype, so bf16
    differs from the float32 path by <~1 intensity level (the matmul
    form's f32 accumulation rounds ~half that). Output values for valid
    boxes are identical to crop_and_resize up to that rounding
    (tests/test_crop_hierarchy.py::test_gather_matches_einsum).
    """
    out_h, out_w = out_hw
    y0, x0, y1i, x1i, wy, wx, good = _sample_grid(image, boxes_tlbr, out_hw)

    img = image.astype(compute_dtype)
    imgT = jnp.swapaxes(img, 0, 1)                 # [W, H, 3]
    wx_c = wx.astype(compute_dtype)[..., None, None]
    t0 = imgT[x0]                                  # [N, out_w, H, 3]
    t1 = imgT[x1i]
    t = t0 + wx_c * (t1 - t0)                      # [N, out_w, H, 3]
    tT = jnp.swapaxes(t, 1, 2)                     # [N, H, out_w, 3]
    r0 = jnp.take_along_axis(tT, y0[:, :, None, None], axis=1)
    r1 = jnp.take_along_axis(tT, y1i[:, :, None, None], axis=1)
    wy_c = wy.astype(compute_dtype)[..., None, None]
    out = (r0 + wy_c * (r1 - r0)).astype(jnp.float32)
    return jnp.where(good[:, None, None, None], out, 0.0)
