"""Fused Pallas TPU kernel for the ResNeSt stem + stage 1.

The body encoder's first two segments (deep stem + three SplAt
bottlenecks at 64x32 spatial, 32-64 channels) run at ~12% MFU under XLA
— in-context 3.6 ms of the 6.9 ms b64 encoder (tools/perf_probe.py
--stages bodycum) — because small-channel convs at large spatial are
dominated by HBM round trips and im2col materialization. This kernel
runs BOTH segments for one image per grid step entirely in VMEM: the
activations never touch HBM between the first conv and stage 1's
output.

Layout: every activation is **pair-packed** — shape (H*W/2, 2C), two
horizontally-adjacent pixels sharing a row, lanes = [even-pixel C |
odd-pixel C]. Chosen for Mosaic's constraints on this platform
(probed): reshapes lower only when BOTH sides' lane counts are
multiples of 128, and strided slices don't lower at all. Pair-packing
makes the stem's stride-2 downsampling a chain of static lane slices
and 128-multiple reshapes, horizontal conv taps a lane-half swap plus a
row roll, and matmuls use block-diagonal duplicated weights (even/odd
pixels share them).

Convolutions are im2col matmuls: 3x3 taps are built with jnp.roll (row
axis) + lane-half swaps + edge masks into a patch scratch buffer, then
one MXU matmul per conv (per 2048-row block to bound VMEM). BatchNorm
is folded into per-channel scale/bias applied on the f32 accumulator.

Weight-exact with respect to models/fastreid.py's Flax modules up to
bf16 rounding (the Flax path computes BN in bf16; here scale/bias apply
in f32 before the bf16 cast). Parity: tests/test_fastreid_pallas.py
(interpret mode on CPU vs the Flax apply).

MEASURED OUTCOME (2026-08-17, v5e): a loss — full encoder b64 9.96 ms
fused vs 6.76 plain XLA (b16 3.04 vs 2.03; --stages bodyfused). The
pair-packing's block-diagonal matmuls waste half the MXU and the
9-roll im2col tap construction is VPU-bound, together exceeding the
HBM traffic saved. Kept as an opt-in for future Mosaic versions with
strided-slice support; see docs/PERF.md "Fused Pallas stem+stage1".

Reference parity context: the stem/stage-1 ops implement the same
graph as the reference's mot17_sbs_S50 ONNX backbone head
(demo_bottrack_onnx_tflite.py:1032-1142 consumes it); this file only
changes HOW they execute on TPU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # maxpool pad value (plain float: no captured array consts)


# ---------------------------------------------------------------------------
# Weight packing (XLA side, pure jnp — runs inside the caller's jit).
# ---------------------------------------------------------------------------

def _fold_bn(bn_params, bn_stats, eps=1e-5):
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    b = bn_params["bias"] - bn_stats["mean"] * s
    return s.astype(jnp.float32), b.astype(jnp.float32)


def _convbn(tree):
    """(kernel, scale, bias) of a _ConvBN submodule's variables."""
    k = tree["params"]["Conv_0"]["kernel"]
    s, b = _fold_bn(tree["params"]["BatchNorm_0"],
                    tree["batch_stats"]["BatchNorm_0"])
    return k, s, b


def _pp_tapblock(w, s, b):
    """Plain conv kernel (kh,kw,cin,cout) -> per-tap block-diagonal
    pair-packed matmul weights (kh*kw*2cin, 2cout), sb (2, 2cout)."""
    kh, kw, cin, cout = w.shape
    wt = w.reshape(kh * kw, cin, cout)
    z = jnp.zeros_like(wt)
    top = jnp.concatenate([wt, z], axis=2)
    bot = jnp.concatenate([z, wt], axis=2)
    wpp = jnp.concatenate([top, bot], axis=1).reshape(
        kh * kw * 2 * cin, 2 * cout)
    sb = jnp.stack([jnp.concatenate([s, s]), jnp.concatenate([b, b])])
    return wpp.astype(jnp.bfloat16), sb.astype(jnp.float32)


def _pp_full(w, s, b):
    """conv1: patch layout is [all-taps even | all-taps odd], so the
    pair weights are one full 2x2 block-diagonal, (2*kh*kw*cin, 2cout)."""
    kh, kw, cin, cout = w.shape
    w2 = w.reshape(kh * kw * cin, cout)
    z = jnp.zeros_like(w2)
    wpp = jnp.concatenate([
        jnp.concatenate([w2, z], axis=1),
        jnp.concatenate([z, w2], axis=1)], axis=0)
    sb = jnp.stack([jnp.concatenate([s, s]), jnp.concatenate([b, b])])
    return wpp.astype(jnp.bfloat16), sb.astype(jnp.float32)


def pack_stem_stage1(stem_vars, block_vars, width: int):
    """Flatten stem (3 x _ConvBN variables) + stage-1 (3 x
    SplAtBottleneck variables) into the kernel's weight tuple.

    width: stage-1 bottleneck width (64 for ResNeSt-50).
    """
    out = []
    for i, tree in enumerate(stem_vars):
        k, s, b = _convbn(tree)
        w, sb = (_pp_full if i == 0 else _pp_tapblock)(k, s, b)
        out += [w, sb]
    for i, tree in enumerate(block_vars):
        p, st = tree["params"], tree["batch_stats"]
        # 1x1 in
        k, s, b = _convbn({"params": p["_ConvBN_0"],
                           "batch_stats": st["_ConvBN_0"]})
        w, sb = _pp_tapblock(k, s, b)
        out += [w, sb]
        # SplAt grouped 3x3 (radix 2): per radix group g, out channels
        # [g*width:(g+1)*width] read input channels [g*width/2 ...].
        sp_p, sp_s = p["SplAtConv_0"], st["SplAtConv_0"]
        k, s, b = _convbn({"params": sp_p["_ConvBN_0"],
                           "batch_stats": sp_s["_ConvBN_0"]})
        wg, sbg = [], []
        for g in range(2):
            sl = slice(g * width, (g + 1) * width)
            w_, sb_ = _pp_tapblock(k[..., sl], s[sl], b[sl])
            wg.append(w_)
            sbg.append(sb_)
        out += [jnp.stack(wg), jnp.stack(sbg)]
        # Attention MLP: Dense -> BN(folded) -> relu -> Dense.
        d1 = sp_p["Dense_0"]
        s1, b1 = _fold_bn(sp_p["BatchNorm_0"], sp_s["BatchNorm_0"])
        # bn(x@W + c) = x@(W*s) + (c*s + (beta - mean*s)) — _fold_bn
        # returns s and (beta - mean*s).
        wd1 = (d1["kernel"] * s1[None, :]).astype(jnp.bfloat16)
        bd1 = (d1["bias"] * s1 + b1)[None, :].astype(jnp.float32)
        d2 = sp_p["Dense_1"]
        wd2 = d2["kernel"].astype(jnp.bfloat16)
        bd2 = d2["bias"][None, :].astype(jnp.float32)
        out += [wd1, bd1, wd2, bd2]
        # 1x1 out (no act)
        k, s, b = _convbn({"params": p["_ConvBN_1"],
                           "batch_stats": st["_ConvBN_1"]})
        w, sb = _pp_tapblock(k, s, b)
        out += [w, sb]
        if "_ConvBN_2" in p:  # downsample shortcut (block 0)
            k, s, b = _convbn({"params": p["_ConvBN_2"],
                               "batch_stats": st["_ConvBN_2"]})
            w, sb = _pp_tapblock(k, s, b)
            out += [w, sb]
    return tuple(out)


def conv1_patches(x: jnp.ndarray) -> jnp.ndarray:
    """XLA-side im2col for the stride-2 stem conv.

    x: (B, H, W, 3) normalized input. Returns (B, H/2 * W/4, 54)
    bfloat16 pair-packed patches, lane order [27-tap even px | odd px],
    tap order (dy, dx) row-major, channel minor.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = [xp[:, 1 + dy:1 + dy + h:2, 1 + dx:1 + dx + w:2, :]
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    p = jnp.concatenate(taps, axis=-1)            # (B, H/2, W/2, 27)
    p = p.reshape(b, h // 2, w // 4, 2 * 9 * c)   # [even 27 | odd 27]
    return p.reshape(b, (h // 2) * (w // 4), 2 * 9 * c).astype(
        jnp.bfloat16)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _make_kernel(h1: int, wq: int, sw: int, width: int, p_rows: int):
    """h1: stem conv rows (H/2); wq: pair columns at stem res (W/4);
    sw: stem width; width: stage-1 bottleneck width; p_rows: patch
    block rows."""
    r = h1 * wq               # pair rows at stem resolution
    h2, wq2 = h1 // 2, wq // 2
    r2 = h2 * wq2             # pair rows at stage-1 resolution
    c_out = 8 * width         # pair-packed stage-1 output lanes

    def px_tap(x, dy, dx, q, c, fill, iota):
        """Tap (dy,dx) of pair-packed x (rows, 2c); q = pairs per row."""
        rows = x.shape[0]
        y = x
        if dy != 0:
            y = jnp.roll(y, -dy * q, axis=0)
            bad = (iota < q) if dy < 0 else (iota >= rows - q)
            y = jnp.where(bad, fill, y)
        if dx == 1:
            even = y[:, c:]
            odd = jnp.roll(y, -1, axis=0)[:, :c]
            odd = jnp.where(jnp.remainder(iota, q) == q - 1, fill, odd)
            y = jnp.concatenate([even, odd], axis=1)
        elif dx == -1:
            even = jnp.roll(y, 1, axis=0)[:, c:]
            even = jnp.where(jnp.remainder(iota, q) == 0, fill, even)
            odd = y[:, :c]
            y = jnp.concatenate([even, odd], axis=1)
        return y

    def mm_sb(pblk, w_ref, sb_ref, act):
        acc = jnp.dot(pblk, w_ref[:, :],
                      preferred_element_type=jnp.float32)
        y = acc * sb_ref[0:1, :] + sb_ref[1:2, :]
        if act:
            y = jnp.maximum(y, 0.0)
        return y.astype(jnp.bfloat16)

    def kernel(p1_ref, *args):
        (w1, sb1, w2, sb2, w3, sb3,
         win0, sbin0, wsp0, sbsp0, wd10, bd10, wd20, bd20, wout0,
         sbout0, wsc0, sbsc0,
         win1, sbin1, wsp1, sbsp1, wd11, bd11, wd21, bd21, wout1,
         sbout1,
         win2, sbin2, wsp2, sbsp2, wd12, bd12, wd22, bd22, wout2,
         sbout2,
         out_ref, pbuf, gbuf, abuf, bbuf, ybuf, xres, tbuf) = args
        blocks = [
            (win0, sbin0, wsp0, sbsp0, wd10, bd10, wd20, bd20, wout0,
             sbout0, wsc0, sbsc0),
            (win1, sbin1, wsp1, sbsp1, wd11, bd11, wd21, bd21, wout1,
             sbout1, None, None),
            (win2, sbin2, wsp2, sbsp2, wd12, bd12, wd22, bd22, wout2,
             sbout2, None, None),
        ]
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
        iota_r2 = jax.lax.broadcasted_iota(jnp.int32, (r2, 1), 0)
        zero = jnp.bfloat16(0)
        neg = jnp.bfloat16(_NEG)

        # --- conv1: pair-packed patches came in via p1_ref.
        n_blk = r // p_rows
        for blk in range(n_blk):
            sl = slice(blk * p_rows, (blk + 1) * p_rows)
            abuf[sl, 0:2 * sw] = mm_sb(p1_ref[sl, :], w1, sb1, True)

        # --- conv2 (sw -> sw) and conv3 (sw -> 2sw): im2col from taps.
        def conv3x3(src_ref, c2, dst_ref, w_ref, sb_ref):
            # src (r, 2*c2) slice of src_ref; patches K = 18*c2.
            for blk in range(n_blk):
                sl = slice(blk * p_rows, (blk + 1) * p_rows)
                for t, (dy, dx) in enumerate(
                        (dy, dx) for dy in (-1, 0, 1)
                        for dx in (-1, 0, 1)):
                    tap = px_tap(src_ref[:, 0:2 * c2], dy, dx, wq, c2,
                                 zero, iota_r)
                    pbuf[0:p_rows, t * 2 * c2:(t + 1) * 2 * c2] = tap[sl]
                nout = w_ref.shape[1]
                dst_ref[sl, 0:nout] = mm_sb(
                    pbuf[0:p_rows, 0:18 * c2], w_ref, sb_ref, True)

        conv3x3(abuf, sw, bbuf, w2, sb2)
        conv3x3(bbuf, sw, abuf, w3, sb3)

        # --- maxpool 3x3 stride 2 (pad 1) + downsample to stage-1 res.
        c2 = 2 * sw                       # conv3 out channels
        m = px_tap(abuf[:, 0:2 * c2], 0, 0, wq, c2, neg, iota_r)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                t = px_tap(abuf[:, 0:2 * c2], dy, dx, wq, c2, neg,
                           iota_r)
                m = jnp.maximum(m, t)
        lanes = wq * 2 * c2
        mh = m.reshape(h1, lanes)                      # rows = h
        mh = mh.reshape(h1 // 2, 2 * lanes)[:, 0:lanes]  # even h
        ms = mh.reshape(h1 // 2 * wq, 2 * c2)
        mw = ms.reshape(h1 // 2 * wq // 2, 4 * c2)     # pair old pairs
        pooled = jnp.concatenate(
            [mw[:, 0:c2], mw[:, 2 * c2:3 * c2]], axis=1)  # even w
        tbuf[0:r2, 0:2 * c2] = pooled

        # --- stage 1: three SplAt bottlenecks at (r2, 2C) pair rows.
        cin = 2 * c2                     # first block input lanes
        for bi, (win, sbin, wsp, sbsp, wd1, bd1, wd2, bd2, wout, sbout,
                 wsc, sbsc) in enumerate(blocks):
            if bi == 0:
                xin = tbuf[0:r2, 0:cin]
            else:
                xin = xres[0:r2, 0:c_out]
            t_act = mm_sb(xin, win, sbin, True)        # (r2, 2*width)
            # splat grouped conv: per radix group, patches + matmul.
            cw = width // 2                            # per-group cin
            for t, (dy, dx) in enumerate(
                    (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)):
                tap = px_tap(t_act, dy, dx, wq2, width, zero, iota_r2)
                pbuf[0:r2, t * 2 * width:(t + 1) * 2 * width] = tap
            for g in range(2):
                # group-sliced patch columns -> (r2, 18*cw)
                for t in range(9):
                    base = t * 2 * width
                    ev = pbuf[0:r2, base + g * cw:base + (g + 1) * cw]
                    od = pbuf[0:r2,
                              base + width + g * cw:
                              base + width + (g + 1) * cw]
                    gbuf[0:r2, t * 2 * cw:t * 2 * cw + cw] = ev
                    gbuf[0:r2, t * 2 * cw + cw:(t + 1) * 2 * cw] = od
                y_g = mm_sb(gbuf[0:r2, 0:18 * cw], wsp[g], sbsp[g],
                            True)                      # (r2, 2*width)
                ybuf[0:r2, g * width:(g + 1) * width] = y_g[:, 0:width]
                ybuf[0:r2,
                     2 * width + g * width:2 * width + (g + 1) * width
                     ] = y_g[:, width:2 * width]
            # attention (f32 throughout).
            y = ybuf[0:r2, 0:4 * width].astype(jnp.float32)
            gm = jnp.mean(y, axis=0, keepdims=True)    # (1, 4*width)
            gm2 = (gm[:, 0:2 * width] + gm[:, 2 * width:4 * width]) * 0.5
            gap = gm2[:, 0:width] + gm2[:, width:2 * width]
            z = jnp.dot(gap.astype(jnp.bfloat16), wd1[:, :],
                        preferred_element_type=jnp.float32) + bd1[:, :]
            z = jnp.maximum(z, 0.0)
            att = jnp.dot(z.astype(jnp.bfloat16), wd2[:, :],
                          preferred_element_type=jnp.float32) + bd2[:, :]
            a0, a1 = att[:, 0:width], att[:, width:2 * width]
            mx = jnp.maximum(a0, a1)
            e0 = jnp.exp(a0 - mx)
            e1 = jnp.exp(a1 - mx)
            att0 = e0 / (e0 + e1)
            att1 = 1.0 - att0
            so_e = y[:, 0:width] * att0 + y[:, width:2 * width] * att1
            so_o = (y[:, 2 * width:3 * width] * att0
                    + y[:, 3 * width:4 * width] * att1)
            so = jnp.concatenate([so_e, so_o], axis=1).astype(
                jnp.bfloat16)                          # (r2, 2*width)
            out_y = jnp.dot(so, wout[:, :],
                            preferred_element_type=jnp.float32)
            out_y = out_y * sbout[0:1, :] + sbout[1:2, :]
            if wsc is not None:
                sc = jnp.dot(xin, wsc[:, :],
                             preferred_element_type=jnp.float32)
                sc = sc * sbsc[0:1, :] + sbsc[1:2, :]
            else:
                sc = xres[0:r2, 0:c_out].astype(jnp.float32)
            xres[0:r2, 0:c_out] = jnp.maximum(out_y + sc, 0.0).astype(
                jnp.bfloat16)
        out_ref[:, :] = xres[0:r2, 0:c_out]

    return kernel


@functools.partial(jax.jit, static_argnames=("h", "w", "sw", "width",
                                             "interpret"))
def _stem_stage1_call(p1, weights, h: int, w: int, sw: int, width: int,
                      interpret: bool):
    b = p1.shape[0]
    h1, wq = h // 2, w // 4
    r, r2 = h1 * wq, (h1 // 2) * (wq // 2)
    p_rows = 2048 if (r % 2048 == 0 and r > 2048) else r
    c_out = 8 * width
    kernel = _make_kernel(h1, wq, sw, width, p_rows)
    pk = max(18 * sw, 18 * width)  # patch buffer lanes
    grid_in_specs = [pl.BlockSpec((None, r, p1.shape[2]),
                                  lambda bb: (bb, 0, 0))]
    for wgt in weights:
        grid_in_specs.append(pl.BlockSpec(
            wgt.shape, lambda bb, _nd=wgt.ndim: (0,) * _nd))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, r2, c_out), jnp.bfloat16),
        in_specs=grid_in_specs,
        out_specs=pl.BlockSpec((None, r2, c_out), lambda bb: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((max(p_rows, r2), pk), jnp.bfloat16),   # pbuf
            pltpu.VMEM((r2, 18 * (width // 2)), jnp.bfloat16),  # gbuf
            pltpu.VMEM((r, 4 * sw), jnp.bfloat16),             # abuf
            pltpu.VMEM((r, 4 * sw), jnp.bfloat16),             # bbuf
            pltpu.VMEM((r2, 4 * width), jnp.bfloat16),         # ybuf
            pltpu.VMEM((r2, c_out), jnp.bfloat16),             # xres
            pltpu.VMEM((r2, 4 * sw), jnp.bfloat16),            # tbuf
        ],
        # The working set (scratch + double-buffered in/out blocks +
        # weights) is ~17 MB at the production 256x128 geometry — just
        # over Mosaic's default 16 MB scoped-vmem budget (observed only
        # at b=64; b=16 compiles under the default). v5e has 128 MB of
        # VMEM; grant the kernel 32 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(p1, *weights)
    return out


def stem_stage1(x: jnp.ndarray, stem_vars, block_vars, sw: int,
                width: int, interpret: bool | None = None):
    """x: (B, H, W, 3) normalized input -> (B, H/4, W/4, 4*width)
    stage-1 output, matching ResNeSt50's stem+stage-1 prefix.

    stem_vars: list of the 3 stem _ConvBN variable trees;
    block_vars: list of the 3 stage-1 SplAtBottleneck variable trees.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, _ = x.shape
    weights = pack_stem_stage1(stem_vars, block_vars, width)
    p1 = conv1_patches(x)
    out = _stem_stage1_call(p1, weights, h, w, sw, width, interpret)
    h2, wq2 = h // 4, w // 8
    out = out.reshape(b, h2, wq2, 2, 4 * width)
    return out.reshape(b, h2, wq2 * 2, 4 * width)


def geometry_ok(h: int, w: int) -> bool:
    """Input geometries the pair-packed kernel supports: H divisible by
    4, W by 8 (pair columns at both resolutions), and at least 2 pair
    columns at stage-1 so horizontal taps exist."""
    return h % 4 == 0 and w % 8 == 0 and (w // 8) >= 2 and h >= 8
