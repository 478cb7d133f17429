"""Component-level device timing for the frame step.

Times each stage of the pipeline as its own K-step in-program scan
(device-side method from bench.py — the only reliable timing through
this environment's tunnel, see CLAUDE.md), with analytic FLOP counts so
the MFU per stage is trustworthy (XLA's cost_analysis() under-counts
convolutions on this backend).

Run (TPU, serialized with any other TPU process):
  python tools/perf_probe.py [--stages detector,body,face,cascade,full]

Reports one JSON line per stage: {stage, ms, gflops, mfu, fps}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12


def model_conv_flops(model, sample):
    """Analytic conv+dot FLOPs of model.apply on sample (batch incl.)."""
    import jax

    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), sample)
    jaxpr = jax.make_jaxpr(lambda p, x: model.apply(p, x))(params, sample)
    total = [0.0]

    def count(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                out = eqn.outvars[0].aval
                rhs = eqn.invars[1].aval
                kh, kw, cin_g = rhs.shape[0], rhs.shape[1], rhs.shape[2]
                total[0] += 2.0 * np.prod(out.shape) * kh * kw * cin_g
            elif eqn.primitive.name == "dot_general":
                out = eqn.outvars[0].aval
                lhs = eqn.invars[0].aval
                ((lc, _), _) = eqn.params["dimension_numbers"]
                k = np.prod([lhs.shape[d] for d in lc])
                total[0] += 2.0 * np.prod(out.shape) * k
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    count(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            count(s.jaxpr)

    count(jaxpr.jaxpr)
    return total[0]


def _body_nominal(bundle):
    """Body encoder at the NOMINAL lowering for FLOP counting. The
    production bundle's dgfa stages trace 2x-dense block-diagonal convs
    whose padding lanes are NOT useful work; counting the traced dgfa
    graph inflated body MFU/GFLOP numbers 1.162x (r5 FLOP audit —
    VERDICT r4 weak #5). Timings still run the production lowering."""
    enc = bundle.body_encoder
    if getattr(enc, "dgfa_stages", ()):
        enc = enc.clone(dgfa_stages=())
    return enc


_TUNNEL_FLOOR_S = None


def tunnel_floor(reps: int = 6) -> float:
    """Fixed dispatch+readback cost of ONE program through the tunnel.

    Measured ~27 ms on this environment REGARDLESS of scan length (a
    trivial 16-step scan and a 64-step scan both total ~27 ms), so every
    per-step number from a K-step scan is inflated by floor/K unless
    subtracted. Cached per process."""
    global _TUNNEL_FLOOR_S
    if _TUNNEL_FLOOR_S is not None:
        return _TUNNEL_FLOOR_S
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xs):
        return jax.lax.scan(lambda c, x: (c + x.sum(), x[:4]),
                            jnp.float32(0), xs)

    xs = jnp.zeros((16, 128), jnp.float32)
    _ = jax.device_get(run(xs)[1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = jax.device_get(run(xs)[1])
        best = min(best, time.perf_counter() - t0)
    _TUNNEL_FLOOR_S = best
    return best


def time_scan(fn, params, init_carry, xs, k, reps=5):
    """Best-of-reps per-step seconds for ONE program scanning fn over k
    steps, with the fixed tunnel round-trip subtracted (see
    tunnel_floor).

    params rides as a jit ARGUMENT (a closure would lower the tree as
    program constants — hundreds of MB, overflowing this environment's
    remote-compile request)."""
    import jax

    @jax.jit
    def run(params, carry, xs):
        return jax.lax.scan(lambda c, x: fn(params, c, x), carry, xs)

    carry, out = run(params, init_carry, xs)
    _ = jax.device_get(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, out = run(params, carry, xs)
        _ = jax.device_get(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return max(best - tunnel_floor(), 1e-9) / k


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stages", default="detector,body,face,full")
    parser.add_argument("--k", type=int, default=32)
    parser.add_argument("--b", type=int, default=64,
                        help="crop batch for the bodyseg bisection")
    parser.add_argument("--db", type=int, default=1,
                        help="frame batch for the detseg bisection")
    parser.add_argument("--tlist", default="1,2,4",
                        help="T values for the batchedtemporal stage")
    parser.add_argument("--ch", type=int, default=256,
                        help="body-crop height for the bstem2 race")
    parser.add_argument("--reidhw", default=None,
                        help="body-ReID input HxW override for the "
                        "batchedbisect stage, e.g. 384x128 (BASELINE "
                        "config 5's mot20 geometry)")
    parser.add_argument("--cw", type=int, default=128,
                        help="body-crop width for the bstem2 race")
    parser.add_argument("--bf16-params", action="store_true",
                        help="pre-cast model params to bfloat16")
    args = parser.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from botsort_tpu.config import NMSConfig, PipelineConfig, TrackerConfig
    from botsort_tpu.runtime import assets
    from botsort_tpu.runtime.device import setup_compilation_cache

    setup_compilation_cache()
    bundle = assets.build_bundle(fake_params=True)
    if args.bf16_params:
        bundle = assets.cast_bundle_bf16(bundle)
    rng = np.random.default_rng(0)

    if "detector" in stages:
        x = jnp.asarray(rng.uniform(0, 255, (args.k, 480, 640, 3)),
                        jnp.float32)
        sec = time_scan(
            lambda p, c, f: (c, bundle.detector.apply(p, f[None])[1][0, :8]),
            bundle.detector_params, jnp.zeros(()), x, args.k)
        g = model_conv_flops(bundle.detector, jnp.zeros((1, 480, 640, 3)))
        print(json.dumps({"stage": "detector_b1_480x640",
                          "ms": round(sec * 1e3, 3),
                          "gflops": round(g / 1e9, 1),
                          "mfu": round(g / sec / V5E_PEAK_BF16, 4),
                          "fps": round(1 / sec, 1)}))

    if "body" in stages:
        for nb in (16, 64):
            x = jnp.asarray(rng.uniform(0, 1, (args.k, nb, 256, 128, 3)),
                            jnp.float32)
            sec = time_scan(
                lambda p, c, f: (c, bundle.body_encoder.apply(p, f)[:, :4]),
                bundle.body_params, jnp.zeros(()), x, args.k)
            g = model_conv_flops(_body_nominal(bundle),
                                 jnp.zeros((nb, 256, 128, 3)))
            print(json.dumps({"stage": f"body_reid_b{nb}",
                              "ms": round(sec * 1e3, 3),
                              "gflops": round(g / 1e9, 1),
                              "mfu": round(g / sec / V5E_PEAK_BF16, 4),
                              "fps": round(1 / sec, 1)}))

    if "face" in stages:
        x = jnp.asarray(rng.uniform(0, 255, (args.k, 16, 128, 128, 3)),
                        jnp.float32)
        sec = time_scan(
            lambda p, c, f: (c, bundle.face_encoder.apply(p, f)[:, :4]),
            bundle.face_params, jnp.zeros(()), x, args.k)
        g = model_conv_flops(bundle.face_encoder,
                             jnp.zeros((16, 128, 128, 3)))
        print(json.dumps({"stage": "face_reid_b16",
                          "ms": round(sec * 1e3, 3),
                          "gflops": round(g / 1e9, 1),
                          "mfu": round(g / sec / V5E_PEAK_BF16, 4),
                          "fps": round(1 / sec, 1)}))

    if "facevar" in stages:
        # Depthwise lowering A/B: XLA grouped conv vs 9 shifted FMAs
        # (_DWConvShift — exact, same param tree). Geometries: b16 =
        # the loaded single-stream face bucket, b128 = the 8-stream
        # batched step (8 x 16 faces), where the encoder is 1.93 ms of
        # the ~33 ms step.
        from botsort_tpu.models.facereid import FaceReID

        # The per-step work here (0.2-1.2 ms) is small vs the ~27 ms
        # tunnel floor, so (k, nb, H, W, 3) xs arrays would need k in
        # the hundreds (GBs at nb=128) for a clean signal. Instead the
        # input rides in the CARRY with a feedback term (x += eps*sum)
        # so the body can't be hoisted out of the loop, and xs is a
        # dummy; k scales freely.
        for nb in (16, 32, 64, 128):
            kk = max(args.k, int(16384 / nb))  # >=25 ms of work
            x0 = jnp.asarray(rng.uniform(0, 255, (nb, 128, 128, 3)),
                             jnp.float32)
            for tag, dw in (("conv", "conv"), ("shift", "shift")):
                model = FaceReID(dw_mode=dw)

                def step(p, c, _):
                    feat = model.apply(p, c)
                    return c + jnp.sum(feat) * 1e-12, feat[0, :4]

                sec = time_scan(step, bundle.face_params, x0,
                                jnp.zeros((kk,)), kk)
                print(json.dumps({"stage": f"face_b{nb}_{tag}",
                                  "k": kk,
                                  "ms": round(sec * 1e3, 3)}))

    if "facedw" in stages:
        # How much of the face encoder is the depthwise 3x3s AT ALL?
        # dw_mode='skip' elides them (wrong numerics, same remaining
        # graph) — (conv - skip) upper-bounds ANY dw lowering win;
        # dw_mode='pallas' is the fused VMEM stencil candidate.
        # Geometries as facevar: b16 loaded single-stream, b128 =
        # 8-stream batched (8 x 16 faces).
        from botsort_tpu.models.facereid import FaceReID

        for nb in (16, 128):
            kk = max(args.k, int(16384 / nb))
            x0 = jnp.asarray(rng.uniform(0, 255, (nb, 128, 128, 3)),
                             jnp.float32)
            for tag in ("conv", "skip", "pallas"):
                model = FaceReID(dw_mode=tag)

                def step(p, c, _):
                    feat = model.apply(p, c)
                    return c + jnp.sum(feat) * 1e-12, feat[0, :4]

                try:
                    sec = time_scan(step, bundle.face_params, x0,
                                    jnp.zeros((kk,)), kk)
                except Exception as e:  # pallas mode may not exist yet
                    print(json.dumps({"stage": f"facedw_b{nb}_{tag}",
                                      "error": str(e)[:120]}))
                    continue
                print(json.dumps({"stage": f"facedw_b{nb}_{tag}",
                                  "k": kk,
                                  "ms": round(sec * 1e3, 3)}))

    if "detseg" in stages:
        # Per-segment detector bisection: each segment is its own
        # standalone module at its real input shape, timed as its own
        # scan program — finds WHERE the 74%-of-peak gap lives.
        import flax.linen as nn

        from botsort_tpu.models.common import (
            ConvBN, CSPLayer, Focus, SPPBottleneck)
        from botsort_tpu.models.yolox import (
            PAFPN, DecoupledHead, decode_outputs)

        def seg_time(name, make_mod, in_shape, out_slice):
            # --db > 1 re-runs every segment at frame batch db (the
            # batched multi-stream step's geometry) with the bodyseg
            # base+delta method (k full-size batches would be GBs).
            db = args.db
            in_shape = (db,) + in_shape[1:]
            mod = make_mod()
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, out_slice(_m.apply(p[0], p[1] + f))),
                (params, base), jnp.zeros(()), deltas, args.k)
            g = model_conv_flops(mod, jnp.zeros(in_shape))
            sfx = "" if db == 1 else f"_b{db}"
            print(json.dumps({
                "stage": name + sfx, "ms": round(sec * 1e3, 3),
                "gflops": round(g / 1e9, 1),
                "mfu": round(g / sec / V5E_PEAK_BF16, 4),
            }))

        class Stage(nn.Module):
            feats: int
            n: int
            spp: bool = False

            @nn.compact
            def __call__(self, x):
                x = ConvBN(self.feats, 3, 2)(x)
                if self.spp:
                    x = SPPBottleneck(self.feats)(x)
                return CSPLayer(self.feats, self.n,
                                shortcut=not self.spp)(x)

        class FPNWrap(nn.Module):
            @nn.compact
            def __call__(self, x):
                h, w = x.shape[1], x.shape[2]
                c3 = ConvBN(320, 1, 1)(x)
                c4 = ConvBN(640, 3, 2)(c3)
                c5 = ConvBN(1280, 3, 2)(c4)
                return PAFPN(1.33, 1.25)((c3, c4, c5))

        class HeadWrap(nn.Module):
            decode: bool = False

            @nn.compact
            def __call__(self, x):
                n3 = ConvBN(320, 1, 1)(x)
                n4 = ConvBN(640, 3, 2)(n3)
                n5 = ConvBN(1280, 3, 2)(n4)
                outs = DecoupledHead(4, 1.25)((n3, n4, n5))
                if self.decode:
                    return decode_outputs(outs, 4)[0]
                return outs[0]

        # out_slice keeps the BATCH axis (a [0]-index would let XLA
        # slice the batch out of per-sample convs at --db > 1).
        if args.db == 1:
            # At --db 8 this exact program reproducibly CRASHES the
            # TPU worker ("kernel fault", 2026-08-19, two clean
            # repros) — the same folded 6x6 conv runs fine inside the
            # batched detector, so it is a probe-harness/XLA layout
            # interaction, not a production path. Skipped at db > 1.
            seg_time("det_stem_focus", lambda: Focus(80, 3),
                     (1, 480, 640, 3), lambda y: y[:, ::37, ::41, 0])
        seg_time("det_dark2", lambda: Stage(160, 4),
                 (1, 240, 320, 80), lambda y: y[:, ::29, ::31, 0])
        seg_time("det_dark3", lambda: Stage(320, 12),
                 (1, 120, 160, 160), lambda y: y[:, ::17, ::19, 0])
        seg_time("det_dark4", lambda: Stage(640, 12),
                 (1, 60, 80, 320), lambda y: y[:, ::7, ::11, 0])
        seg_time("det_dark5", lambda: Stage(1280, 4, spp=True),
                 (1, 30, 40, 640), lambda y: y[:, ::5, ::7, 0])
        # FPN/head wrappers add small feeder convs (counted in their
        # FLOPs) so each runs standalone from one input tensor.
        seg_time("det_pafpn_plus_feeders", lambda: FPNWrap(),
                 (1, 60, 80, 320), lambda y: y[0][:, ::7, ::11, 0])
        seg_time("det_head_plus_feeders", lambda: HeadWrap(),
                 (1, 60, 80, 320), lambda y: y[:, ::7, ::11, 0])
        seg_time("det_head_decode_plus_feeders",
                 lambda: HeadWrap(decode=True),
                 (1, 60, 80, 320), lambda y: y[:, ::531, 0])

    if "int8scope" in stages:
        # VERDICT #7: scope int8 to the mid-network (bottlenecks >= 3,
        # i.e. stages 2-4) where requant overhead amortizes over big
        # convs, vs full-model int8 vs bf16 — body encoder b64.
        import re as _re

        from botsort_tpu.models import fastreid as fastreid_mod
        from botsort_tpu.models.quantize import quantize_module

        bsz = 64
        calib = [
            fastreid_mod.preprocess(jnp.asarray(
                rng.integers(0, 255, (8, 256, 128, 3)), jnp.float32))
            for _ in range(3)]
        x = jnp.asarray(rng.uniform(-2, 2, (args.k, bsz, 256, 128, 3)),
                        jnp.float32)
        g = model_conv_flops(_body_nominal(bundle),
                             jnp.zeros((bsz, 256, 128, 3)))

        def mid_filter(p):
            m = _re.search(r"SplAtBottleneck_(\d+)", p)
            return m is not None and int(m.group(1)) >= 3

        variants = [("body_b64_bf16", bundle.body_encoder,
                     bundle.body_params)]
        for nm, pf in (("body_b64_int8_full", None),
                       ("body_b64_int8_mid", mid_filter)):
            qmod, qparams = quantize_module(
                bundle.body_encoder, bundle.body_params, calib,
                path_filter=pf)
            variants.append((nm, qmod, qparams))
        for nm, mod, prm in variants:
            sec = time_scan(
                lambda p, c, f, _m=mod: (c, _m.apply(p, f)[:, :4]),
                prm, jnp.zeros(()), x, args.k)
            print(json.dumps({"stage": nm, "ms": round(sec * 1e3, 3),
                              "gflops": round(g / 1e9, 1),
                              "mfu": round(g / sec / V5E_PEAK_BF16, 4)}))

    if "int8scopedet" in stages:
        # Detector int8-mid at the batched-serving shape (b=8): skip
        # stem/dark2/heads (models/quantize.py::_mid_scope_detector).
        from botsort_tpu.models.quantize import (
            _mid_scope_detector,
            quantize_module,
        )

        bsz = 8
        calib = [jnp.asarray(
            rng.uniform(0, 255, (1, 480, 640, 3)), jnp.float32)
            for _ in range(3)]
        base = jnp.asarray(rng.uniform(0, 255, (bsz, 480, 640, 3)),
                           jnp.float32)
        deltas = jnp.linspace(0.0, 0.5, args.k)
        g = model_conv_flops(bundle.detector,
                             jnp.zeros((bsz, 480, 640, 3)))
        variants = [("det_b8_bf16", bundle.detector,
                     bundle.detector_params)]
        qmod, qparams = quantize_module(
            bundle.detector, bundle.detector_params, calib,
            path_filter=_mid_scope_detector)
        variants.append(("det_b8_int8_mid", qmod, qparams))
        for nm, mod, prm in variants:
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, _m.apply(p[0], p[1] + f)[1][:, ::531, 0]),
                (prm, base), jnp.zeros(()), deltas, args.k)
            print(json.dumps({"stage": nm, "ms": round(sec * 1e3, 3),
                              "gflops": round(g / 1e9, 1),
                              "mfu": round(g / sec / V5E_PEAK_BF16, 4)}))

    if "bodyseg" in stages:
        # ResNeSt-50 (body ReID) per-segment bisection at b=64 crops
        # 256x128 + split-attention micro-variants.
        import flax.linen as nn

        from botsort_tpu.models.fastreid import (
            ResNeSt50, SplAtBottleneck, _ConvBN)

        def seg_time(name, mod, in_shape, out_slice):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            # One base batch + a per-step scalar delta: k full-size
            # batches would be tens of GB at b=64; base+delta keeps the
            # input distinct per step (no cross-step CSE) at constant
            # memory.
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, out_slice(_m.apply(p[0], p[1] + f))),
                (params, base), jnp.zeros(()), deltas, args.k)
            g = model_conv_flops(mod, jnp.zeros(in_shape))
            print(json.dumps({
                "stage": name, "ms": round(sec * 1e3, 3),
                "gflops": round(g / 1e9, 1),
                "mfu": round(g / sec / V5E_PEAK_BF16, 4),
            }))

        b = args.b

        class Stem(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = _ConvBN(32, 3, 2)(x)
                x = _ConvBN(32, 3, 1)(x)
                x = _ConvBN(64, 3, 1)(x)
                return nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        class StageN(nn.Module):
            width: int
            blocks: int
            stride: int

            @nn.compact
            def __call__(self, x):
                for i in range(self.blocks):
                    x = SplAtBottleneck(
                        self.width,
                        stride=self.stride if i == 0 else 1,
                        downsample=(i == 0))(x)
                return x

        seg_time("body_stem", Stem(), (b, 256, 128, 3),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("body_stage1", StageN(64, 3, 1), (b, 64, 32, 64),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("body_stage2", StageN(128, 4, 2), (b, 64, 32, 256),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("body_stage3", StageN(256, 6, 2), (b, 32, 16, 512),
                 lambda y: y[:, ::5, ::3, 0])
        seg_time("body_stage4", StageN(512, 3, 1), (b, 16, 8, 1024),
                 lambda y: y[:, ::5, ::3, 0])

        # SplAt 3x3 micro-variants at the stage-3 shape (the FLOP bulk):
        # (a) as-built: grouped conv radix 2 -> split-attention
        # (b) grouped conv replaced by TWO plain convs (no groups)
        # (c) attention removed (plain 3x3, lower FLOPs — bounds the
        #     attention block's cost)
        class VariantA(nn.Module):
            @nn.compact
            def __call__(self, x):
                from botsort_tpu.models.fastreid import SplAtConv

                return SplAtConv(256)(x)

        class VariantB(nn.Module):
            @nn.compact
            def __call__(self, x):
                a = _ConvBN(256, 3, 1)(x)
                c = _ConvBN(256, 3, 1)(x)
                gap = jnp.mean(a + c, axis=(1, 2))
                z = nn.Dense(128)(gap)
                z = nn.BatchNorm(use_running_average=True,
                                 epsilon=1e-5)(z)
                z = nn.relu(z)
                att = nn.Dense(512)(z).reshape(-1, 2, 256)
                att = nn.softmax(att.astype(jnp.float32), axis=1).astype(
                    a.dtype)
                return (a * att[:, None, None, 0]
                        + c * att[:, None, None, 1])

        class VariantC(nn.Module):
            @nn.compact
            def __call__(self, x):
                return _ConvBN(256, 3, 1)(x)

        shape3 = (b, 16, 8, 256)
        seg_time("splat_a_grouped", VariantA(), shape3,
                 lambda y: y[:, ::5, ::3, 0])
        seg_time("splat_b_two_plain", VariantB(), shape3,
                 lambda y: y[:, ::5, ::3, 0])
        seg_time("splat_c_noattn", VariantC(), shape3,
                 lambda y: y[:, ::5, ::3, 0])

    if "detvar8" in stages:
        # Full-detector A/B at frame batch --db: production lowering
        # (splitsum dark2) vs chpad variants (CSP hidden chain padded
        # to 128 lanes; models/common.py::CSPLayer chpad). Full-model
        # in-context numbers — dark2's standalone win dissolved at b1
        # (docs/PERF.md), so only the composed delta counts.
        from botsort_tpu.models.yolox import YOLOX

        db = args.db
        base = jnp.asarray(rng.uniform(0, 255, (db, 480, 640, 3)),
                           jnp.float32)
        deltas = jnp.linspace(0.0, 0.01, args.k)
        variants = (
            ("prod_splitsum0", dict(splitsum_csp=(0,))),
            ("chpad0", dict(chpad_csp=(0,))),
            ("chpad01", dict(chpad_csp=(0, 1))),
        )
        for tag, kw in variants:
            mod = YOLOX(**kw)
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 480, 640, 3)))
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, _m.apply(p[0], p[1] + f)[0][:, ::531, 0]),
                (params, base), jnp.zeros(()), deltas, args.k)
            g = model_conv_flops(mod, jnp.zeros((db, 480, 640, 3)))
            print(json.dumps({
                "stage": f"detvar_{tag}_b{db}",
                "ms": round(sec * 1e3, 3),
                "mfu": round(g / sec / V5E_PEAK_BF16, 4),
            }), flush=True)

    if "decodevar8" in stages:
        # Decode + NMS seam attribution IN-CONTEXT at frame batch --db
        # (standalone decode measured free at b1 — decodevar — yet the
        # b8 segment delta head->head+decode is ~0.96 ms). Levels:
        #   raw:        detector up to raw head maps (decode=False)
        #   dec:        + decode_outputs as-is ([B, A, 4]/[B, A, C])
        #   dect:       + transposed decode ([B, 4, A]/[B, C, A] built
        #               from per-channel planes — anchors on lanes)
        #   dec_nms:    decode + per-stream NMS (the production seam)
        from botsort_tpu.models.yolox import STRIDES, YOLOX
        from botsort_tpu.ops import nms as nms_mod

        db = args.db
        base = jnp.asarray(rng.uniform(0, 255, (db, 480, 640, 3)),
                           jnp.float32)
        deltas = jnp.linspace(0.0, 0.01, args.k)
        raw_mod = YOLOX(decode=False)
        dec_mod = YOLOX()
        params = jax.jit(raw_mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 480, 640, 3)))

        def decode_t(outs, num_classes):
            # Same math as decode_outputs, assembled anchor-lane-major.
            cols_b, cols_s = [], []
            for out, stride in zip(outs, STRIDES):
                bb, h, w, _ = out.shape
                out = out.astype(jnp.float32)
                gy = jnp.arange(h, dtype=jnp.float32)[:, None]
                gx = jnp.arange(w, dtype=jnp.float32)[None, :]
                cx = ((out[..., 0] + gx) * stride).reshape(bb, h * w)
                cy = ((out[..., 1] + gy) * stride).reshape(bb, h * w)
                bw = (jnp.exp(jnp.minimum(out[..., 2], 20.0))
                      * stride).reshape(bb, h * w)
                bh = (jnp.exp(jnp.minimum(out[..., 3], 20.0))
                      * stride).reshape(bb, h * w)
                obj = jax.nn.sigmoid(out[..., 4]).reshape(bb, h * w)
                cols_b.append(jnp.stack(
                    [cx - bw / 2, cy - bh / 2,
                     cx + bw / 2, cy + bh / 2], axis=1))   # [B, 4, hw]
                cols_s.append(jnp.stack(
                    [jax.nn.sigmoid(out[..., 5 + c]).reshape(bb, h * w)
                     * obj for c in range(num_classes)],
                    axis=1))                               # [B, C, hw]
            return (jnp.concatenate(cols_b, axis=2),
                    jnp.concatenate(cols_s, axis=2))

        def run(tag, fn):
            sec = time_scan(fn, (params, base), jnp.zeros(()), deltas,
                            args.k)
            print(json.dumps({"stage": f"decv_{tag}_b{db}",
                              "ms": round(sec * 1e3, 3)}), flush=True)

        run("raw", lambda p, c, f: (
            c, sum(o[:, ::7, ::11, 0].sum() for o in
                   raw_mod.apply(p[0], p[1] + f))))
        run("dec", lambda p, c, f: (
            c, dec_mod.apply(p[0], p[1] + f)[0][:, ::531, 0]))

        def step_dect(p, c, f):
            outs = raw_mod.apply(p[0], p[1] + f)
            bx, sc = decode_t(outs, 4)
            return c, bx[:, 0, ::531]

        run("dect", step_dect)

        def step_dec_nms(p, c, f):
            bx, sc = dec_mod.apply(p[0], p[1] + f)
            dets = jax.vmap(lambda b_, s_: nms_mod.multiclass_nms_dense(
                b_, s_, iou_threshold=0.4, score_threshold=0.25,
                max_per_class=50, pre_nms_top_k=512))(bx, sc)
            return c, dets.boxes[:, 0, :, 0]

        run("dec_nms", step_dec_nms)

    if "bstemseg" in stages:
        # Body-stem internal bisection + exact relowering candidates at
        # the LOADED geometry (--b crops). The stem measures 9.3% MFU
        # at b=50 (bodyseg) against a ~25% output-lane cap (32-channel
        # convs) — this stage finds where the extra gap lives and races
        # the candidates:
        #   conv1/conv2/conv3/pool: each layer alone
        #   asis:      the production stem
        #   s2dfold:   conv1 folded into a 2x2 conv over the
        #              space-to-depth-packed input (12ch) — kills the
        #              3-channel lane-padded input reads if those are
        #              the cost (exact: same 27 weights, 1.78x nominal)
        #   pack4:     4 crops packed on channels, conv2/conv3 as
        #              block-diagonal DENSE convs (dgfa on the batch
        #              axis): full 128 lanes at 4x nominal FLOPs
        import flax.linen as nn

        from botsort_tpu.models.fastreid import _ConvBN

        def seg_time(name, mod, in_shape, out_slice):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, out_slice(_m.apply(p[0], p[1] + f))),
                (params, base), jnp.zeros(()), deltas, args.k)
            g = model_conv_flops(mod, jnp.zeros(in_shape))
            print(json.dumps({
                "stage": name, "ms": round(sec * 1e3, 3),
                "gflops": round(g / 1e9, 1),
                "mfu": round(g / sec / V5E_PEAK_BF16, 4),
            }), flush=True)

        b = args.b

        class L1(nn.Module):
            @nn.compact
            def __call__(self, x):
                return _ConvBN(32, 3, 2)(x)

        class L2(nn.Module):
            feats: int = 32

            @nn.compact
            def __call__(self, x):
                return _ConvBN(self.feats, 3, 1)(x)

        class Pool(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        class StemAsIs(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = _ConvBN(32, 3, 2)(x)
                x = _ConvBN(32, 3, 1)(x)
                x = _ConvBN(64, 3, 1)(x)
                return nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        def s2d(x):
            return jnp.concatenate(
                [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                 x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)

        class StemS2DFold(nn.Module):
            """conv1 (3x3/s2/pad1 on 3ch) == 2x2/pad(1,0) conv on the
            2x2-space-to-depth input (12ch): output pixel (i,j) reads
            original rows 2i-1..2i+1 = packed blocks {i-1, i}."""

            @nn.compact
            def __call__(self, x):
                x = s2d(x)                     # [B, 128, 64, 12]
                x = nn.Conv(32, (2, 2), strides=(1, 1),
                            padding=((1, 0), (1, 0)), use_bias=False,
                            dtype=jnp.bfloat16)(x)
                x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                 dtype=jnp.bfloat16)(x)
                x = nn.relu(x)
                x = _ConvBN(32, 3, 1)(x)
                x = _ConvBN(64, 3, 1)(x)
                return nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        class StemPack4(nn.Module):
            """4 crops channel-packed; conv2/conv3 dense block-diag
            (128->128 / 128->256 with 3/4 of the weights zero)."""

            @nn.compact
            def __call__(self, x):             # [B/4, 256, 128, 12]
                x = _ConvBN(4 * 32, 3, 2, groups=4,
                            dense_groups=True)(x)
                x = _ConvBN(4 * 32, 3, 1, groups=4,
                            dense_groups=True)(x)
                x = _ConvBN(4 * 64, 3, 1, groups=4,
                            dense_groups=True)(x)
                return nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        seg_time("bstem_conv1", L1(), (b, 256, 128, 3),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("bstem_conv2", L2(32), (b, 128, 64, 32),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("bstem_conv3", L2(64), (b, 128, 64, 32),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("bstem_pool", Pool(), (b, 128, 64, 64),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("bstem_asis", StemAsIs(), (b, 256, 128, 3),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("bstem_s2dfold", StemS2DFold(), (b, 256, 128, 3),
                 lambda y: y[:, ::7, ::5, 0])
        bp = -(-b // 4)
        seg_time("bstem_pack4", StemPack4(), (bp, 256, 128, 12),
                 lambda y: y[:, ::7, ::5, 0])

    if "bstem2" in stages:
        # Round-5 stem race (VERDICT r4 next #1a). The r4 pack4 probe
        # timed a PRE-packed input, so the pack/unpack relayouts the
        # adoption would pay in-context were never measured, and int8
        # was never composed with the dense pack (the scoped-int8 study
        # excluded the stem because requant churn on small LANE-PADDED
        # layers lost; dense packing changes the economics: full lanes
        # AND the 2x s8 MXU rate). Variants, at --b crops x --ch/--cw:
        #   asis:            production stem (baseline re-measure)
        #   pack4_full:      transpose-pack -> dense block-diag stem ->
        #                    pool -> transpose-unpack (TRUE in-context
        #                    cost if adopted behind the existing crop)
        #   packafter1:      conv1 plain (3ch input is lane-poor either
        #                    way) -> pack at HALF resolution (4x smaller
        #                    relayout) -> dense conv2/conv3 -> pool ->
        #                    unpack
        #   pack4_int8:      dense block-diag convs s8xs8->s32, per-
        #                    channel requant between layers, packed
        #                    input (sizing the int8 gain alone)
        #   pack4_int8_full: int8 stem + quantize/pack/unpack from the
        #                    bf16 normalized input (adoption form)
        import flax.linen as nn

        from botsort_tpu.models.fastreid import _ConvBN

        ch, cw = args.ch, args.cw
        b = args.b
        bp = -(-b // 4)

        def seg_time(name, mod, in_shape, out_slice, gflops=None):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, out_slice(_m.apply(p[0], p[1] + f))),
                (params, base), jnp.zeros(()), deltas, args.k)
            g = (gflops * 1e9 if gflops is not None
                 else model_conv_flops(mod, jnp.zeros(in_shape)))
            print(json.dumps({
                "stage": name, "ms": round(sec * 1e3, 3),
                "gflops": round(g / 1e9, 1),
                "mfu": round(g / sec / V5E_PEAK_BF16, 4),
            }), flush=True)

        def pack4(x):
            """[B,H,W,C] -> [ceil(B/4),H,W,4C] (pad + batch->channel)."""
            bb, h, w, c = x.shape
            gp = -(-bb // 4)
            x = jnp.pad(x, ((0, gp * 4 - bb), (0, 0), (0, 0), (0, 0)))
            x = x.reshape(gp, 4, h, w, c).transpose(0, 2, 3, 1, 4)
            return x.reshape(gp, h, w, 4 * c)

        def unpack4(y, bb):
            g, h, w, c4 = y.shape
            y = y.reshape(g, h, w, 4, c4 // 4).transpose(0, 3, 1, 2, 4)
            return y.reshape(g * 4, h, w, c4 // 4)[:bb]

        class StemAsIs(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = _ConvBN(32, 3, 2)(x)
                x = _ConvBN(32, 3, 1)(x)
                x = _ConvBN(64, 3, 1)(x)
                return nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        class StemPack4Full(nn.Module):
            """pack -> dense block-diag stem -> pool -> unpack."""

            @nn.compact
            def __call__(self, x):
                bb = x.shape[0]
                x = pack4(x)
                x = _ConvBN(4 * 32, 3, 2, groups=4, dense_groups=True)(x)
                x = _ConvBN(4 * 32, 3, 1, groups=4, dense_groups=True)(x)
                x = _ConvBN(4 * 64, 3, 1, groups=4, dense_groups=True)(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
                return unpack4(x, bb)

        class StemPackAfter1(nn.Module):
            """conv1 plain, pack at half resolution, dense conv2/3."""

            @nn.compact
            def __call__(self, x):
                bb = x.shape[0]
                x = _ConvBN(32, 3, 2)(x)
                x = pack4(x)
                x = _ConvBN(4 * 32, 3, 1, groups=4, dense_groups=True)(x)
                x = _ConvBN(4 * 64, 3, 1, groups=4, dense_groups=True)(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
                return unpack4(x, bb)

        class _Int8ConvBN(nn.Module):
            """s8 x s8 -> s32 conv + folded-BN requant (+ReLU) emitting
            s8 for the next layer (emit_s8) or bf16 (tail)."""

            features: int
            stride: int = 1
            emit_s8: bool = True

            @nn.compact
            def __call__(self, x8):
                cin = x8.shape[-1]
                k8 = self.param(
                    "k8", lambda k: jax.random.randint(
                        k, (3, 3, cin, self.features), -127, 128,
                        jnp.int8))
                sc = self.param(
                    "sc", lambda k: jnp.full((self.features,), 3e-3,
                                             jnp.float32))
                y = jax.lax.conv_general_dilated(
                    x8, k8, window_strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                y = nn.relu(y.astype(jnp.float32) * sc)
                if self.emit_s8:
                    return jnp.clip(jnp.round(y * 8.0),
                                    -127, 127).astype(jnp.int8)
                return y.astype(jnp.bfloat16)

        class StemPack4Int8(nn.Module):
            """Packed s8 input -> 3 int8 dense convs -> bf16 pool."""

            @nn.compact
            def __call__(self, x):
                x8 = jnp.clip(jnp.round(x * 32.0), -127, 127).astype(
                    jnp.int8)
                y = _Int8ConvBN(128, 2)(x8)
                y = _Int8ConvBN(128, 1)(y)
                y = _Int8ConvBN(256, 1, emit_s8=False)(y)
                return nn.max_pool(y, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        class StemPack4Int8Full(nn.Module):
            """bf16 normalized input -> quantize+pack -> int8 stem ->
            pool -> unpack (the full adoption form)."""

            @nn.compact
            def __call__(self, x):
                bb = x.shape[0]
                x8 = jnp.clip(jnp.round(x * 32.0), -127, 127).astype(
                    jnp.int8)
                x8 = pack4(x8)
                y = _Int8ConvBN(128, 2)(x8)
                y = _Int8ConvBN(128, 1)(y)
                y = _Int8ConvBN(256, 1, emit_s8=False)(y)
                y = nn.max_pool(y, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))
                return unpack4(y, bb)

        # Nominal stem FLOPs (what the work is worth, not what the
        # dense lowering traces).
        def stem_gflops(bb):
            hw2 = (ch // 2) * (cw // 2)
            return 2.0 * bb * hw2 * 9 * (3 * 32 + 32 * 32 + 32 * 64) / 1e9

        sl = lambda y: y[:, ::7, ::5, 0]
        seg_time("bstem2_asis", StemAsIs(), (b, ch, cw, 3), sl,
                 gflops=stem_gflops(b))
        seg_time("bstem2_pack4_full", StemPack4Full(), (b, ch, cw, 3),
                 sl, gflops=stem_gflops(b))
        seg_time("bstem2_packafter1", StemPackAfter1(), (b, ch, cw, 3),
                 sl, gflops=stem_gflops(b))
        seg_time("bstem2_pack4_int8", StemPack4Int8(),
                 (bp, ch, cw, 12), sl, gflops=stem_gflops(bp * 4))
        seg_time("bstem2_pack4_int8_full", StemPack4Int8Full(),
                 (b, ch, cw, 3), sl, gflops=stem_gflops(b))

    if "splatvar" in stages:
        # Exact-math SplAt lowering variants at the LOW-MFU stage
        # geometries (stage1 11.5% MFU, stage2 34% — tools bodyseg).
        # dg: grouped conv as block-diagonal plain conv (bit-exact);
        # fa: rank-4 lane-sliced attention (no rank-5 reshapes).
        import flax.linen as nn

        from botsort_tpu.models.fastreid import SplAtBottleneck

        class StageV(nn.Module):
            width: int
            blocks: int
            stride: int
            dg: bool = False
            fa: bool = False

            @nn.compact
            def __call__(self, x):
                for i in range(self.blocks):
                    x = SplAtBottleneck(
                        self.width,
                        stride=self.stride if i == 0 else 1,
                        downsample=(i == 0),
                        dense_groups=self.dg,
                        flat_attention=self.fa)(x)
                return x

        def seg_time(name, mod, in_shape, out_slice, flops_mod=None):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, out_slice(_m.apply(p[0], p[1] + f))),
                (params, base), jnp.zeros(()), deltas, args.k)
            # flops_mod: count at the nominal lowering — dense_groups
            # variants trace 2x FLOPs of padding lanes (r5 FLOP audit).
            g = model_conv_flops(flops_mod or mod, jnp.zeros(in_shape))
            print(json.dumps({
                "stage": name, "ms": round(sec * 1e3, 3),
                "gflops": round(g / 1e9, 1),
                "mfu": round(g / sec / V5E_PEAK_BF16, 4)}), flush=True)

        b = 64
        for dg, fa, tag in ((False, False, "asis"), (True, False, "dg"),
                            (False, True, "fa"), (True, True, "dgfa")):
            seg_time(f"s1_{tag}", StageV(64, 3, 1, dg, fa),
                     (b, 64, 32, 64), lambda y: y[:, ::7, ::5, 0],
                     flops_mod=StageV(64, 3, 1, False, False))
        for dg, fa, tag in ((False, False, "asis"), (True, True, "dgfa")):
            seg_time(f"s2_{tag}", StageV(128, 4, 2, dg, fa),
                     (b, 64, 32, 256), lambda y: y[:, ::7, ::5, 0],
                     flops_mod=StageV(128, 4, 2, False, False))

        # Full encoder, production geometry, with/without dgfa on the
        # two low-MFU stages. bundle.body_params apply unchanged (the
        # variants are apply-time lowerings of the same param tree).
        from botsort_tpu.models.fastreid import FastReIDSBS

        for tag, kw in (("plain", {}), ("dgfa01", {"dgfa_stages": (0, 1)})):
            model = FastReIDSBS(**kw)
            for nb in (16, 50, 64):
                base = jnp.asarray(
                    rng.uniform(0, 1, (nb, 256, 128, 3)), jnp.float32)
                deltas = jnp.linspace(0.0, 0.01, args.k)
                sec = time_scan(
                    lambda p, c, d, _m=model: (
                        c, _m.apply(p[0], p[1] + d)[:, :4]),
                    (bundle.body_params, base), jnp.zeros(()), deltas,
                    args.k)
                g = model_conv_flops(_body_nominal(bundle),
                                     jnp.zeros((nb, 256, 128, 3)))
                print(json.dumps({
                    "stage": f"bodyfull_{tag}_b{nb}",
                    "ms": round(sec * 1e3, 3),
                    "mfu": round(g / sec / V5E_PEAK_BF16, 4),
                    "fps": round(1 / sec, 1)}), flush=True)

    if "bodyfused" in stages:
        # Fused stem+stage1 Pallas kernel (models/fastreid_pallas.py)
        # vs the plain XLA path, full encoder at production geometry.
        # Param trees are identical in both modes, so the bundle's
        # params apply unchanged.
        from botsort_tpu.models.fastreid import FastReIDSBS

        for fused in (True, False):
            model = FastReIDSBS(fused_stem=fused)
            for nb in (16, 64):
                # base + per-step scalar delta: avoids shipping
                # k*nb*256*128*3 f32 through the tunnel (1.6 GB at
                # k=16/nb=64 — times out the probe).
                base = jnp.asarray(
                    rng.uniform(0, 1, (nb, 256, 128, 3)), jnp.float32)
                deltas = jnp.linspace(0.0, 0.01, args.k)
                sec = time_scan(
                    lambda p, c, d, _m=model: (
                        c, _m.apply(p[0], p[1] + d)[:, :4]),
                    (bundle.body_params, base), jnp.zeros(()), deltas,
                    args.k)
                g = model_conv_flops(_body_nominal(bundle),
                                     jnp.zeros((nb, 256, 128, 3)))
                print(json.dumps({
                    "stage": f"body_{'fused' if fused else 'plain'}_b{nb}",
                    "ms": round(sec * 1e3, 3),
                    "mfu": round(g / sec / V5E_PEAK_BF16, 4),
                    "fps": round(1 / sec, 1)}), flush=True)

    if "bodycum" in stages:
        # CUMULATIVE truncations of the body encoder at b=64. The
        # standalone per-stage segments (bodyseg) sum to ~8.7 ms while
        # the full encoder measures ~6.9 ms — each standalone probe
        # carries harness overhead. Deltas between successive
        # truncations cancel it and give honest in-context attribution.
        from botsort_tpu.models.fastreid import ResNeSt50

        def cum_time(name, mod, in_shape, out_slice):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, out_slice(_m.apply(p[0], p[1] + f))),
                (params, base), jnp.zeros(()), deltas, args.k)
            print(json.dumps({
                "stage": name, "ms": round(sec * 1e3, 3)}))
            return sec

        b = args.b
        shape = (b, 256, 128, 3)
        blocks = (3, 4, 6, 3)
        widths = (64, 128, 256, 512)

        # Harness floor: an identity-ish program on the same input —
        # the fixed cost every standalone probe at this shape carries
        # (bstemseg measured single stem LAYERS at >1 ms while the
        # composed stem runs 1.28; the deltas below cancel this).
        import flax.linen as nn2

        class Ident(nn2.Module):
            @nn2.compact
            def __call__(self, x):
                return x * jnp.float32(1.0001)

        cum_time("cum_harness_floor", Ident(), shape,
                 lambda y: y[:, ::7, ::5, 0])

        # Production lowering: dgfa on stages 0-1 (build_bundle's TPU
        # default) so deltas attribute what the pipeline actually runs.
        prev = cum_time("cum_stem", ResNeSt50(stage_blocks=(),
                                              stage_widths=()),
                        shape, lambda y: y[:, ::7, ::5, 0])
        for n in range(1, 5):
            sec = cum_time(
                f"cum_stem_to_stage{n}",
                ResNeSt50(stage_blocks=blocks[:n],
                          stage_widths=widths[:n],
                          dgfa_stages=(0, 1)),
                shape, lambda y: y[:, ::7, ::5, 0])
            print(json.dumps({"stage": f"delta_stage{n}",
                              "ms": round((sec - prev) * 1e3, 3)}))
            prev = sec

    if "stage1var" in stages:
        # Body stage-1 + stem rewrite candidates (the two worst body
        # segments: ~11% MFU — small-channel convs at large spatial).
        # All candidates are WEIGHT-EXACT remappings: ungrouping = block
        # -diagonal zero-padded weights; im2col = the same weights
        # reshaped to a [kh*kw*cin, cout] matmul operand.
        import flax.linen as nn

        from botsort_tpu.models.fastreid import (
            SplAtBottleneck, SplAtConv, _ConvBN)

        def seg_time(name, mod, in_shape, out_slice):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, out_slice(_m.apply(p[0], p[1] + f))),
                (params, base), jnp.zeros(()), deltas, args.k)
            g = model_conv_flops(mod, jnp.zeros(in_shape))
            print(json.dumps({
                "stage": name, "ms": round(sec * 1e3, 3),
                "gflops": round(g / 1e9, 1),
                "mfu": round(g / sec / V5E_PEAK_BF16, 4),
            }))

        b = 64

        class Im2colConvBN(nn.Module):
            """3x3 conv lowered explicitly to patches + one matmul."""
            features: int
            dtype: Any = jnp.bfloat16

            @nn.compact
            def __call__(self, x):
                cin = x.shape[-1]
                w = self.param(
                    "w", nn.initializers.lecun_normal(),
                    (9 * cin, self.features), jnp.float32)
                pat = jax.lax.conv_general_dilated_patches(
                    x.astype(self.dtype), (3, 3), (1, 1),
                    ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y = pat @ w.astype(self.dtype)
                y = nn.BatchNorm(use_running_average=True,
                                 epsilon=1e-5, dtype=self.dtype)(y)
                return nn.relu(y)

        class SplAtDense(nn.Module):
            """SplAtConv with the grouped 3x3 ungrouped (dense 64->128;
            zero-padded block-diagonal weights make it bit-equal)."""
            features: int
            im2col: bool = False
            dtype: Any = jnp.bfloat16

            @nn.compact
            def __call__(self, x):
                c, r = self.features, 2
                if self.im2col:
                    x = Im2colConvBN(c * r, dtype=self.dtype)(x)
                else:
                    x = _ConvBN(c * r, 3, 1, groups=1,
                                dtype=self.dtype)(x)
                bb, h, w, _ = x.shape
                splits = x.reshape(bb, h, w, r, c)
                gap = jnp.mean(jnp.sum(splits, axis=3), axis=(1, 2))
                inter = max(c * r // 4, 32)
                z = nn.Dense(inter, dtype=self.dtype)(gap)
                z = nn.BatchNorm(use_running_average=True,
                                 epsilon=1e-5, dtype=self.dtype)(z)
                z = nn.relu(z)
                atten = nn.Dense(c * r, dtype=self.dtype)(z).reshape(
                    bb, r, c)
                atten = nn.softmax(atten.astype(jnp.float32),
                                   axis=1).astype(self.dtype)
                return jnp.sum(splits * atten[:, None, None, :, :],
                               axis=3)

        shape1 = (b, 64, 32, 64)
        seg_time("splat1_grouped", SplAtConv(64), shape1,
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("splat1_dense", SplAtDense(64), shape1,
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("splat1_im2col", SplAtDense(64, im2col=True), shape1,
                 lambda y: y[:, ::7, ::5, 0])

        class Stage1(nn.Module):
            dense_splat: bool = False

            @nn.compact
            def __call__(self, x):
                for i in range(3):
                    if self.dense_splat:
                        out_ch = 256
                        y = _ConvBN(64, 1, 1)(x)
                        y = SplAtDense(64)(y)
                        y = _ConvBN(out_ch, 1, 1, act=False)(y)
                        s = _ConvBN(out_ch, 1, 1, act=False)(x) \
                            if i == 0 else x
                        x = nn.relu(y + s)
                    else:
                        x = SplAtBottleneck(64, stride=1,
                                            downsample=(i == 0))(x)
                return x

        seg_time("stage1_grouped", Stage1(), (b, 64, 32, 64),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("stage1_dense", Stage1(dense_splat=True),
                 (b, 64, 32, 64), lambda y: y[:, ::7, ::5, 0])

        class Stem(nn.Module):
            im2col: bool = False

            @nn.compact
            def __call__(self, x):
                if self.im2col:
                    x = _ConvBN(32, 3, 2)(x)   # 3ch input: keep conv
                    x = Im2colConvBN(32)(x)
                    x = Im2colConvBN(64)(x)
                else:
                    x = _ConvBN(32, 3, 2)(x)
                    x = _ConvBN(32, 3, 1)(x)
                    x = _ConvBN(64, 3, 1)(x)
                return nn.max_pool(x, (3, 3), strides=(2, 2),
                                   padding=((1, 1), (1, 1)))

        seg_time("stem_conv", Stem(), (b, 256, 128, 3),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("stem_im2col", Stem(im2col=True), (b, 256, 128, 3),
                 lambda y: y[:, ::7, ::5, 0])

    if "stage1pack" in stages:
        # Hypotheses for stage-1's ~10% MFU: (a) elementwise/HBM floor
        # at its activation shape; (b) batch-in-channels packing — 2 or
        # 4 images concatenated on the channel axis with block-diagonal
        # (grouped) weights fill all 128 lanes and are WEIGHT-EXACT.
        import flax.linen as nn

        from botsort_tpu.models.fastreid import SplAtBottleneck, _ConvBN

        def seg_time(name, mod, in_shape, out_slice, flops_mod=None):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, f, _m=mod: (
                    c, out_slice(_m.apply(p[0], p[1] + f))),
                (params, base), jnp.zeros(()), deltas, args.k)
            g = model_conv_flops(flops_mod or mod, jnp.zeros(in_shape))
            print(json.dumps({
                "stage": name, "ms": round(sec * 1e3, 3),
                "gflops": round(g / 1e9, 1),
                "mfu": round(g / sec / V5E_PEAK_BF16, 4),
            }))

        b = 64

        class EltFloor(nn.Module):
            """One bf16 read+write round trip at the stage-1 shape."""
            @nn.compact
            def __call__(self, x):
                x = x.astype(jnp.bfloat16)
                return nn.relu(x * jnp.bfloat16(1.01) + jnp.bfloat16(0.1))

        seg_time("elt_floor_64x64x32x128", EltFloor(), (b, 64, 32, 128),
                 lambda y: y[:, ::7, ::5, 0])

        class PackedSplAtBottleneck(nn.Module):
            """SplAtBottleneck(64) with PACK images stacked channel-wise.

            Every conv becomes feature_group_count=PACK x (its own
            groups) with block-diagonal weights; the attention GAP /
            softmax stay per-image by reshaping the pack axis out.
            Input [B/PACK, H, W, PACK*C]."""
            pack: int = 2
            dtype: Any = jnp.bfloat16

            @nn.compact
            def __call__(self, x):
                pk, c = self.pack, 64
                bb, h, w, _ = x.shape
                y = _ConvBN(pk * c, 1, 1, groups=pk, dtype=self.dtype)(x)
                # SplAt 3x3 radix-2: per image 64 -> 128 in 2 groups.
                y = _ConvBN(pk * c * 2, 3, 1, groups=pk * 2,
                            dtype=self.dtype)(y)
                splits = y.reshape(bb, h, w, pk, 2, c)
                gap = jnp.mean(jnp.sum(splits, axis=4), axis=(1, 2))
                # Per-image attention MLP (shared weights, vmapped over
                # pack via reshape to [B*pk, C]).
                gap2 = gap.reshape(bb * pk, c)
                zz = nn.Dense(32, dtype=self.dtype)(gap2)
                zz = nn.BatchNorm(use_running_average=True,
                                  epsilon=1e-5, dtype=self.dtype)(zz)
                zz = nn.relu(zz)
                att = nn.Dense(2 * c, dtype=self.dtype)(zz).reshape(
                    bb, pk, 2, c)
                att = nn.softmax(att.astype(jnp.float32), axis=2).astype(
                    self.dtype)
                y = jnp.sum(splits * att[:, None, None], axis=4).reshape(
                    bb, h, w, pk * c)
                y = _ConvBN(pk * 256, 1, 1, groups=pk, act=False,
                            dtype=self.dtype)(y)
                s = _ConvBN(pk * 256, 1, 1, groups=pk, act=False,
                            dtype=self.dtype)(x)
                return nn.relu(y + s)

        seg_time("bottleneck1_asbuilt",
                 SplAtBottleneck(64, stride=1, downsample=True),
                 (b, 64, 32, 64), lambda y: y[:, ::7, ::5, 0])
        seg_time("bottleneck1_pack2", PackedSplAtBottleneck(2),
                 (b // 2, 64, 32, 128), lambda y: y[:, ::7, ::5, 0])
        seg_time("bottleneck1_pack4", PackedSplAtBottleneck(4),
                 (b // 4, 64, 32, 256), lambda y: y[:, ::7, ::5, 0])

        # Isolate the 3x3 grouped conv under packing.
        class PackedConv(nn.Module):
            pack: int = 2
            @nn.compact
            def __call__(self, x):
                return _ConvBN(self.pack * 128, 3, 1,
                               groups=self.pack * 2)(x)

        seg_time("splat1_conv_pack2", PackedConv(2), (b // 2, 64, 32, 128),
                 lambda y: y[:, ::7, ::5, 0])
        seg_time("splat1_conv_pack4", PackedConv(4), (b // 4, 64, 32, 256),
                 lambda y: y[:, ::7, ::5, 0])

    if "dark2var" in stages:
        # dark2 is the detector's worst remaining segment (0.64 ms @
        # 13% MFU, detseg): ConvBN(160,3,s2) on (240,320,80) + CSP(160,
        # n=4) with hidden=80 at (120,160). Candidate relowerings, each
        # timed at the real geometry (exactness machinery comes later
        # for whichever wins — these probe variants carry their own
        # params):
        # - splitsum: CSP's concat([a,b]) @ W == a @ Wa + b @ Wb
        #   (concat-free: no 160-ch relayout between the branches).
        # - chpad: every hidden conv padded 80 -> 128 output channels
        #   (1.6x nominal FLOPs; tests whether XLA picks a better
        #   strategy at full-lane widths).
        # - s2dpack: the stride-2 3x3 downsample as s2d(2) + 2x2 conv
        #   over 320 channels (K 720 -> 1280, exact-expressible).
        import flax.linen as nn

        from botsort_tpu.models.common import Bottleneck, ConvBN

        class CSPAsIs(nn.Module):
            feats: int = 160
            n: int = 4

            @nn.compact
            def __call__(self, x):
                x = ConvBN(self.feats, 3, 2)(x)
                h = self.feats // 2
                a = ConvBN(h, 1, 1)(x)
                b = ConvBN(h, 1, 1)(x)
                for _ in range(self.n):
                    a = Bottleneck(h, True, 1.0)(a)
                y = jnp.concatenate([a, b], axis=-1)
                return ConvBN(self.feats, 1, 1)(y)

        class CSPSplitSum(nn.Module):
            feats: int = 160
            n: int = 4

            @nn.compact
            def __call__(self, x):
                x = ConvBN(self.feats, 3, 2)(x)
                h = self.feats // 2
                a = ConvBN(h, 1, 1)(x)
                b = ConvBN(h, 1, 1)(x)
                for _ in range(self.n):
                    a = Bottleneck(h, True, 1.0)(a)
                # concat([a, b]) @ W == a @ Wa + b @ Wb; keep BN+act on
                # the sum (same math as the fused ConvBN epilogue).
                ya = nn.Conv(self.feats, (1, 1), use_bias=False,
                             dtype=jnp.bfloat16)(a)
                yb = nn.Conv(self.feats, (1, 1), use_bias=False,
                             dtype=jnp.bfloat16)(b)
                y = nn.BatchNorm(use_running_average=True, momentum=0.97,
                                 epsilon=1e-3, dtype=jnp.bfloat16)(
                                     ya + yb)
                return nn.silu(y)

        class CSPChPad(nn.Module):
            feats: int = 160
            n: int = 4

            @nn.compact
            def __call__(self, x):
                x = ConvBN(self.feats, 3, 2)(x)
                h = 128  # hidden 80 -> full-lane 128
                a = ConvBN(h, 1, 1)(x)
                b = ConvBN(h, 1, 1)(x)
                for _ in range(self.n):
                    a = Bottleneck(h, True, 1.0)(a)
                y = jnp.concatenate([a, b], axis=-1)
                return ConvBN(self.feats, 1, 1)(y)

        class DownAsIs(nn.Module):
            @nn.compact
            def __call__(self, x):
                return ConvBN(160, 3, 2)(x)

        class DownS2D(nn.Module):
            @nn.compact
            def __call__(self, x):
                b, h, w, c = x.shape
                z = x.reshape(b, h // 2, 2, w // 2, 2, c)
                z = z.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, h // 2, w // 2, 4 * c)
                # 2x2 conv with pad (1,0): covers the stride-2 3x3's
                # taps u in {-1, 0} on the packed grid (5/9 of the
                # packed-kernel weights would be exact zeros in the
                # weight-remapped form).
                z = nn.Conv(160, (2, 2), padding=((1, 0), (1, 0)),
                            use_bias=False, dtype=jnp.bfloat16)(z)
                z = nn.BatchNorm(use_running_average=True, momentum=0.97,
                                 epsilon=1e-3, dtype=jnp.bfloat16)(z)
                return nn.silu(z)

        for name, mod in (("dark2_asis", CSPAsIs()),
                          ("dark2_splitsum", CSPSplitSum()),
                          ("dark2_chpad", CSPChPad()),
                          ("down_asis", DownAsIs()),
                          ("down_s2dpack", DownS2D())):
            in_shape = (1, 240, 320, 80)
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros(in_shape))
            base = jnp.asarray(rng.uniform(0, 1, in_shape), jnp.float32)
            deltas = jnp.linspace(0.0, 0.01, args.k)
            sec = time_scan(
                lambda p, c, d, _m=mod: (
                    c, _m.apply(p[0], p[1] + d)[:, ::37, ::41, 0]),
                (params, base), jnp.zeros(()), deltas, args.k)
            g = model_conv_flops(mod, jnp.zeros(in_shape))
            print(json.dumps({"stage": name, "ms": round(sec * 1e3, 3),
                              "gflops": round(g / 1e9, 1),
                              "mfu": round(g / sec / V5E_PEAK_BF16, 4)}),
                  flush=True)

    if "stemvar" in stages:
        # Focus-stem fold candidate: space-to-depth slicing + 3x3 conv
        # on 12 channels vs the mathematically equivalent single 6x6
        # stride-2 conv on 3 channels (same FLOPs; no slice/concat HBM
        # churn). YOLOv5 made the same swap for GPUs.
        import flax.linen as nn

        from botsort_tpu.models.common import Focus

        class Conv6Stem(nn.Module):
            features: int = 80

            @nn.compact
            def __call__(self, x):
                x = nn.Conv(self.features, (6, 6), strides=(2, 2),
                            padding=((2, 2), (2, 2)), use_bias=False,
                            dtype=jnp.bfloat16)(x)
                x = nn.BatchNorm(use_running_average=True,
                                 momentum=0.97, epsilon=1e-3,
                                 dtype=jnp.bfloat16)(x)
                return nn.silu(x)

        for name, mod in (("stem_focus_slice", Focus(80, 3)),
                          ("stem_conv6x6s2", Conv6Stem(80))):
            params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                       jnp.zeros((1, 480, 640, 3)))
            x = jnp.asarray(rng.uniform(0, 255, (args.k, 480, 640, 3)),
                            jnp.float32)
            sec = time_scan(
                lambda p, c, f: (c, mod.apply(p, f[None])[0, ::37, ::41, 0]),
                params, jnp.zeros(()), x, args.k)
            g = model_conv_flops(mod, jnp.zeros((1, 480, 640, 3)))
            print(json.dumps({"stage": name, "ms": round(sec * 1e3, 3),
                              "gflops": round(g / 1e9, 1),
                              "mfu": round(g / sec / V5E_PEAK_BF16, 4)}))

    if "cropvar" in stages:
        # Crop-and-resize lowering A/B at production geometries: the
        # one-hot-matmul form contracts every output column against the
        # full 1920-wide frame (~1.6 GFLOP/crop at 256x128), the gather
        # form reads the 4 tap pixels per output pixel (O(pixels) HBM,
        # no MXU). Boxes vary per step (xs); frames ride in params.
        from botsort_tpu.ops import crop as crop_mod

        def rand_boxes(k, n):
            x1 = rng.uniform(0, 1600, (k, n))
            y1 = rng.uniform(0, 700, (k, n))
            w = rng.uniform(40, 320, (k, n))
            h = rng.uniform(80, 380, (k, n))
            return jnp.asarray(np.floor(np.stack(
                [x1, y1, x1 + w, y1 + h], axis=-1)), jnp.float32)

        frame = jnp.asarray(rng.integers(0, 255, (1080, 1920, 3)),
                            jnp.uint8)
        frames8 = jnp.asarray(rng.integers(0, 255, (8, 1080, 1920, 3)),
                              jnp.uint8)
        def crop_int8(image, boxes_tlbr, out_hw, compute_dtype=None):
            # x-phase as an s8 x s8 -> s32 matmul (v5e int8 MXU = 2x
            # bf16): pixels shift to p-128; the 2-tap weights (1-wx)/wx
            # quantize to q/127 with (127-q)+q = 127 exactly, so
            # dequant is (acc + 128*127)/127 — weight-rounding error
            # <= 1/254 (~1 intensity level), no other approximation.
            img_h, img_w = image.shape[0], image.shape[1]
            out_h, out_w = out_hw
            y0, x0, y1i, x1i, wy, wx, good = crop_mod._sample_grid(
                image, boxes_tlbr, out_hw)
            imgq = (image.astype(jnp.int16) - 128).astype(jnp.int8)
            qx = jnp.round(wx * 127.0).astype(jnp.int8)
            col_ids = jnp.arange(img_w, dtype=jnp.int32)
            wx_q = (
                (col_ids[None, None, :] == x0[:, :, None])
                * (127 - qx[:, :, None])
                + (col_ids[None, None, :] == x1i[:, :, None])
                * qx[:, :, None]
            ).astype(jnp.int8)
            acc = jnp.einsum("nxw,hwc->nhxc", wx_q, imgq,
                             preferred_element_type=jnp.int32)
            tmp = ((acc.astype(jnp.float32) + 128.0 * 127.0) / 127.0
                   ).astype(jnp.bfloat16)
            row_ids = jnp.arange(img_h, dtype=jnp.int32)
            wy_mat = (
                (row_ids[None, None, :] == y0[:, :, None])
                * (1.0 - wy[:, :, None])
                + (row_ids[None, None, :] == y1i[:, :, None])
                * wy[:, :, None]
            ).astype(jnp.bfloat16)
            out = jnp.einsum("nrh,nhxc->nrxc", wy_mat, tmp,
                             preferred_element_type=jnp.float32)
            return jnp.where(good[:, None, None, None], out, 0.0)

        variants = (
            ("einsum_bf16", crop_mod.crop_and_resize, jnp.bfloat16),
            ("einsum_int8", crop_int8, jnp.bfloat16),
            ("gather_bf16", crop_mod.crop_and_resize_gather, jnp.bfloat16),
            ("gather_f32", crop_mod.crop_and_resize_gather, jnp.float32),
        )
        # (tag, n_crops, out_hw, batched-over-8-frames)
        geos = (("body50", 50, (256, 128), False),
                ("face16", 16, (128, 128), False),
                ("body8x16", 16, (256, 128), True),
                ("face8x16", 16, (128, 128), True))
        for gtag, n, out_hw, batched in geos:
            # >= ~150 ms of device work per measurement: at ~25 ms the
            # tunnel-floor subtraction dominates the number (crop
            # probes vary 30-50% across sessions at k=32).
            est_gf = (n * (8 if batched else 1)
                      * 2e-9 * 1080 * out_hw[1] * 1920 * 3)
            kk = max(args.k, int(150e-3 / (est_gf / 197e3 / 0.3)))
            kk = min(kk, 512)
            bx = rand_boxes(kk, n * 8 if batched else n)
            if batched:
                bx = bx.reshape(kk, 8, n, 4)
            for vtag, fn, cdt in variants:
                if batched:
                    def step(fr, c, b, _fn=fn, _cdt=cdt, _hw=out_hw):
                        crops = jax.vmap(
                            lambda f, bb: _fn(f, bb, _hw,
                                              compute_dtype=_cdt)
                        )(fr, b)
                        return c, crops[:, :, ::37, ::19, 0]
                    sec = time_scan(step, frames8, jnp.zeros(()), bx, kk)
                else:
                    def step(fr, c, b, _fn=fn, _cdt=cdt, _hw=out_hw):
                        crops = _fn(fr, b, _hw, compute_dtype=_cdt)
                        return c, crops[:, ::37, ::19, 0]
                    sec = time_scan(step, frame, jnp.zeros(()), bx, kk)
                print(json.dumps({"stage": f"crop_{gtag}_{vtag}",
                                  "k": kk,
                                  "ms": round(sec * 1e3, 3)}), flush=True)

    if "resize" in stages:
        # The per-frame 1080p -> detector-input preprocessing.
        frames = jnp.asarray(
            rng.integers(0, 255, (args.k, 1080, 1920, 3)), jnp.uint8)

        def prep(p, c, f):
            r = jax.image.resize(f.astype(jnp.float32), (480, 640, 3),
                                 method="linear")
            return c, r[::97, ::89, 0]

        sec = time_scan(prep, jnp.zeros(()), jnp.zeros(()), frames, args.k)
        print(json.dumps({"stage": "resize_1080p_to_480x640",
                          "ms": round(sec * 1e3, 3),
                          "fps": round(1 / sec, 1)}))

    if "decodevar" in stages:
        # Exact-math variants of the YOLOX decode (models/yolox.py::
        # decode_outputs — ~0.3 ms of f32 elementwise per detseg). The
        # as-is form slices ~20 lane-9 channels; both variants reduce
        # op/relayout count without changing values:
        # - lanes: transpose each level to (B, 9, HW) so every
        #   elementwise op runs with the anchor dim in lanes.
        # - fused: one masked nonlinearity over the full [..., 9]
        #   tensor (XLA fuses the selects), tlbr via a constant 4x4
        #   matmul, scores as one multiply.
        import flax.linen as fnn

        from botsort_tpu.models.yolox import STRIDES, decode_outputs

        C = 4
        shapes = [(1, 60, 80, 5 + C), (1, 30, 40, 5 + C),
                  (1, 15, 20, 5 + C)]

        def asis(levels):
            return decode_outputs(levels, C)

        def lanes(levels):
            boxes, scores = [], []
            for out, stride in zip(levels, STRIDES):
                b, h, w, ch = out.shape
                t = jnp.swapaxes(
                    out.astype(jnp.float32).reshape(b, h * w, ch), 1, 2)
                gy = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
                gx = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
                cx = (t[:, 0] + gx) * stride
                cy = (t[:, 1] + gy) * stride
                bw = jnp.exp(jnp.minimum(t[:, 2], 20.0)) * stride
                bh = jnp.exp(jnp.minimum(t[:, 3], 20.0)) * stride
                tlbr = jnp.stack([cx - bw / 2, cy - bh / 2,
                                  cx + bw / 2, cy + bh / 2], axis=1)
                obj = fnn.sigmoid(t[:, 4:5])
                cls = fnn.sigmoid(t[:, 5:])
                boxes.append(tlbr)
                scores.append(obj * cls)
            bx = jnp.concatenate(boxes, axis=2)
            sc = jnp.concatenate(scores, axis=2)
            return jnp.swapaxes(bx, 1, 2), jnp.swapaxes(sc, 1, 2)

        def fused(levels):
            boxes, scores = [], []
            tlbr_m = jnp.array([[1, 0, 1, 0], [0, 1, 0, 1],
                                [-0.5, 0, 0.5, 0], [0, -0.5, 0, 0.5]],
                               jnp.float32)
            for out, stride in zip(levels, STRIDES):
                b, h, w, ch = out.shape
                f = out.astype(jnp.float32)
                idx = jnp.arange(ch)
                gy = jnp.arange(h, dtype=jnp.float32)[:, None, None]
                gx = jnp.arange(w, dtype=jnp.float32)[None, :, None]
                grid = jnp.where(idx == 0, gx,
                                 jnp.where(idx == 1, gy, 0.0))
                v = jnp.where(
                    idx < 2, (f + grid) * stride,
                    jnp.where(idx < 4,
                              jnp.exp(jnp.minimum(f, 20.0)) * stride,
                              fnn.sigmoid(f)))
                v = v.reshape(b, h * w, ch)
                boxes.append(v[..., :4] @ tlbr_m)
                scores.append(v[..., 4:5] * v[..., 5:])
            return (jnp.concatenate(boxes, axis=1),
                    jnp.concatenate(scores, axis=1))

        base = [jnp.asarray(rng.normal(size=s), jnp.float32)
                for s in shapes]
        deltas = jnp.linspace(0.0, 0.01, args.k)
        for name, fn in (("asis", asis), ("lanes", lanes),
                         ("fused", fused)):
            sec = time_scan(
                lambda p, c, d, _f=fn: (
                    c, _f([lv + d for lv in p])[0][0, ::711, 0]),
                base, jnp.zeros(()), deltas, args.k)
            print(json.dumps({"stage": f"decode_{name}",
                              "ms": round(sec * 1e3, 3)}), flush=True)

    if "nms" in stages:
        from botsort_tpu.ops import nms as nms_mod

        nms_cfg = NMSConfig()
        boxes = jnp.asarray(rng.uniform(0, 640, (args.k, 6300, 4)),
                            jnp.float32)
        scores = jnp.asarray(rng.uniform(0, 1, (args.k, 6300, 4)) ** 4,
                             jnp.float32)

        def run_nms(p, c, xs):
            bx, sc = xs
            dets = nms_mod.multiclass_nms_dense(
                bx, sc, iou_threshold=nms_cfg.iou_threshold,
                score_threshold=nms_cfg.score_threshold,
                max_per_class=nms_cfg.max_boxes_per_class,
                pre_nms_top_k=nms_cfg.pre_nms_top_k)
            return c, dets.valid

        sec = time_scan(run_nms, jnp.zeros(()), jnp.zeros(()),
                        (boxes, scores), args.k)
        print(json.dumps({"stage": "nms_6300x4",
                          "ms": round(sec * 1e3, 3),
                          "fps": round(1 / sec, 1)}))

    if "cascade" in stages:
        from botsort_tpu.track.cascade import tracker_update
        from botsort_tpu.track.state import empty_store

        tracker_cfg = TrackerConfig(
            det_score_threshold=0.2, track_high_thresh=0.15,
            track_low_thresh=0.05, new_track_thresh=0.2)
        d = 50
        tlbr = jnp.asarray(
            rng.uniform(0, 600, (args.k, d, 4)).astype(np.float32))
        tlbr = tlbr.at[..., 2:].add(tlbr[..., :2])
        scores = jnp.asarray(rng.uniform(0.2, 1, (args.k, d)), jnp.float32)
        valid = jnp.ones((args.k, d), bool)
        bf = jnp.asarray(rng.normal(size=(args.k, d, 2048)), jnp.float32)
        ff = jnp.asarray(rng.normal(size=(args.k, d, 256)), jnp.float32)

        def step(p, s, xs):
            t, sc, v, b_, f_ = xs
            s2, tr = tracker_update(s, t, sc, v, b_, f_, tracker_cfg)
            return s2, tr.valid

        sec = time_scan(step, jnp.zeros(()), empty_store(tracker_cfg),
                        (tlbr, scores, valid, bf, ff), args.k)
        print(json.dumps({"stage": "cascade_50dets",
                          "ms": round(sec * 1e3, 3),
                          "fps": round(1 / sec, 1)}))

    if "loadedtail" in stages:
        # Split the loaded config's ~1.4 ms cascade+assembly tail
        # (loadedbisect: full - face level): how much is the Pallas
        # cascade SOLVER (sequential Dijkstra pops; no cross-stream
        # lockstep exists at B=1) vs the cost-matrix build vs the
        # vectorized KF/EMA/lifecycle/dedup around it. Feasible
        # anchored scene (pass-1 has real matches; the store warms up
        # over the scan) at the loaded geometry N=64 slots x D=50 dets.
        from botsort_tpu.ops.assignment import solve_cascade_masked
        from botsort_tpu.ops.boxes import iou_distance
        from botsort_tpu.track.cascade import tracker_update
        from botsort_tpu.track.state import empty_store

        cfg = TrackerConfig(
            det_score_threshold=0.2, track_high_thresh=0.15,
            track_low_thresh=0.05, new_track_thresh=0.2)
        d, n, kk = cfg.max_dets, cfg.max_tracks, args.k
        anchors = rng.uniform(50, 900, (d, 2)).astype(np.float32)
        jit_xy = rng.normal(0, 6, (kk, d, 2)).astype(np.float32)
        wh = rng.uniform(40, 120, (d, 2)).astype(np.float32)
        tl = anchors[None] + jit_xy
        tlbr = jnp.asarray(np.concatenate([tl, tl + wh[None]], -1))
        scores = jnp.asarray(rng.uniform(0.2, 1, (kk, d)), jnp.float32)
        valid = jnp.ones((kk, d), bool)
        bf = rng.normal(size=(d, 2048)).astype(np.float32)
        bf /= np.linalg.norm(bf, axis=-1, keepdims=True)
        bfk = jnp.asarray(np.broadcast_to(bf, (kk, d, 2048)).copy())
        ff = rng.normal(size=(d, 256)).astype(np.float32)
        ff /= np.linalg.norm(ff, axis=-1, keepdims=True)
        ffk = jnp.asarray(np.broadcast_to(ff, (kk, d, 256)).copy())

        def step_full(p, s, xs):
            t, sc, v, b_, f_ = xs
            s2, tr = tracker_update(s, t, sc, v, b_, f_, cfg)
            return s2, tr.valid

        sec = time_scan(step_full, jnp.zeros(()), empty_store(cfg),
                        (tlbr, scores, valid, bfk, ffk), kk)
        print(json.dumps({"stage": f"ltail_full_N{n}_D{d}",
                          "ms": round(sec * 1e3, 3)}), flush=True)

        # Solver + costs: fixed realistic masks, d live tracked rows.
        pool_m = jnp.zeros((n,), bool).at[:d].set(True)
        tracked_m = pool_m
        unconf_m = jnp.zeros((n,), bool)
        track_pad = jnp.zeros((n, 4), jnp.float32).at[:d].set(
            jnp.asarray(np.concatenate([anchors, anchors + wh], -1)))
        bf_track = jnp.zeros((n, 2048), jnp.float32
                             ).at[:d].set(jnp.asarray(bf))
        ff_track = jnp.zeros((n, 256), jnp.float32
                             ).at[:d].set(jnp.asarray(ff))

        def costs(t_, sc_, b2, f2):
            iou_d = iou_distance(track_pad, t_)
            body_sim = bf_track @ b2.T
            face_sim = ff_track @ f2.T
            face_sim = jnp.where(face_sim > 0.99999, 0.0, face_sim)
            body_d = 1.0 - body_sim
            face_d = 1.0 - face_sim
            gate = jnp.minimum(body_d, face_d) > cfg.appearance_thresh
            d1 = jnp.minimum(iou_d, jnp.where(gate, 1.0, body_d))
            emb3 = 1.0 - jnp.maximum(0.0, body_sim)
            emb3 = jnp.where(emb3 > cfg.appearance_thresh, 1.0, emb3)
            emb3 = jnp.where(iou_d > cfg.proximity_thresh, 1.0, emb3)
            d3 = jnp.minimum(iou_d, emb3)
            high = sc_ > cfg.track_high_thresh
            low = (sc_ >= cfg.track_low_thresh) & ~high
            return d1, iou_d, d3, high, low

        def step_solver(p, s, xs):
            t, sc, v, b_, f_ = xs
            d1, iou_d, d3, high, low = costs(t, sc, b_, f_)
            r1, r2, r3 = solve_cascade_masked(
                d1, iou_d, d3, pool_m, tracked_m, unconf_m, high, low,
                (cfg.match_thresh, cfg.second_match_thresh,
                 cfg.unconfirmed_match_thresh))
            return s, r1.col_for_row + r2.col_for_row + r3.col_for_row

        sec = time_scan(step_solver, jnp.zeros(()), jnp.zeros(()),
                        (tlbr, scores, valid, bfk, ffk), kk)
        print(json.dumps({"stage": f"ltail_solvercosts_N{n}_D{d}",
                          "ms": round(sec * 1e3, 3)}), flush=True)

        def step_costs(p, s, xs):
            t, sc, v, b_, f_ = xs
            d1, iou_d, d3, high, low = costs(t, sc, b_, f_)
            return s, d1[::7, ::5] + d3[::7, ::5]

        sec = time_scan(step_costs, jnp.zeros(()), jnp.zeros(()),
                        (tlbr, scores, valid, bfk, ffk), kk)
        print(json.dumps({"stage": f"ltail_costs_N{n}_D{d}",
                          "ms": round(sec * 1e3, 3)}), flush=True)

    if "cascadewidth" in stages:
        # tracker_update cost vs det-slot width and live load: the
        # empty-scene bench (width 50, zero dets) is SLOWER than
        # moderate-16 (width 16, full encoders) — localize where the
        # width-scaling cost lives.
        import dataclasses as _dc

        from botsort_tpu.track.cascade import tracker_update
        from botsort_tpu.track.state import empty_store

        base_cfg = TrackerConfig(
            det_score_threshold=0.2, track_high_thresh=0.15,
            track_low_thresh=0.05, new_track_thresh=0.2)
        for d, n_valid in [(50, 50), (50, 0), (16, 16), (16, 0)]:
            cfg = _dc.replace(base_cfg, max_dets=d)
            tlbr = jnp.asarray(
                rng.uniform(0, 600, (args.k, d, 4)).astype(np.float32))
            tlbr = tlbr.at[..., 2:].add(tlbr[..., :2])
            scores = jnp.asarray(rng.uniform(0.2, 1, (args.k, d)),
                                 jnp.float32)
            valid = jnp.zeros((args.k, d), bool).at[:, :n_valid].set(True)
            bf = jnp.asarray(rng.normal(size=(args.k, d, 2048)),
                             jnp.float32)
            ff = jnp.asarray(rng.normal(size=(args.k, d, 256)),
                             jnp.float32)

            def step(p, s, xs):
                t, sc, v, b_, f_ = xs
                s2, tr = tracker_update(s, t, sc, v, b_, f_, cfg)
                return s2, tr.valid

            sec = time_scan(step, jnp.zeros(()), empty_store(cfg),
                            (tlbr, scores, valid, bf, ff), args.k)
            print(json.dumps({
                "stage": f"cascade_d{d}_live{n_valid}",
                "ms": round(sec * 1e3, 3)}))

    if "batchedcasc" in stages:
        # Attribute the batched step's ~4.4 ms cascade tail
        # (batchedbisect full - faceenc): is it the B-grid Pallas
        # solver (sequential grid steps on the one TensorCore) or the
        # vmapped KF/lifecycle/assembly around it? Times, at the
        # 8-stream moderate-16 geometry (N=64 slots x D=16 dets):
        #   vmapped solve_cascade_masked alone   (solver share)
        #   vmapped tracker_update               (whole cascade)
        # NOTE: the "solver share" number also includes per-step cost-
        # matrix construction (iou_distance over 64x16 plus a
        # [64,2048]@[2048,16] matmul per stream) — small next to the
        # solver, but read it as solver+costs, not solver alone.
        import dataclasses as _dc

        from botsort_tpu.ops.assignment import solve_cascade_masked
        from botsort_tpu.track.cascade import tracker_update
        from botsort_tpu.track.state import empty_store

        B, d = 8, 16
        cfg = _dc.replace(
            TrackerConfig(det_score_threshold=0.2, track_high_thresh=0.15,
                          track_low_thresh=0.02, new_track_thresh=0.2),
            max_dets=d)
        n = cfg.max_tracks
        kk = args.k

        # Feasible scene: per stream, dets jitter around persistent
        # anchor boxes so pass-1 has real (non-parked) matches; track
        # stores warm up over the scan so live rows exist.
        anchors = rng.uniform(50, 900, (B, d, 2)).astype(np.float32)
        jit_xy = rng.normal(0, 6, (kk, B, d, 2)).astype(np.float32)
        wh = rng.uniform(40, 120, (B, d, 2)).astype(np.float32)
        tl = anchors[None] + jit_xy
        tlbr = jnp.asarray(np.concatenate([tl, tl + wh[None]], -1))
        scores = jnp.asarray(rng.uniform(0.2, 1, (kk, B, d)), jnp.float32)
        valid = jnp.ones((kk, B, d), bool)
        bf = rng.normal(size=(B, d, 2048)).astype(np.float32)
        bf = bf / np.linalg.norm(bf, axis=-1, keepdims=True)
        bfk = jnp.asarray(np.broadcast_to(bf, (kk, B, d, 2048)).copy())
        ff = rng.normal(size=(B, d, 256)).astype(np.float32)
        ff = ff / np.linalg.norm(ff, axis=-1, keepdims=True)
        ffk = jnp.asarray(np.broadcast_to(ff, (kk, B, d, 256)).copy())

        one = empty_store(cfg)
        stores0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), one)

        def step_full(p, s, xs):
            t, sc, v, b_, f_ = xs
            s2, tr = jax.vmap(
                lambda st, a1, a2, a3, a4, a5: tracker_update(
                    st, a1, a2, a3, a4, a5, cfg))(s, t, sc, v, b_, f_)
            return s2, tr.valid

        sec = time_scan(step_full, jnp.zeros(()), stores0,
                        (tlbr, scores, valid, bfk, ffk), kk)
        print(json.dumps({"stage": f"batchedcasc_full_B{B}_d{d}",
                          "ms": round(sec * 1e3, 3)}), flush=True)

        # Solver share: fixed realistic masks (16 live tracked rows),
        # cost matrices recomputed per step from the same det stream.
        pool_m = jnp.zeros((B, n), bool).at[:, :d].set(True)
        tracked_m = pool_m
        unconf_m = jnp.zeros((B, n), bool)
        track_tlbr = jnp.asarray(np.concatenate(
            [anchors, anchors + wh], -1))  # [B, d, 4]
        track_pad = jnp.zeros((B, n, 4), jnp.float32
                              ).at[:, :d].set(track_tlbr)
        bf_track = jnp.zeros((B, n, 2048), jnp.float32
                             ).at[:, :d].set(jnp.asarray(bf))

        from botsort_tpu.ops.boxes import iou_distance

        def step_solve(p, s, xs):
            t, sc, v, b_, f_ = xs

            def one_stream(tp, bt, t_, sc_, b2):
                iou_d = iou_distance(tp, t_)
                body_d = 1.0 - bt @ b2.T
                d1 = jnp.minimum(iou_d, body_d)
                high = sc_ > cfg.track_high_thresh
                low = (sc_ >= cfg.track_low_thresh) & ~high
                r1, r2, r3 = solve_cascade_masked(
                    d1, iou_d, d1, pool_m[0], tracked_m[0], unconf_m[0],
                    high, low,
                    (cfg.match_thresh, cfg.second_match_thresh,
                     cfg.unconfirmed_match_thresh))
                return r1.col_for_row + r2.col_for_row + r3.col_for_row

            out = jax.vmap(one_stream)(track_pad, bf_track, t, sc, b_)
            return s, out

        sec = time_scan(step_solve, jnp.zeros(()), jnp.zeros(()),
                        (tlbr, scores, valid, bfk, ffk), kk)
        print(json.dumps({"stage": f"batchedcasc_solver_B{B}_d{d}",
                          "ms": round(sec * 1e3, 3)}), flush=True)

    if "batchedtemporal" in stages:
        # 8-stream aggregate FPS: frame_step_batched (T=1) vs the
        # temporal variant batching T consecutive frames per stream in
        # one dispatch (detector batch B*T, ReID chunks B*T*r crops) —
        # bitwise-equal outputs, T-1 frames of added latency. The bench
        # geometry: moderate-16 config, bucket 16, 1080p frames.
        from botsort_tpu.pipeline.frame_step import (
            frame_step_batched, frame_step_batched_temporal)
        from botsort_tpu.track.state import empty_store

        cfg = TrackerConfig(det_score_threshold=0.2,
                            track_high_thresh=0.15,
                            track_low_thresh=0.05,
                            new_track_thresh=0.2, max_dets=16)
        nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
        B = 8
        frames4 = [jnp.asarray(rng.integers(0, 255, (1080, 1920, 3)),
                               jnp.uint8) for _ in range(4)]
        one = empty_store(cfg)
        for t in (int(v) for v in args.tlist.split(",")):
            k = max(16 // t, 4)
            flat = jnp.stack(frames4 * (k * B * t // 4))
            if t == 1:
                fk = flat.reshape((k, B) + flat.shape[1:])

                def body(bund, s, f):
                    s2, out = frame_step_batched(
                        bund, s, f, cfg, nms_cfg, pipe_cfg, None, 16)
                    return s2, out.tracks.valid
            else:
                fk = flat.reshape((k, B, t) + flat.shape[1:])

                def body(bund, s, f):
                    s2, out = frame_step_batched_temporal(
                        bund, s, f, cfg, nms_cfg, pipe_cfg, None, 16)
                    return s2, out.tracks.valid
            stores = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), one)
            sec = time_scan(body, bundle, stores, fk, k * t * B)
            print(json.dumps({
                "stage": f"batched8_t{t}",
                "frames_per_dispatch": B * t,
                "aggregate_fps": round(1.0 / sec, 1),
                "per_stream_fps": round(1.0 / sec / B, 2),
            }), flush=True)

    if "emptybisect" in stages:
        # In-context truncation bisection of the EMPTY config (width-50
        # slots, bucket-0 encoders): the composed program costs ~7.6 ms
        # where its standalone stages sum to ~3.2. Each level adds one
        # stage of the real frame_step sequence; deltas localize the
        # composition overhead. Level "full" is the actual frame_step.
        import dataclasses as _dc

        from botsort_tpu.ops import crop as crop_mod
        from botsort_tpu.ops import hierarchy as hier_mod
        from botsort_tpu.ops import nms as nms_mod
        from botsort_tpu.pipeline import frame_step as fs
        from botsort_tpu.track.cascade import tracker_update
        from botsort_tpu.track.state import empty_store

        cfg = TrackerConfig(det_score_threshold=0.99)
        nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
        frames = jnp.asarray(
            rng.uniform(0, 255, (args.k, 1080, 1920, 3)), jnp.uint8)
        in_h, in_w = pipe_cfg.detector_input_hw

        def build(level):
            def step(b, s, frame_bgr):
                src_h, src_w = frame_bgr.shape[0], frame_bgr.shape[1]
                pdt = fs._compute_dtype(pipe_cfg)
                det_in = jax.image.resize(
                    frame_bgr.astype(pdt), (in_h, in_w, 3),
                    method="linear")[None]
                if level == "resize":
                    return s, det_in[0, ::97, ::89, 0]
                cb, cs = b.detector.apply(b.detector_params, det_in)
                if level == "det":
                    return s, cb[0, ::531, 0]
                dets = nms_mod.multiclass_nms_dense(
                    cb[0], cs[0],
                    iou_threshold=nms_cfg.iou_threshold,
                    score_threshold=nms_cfg.score_threshold,
                    max_per_class=nms_cfg.max_boxes_per_class,
                    pre_nms_top_k=nms_cfg.pre_nms_top_k)
                det_boxes = fs._rescale_to_source(
                    dets.boxes, (in_h, in_w), (src_h, src_w))
                det_valid = dets.valid & (
                    dets.scores > cfg.det_score_threshold)
                if level == "nms":
                    return s, det_boxes[0, :, 0]
                results = hier_mod.greedy_assign_batch([
                    (det_boxes[1], det_valid[1],
                     det_boxes[3], det_valid[3], 1),
                    (det_boxes[0], det_valid[0],
                     det_boxes[1], det_valid[1], 1),
                    (det_boxes[0], det_valid[0],
                     det_boxes[2], det_valid[2], 2),
                ])
                (face_for_head,) = results[0]
                (head_for_body,) = results[1]
                if level == "hier":
                    return s, head_for_body
                d = fs._det_width(cfg, nms_cfg)
                body_valid = det_valid[0][:d]
                bf = jnp.zeros((d, cfg.body_feature_dim), jnp.float32)
                ff = jnp.zeros((d, cfg.face_feature_dim), jnp.float32)
                s2, tracks = tracker_update(
                    s, det_boxes[0][:d], dets.scores[0][:d],
                    body_valid, bf, ff, cfg)
                return s2, tracks.valid

            return step

        for level in ("resize", "det", "nms", "hier", "cascade"):
            sec = time_scan(build(level), bundle, empty_store(cfg),
                            frames, args.k)
            print(json.dumps({"stage": f"empty_{level}",
                              "ms": round(sec * 1e3, 3)}))

        def step_full(b, s, frame_bgr):
            s2, out = fs.frame_step(b, s, frame_bgr, cfg, nms_cfg,
                                    pipe_cfg, None, 0, 0)
            return s2, out.tracks.valid

        sec = time_scan(step_full, bundle, empty_store(cfg), frames,
                        args.k)
        print(json.dumps({"stage": "empty_full", "ms": round(sec * 1e3, 3)}))

    if "loadedbisect" in stages:
        # In-context truncation bisection of the LOADED config (50
        # garbage dets via lowered thresholds on random weights — the
        # bench headline scene). Deltas between levels attribute the
        # 10.6 ms loaded frame: resize, detector(+decode), NMS, box
        # hierarchy, body crop-gather, body encode @ bucket 50, face
        # path @ bucket 16, cascade+KF (full - prior).
        from botsort_tpu.models import fastreid as fastreid_mod
        from botsort_tpu.ops import assignment
        from botsort_tpu.ops import crop as crop_mod
        from botsort_tpu.ops import hierarchy as hier_mod
        from botsort_tpu.ops import nms as nms_mod
        from botsort_tpu.pipeline import frame_step as fs
        from botsort_tpu.track.cascade import tracker_update
        from botsort_tpu.track.state import empty_store

        cfg = TrackerConfig(
            det_score_threshold=0.2, track_high_thresh=0.15,
            track_low_thresh=0.02, new_track_thresh=0.2)
        nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
        # Ship only 4 distinct frames through the tunnel (24 MB) and
        # stack to k on DEVICE — a direct (k,1080,1920,3) host transfer
        # is ~200 MB and stalls the tunnel for tens of minutes.
        frame_list = [
            jnp.asarray(rng.integers(0, 255, (1080, 1920, 3)), jnp.uint8)
            for _ in range(4)
        ]
        frames = jnp.stack(frame_list * (max(args.k, 4) // 4))
        in_h, in_w = pipe_cfg.detector_input_hw
        d = fs._det_width(cfg, nms_cfg)
        r = pipe_cfg.max_reid_batch
        dp = -(-d // r) * r
        face_bucket = 16

        def build(level):
            prod_crop = level.endswith("i8")

            def step(b, s, frame_bgr):
                src_h, src_w = frame_bgr.shape[0], frame_bgr.shape[1]
                pdt = fs._compute_dtype(pipe_cfg)
                if prod_crop:
                    # Mirror frame_step's production preprocess exactly
                    # (int8-x-phase crop op) to isolate the closure-vs-
                    # frame_step delta.
                    fullbox = jnp.asarray(
                        [[0.0, 0.0, float(src_w), float(src_h)]],
                        jnp.float32)
                    det_in = fs._crop(frame_bgr, fullbox, (in_h, in_w),
                                      pdt, pipe_cfg)
                else:
                    det_in = jax.image.resize(
                        frame_bgr.astype(pdt), (in_h, in_w, 3),
                        method="linear")[None]
                if level == "resize":
                    return s, det_in[0, ::97, ::89, 0]
                cb, cs = b.detector.apply(b.detector_params, det_in)
                if level == "det":
                    return s, cb[0, ::531, 0]
                dets = nms_mod.multiclass_nms_dense(
                    cb[0], cs[0],
                    iou_threshold=nms_cfg.iou_threshold,
                    score_threshold=nms_cfg.score_threshold,
                    max_per_class=nms_cfg.max_boxes_per_class,
                    pre_nms_top_k=nms_cfg.pre_nms_top_k)
                det_boxes = fs._rescale_to_source(
                    dets.boxes, (in_h, in_w), (src_h, src_w))
                det_valid = dets.valid & (
                    dets.scores > cfg.det_score_threshold)
                if level == "nms":
                    return s, det_boxes[0, :, 0]
                results = hier_mod.greedy_assign_batch([
                    (det_boxes[1], det_valid[1],
                     det_boxes[3], det_valid[3], 1),
                    (det_boxes[0], det_valid[0],
                     det_boxes[1], det_valid[1], 1),
                    (det_boxes[0], det_valid[0],
                     det_boxes[2], det_valid[2], 2),
                ])
                (face_for_head,) = results[0]
                (head_for_body,) = results[1]
                if level == "hier":
                    return s, head_for_body
                body_tlbr_p = fs._pad_slots(det_boxes[0], dp)
                body_valid = det_valid[0][:d]
                n_live = jnp.sum(body_valid)
                if level == "bodycrop":
                    crops = crop_mod.crop_and_resize(
                        frame_bgr, body_tlbr_p[:d],
                        pipe_cfg.body_reid_input_hw, compute_dtype=pdt)
                    return s, crops[:, ::37, ::19, 0]

                def encode_body(tlbr_chunk):
                    if prod_crop:
                        crops = fs._crop(frame_bgr, tlbr_chunk,
                                         pipe_cfg.body_reid_input_hw,
                                         pdt, pipe_cfg)
                    else:
                        crops = crop_mod.crop_and_resize(
                            frame_bgr, tlbr_chunk,
                            pipe_cfg.body_reid_input_hw,
                            compute_dtype=pdt)
                    return b.body_encoder.apply(
                        b.body_params, fastreid_mod.preprocess(crops))

                body_feats = fs._encode_chunked(
                    encode_body, body_tlbr_p, n_live, r,
                    cfg.body_feature_dim, static_bucket=d)[:d]
                if level.startswith("bodyenc"):
                    return s, body_feats[:, 0]
                hb = fs._pad_slots(head_for_body, dp, fill=-1)
                fb = jnp.where(
                    hb >= 0, face_for_head[jnp.clip(hb, 0, None)], -1)
                has_face = fb >= 0
                face_tlbr = jnp.where(
                    has_face[:, None],
                    det_boxes[3][jnp.clip(fb, 0, None)],
                    jnp.zeros((dp, 4), jnp.float32))

                def encode_face(tlbr_chunk):
                    if prod_crop:
                        crops = fs._crop(frame_bgr, tlbr_chunk,
                                         pipe_cfg.face_reid_input_hw,
                                         pdt, pipe_cfg)
                    else:
                        crops = crop_mod.crop_and_resize(
                            frame_bgr, tlbr_chunk,
                            pipe_cfg.face_reid_input_hw,
                            compute_dtype=pdt)
                    return b.face_encoder.apply(b.face_params, crops)

                face_feats = fs._encode_faces(
                    encode_face, face_tlbr, has_face, n_live, r,
                    cfg.face_feature_dim, static_bucket=face_bucket)[:d]
                if level == "faceenc":
                    return s, face_feats[:, 0]
                s2, tracks = tracker_update(
                    s, det_boxes[0][:d], dets.scores[0][:d],
                    body_valid, body_feats, face_feats, cfg)
                return s2, tracks.valid

            return step

        # Solver-ablation levels: run the FULL tracker_update but with
        # solve_cascade_masked swapped for (a) an all-unmatched stub
        # (cost matrices get DCE'd too -> cascade minus this delta =
        # costs + solver) and (b) a cheap greedy over the same cost
        # inputs (costs stay materialized -> cascade minus this =
        # solver kernel alone). State evolution differs from the real
        # path, so these bound, not equal, the production split.
        def _stub_unmatched(d1, iou, d3, pool, tr, unc, high, low,
                            limits, max_iters=0):
            nn, dd = d1.shape
            r = assignment.AssignmentResult(
                jnp.full((nn,), -1, jnp.int32),
                jnp.full((dd,), -1, jnp.int32))
            return r, r, r

        def _stub_greedy(d1, iou, d3, pool, tr, unc, high, low,
                         limits, max_iters=0):
            def g(c, rm, cm, lim):
                c2 = jnp.where(rm[:, None] & cm[None, :], c, 1e9)
                j = jnp.argmin(c2, axis=1).astype(jnp.int32)
                ok = jnp.min(c2, axis=1) <= lim
                i = jnp.argmin(c2, axis=0).astype(jnp.int32)
                okc = jnp.min(c2, axis=0) <= lim
                return assignment.AssignmentResult(
                    jnp.where(ok, j, -1), jnp.where(okc, i, -1))
            r1 = g(d1, pool, high, limits[0])
            r2 = g(iou, tr & (r1.col_for_row < 0), low, limits[1])
            r3 = g(d3, unc, high & (r1.row_for_col < 0), limits[2])
            return r1, r2, r3

        _real_solve = assignment.solve_cascade_masked
        _stubs = {"tailstub": _stub_unmatched, "tailgreedy": _stub_greedy}
        from botsort_tpu.track import cascade as cascade_core
        for level in ("resize", "det", "nms", "hier", "bodycrop",
                      "bodyenc", "faceenc", "tailstub", "tailgreedy",
                      "cascade", "cascadei8", "bodyenci8"):
            # tracker_update is itself jitted: its FIRST trace in this
            # process is cached and reused by every later level with the
            # same shapes/static args, so a solver monkeypatch would
            # silently leak across levels (it did — the round-5 session-2
            # "8.5 ms cascade" was a stubbed-solver artifact). Clear its
            # trace cache around each stubbed level.
            cascade_core.tracker_update.clear_cache()
            assignment.solve_cascade_masked = _stubs.get(level, _real_solve)
            try:
                lv = {"tailstub": "cascade",
                      "tailgreedy": "cascade"}.get(level, level)
                sec = time_scan(build(lv), bundle, empty_store(cfg),
                                frames, args.k)
            finally:
                assignment.solve_cascade_masked = _real_solve
                cascade_core.tracker_update.clear_cache()
            print(json.dumps({"stage": f"loaded_{level}",
                              "ms": round(sec * 1e3, 3)}), flush=True)

        def step_full(b, s, frame_bgr):
            s2, out = fs.frame_step(b, s, frame_bgr, cfg, nms_cfg,
                                    pipe_cfg, None, d, face_bucket)
            return s2, out.tracks.valid

        sec = time_scan(step_full, bundle, empty_store(cfg), frames,
                        args.k)
        print(json.dumps({"stage": "loaded_full",
                          "ms": round(sec * 1e3, 3)}), flush=True)

    if "batchedbisect" in stages:
        # In-context truncation bisection of the 8-stream BATCHED step
        # (the batched_8stream_aggregate_fps program: moderate-16
        # config, bucket 16, b=8). Levels ride _perception_batched's
        # _truncate hook — one source of truth, no duplicated pipeline.
        # Deltas attribute the ~34 ms batched step: 8x resize,
        # detector b8, NMS/hier, 128-crop body encode, face encode,
        # vmapped cascades (full - faceenc).
        import dataclasses as _dc

        from botsort_tpu.pipeline import frame_step as fs
        from botsort_tpu.track.state import empty_store

        cfg = _dc.replace(
            TrackerConfig(det_score_threshold=0.2, track_high_thresh=0.15,
                          track_low_thresh=0.02, new_track_thresh=0.2),
            max_dets=16)
        nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
        tag = ""
        if args.reidhw:
            rh, rw = (int(v) for v in args.reidhw.split("x"))
            pipe_cfg = _dc.replace(pipe_cfg, body_reid_input_hw=(rh, rw))
            tag = f"_{rh}x{rw}"
        B = 8
        kk = min(args.k, 8)
        # Ship 4 distinct 1080p frames through the tunnel, tile to
        # (kk, B, ...) on device (a direct host transfer would be
        # ~kk*B*6 MB).
        f4 = jnp.stack([
            jnp.asarray(rng.integers(0, 255, (1080, 1920, 3)), jnp.uint8)
            for _ in range(4)])
        frames_kb = jnp.tile(f4[:, None], (kk // 4, B, 1, 1, 1))

        def build(level):
            def step(bdl, s, frames_b):
                out = fs._perception_batched(
                    bdl, frames_b, cfg, nms_cfg, pipe_cfg,
                    reid_bucket=16, face_bucket=16, _truncate=level)
                return s, out
            return step

        for level in ("resize", "det", "nms", "hier", "bodyenc",
                      "faceenc"):
            sec = time_scan(build(level), bundle, jnp.zeros(()),
                            frames_kb, kk)
            print(json.dumps({"stage": f"batched8_{level}{tag}",
                              "ms": round(sec * 1e3, 3)}), flush=True)

        one = empty_store(cfg)
        stores = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), one)

        def step_full(bdl, s, frames_b):
            s2, out = fs.frame_step_batched(
                bdl, s, frames_b, cfg, nms_cfg, pipe_cfg, None, 16, 16)
            return s2, out.tracks.valid

        sec = time_scan(step_full, bundle, stores, frames_kb, kk)
        print(json.dumps({"stage": f"batched8_full{tag}",
                          "ms": round(sec * 1e3, 3)}), flush=True)

    if "emptyiso" in stages:
        # Follow-ups to emptybisect's finding (tracker_update costs
        # 4.7 ms when fed detector-derived inputs vs 0.32 standalone):
        # (a) dummy consumer of the same det-derived inputs (is the
        #     cost in the cascade or redistributed into the program?)
        # (b) optimization_barrier between percep and cascade
        # (c) XLA solver instead of the Pallas kernel
        import dataclasses as _dc

        from botsort_tpu.ops import hierarchy as hier_mod
        from botsort_tpu.ops import nms as nms_mod
        from botsort_tpu.pipeline import frame_step as fs
        from botsort_tpu.track.cascade import tracker_update
        from botsort_tpu.track.state import empty_store

        cfg = TrackerConfig(det_score_threshold=0.99)
        nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
        frames = jnp.asarray(
            rng.uniform(0, 255, (args.k, 1080, 1920, 3)), jnp.uint8)
        in_h, in_w = pipe_cfg.detector_input_hw

        def percep(b, frame_bgr):
            src_h, src_w = frame_bgr.shape[0], frame_bgr.shape[1]
            pdt = fs._compute_dtype(pipe_cfg)
            det_in = jax.image.resize(
                frame_bgr.astype(pdt), (in_h, in_w, 3),
                method="linear")[None]
            cb, cs = b.detector.apply(b.detector_params, det_in)
            dets = nms_mod.multiclass_nms_dense(
                cb[0], cs[0],
                iou_threshold=nms_cfg.iou_threshold,
                score_threshold=nms_cfg.score_threshold,
                max_per_class=nms_cfg.max_boxes_per_class,
                pre_nms_top_k=nms_cfg.pre_nms_top_k)
            det_boxes = fs._rescale_to_source(
                dets.boxes, (in_h, in_w), (src_h, src_w))
            det_valid = dets.valid & (
                dets.scores > cfg.det_score_threshold)
            d = fs._det_width(cfg, nms_cfg)
            return (det_boxes[0][:d], dets.scores[0][:d],
                    det_valid[0][:d])

        d = fs._det_width(cfg, nms_cfg)

        def step_dummy(b, s, frame_bgr):
            tl, sc, v = percep(b, frame_bgr)
            out = (jnp.sum(tl) + jnp.sum(sc)
                   + jnp.sum(v.astype(jnp.float32)))
            return s, out

        def step_casc(b, s, frame_bgr):
            tl, sc, v = percep(b, frame_bgr)
            bf = jnp.zeros((d, cfg.body_feature_dim), jnp.float32)
            ff = jnp.zeros((d, cfg.face_feature_dim), jnp.float32)
            s2, tracks = tracker_update(s, tl, sc, v, bf, ff, cfg)
            return s2, tracks.valid

        def step_casc_barrier(b, s, frame_bgr):
            tl, sc, v = percep(b, frame_bgr)
            tl, sc, v = jax.lax.optimization_barrier((tl, sc, v))
            bf = jnp.zeros((d, cfg.body_feature_dim), jnp.float32)
            ff = jnp.zeros((d, cfg.face_feature_dim), jnp.float32)
            s2, tracks = tracker_update(s, tl, sc, v, bf, ff, cfg)
            return s2, tracks.valid

        for name, step in [("dummy_consumer", step_dummy),
                           ("cascade", step_casc),
                           ("cascade_barrier", step_casc_barrier)]:
            sec = time_scan(step, bundle, empty_store(cfg), frames,
                            args.k)
            print(json.dumps({"stage": f"emptyiso_{name}",
                              "ms": round(sec * 1e3, 3)}))

        os.environ["BOTSORT_TPU_PALLAS_LAP"] = "0"
        try:
            sec = time_scan(step_casc, bundle, empty_store(cfg), frames,
                            args.k)
            print(json.dumps({"stage": "emptyiso_cascade_xla_solver",
                              "ms": round(sec * 1e3, 3)}))
        finally:
            os.environ["BOTSORT_TPU_PALLAS_LAP"] = "1"

    if "cascbisect" in stages:
        # Truncations of tracker_update IN-COMPOSITION with percep
        # (emptyiso found the full cascade costs +4.7 ms there vs 0.32
        # standalone). Each level adds a chunk of the real update.
        from botsort_tpu.ops import assignment, kalman
        from botsort_tpu.ops import nms as nms_mod
        from botsort_tpu.ops.boxes import (
            iou_distance, tlbr_to_tlwh, tlwh_to_xywh, xywh_to_tlbr)
        from botsort_tpu.pipeline import frame_step as fs
        from botsort_tpu.track.state import (
            LOST, TRACKED, empty_store)

        cfg = TrackerConfig(det_score_threshold=0.99)
        nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
        frames = jnp.asarray(
            rng.uniform(0, 255, (args.k, 1080, 1920, 3)), jnp.uint8)
        in_h, in_w = pipe_cfg.detector_input_hw
        d = fs._det_width(cfg, nms_cfg)

        def percep(b, frame_bgr):
            src_h, src_w = frame_bgr.shape[0], frame_bgr.shape[1]
            pdt = fs._compute_dtype(pipe_cfg)
            det_in = jax.image.resize(
                frame_bgr.astype(pdt), (in_h, in_w, 3),
                method="linear")[None]
            cb, cs = b.detector.apply(b.detector_params, det_in)
            dets = nms_mod.multiclass_nms_dense(
                cb[0], cs[0],
                iou_threshold=nms_cfg.iou_threshold,
                score_threshold=nms_cfg.score_threshold,
                max_per_class=nms_cfg.max_boxes_per_class,
                pre_nms_top_k=nms_cfg.pre_nms_top_k)
            det_boxes = fs._rescale_to_source(
                dets.boxes, (in_h, in_w), (src_h, src_w))
            det_valid = dets.valid & (
                dets.scores > cfg.det_score_threshold)
            return (det_boxes[0][:d], dets.scores[0][:d],
                    det_valid[0][:d])

        def build(level):
            def step(b, store, frame_bgr):
                det_tlbr, det_score, det_valid = percep(b, frame_bgr)
                det_body_feat = jnp.zeros((d, cfg.body_feature_dim),
                                          jnp.float32)
                det_face_feat = jnp.zeros((d, cfg.face_feature_dim),
                                          jnp.float32)
                frame = store.frame_count + 1
                tracked_m = (store.state == TRACKED) & store.is_activated
                unconfirmed_m = ((store.state == TRACKED)
                                 & ~store.is_activated)
                lost_m = store.state == LOST
                pool_m = tracked_m | lost_m
                mean_z = jnp.where(
                    (lost_m)[:, None] & (jnp.arange(8) >= 6)[None, :],
                    0.0, store.mean)
                mean_p, cov_p = kalman.predict(mean_z, store.cov)
                mean = jnp.where(pool_m[:, None], mean_p, store.mean)
                cov = jnp.where(pool_m[:, None, None], cov_p, store.cov)
                if level == "predict":
                    s2 = store._replace(mean=mean, cov=cov,
                                        frame_count=frame)
                    return s2, mean[:, 0]
                track_tlbr = xywh_to_tlbr(mean[:, :4])
                det_xywh = tlwh_to_xywh(tlbr_to_tlwh(det_tlbr))
                high_m = det_valid & (det_score > cfg.track_high_thresh)
                low_m = (det_valid
                         & (det_score >= cfg.track_low_thresh)
                         & (det_score <= cfg.track_high_thresh))
                iou_d = iou_distance(track_tlbr, det_tlbr)
                body_sim = store.body_feat @ det_body_feat.T
                face_sim = store.face_feat @ det_face_feat.T
                face_sim = jnp.where(face_sim > 0.99999, 0.0, face_sim)
                body_d = 1.0 - body_sim
                face_d = 1.0 - face_sim
                gate = (jnp.minimum(body_d, face_d)
                        > cfg.appearance_thresh)
                emb = jnp.where(gate, 1.0, body_d)
                dists1 = jnp.minimum(iou_d, emb)
                emb3 = 1.0 - jnp.maximum(0.0, body_sim)
                emb3 = jnp.where(emb3 > cfg.appearance_thresh, 1.0, emb3)
                emb3 = jnp.where(iou_d > cfg.proximity_thresh, 1.0, emb3)
                dists3 = jnp.minimum(iou_d, emb3)
                if level == "costs":
                    s2 = store._replace(mean=mean, cov=cov,
                                        frame_count=frame)
                    return s2, dists1[:, 0] + dists3[:, 0]
                if level == "costs_all":
                    # Force FULL materialization of every solver input
                    # (the narrow "costs" output lets XLA dead-code most
                    # of the matrices) — but no solver.
                    s2 = store._replace(mean=mean, cov=cov,
                                        frame_count=frame)
                    out = (jnp.sum(dists1, axis=1) + jnp.sum(iou_d, axis=1)
                           + jnp.sum(dists3, axis=1)
                           + pool_m + tracked_m + unconfirmed_m
                           + jnp.sum(high_m) + jnp.sum(low_m))
                    return s2, out
                res1, res2, res3 = assignment.solve_cascade_masked(
                    dists1, iou_d, dists3, pool_m, tracked_m,
                    unconfirmed_m, high_m, low_m,
                    (cfg.match_thresh, cfg.second_match_thresh,
                     cfg.unconfirmed_match_thresh))
                if level == "solve":
                    s2 = store._replace(mean=mean, cov=cov,
                                        frame_count=frame)
                    return s2, (res1.col_for_row + res2.col_for_row
                                + res3.col_for_row)
                det_for_row = jnp.where(
                    res1.col_for_row >= 0, res1.col_for_row,
                    jnp.where(res2.col_for_row >= 0, res2.col_for_row,
                              res3.col_for_row))
                matched_m = det_for_row >= 0
                j = jnp.clip(det_for_row, 0, d - 1)
                mean_u, cov_u = kalman.update(mean, cov, det_xywh[j])
                mean = jnp.where(matched_m[:, None], mean_u, mean)
                cov = jnp.where(matched_m[:, None, None], cov_u, cov)
                body_feat = jnp.where(matched_m[:, None],
                                      det_body_feat[j], store.body_feat)
                s2 = store._replace(mean=mean, cov=cov,
                                    body_feat=body_feat,
                                    frame_count=frame)
                return s2, mean[:, 0]

            return step

        for level in ("costs_all", "solve"):
            sec = time_scan(build(level), bundle, empty_store(cfg),
                            frames, args.k)
            print(json.dumps({"stage": f"cascbisect_{level}",
                              "ms": round(sec * 1e3, 3)}))

    if "hierprobe" in stages:
        from botsort_tpu.ops import hierarchy as hier_mod

        for w in (50, 16):
            boxes = jnp.asarray(
                rng.uniform(0, 600, (args.k, 4, w, 4)).astype(np.float32))
            boxes = boxes.at[..., 2:].add(boxes[..., :2])
            valid = jnp.ones((args.k, 4, w), bool)

            def step(p, c, xs):
                bx, v = xs
                res = hier_mod.greedy_assign_batch([
                    (bx[1], v[1], bx[3], v[3], 1),
                    (bx[0], v[0], bx[1], v[1], 1),
                    (bx[0], v[0], bx[2], v[2], 2),
                ])
                return c, res[1][0]

            sec = time_scan(step, jnp.zeros(()), jnp.zeros(()),
                            (boxes, valid), args.k)
            print(json.dumps({"stage": f"hierarchy_w{w}",
                              "ms": round(sec * 1e3, 3)}))

    if "full" in stages:
        from botsort_tpu.pipeline.frame_step import frame_step
        from botsort_tpu.track.state import empty_store

        tracker_cfg = TrackerConfig(
            det_score_threshold=0.2, track_high_thresh=0.15,
            track_low_thresh=0.05, new_track_thresh=0.2)
        nms_cfg, pipe_cfg = NMSConfig(), PipelineConfig()
        frames = jnp.asarray(
            rng.uniform(0, 255, (args.k, 1080, 1920, 3)), jnp.uint8)
        store = empty_store(tracker_cfg)

        def step(b, s, f):
            s2, out = frame_step(b, s, f, tracker_cfg, nms_cfg,
                                 pipe_cfg)
            return s2, out.tracks.valid

        sec = time_scan(step, bundle, store, frames, args.k)
        print(json.dumps({"stage": "full_frame_step_loaded",
                          "ms": round(sec * 1e3, 3),
                          "fps": round(1 / sec, 1)}))


if __name__ == "__main__":
    main()
