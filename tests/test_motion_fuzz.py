"""Motion geometry + filter-chain fuzz vs a host oracle (VERDICT r3
item 5).

The oracle below is an independent straight-numpy transcription of the
reference C:

* geometry propagation — propagate_planes/fill_coords/limit_coords and
  the samesize-chroma clearing (reference motion/motion.c:58-91,
  369-433);
* the per-block chain — strided minbuf buffer, forward DCT at block
  dims, uniform renorm over active, top-N over the whole buffer,
  6-face bandpass damp + unclipped boost, threshold, preserve-dc,
  quantize with coded counts, inverse renorm, IDCT at scaled dims, pel
  mapping (reference motion/motion.c:591-811).

Randomised draws of (source, block, scaled, bandpass, chroma shift,
samesize, chain params) must match dspfun_tpu's vectorised
implementation: plan_geometry field-for-field and filter_blocks
numerically.
"""

import dataclasses
import math

import numpy as np
import pytest
import scipy.fft

from dspfun_tpu.core.precision import Precision
from dspfun_tpu.models import motion_pipeline as mp
from dspfun_tpu.models.motion_pipeline import Dims

SQRT2 = math.sqrt(2.0)


# ---------------------------------------------------------------------------
# geometry oracle (motion.c:58-91, 369-433)
# ---------------------------------------------------------------------------

def _shift(v, s):
    return -((-int(v)) >> s)


def oracle_geometry(w, h, d, nplanes, sub_w, sub_h, block, scaled,
                    bpb, bpe, samesize):
    subs = [[0, 0], [sub_w, sub_h], [sub_w, sub_h], [0, 0]][:nplanes]

    def propagate(c0):
        # per-plane: zeros inherit the ceiling-shifted plane-0 value
        out = []
        for i in range(nplanes):
            sw, sh = subs[i]
            out.append([
                c0[0] if i == 0 else (_shift(c0[0], sw) if c0[0] else 0),
                c0[1] if i == 0 else (_shift(c0[1], sh) if c0[1] else 0),
                c0[2],
            ])
        return out

    source = [[w, h, d]] + [
        [_shift(w, subs[i][0]), _shift(h, subs[i][1]), d]
        for i in range(1, nplanes)
    ]
    block = list(block)
    if samesize and nplanes >= 3:
        for pi in (1, 2):
            if block[0] <= source[pi][0]:
                subs[pi][0] = 0
                if not block[0]:
                    block[0] = source[pi][0]
            if block[1] <= source[pi][1]:
                subs[pi][1] = 0
                if not block[1]:
                    block[1] = source[pi][1]

    blocks = propagate(block)
    scaleds = propagate(list(scaled))
    bpbs = propagate(list(bpb))
    bpes = propagate(list(bpe))

    def fill(src, dst):
        for i in range(nplanes):
            for k in range(3):
                if not dst[i][k]:
                    dst[i][k] = src[i][k]

    def limit(src, dst):
        for i in range(nplanes):
            for k in range(3):
                dst[i][k] = min(dst[i][k], src[i][k])

    fill(source, blocks)
    limit(source, blocks)
    fill(blocks, scaleds)
    fill(blocks, bpes)
    limit(blocks, bpbs)
    limit(blocks, bpes)

    planes = []
    for i in range(nplanes):
        sw_, sh_, sd_ = source[i]
        bw_, bh_, bd_ = blocks[i]
        nb = [sw_ // bw_, sh_ // bh_, sd_ // bd_]
        planes.append({
            "source": tuple(source[i]), "block": tuple(blocks[i]),
            "scaled": tuple(scaleds[i]), "bp_begin": tuple(bpbs[i]),
            "bp_end": tuple(bpes[i]), "nblocks": tuple(nb),
            "truncated": tuple(nb[k] * blocks[i][k] for k in range(3)),
            "newres": tuple(nb[k] * scaleds[i][k] for k in range(3)),
            "active": tuple(min(blocks[i][k], scaleds[i][k]) for k in range(3)),
            "minbuf": tuple(max(blocks[i][k], scaleds[i][k]) for k in range(3)),
        })
    return planes


def _dims_tuple(dm):
    return (dm.w, dm.h, dm.d)


@pytest.mark.parametrize("seed", range(10))
def test_geometry_fuzz(seed):
    rng = np.random.default_rng(100 + seed)
    for _ in range(60):
        w = int(rng.integers(2, 33))
        h = int(rng.integers(2, 33))
        d = int(rng.integers(1, 9))
        nplanes = int(rng.choice([1, 3, 4]))
        sub_w = int(rng.integers(0, 2)) if nplanes >= 3 else 0
        sub_h = int(rng.integers(0, 2)) if nplanes >= 3 else 0
        samesize = bool(rng.integers(0, 2)) and nplanes >= 3

        def dim_or_zero(limit):
            return int(rng.integers(0, limit + 1))  # 0 = inherit

        block = (dim_or_zero(w), dim_or_zero(h),
                 int(rng.integers(1, d + 1)))
        scaled = (dim_or_zero(2 * w), dim_or_zero(2 * h), dim_or_zero(2 * d))
        bpb = (dim_or_zero(w), dim_or_zero(h), dim_or_zero(d))
        bpe = (dim_or_zero(w), dim_or_zero(h), dim_or_zero(d))

        want = oracle_geometry(w, h, d, nplanes, sub_w, sub_h,
                               block, scaled, bpb, bpe, samesize)
        got = mp.plan_geometry(
            w, h, d, nplanes, sub_w, sub_h,
            block=Dims(*block), scaled=Dims(*scaled),
            bp_begin=Dims(*bpb), bp_end=Dims(*bpe),
            samesize_chroma=samesize,
        )
        ctx = dict(w=w, h=h, d=d, nplanes=nplanes, sub=(sub_w, sub_h),
                   block=block, scaled=scaled, bpb=bpb, bpe=bpe,
                   samesize=samesize)
        for i in range(nplanes):
            for field in ("source", "block", "scaled", "bp_begin", "bp_end",
                          "nblocks", "truncated", "newres", "active",
                          "minbuf"):
                assert _dims_tuple(getattr(got[i], field)) == \
                    want[i][field], (i, field, ctx)


# ---------------------------------------------------------------------------
# filter-chain oracle (motion.c:591-811), single plane, float64
# ---------------------------------------------------------------------------

def oracle_filter_blocks(blocks, g, p, plane_index=0, nplanes=1, bz=0):
    """[NB, bd, bh, bw] pel 0..255 float64 -> ([NB, sd, sh, sw] pel
    0..255, coded[NB]); straight per-block numpy transcription."""
    nb = blocks.shape[0]
    md, mh, mw = g.minbuf.d, g.minbuf.h, g.minbuf.w
    bd, bh, bw = g.block.d, g.block.h, g.block.w
    sd, sh, sw = g.scaled.d, g.scaled.h, g.scaled.w
    ad, ah, aw = g.active.d, g.active.h, g.active.w
    svol = sd * sh * sw
    scalefactor = svol / (bd * bh * bw)
    norm = 1.0 / math.sqrt(svol * 8.0)
    norm2 = norm * norm
    quantizer = p.quant * 8.0 * math.sqrt(svol)
    out = np.zeros((nb, sd, sh, sw))
    coded = np.zeros(nb, np.int64)

    for b in range(nb):
        buf = np.zeros((md, mh, mw))
        x = blocks[b].astype(np.float64)
        if p.ispec == "shift":
            ic = 127.5 / math.log1p(svol * norm * 255 * 8)
            t = x - 127.5
            x = np.copysign(np.expm1(np.abs(t / ic)), t) / norm
        elif p.ispec == "flat":
            x = (x - 127.5) * 2.0 / norm2
        elif p.ispec == "copy":
            x = x / norm2
        elif p.linear:
            v = x / 255.0
            x = np.where(v <= 0.04045, v / 12.92,
                         ((v + 0.055) / 1.055) ** 2.4) * 255.0
        buf[:bd, :bh, :bw] = x

        if not p.ispec:
            buf[:bd, :bh, :bw] = scipy.fft.dctn(buf[:bd, :bh, :bw], type=2)
            for z in range(ad):
                for yy in range(ah):
                    for xx in range(aw):
                        buf[z, yy, xx] *= 2 * SQRT2 / (
                            (1 if xx else SQRT2) * (1 if yy else SQRT2)
                            * (1 if z else SQRT2))

        dc = buf[0, 0, 0]

        if p.coeff_limit:
            flat = buf.reshape(-1)
            k = min(p.coeff_limit, flat.size)
            order = np.argsort(-np.abs(flat), kind="stable")
            keep = order[:k]
            nf = np.zeros_like(flat)
            nf[keep] = flat[keep]
            buf = nf.reshape(md, mh, mw)

        if p.expr is not None:
            for z in range(ad):
                for yy in range(ah):
                    for xx in range(aw):
                        env = {
                            "c": buf[z, yy, xx] * norm2 / 255.0,
                            "x": float(xx), "y": float(yy), "z": float(z),
                            "i": float(plane_index),
                            "width": float(bw), "height": float(bh),
                            "depth": float(bd),
                            "components": float(nplanes),
                            "bx": 0.0, "by": 0.0, "bz": float(bz),
                            "bwidth": float(g.nblocks.w),
                            "bheight": float(g.nblocks.h),
                            "bdepth": float(g.nblocks.d),
                        }
                        buf[z, yy, xx] = (p.expr({k2: np.float64(v)
                                                  for k2, v in env.items()},
                                                 np) / norm2 * 255.0)

        if p.damp != 1.0:
            bb, be = g.bp_begin, g.bp_end
            if bb.d:
                buf[:bb.d, :ah, :aw] *= p.damp
            if be.d < ad:
                buf[be.d:ad, :ah, :aw] *= p.damp
            if bb.h:
                buf[bb.d:be.d, :bb.h, :aw] *= p.damp
            if be.h < ah:
                buf[bb.d:be.d, be.h:ah, :aw] *= p.damp
            if bb.w:
                buf[bb.d:be.d, bb.h:be.h, :bb.w] *= p.damp
            if be.w < aw:
                buf[bb.d:be.d, bb.h:be.h, be.w:aw] *= p.damp
        if p.boost != 1.0:
            bb, be = g.bp_begin, g.bp_end
            buf[bb.d:be.d, bb.h:be.h, bb.w:be.w] *= p.boost

        if p.threshold_max:
            tmin = p.threshold_min * 255.0 / norm2
            tmax = p.threshold_max * 255.0 / norm2
            a = np.abs(buf[:ad, :ah, :aw])
            buf[:ad, :ah, :aw] = np.where((a < tmin) | (a > tmax), 0.0,
                                          buf[:ad, :ah, :aw])

        if p.preserve_dc:
            dcstop = bool(g.bp_begin.d or g.bp_begin.h or g.bp_begin.w)
            if (p.expr is not None or dcstop or p.boost != 1.0
                    or p.threshold_max):
                if p.preserve_dc == "dc":
                    buf[0, 0, 0] = dc
                else:
                    buf[0, 0, 0] += (1 - (p.damp if dcstop else p.boost)) \
                        * 127.5 / (norm2 * scalefactor)

        if p.quant:
            q = np.round(buf[:ad, :ah, :aw] / quantizer) * quantizer
            buf[:ad, :ah, :aw] = q
            coded[b] = np.count_nonzero(q)

        spec_c = None
        if not p.spec:
            for z in range(ad):
                for yy in range(ah):
                    for xx in range(aw):
                        buf[z, yy, xx] *= (
                            (1 if xx else SQRT2) * (1 if yy else SQRT2)
                            * (1 if z else SQRT2)) / (2 * SQRT2)
            buf[:sd, :sh, :sw] = scipy.fft.dctn(buf[:sd, :sh, :sw], type=3)
        elif p.spec == "abs":
            spec_c = 255.0 / math.log1p(abs(dc * scalefactor * norm))

        pel = buf[:sd, :sh, :sw] * scalefactor * norm
        if p.spec == "abs":
            pel = spec_c * np.log1p(np.abs(pel))
        elif p.spec == "shift":
            c = 127.5 / math.log1p(svol * norm * 255 * 8)
            pel = c * np.copysign(np.log1p(np.abs(pel)), pel) + 127.5
        elif p.spec == "flat":
            pel = pel * norm / 2 + 127.5
        else:
            pel = pel * norm
            if p.linear:
                v = pel / 255.0
                pel = np.where(v <= 0.0031308, v * 12.92,
                               1.055 * np.abs(v) ** (1 / 2.4) - 0.055) * 255.0
        if not p.float_pixels:
            pel = np.clip(np.floor(pel + 0.5), 0.0, 255.0)
        out[b] = pel
    return out, coded


def _run_filter_blocks(blocks, g, p, prec):
    import jax.numpy as jnp

    plans = mp.make_plans(g, prec)
    nb = blocks.shape[0]
    bx = np.zeros(nb, np.int32)
    by = np.zeros(nb, np.int32)
    out, coded = mp.filter_blocks(
        jnp.asarray(blocks, prec.coeff_dtype), plans,
        (jnp.asarray(bx), jnp.asarray(by)), jnp.asarray(0),
        geom=g, params=p, plane_index=0, nplanes=1,
    )
    return np.asarray(out, np.float64), np.asarray(coded)


@pytest.mark.parametrize("seed", range(6))
def test_filter_chain_fuzz(seed):
    """~100 randomized chain configurations vs the per-block numpy
    oracle.  f64 precision so any mismatch is semantic, not rounding;
    fast-path-eligible draws run the f32 fused kernels and get a pel
    tolerance instead."""
    from dspfun_tpu.core.precision import get_precision, set_precision

    rng = np.random.default_rng(2000 + seed)
    prec64 = Precision(coeff="float64", intermediate="f64")
    prev = get_precision()
    set_precision(prec64)
    try:
        for _ in range(25):
            w = int(rng.integers(2, 13))
            h = int(rng.integers(2, 13))
            d = int(rng.integers(1, 5))
            sc = (int(rng.integers(1, 13)), int(rng.integers(1, 13)),
                  int(rng.integers(1, 5)))
            use_scale = bool(rng.integers(0, 2))
            bpb = (int(rng.integers(0, w + 1)), int(rng.integers(0, h + 1)),
                   int(rng.integers(0, d + 1)))
            bpe = (int(rng.integers(0, w + 1)), int(rng.integers(0, h + 1)),
                   int(rng.integers(0, d + 1)))
            g = mp.plan_geometry(
                w, h, d, 1,
                block=Dims(w, h, d),
                scaled=Dims(*sc) if use_scale else Dims(),
                bp_begin=Dims(*bpb), bp_end=Dims(*bpe),
            )[0]

            kind = rng.integers(0, 7)
            p = mp.MotionParams(
                boost=float(rng.choice([1.0, 0.5, 1.5])),
                damp=float(rng.choice([1.0, 0.0, 0.25])),
                quant=float(rng.choice([0.0, 0.0, 0.5, 2.0])),
                threshold_min=float(rng.choice([0.0, 1e-4])),
                threshold_max=float(rng.choice([0.0, 0.0, 0.3])),
                coeff_limit=int(rng.choice([0, 0, 3, 9])),
                preserve_dc=[None, "dc", "grey"][int(rng.integers(0, 3))],
                spec=(["abs", "shift", "flat", "copy"][int(rng.integers(0, 4))]
                      if kind == 4 else None),
                ispec=(["shift", "flat", "copy"][int(rng.integers(0, 3))]
                       if kind == 6 else None),
                linear=kind == 5,
                float_pixels=True,
            )
            blocks = rng.random(
                (1, g.block.d, g.block.h, g.block.w)) * 255.0

            want, wcoded = oracle_filter_blocks(blocks, g, p)
            got, gcoded = _run_filter_blocks(blocks, g, p, prec64)

            ctx = dict(w=w, h=h, d=d, scaled=_dims_tuple(g.scaled),
                       bpb=_dims_tuple(g.bp_begin),
                       bpe=_dims_tuple(g.bp_end), params=dataclasses.asdict(p))
            # the fused fast path runs f32; everything else is f64-tight
            atol = 5e-3 if (p.spec is None and not p.coeff_limit
                            and not p.preserve_dc and not p.quant
                            and not p.linear
                            and g.block == g.scaled == g.minbuf) else 5e-7
            np.testing.assert_allclose(got, want, atol=atol * 255.0 / 255.0,
                                       rtol=1e-6, err_msg=repr(ctx))
            if p.quant:
                assert int(gcoded.sum()) == int(wcoded.sum()), ctx
    finally:
        set_precision(prev)
