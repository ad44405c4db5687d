#!/usr/bin/env python
"""Benchmark suite: the BASELINE.md configurations, each with a locally
measured single-core pocketfft/numpy f64 baseline (the reference
publishes no numbers — BASELINE.md:1-11).

Config 1 is the 8x8-blockwise spec round trip BASELINE.md:31 names;
config 6 adds the whole-image 512^2 spec round trip on the exact
contraction path (the round-1 precision gap).  Each config prints one
JSON line with value/unit/vs_baseline/max_abs_err where applicable.

Usage: python benchmarks/suite.py [--quick] [--configs 1,2,...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from benchmarks.timing import time_fori as _shared_time_fori  # noqa: E402
from benchmarks.timing import time_host as _shared_time_host  # noqa: E402

LAST_SPREAD: tuple[float, float] | None = None


def _time_fori(step, x0, iters=8, reps=5, target_s=0.08, max_iters=1 << 20):
    """Median on-device seconds-per-iteration via the shared two-point
    estimator (benchmarks/timing.py — delta-sized chains, positive
    median, spike-confirmed stop); the (min, max) band lands in
    ``LAST_SPREAD`` for the caller's artifact row."""
    global LAST_SPREAD
    c, LAST_SPREAD = _shared_time_fori(step, x0, iters=iters, reps=reps,
                                       target_s=target_s,
                                       max_iters=max_iters)
    return c


def _spread(numer):
    """[lo, hi] of value = numer/dt over the last _time_fori band."""
    if not LAST_SPREAD:
        return None
    lo_dt, hi_dt = LAST_SPREAD
    return [round(numer / hi_dt, 2), round(numer / lo_dt, 2)]


def _time_host(fn, reps=3):
    """min-of-N host baseline timing (benchmarks/timing.py)."""
    return _shared_time_host(fn, reps=reps)


# ---------------------------------------------------------------------------
# config 1: 8x8-blockwise spec round trip of a 512x512 RGB image
# ---------------------------------------------------------------------------

def _block_spec_chain_np(img, n=8):
    """f64 oracle: blockwise DCT-II + flat-template spec encode/decode +
    IDCT, all in float64 pocketfft (reference chain spec/spec.c:63-139
    applied per 8x8 block)."""
    import scipy.fft

    h, w, c = img.shape
    gain = 127.5 * math.sqrt(4 * n * n)
    grid = np.sqrt(2.0) ** (
        (np.arange(n) != 0)[:, None] + (np.arange(n) != 0)[None, :]
    )
    b = img.reshape(h // n, n, w // n, n, c).astype(np.float64)
    F = scipy.fft.dctn(b, type=2, axes=(1, 3), workers=1)
    f = F * (grid * (gain / (4.0 * n * n)))[None, :, None, :, None]
    stored = (f / (2 * gain) + 0.5) * 254 / 255          # flat encode
    f2 = (stored * 255 / 254 - 0.5) * (2 * gain)         # decode
    f2 = f2 / (grid * gain)[None, :, None, :, None]
    # f2/(grid*gain) == F/(4n^2), and DCT3(DCT2(x)) = 4n^2 x, so this
    # IS the image — no further normalisation (an extra /(4n^2) here
    # and in the device chain's si made the 'round trip' return
    # img/256 and understated the published error 256x; round 4)
    y = scipy.fft.dctn(f2, type=3, axes=(1, 3), workers=1)
    return y.reshape(h, w, c)


def bench_spec_blockwise(quick):
    """Config 1 (BASELINE.md:31): 8x8 blockwise 2-D DCT-II spectrum of a
    512x512 RGB image, flat-encode, invert; error vs the f64 pocketfft
    chain; throughput vs the same chain single-core."""
    import jax

    from dspfun_tpu.core import basis as basis_mod
    from dspfun_tpu.core.precision import Precision
    from dspfun_tpu.core.transforms import apply_plan
    from dspfun_tpu.ops.blockdct import bdiag_axis_plan

    n = 8
    size = 128 if quick else 512
    rng = np.random.default_rng(0)
    img = rng.random((size, size, 3)).astype(np.float32)
    gain = 127.5 * math.sqrt(4 * n * n)

    # Planar [C, H, W] + block-diagonal [size, size] operators: the
    # blockwise DCT along each axis is ONE dense matmul with the
    # separable sqrt(2) grid + gain factors folded in (K=size on the
    # MXU; calibrated 1.9x the per-axis [8,8]-plan form,
    # benchmarks/calib_r4_block.py).
    prec = Precision(coeff="float32", intermediate="f32")
    g8 = np.sqrt(2.0) ** (np.arange(n) != 0)
    sf = math.sqrt(gain / (4.0 * n * n))
    # forward already folded the 1/(4n^2); the inverse only unwinds the
    # gain (si = sqrt(1/(gain*4n^2)) returned img/256 — a true round
    # trip measures error at image scale)
    si = math.sqrt(1.0 / gain)
    pf = jax.device_put(bdiag_axis_plan(
        size, (g8[:, None] * basis_mod.dct2_matrix(n)) * sf, prec))
    pi = jax.device_put(bdiag_axis_plan(
        size, (basis_mod.dct3_matrix(n) * (1.0 / g8)[None, :]) * si, prec))

    @jax.jit
    def roundtrip(x):
        F = apply_plan(apply_plan(x, pf, 1, prec), pf, 2, prec)
        stored = (F / (2 * gain) + 0.5) * 254 / 255
        f2 = (stored * 255 / 254 - 0.5) * (2 * gain)
        return apply_plan(apply_plan(f2, pi, 1, prec), pi, 2, prec)

    x = jax.device_put(np.moveaxis(img, -1, 0).copy())
    dt = _time_fori(roundtrip, x, iters=128)
    got = np.moveaxis(np.asarray(roundtrip(x)), 0, -1)
    oracle = _block_spec_chain_np(img, n)
    err = float(np.max(np.abs(got - oracle)))

    base_dt = _time_host(lambda: _block_spec_chain_np(img, n))
    mps = size * size / dt / 1e6
    return {
        "metric": f"spec+ispec 8x8-blockwise round trip {size}x{size} RGB",
        "value": round(mps, 2), "unit": "MP/s",
        "value_spread": _spread(size * size / 1e6),
        "max_abs_err_vs_f64": err,
        "baseline_MP/s": round(size * size / base_dt / 1e6, 2),
        "vs_baseline": round(base_dt / dt, 1),
        "baseline": "pocketfft f64 1-core, same chain",
    }


# ---------------------------------------------------------------------------
# config 2: zoom 4x of 1080p, linear light
# ---------------------------------------------------------------------------

def bench_zoom(quick):
    import jax
    import scipy.fft

    from dspfun_tpu.core.precision import Precision, get_precision, set_precision
    from dspfun_tpu.io.color import srgb_decode, srgb_encode
    from dspfun_tpu.models import zoom_pipeline as zp

    h, w = (270, 480) if quick else (1080, 1920)
    rng = np.random.default_rng(1)
    img = rng.random((h, w, 3))
    spec = jax.device_put(jax.numpy.asarray(
        zp.forward_spectrum(srgb_decode(img)), jax.numpy.float32))

    # stills ride the *planned* path (tools/zoom.py static_basis): host
    # float64 basis built once -> deep+tail-corrected int8 digit
    # contraction (~1e-7 relative with exact accumulation,
    # ops/int8mm.i8_contract) — the post-OETF error budget is 1e-5
    # (BASELINE.md) and the dark-end sRGB slope is ~12.9x, so the
    # linear budget is ~8e-7 (VERDICT r3 item 1)
    prev = get_precision()
    set_precision(Precision(coeff="float32", intermediate="i8", tol=8e-7))
    try:
        # plans are built (and device_put) ONCE, eagerly — the timing
        # loop then closes over the device-resident AxisPlans exactly
        # like bench.py's fused chain
        prec = get_precision()
        plan_y, plan_x = zp.zoom_plan("interpolated", (4, 1), (4, 1),
                                      0, 0, w * 2, h * 2, w, h, prec)

        # two-point timing: the synthesis output shape differs from the
        # input, so chain a scalar carry perturbing the spectrum by
        # ~1e-38 (numerically nil, but keeps XLA from hoisting the body)
        def step(carry):
            f = zp._synthesize(spec + carry * 1e-38, plan_y, plan_x,
                               prec, True)
            return f[0, 0, 0]

        dt = _time_fori(step, jax.numpy.zeros((), jax.numpy.float32), iters=4)
        frame = np.asarray(zp._synthesize(spec, plan_y, plan_x, prec, True),
                           np.float64)
    finally:
        set_precision(prev)

    # f64 oracle of the same continuous-basis synthesis (first rows)
    nv = 64
    F64 = np.asarray(spec, np.float64)

    def hb(nvec, length):
        b = np.arange(nvec, dtype=np.float64)[:, None]
        j = np.arange(length, dtype=np.float64)[None, :]
        k = b / 4.0
        ncomp = min(length, round(length * 4.0))
        m = np.cos(np.pi * (k + 0.5) * j / length)
        m[:, 0] = 0.5
        return np.where(np.arange(length)[None, :] < ncomp, m, 0.0)

    yb, xb = hb(nv, h), hb(2 * w, w)
    from dspfun_tpu.io.color import srgb_encode as _enc64

    ref = _enc64(np.einsum("jv,vuc,iu->jic", yb, F64, xb,
                            optimize=True) / (h * w))
    err = float(np.max(np.abs(frame[:nv] - ref)))

    # single-core pocketfft proxy baseline: cosine upsampling to the
    # same output pixels = IDCT of the zero-padded spectrum (+ the
    # linear-light transfer stages in f64)
    lin = srgb_decode(img)
    F = scipy.fft.dctn(lin, type=2, axes=(0, 1), workers=1)
    Fp = np.zeros((2 * h, 2 * w, 3))
    Fp[:h, :w] = F

    def base():
        up = scipy.fft.dctn(Fp, type=3, axes=(0, 1), workers=1) / (4.0 * w * h)
        # x^(1/2.4) as cbrt(x)^(1/0.8) — the actual sRGB OETF exponent
        # (1/0.4 computed x^(5/6); timing-equivalent but wrong math)
        _ = np.where(up <= 0.0031308, up * 12.92,
                     1.055 * np.cbrt(np.abs(up)) ** (1 / 0.8) - 0.055)

    base_dt = _time_host(base, reps=2)
    out_mp = (2 * w) * (2 * h) / 1e6
    return {
        "metric": f"zoom 4x of {w}x{h} linear-light (per {w*2}x{h*2} frame)",
        "value": round(out_mp / dt, 2), "unit": "out MP/s",
        "value_spread": _spread(out_mp),
        "max_abs_err_vs_f64": err,
        "baseline_MP/s": round(out_mp / base_dt, 2),
        "vs_baseline": round(base_dt / dt, 1),
        "baseline": "pocketfft f64 1-core zero-pad cosine upsample + trc",
    }


# ---------------------------------------------------------------------------
# config 3: applybasis / genbasis
# ---------------------------------------------------------------------------

def bench_applybasis(quick):
    """Config 3: render 8x8/16x16 DCT basis grids + full 64^2 DCT apply.

    The apply step is a three-operand einsum; the baseline is the same
    contraction in f64 numpy (optimize=False: single-threaded C loops —
    generous to the reference, whose per-element long-double scalar
    loops are slower still, applybasis.c:409-448)."""
    import jax
    import jax.numpy as jnp

    from dspfun_tpu.models import basis_pipeline as bp

    t0 = time.perf_counter()
    for size in (8, 16):
        grid = bp.gen_basis_grid("dct2", (size, size))
        bp.render_grid(bp.realize(grid[..., None].repeat(3, -1), "real"))
    gen_dt = time.perf_counter() - t0

    n = 16 if quick else 64
    rng = np.random.default_rng(2)
    img = rng.random((n, n, 3))

    # tool-level (includes host->device->host transfer per call)
    def run():
        return bp.apply_basis(img, "dct2", terms=(n, n), partsum=(n, n))

    run()
    t0 = time.perf_counter()
    run()
    percall = time.perf_counter() - t0

    # device-resident throughput (chained)
    from dspfun_tpu.models.basis_pipeline import (
        _axis_matrix_forward, _einsum_forward,
    )

    mh = _axis_matrix_forward("dct2", n, 1, n, 0, n, False).real
    mw = mh
    pr = img.reshape(1, n, 1, n, 3)
    mhj = jax.device_put(jnp.asarray(mh, jnp.float32))
    mwj = jax.device_put(jnp.asarray(mw, jnp.float32))

    def step(x):
        out = _einsum_forward(mhj, x, mwj)  # [n, n, 1, 1, 3]
        return out.reshape(1, n, 1, n, 3) * 1e-3  # feed back, keep finite

    dt = _time_fori(step, jnp.asarray(pr, jnp.float32), iters=256)

    # baseline: same contraction, f64 numpy single-core loops
    base_dt = _time_host(
        lambda: np.einsum("ais,isjtz,bjt->abijz", mh, pr, mw, optimize=False))

    return {
        "metric": f"applybasis full {n}x{n} DCT + genbasis 8/16 grids",
        "value": round(1.0 / dt, 1), "unit": "transforms/s",
        "value_spread": _spread(1.0),
        "percall_s": round(percall, 4),
        "genbasis_ms": round(gen_dt * 1e3, 1),
        "baseline_transforms/s": round(1.0 / base_dt, 1),
        "vs_baseline": round(base_dt / dt, 1),
        "baseline": "numpy f64 1-core einsum (same contraction)",
    }


# ---------------------------------------------------------------------------
# config 4: scan progressive reconstruction
# ---------------------------------------------------------------------------

def bench_scan(quick):
    import scipy.fft

    from dspfun_tpu.core.precision import Precision
    from dspfun_tpu.models import scan_pipeline as sp
    from dspfun_tpu.ops import scan_methods as sm

    n = 64 if quick else 256
    nframes = 64 if quick else 256
    rng = np.random.default_rng(3)
    img = rng.random((n, n, 3))
    prec = Precision(coeff="float32", intermediate="f32")
    order = sm.get_method("zigzag").build(n, n)
    coeffs = sp.forward_coeffs(img, prec)
    plan = sp.plan_scan(order, n, n, 3, step=4, nframes=nframes,
                        chunk=64, precision=prec)

    # tool-path emission: frames pack to y4m payload bytes ON DEVICE
    # (uint8 — 12x less D2H than float RGB) and the host only writes
    # bytes, exactly like `scan out.y4m` (tools/scan.py packed path)
    from dspfun_tpu.io import video as _video
    from dspfun_tpu.io.device_pack import make_packer

    props = _video.parse_color_props("pixel_format=yuv444p:color_range=tv")
    packer = make_packer(_video.PIXEL_FORMATS["yuv444p"], props, n, n)

    def run():
        nbytes = 0
        nfetches = 0
        for _, res in sp.scan_chunks(plan, coeffs, packer=packer):
            nbytes += res.payload.nbytes
            nfetches += 1
        return nbytes, nfetches

    run()
    t0 = time.perf_counter()
    total_bytes, nfetches = run()
    dt = time.perf_counter() - t0

    # D2H roofline statement (round 5): measure the RAW tunnel rate on
    # the same fetch pattern (same chunk payload size, same number of
    # fetches) so "tunnel-bound" is a number, not a sentence —
    # packed_overhead = emission time / raw-transfer time for the same
    # bytes.  <= ~1.3x means the packed path sits on the D2H roofline.
    import jax as _jax
    import jax.numpy as _jnp

    chunk_bytes = max(1, total_bytes // max(nfetches, 1))
    # one DISTINCT device buffer per fetch: jax.Array caches its host
    # copy (_npy_value) after the first np.asarray, so re-fetching one
    # buffer times cache hits, not the tunnel (this exact bug printed
    # 760 GB/s in the first r5 capture)
    rawbufs = [_jax.device_put(_jnp.full((chunk_bytes,), i % 251, _jnp.uint8))
               for i in range(nfetches)]
    _jax.block_until_ready(rawbufs)
    warm = _jax.device_put(_jnp.zeros((chunk_bytes,), _jnp.uint8))
    np.asarray(warm)  # warm the fetch path itself
    t0 = time.perf_counter()
    for b in rawbufs:
        np.asarray(b)
    raw_dt = time.perf_counter() - t0
    d2h_mbps = total_bytes / raw_dt / 1e6

    # device-resident reconstruction rate: every emitted frame crosses
    # D2H, which through this environment's device tunnel runs ~20 MB/s
    # and dominates the tool-level number above; on directly-attached
    # chips the transfer is >1000x faster.  Chain the chunk kernels and
    # sync once to measure the compute rate itself.
    import jax
    import jax.numpy as jnp

    plans_inv = jax.device_put(plan.plans_inv)
    coeffs_nodc = jnp.asarray(coeffs).at[0, 0, :].set(0.0)
    dc = jnp.asarray(coeffs[0, 0, :])
    carry0 = jnp.broadcast_to(dc, (n, n, 3)).astype(coeffs.dtype)
    npad = plan.ys.shape[0]
    nchunks = npad // plan.chunk
    ys_all = jax.device_put(jnp.asarray(
        plan.ys.reshape(nchunks, plan.chunk, -1)))
    xs_all = jax.device_put(jnp.asarray(
        plan.xs.reshape(nchunks, plan.chunk, -1)))
    valid_all = jax.device_put(jnp.asarray(
        plan.valid.reshape(nchunks, plan.chunk, -1)))

    def device_pass(carry):
        # the full frame schedule as ONE lax.scan over stacked chunks;
        # chained by carry so repeated passes can be two-point timed
        def body(c, chunk):
            ys, xs, valid = chunk
            c2, _disp, _d, _i, _p = sp._scan_chunk(
                c, coeffs_nodc, ys, xs, valid, plans_inv,
                jnp.zeros((), coeffs.dtype), dc, parity_scale=0.0,
                use_pruned=plan.use_pruned, want_deltas=False,
                measure_parity=False,
            )
            return c2, ()

        out, _ = jax.lax.scan(body, carry, (ys_all, xs_all, valid_all))
        return out * 1e-3  # keep magnitudes finite across passes

    dev_dt = _time_fori(device_pass, carry0, iters=8)

    # baseline: the reference emits one full IDCT per output frame
    # (scan.c:446-449); time pocketfft IDCTs and scale to nframes
    F = scipy.fft.dctn(img.astype(np.float64), type=2, axes=(0, 1), workers=1)
    base_dt = _time_host(
        lambda: scipy.fft.dctn(F, type=3, axes=(0, 1), workers=1),
        reps=8) * plan.nframes
    return {
        "metric": f"scan zigzag {n}x{n}, {plan.nframes} frames step=4",
        "value": round(plan.nframes / dev_dt, 1), "unit": "frames/s",
        "value_spread": _spread(plan.nframes),
        "with_frame_download_frames/s": round(plan.nframes / dt, 1),
        "payload_bytes_per_frame": total_bytes // plan.nframes,
        "d2h_raw_MB/s": round(d2h_mbps, 1),
        "d2h_budget_s": round(total_bytes / (d2h_mbps * 1e6), 3),
        "packed_overhead_ratio": round(dt / raw_dt, 2),
        "pruned": plan.use_pruned,
        "baseline_frames/s": round(plan.nframes / base_dt, 1),
        "vs_baseline": round(base_dt / dev_dt, 1),
        "baseline": "pocketfft f64 1-core full IDCT per frame",
    }


# ---------------------------------------------------------------------------
# config 5: motion 3-D lowpass
# ---------------------------------------------------------------------------

def bench_motion(quick):
    import jax
    import jax.numpy as jnp

    from dspfun_tpu.models import motion_pipeline as mp

    w, h, d = (320, 180, 8) if quick else (640, 360, 16)
    g = mp.plan_geometry(w, h, d, 1, block=mp.Dims(16, 16, d),
                         bp_end=mp.Dims(8, 8, 4))[0]
    params = mp.MotionParams(boost=1.25, damp=0.0)
    plans = (*mp.make_plans(g), mp.maybe_kron_plans(g, params))
    rng = np.random.default_rng(4)
    frames = rng.random((d, h, w)).astype(np.float32) * 255
    blocks = jax.device_put(mp.frames_to_blocks(frames, g))
    nb = blocks.shape[0]
    bc = (jax.device_put(np.arange(nb, dtype=np.int32) % g.nblocks.w),
          jax.device_put(np.arange(nb, dtype=np.int32) // g.nblocks.w))
    plans = jax.device_put(plans)
    bz = jnp.asarray(0)

    def step(cur):
        out, _ = mp.filter_blocks(cur, plans, bc, bz, geom=g,
                                  params=params, plane_index=0, nplanes=1)
        return out * 0.5  # keep magnitudes finite (boost=1.25 compounds)

    dt = _time_fori(step, blocks, iters=64)
    fps = d / dt

    # single-core FFTW-proxy baseline: the same 3-D DCT+filter+IDCT per
    # block with pocketfft (BASELINE.md: ">10x single-core FFTW" target)
    import scipy.fft  # noqa: PLC0415

    nb_blocks = np.asarray(blocks)
    mask = np.ones((g.block.d, g.block.h, g.block.w))
    mask[4:, :, :] = 0

    def base():
        F = scipy.fft.dctn(nb_blocks.astype(np.float64), type=2,
                           axes=(1, 2, 3), workers=1) * mask[None]
        scipy.fft.dctn(F, type=3, axes=(1, 2, 3), workers=1)

    base_dt = _time_host(base, reps=2)
    base_fps = d / base_dt

    # end-to-end CLI wall rate (y4m in -> y4m out, packed device-side
    # emission): container I/O + D2H included — the production number,
    # bounded by this environment's ~20 MB/s device tunnel
    import tempfile

    from dspfun_tpu.io import video as _video
    from dspfun_tpu.tools import motion as motion_tool

    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "clip.y4m")
        outp = os.path.join(td, "out.y4m")
        nio = 2 * d
        props = _video.parse_color_props("pixel_format=yuv444p")
        from fractions import Fraction as _Fr
        with _video.open_output(clip, w, h, _Fr(25), props) as wr:
            for t in range(nio):
                wr.write_frame([rng.random((h, w)) for _ in range(3)],
                               raw=False)
        argv = ["-Q", "-b", f"16x16x{d}", "-p", "8x8x4", clip, outp]
        rc = motion_tool.main(argv)   # warm run: jit compiles cache
        # min-of-3 (same policy as the host baselines): identical runs
        # through the remote tunnel scatter ~1.3-2.0 s wall (round-5
        # profile), so a single reading publishes tunnel weather, not
        # the tool
        io_dt = float("inf")
        breakdown = {}
        for _ in range(3):
            t0 = time.perf_counter()
            rc |= motion_tool.main(argv)
            dt_i = time.perf_counter() - t0
            if dt_i < io_dt:
                io_dt = dt_i
                breakdown = dict(getattr(motion_tool, "LAST_STAGE_TIMES", {}))
        io_fps = nio / io_dt if rc == 0 else 0.0
        # per-stage breakdown of the best run (VERDICT r4 item 3):
        # read = container decode + host de-block, stage+dispatch =
        # H2D + jit dispatch, write = D2H fetch + host mux; the
        # remainder is open/close + geometry/plan setup
        breakdown = {k: round(v, 3) for k, v in breakdown.items()}
        breakdown["unaccounted"] = round(
            io_dt - sum(breakdown.values()), 3)

    return {
        "metric": f"motion 3-D lowpass {w}x{h} {d}-frame cubes (16x16x{d} blocks)",
        "value": round(fps, 1), "unit": "frames/s",
        "value_spread": _spread(float(d)),
        "Mpel/s": round(w * h * fps / 1e6, 1),
        "cli_end_to_end_frames/s": round(io_fps, 1),
        "cli_timing": "min of 3 (tunnel-weather control)",
        "cli_breakdown_s": breakdown,
        "baseline_frames/s": round(base_fps, 1),
        "vs_baseline": round(fps / base_fps, 1),
        "baseline": "pocketfft f64 1-core, same blockwise chain",
    }


# ---------------------------------------------------------------------------
# config 6: whole-image 512^2 spec round trip (exact contraction path)
# ---------------------------------------------------------------------------

def bench_spec_wholeimage(quick):
    """The round-1 precision gap config: whole-image spec round trip on
    the error-free contraction path (core/exact.py).  Must be <=1e-5 vs
    f64 FFTW on the TPU device at >=10x the 1-core baseline."""
    import jax
    import scipy.fft

    from dspfun_tpu.core.precision import Precision
    from dspfun_tpu.models.spec_pipeline import (
        SpecChainParams, spec_forward, spec_inverse,
    )

    n = 128 if quick else 512
    rng = np.random.default_rng(0)
    img = rng.random((n, n, 3)).astype(np.float32)
    # raw-spectrum template: measures the transform, not the +-0.5
    # display encoding (see tests/test_exact.py)
    params = SpecChainParams.template("copy")
    # the fastest mode that meets the BASELINE <=1e-5 target: int8
    # digit contraction + rank-1 DC splits (spec_pipeline._whole_dct);
    # measured 5.9e-6 at 512^2.  The bf16 budgeted-exact path
    # (intermediate="hilo"/"exact" with tol, auto-upgraded) measures
    # 457 MP/s at 3.1e-7 and stays the conservative tool default.
    prec = Precision(coeff="float32", intermediate="i8", tol=1e-5)

    @jax.jit
    def roundtrip(x):
        f, dc = spec_forward(x, params, prec)
        return spec_inverse(f, params, dc=dc, precision=prec)

    x = jax.device_put(img)
    dt = _time_fori(roundtrip, x, iters=32)
    got = np.asarray(roundtrip(x))

    # f64 pocketfft oracle of the same chain
    gain = params.gain
    grid = np.sqrt(2.0) ** ((np.arange(n) != 0)[:, None]
                            + (np.arange(n) != 0)[None, :])

    def base():
        F = scipy.fft.dctn(img.astype(np.float64), type=2, axes=(0, 1),
                           workers=1)
        f = F * (grid * (gain / (4.0 * n * n)))[:, :, None]
        f2 = f / (grid * gain)[:, :, None]   # == F / (4wh)
        return scipy.fft.dctn(f2, type=3, axes=(0, 1), workers=1)

    base_dt = _time_host(base)
    oracle = base()
    err = float(np.max(np.abs(got - oracle)))
    return {
        "metric": f"spec+ispec whole-image round trip {n}x{n} RGB (int8 digit path)",
        "value": round(n * n / dt / 1e6, 2), "unit": "MP/s",
        "value_spread": _spread(n * n / 1e6),
        "max_abs_err_vs_f64": err,
        "baseline_MP/s": round(n * n / base_dt / 1e6, 2),
        "vs_baseline": round(base_dt / dt, 1),
        "baseline": "pocketfft f64 1-core, same chain",
    }


CONFIGS = {
    1: bench_spec_blockwise,
    2: bench_zoom,
    3: bench_applybasis,
    4: bench_scan,
    5: bench_motion,
    6: bench_spec_wholeimage,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    args = ap.parse_args()
    for idx in (int(t) for t in args.configs.split(",")):
        try:
            res = CONFIGS[idx](args.quick)
            print(json.dumps({"config": idx, **res}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": idx, "error": str(e)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
