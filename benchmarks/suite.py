#!/usr/bin/env python
"""Benchmark suite: the five BASELINE.md configurations.

Each config prints one JSON line.  The headline driver metric stays in
bench.py (config 0 here); this suite is for tracking the rest.

Usage: python benchmarks/suite.py [--quick] [--configs 1,2,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


_PROBE = None


def _sync(x):
    """Fetch one scalar to synchronise; the probe jit is cached (a fresh
    lambda per call would re-trace and pay a remote compile each time)."""
    global _PROBE
    import jax

    if _PROBE is None:
        _PROBE = jax.jit(lambda a: a.reshape(-1)[0])
    return float(jax.device_get(_PROBE(x)))


def _time(fn, iters=5):
    r = fn()  # warmup/compile
    if r is not None:
        _sync(r)  # absorb first-sync / compile latency outside the timing
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn()
    if last is not None:
        _sync(last)
    return (time.perf_counter() - t0) / iters


def bench_spec_roundtrip(quick):
    """Config 1: spec->ispec round trip of a 512x512 RGB image."""
    import jax

    from dspfun_tpu.core.precision import Precision
    from dspfun_tpu.models.spec_pipeline import SpecChainParams, spec_forward, spec_inverse

    n = 128 if quick else 512
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.random((n, n, 3)).astype(np.float32))
    params = SpecChainParams.template("flat")
    prec = Precision(coeff="float32", intermediate="hilo")

    fwd = jax.jit(lambda x: spec_forward(x, params, prec))
    inv = jax.jit(lambda f, dc: spec_inverse(f, params, dc=dc, precision=prec))

    def run():
        f, dc = fwd(img)
        return inv(f, dc)

    dt = _time(run)
    y = run()
    err = float(np.max(np.abs(np.asarray(y) - np.asarray(img))))
    return {
        "metric": f"spec+ispec round-trip {n}x{n} RGB",
        "value": round(n * n / dt / 1e6, 2), "unit": "MP/s",
        "max_abs_err": err,
    }


def bench_zoom(quick):
    """Config 2: 4x DCT-basis upscale of a 1080p image, linear light."""
    import jax

    from dspfun_tpu.io.color import srgb_decode, srgb_encode
    from dspfun_tpu.models import zoom_pipeline as zp

    h, w = (270, 480) if quick else (1080, 1920)
    rng = np.random.default_rng(1)
    img = rng.random((h, w, 3))
    spec = zp.forward_spectrum(srgb_decode(img))

    def run():
        f = zp.zoom_frame_device(spec, "interpolated", (4, 1), (4, 1),
                                 0, 0, w * 2, h * 2)
        return srgb_encode(f, jax.numpy)

    dt = _time(run, iters=3)
    return {
        "metric": f"zoom 4x of {w}x{h} linear-light (per {w*2}x{h*2} frame)",
        "value": round((2 * w) * (2 * h) / dt / 1e6, 2), "unit": "out MP/s",
    }


def bench_applybasis(quick):
    """Config 3: render 8x8 and 16x16 DCT basis grids + apply to image."""
    from dspfun_tpu.models import basis_pipeline as bp

    t0 = time.perf_counter()
    for size in (8, 16):
        grid = bp.gen_basis_grid("dct2", (size, size))
        bp.render_grid(bp.realize(grid[..., None].repeat(3, -1), "real"))
    gen_dt = time.perf_counter() - t0

    n = 16 if quick else 64
    rng = np.random.default_rng(2)
    img = rng.random((n, n, 3))

    def run():
        return bp.apply_basis(img, "dct2", terms=(n, n), partsum=(n, n))

    run()
    t0 = time.perf_counter()
    run()
    ap_dt = time.perf_counter() - t0
    return {
        "metric": f"applybasis full {n}x{n} DCT + genbasis 8/16 grids",
        "value": round(1.0 / ap_dt, 2), "unit": "transforms/s",
        "genbasis_ms": round(gen_dt * 1e3, 1),
    }


def bench_scan(quick):
    """Config 4: progressive zigzag reconstruction of a 256x256 image."""
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
                        chunk=32, precision=prec)

    def run():
        frames = 0
        for _, res in sp.scan_chunks(plan, coeffs):
            frames += res.sums.shape[0]
        return None

    run()
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return {
        "metric": f"scan zigzag {n}x{n}, {plan.nframes} frames step=4",
        "value": round(plan.nframes / dt, 1), "unit": "frames/s",
        "pruned": plan.use_pruned,
    }


def bench_motion(quick):
    """Config 5: 3-D lowpass+scale of 640x360 video over 16-frame cubes."""
    import jax
    import jax.numpy as jnp

    from dspfun_tpu.models import motion_pipeline as mp

    w, h, d = (320, 180, 8) if quick else (640, 360, 16)
    g = mp.plan_geometry(w, h, d, 1, block=mp.Dims(16, 16, d),
                         bp_end=mp.Dims(8, 8, 4))[0]
    params = mp.MotionParams(boost=1.25, damp=0.0)
    plans = mp.make_plans(g)
    rng = np.random.default_rng(4)
    frames = rng.random((d, h, w)).astype(np.float32) * 255
    blocks = jax.device_put(mp.frames_to_blocks(frames, g))
    nb = blocks.shape[0]
    bc = (jax.device_put(np.arange(nb, dtype=np.int32) % g.nblocks.w),
          jax.device_put(np.arange(nb, dtype=np.int32) // g.nblocks.w))
    plans = jax.device_put(plans)
    bz = jnp.asarray(0)

    # chain slabs (output feeds input) so each step depends on the
    # previous; a single scalar fetch syncs the chain — per-dispatch
    # sync round-trips would otherwise dominate on remote devices
    out, _ = mp.filter_blocks(blocks, plans, bc, bz, geom=g,
                              params=params, plane_index=0, nplanes=1)
    _sync(out)
    iters = 10
    t0 = time.perf_counter()
    cur = blocks
    for _ in range(iters):
        cur, _ = mp.filter_blocks(cur, plans, bc, bz, geom=g,
                                  params=params, plane_index=0, nplanes=1)
    _sync(cur)
    dt = (time.perf_counter() - t0) / iters
    fps = d / dt

    # single-core FFTW-proxy baseline: the same 3-D DCT+filter+IDCT per
    # block with pocketfft (BASELINE.md: ">10x single-core FFTW" target)
    import scipy.fft  # noqa: PLC0415

    nb_blocks = np.asarray(blocks)
    mask = np.ones((g.block.d, g.block.h, g.block.w))
    mask[4:, :, :] = 0
    t0 = time.perf_counter()
    F = scipy.fft.dctn(nb_blocks.astype(np.float64), type=2, axes=(1, 2, 3),
                       workers=1) * mask[None]
    _ = scipy.fft.dctn(F, type=3, axes=(1, 2, 3), workers=1)
    base_dt = time.perf_counter() - t0
    base_fps = d / base_dt
    return {
        "metric": f"motion 3-D lowpass {w}x{h} {d}-frame cubes (16x16x{d} blocks)",
        "value": round(fps, 1), "unit": "frames/s",
        "Mpel/s": round(w * h * fps / 1e6, 1),
        "vs_fftw_1core": round(fps / base_fps, 1),
    }


CONFIGS = {
    1: bench_spec_roundtrip,
    2: bench_zoom,
    3: bench_applybasis,
    4: bench_scan,
    5: bench_motion,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()
    for idx in (int(t) for t in args.configs.split(",")):
        try:
            res = CONFIGS[idx](args.quick)
            print(json.dumps(res), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"config": idx, "error": str(e)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
