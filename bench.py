#!/usr/bin/env python
"""Benchmark: fused 2-D DCT + filter + IDCT throughput on a 4K image.

Per BASELINE.md: the reference publishes no numbers, so the baseline is
single-core FFTW measured locally (scipy.fft/pocketfft as the proxy,
workers=1, float64 — the reference spec builds with COEFF_PRECISION=D).
Target: >10x single-core FFTW per TPU chip at <=1e-5 max abs error vs
the double-precision result.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N, ...}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import scipy.fft

    import jax
    from dspfun_tpu.core.precision import Precision
    from dspfun_tpu.models.fused import filter_plans, fused_filter_2d, lowpass_mask
    from dspfun_tpu.utils.cache import enable_compilation_cache

    # persistent XLA compilation cache (the FFTW-wisdom analogue): a
    # capture that follows any earlier run on this machine skips the
    # 20-40 s pipeline compiles, shrinking the window the driver's
    # timeout has to cover
    enable_compilation_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".dspfun-xla-cache"))

    h, w, c = 2160, 3840, 3  # 4K RGB
    rng = np.random.default_rng(0)
    x_np = rng.random((h, w, c)).astype(np.float32)
    mask_np = lowpass_mask((h, w), cutoff=0.25, boost=1.25, damp=0.0)[:, :, None]

    # host-side pieces FIRST (baseline + f64 oracle, ~10 s): once the
    # device measurement lands the JSON line prints immediately, so a
    # timeout that would clip post-processing cannot zero the capture
    xd = x_np.astype(np.float64)
    base_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ref = scipy.fft.dctn(xd, type=2, axes=(0, 1), workers=1)
        ref *= mask_np
        ref = scipy.fft.dctn(ref, type=3, axes=(0, 1), workers=1) / (4.0 * w * h)
        base_dt = min(base_dt, time.perf_counter() - t0)
    base_mps = (h * w) / base_dt / 1e6

    # i8 = int8 Ozaki digit contraction on the MXU's 2x-rate int8 path
    # (ops/int8mm.py Pallas kernels; exact int32 accumulation, ~2e-6
    # chain error) + rank-1 DC-split (mean/zero0 applied analytically)
    # + mask-support pruning — only the pass-band coefficients are
    # computed (the fused-chain generalisation of scan's pruned IDCT,
    # reference scan/scan.c:20-41; identical algebra).  Round-4 capture:
    # 3,138 MP/s median [2513-4188].  The f32 fallback at tol=1e-6
    # (pruned + split + HIGHEST) measures ~1,900 MP/s at 2.5e-7 if i8
    # ever regresses.
    precision = Precision(coeff="float32", intermediate="i8", tol=1e-5)
    # plans are host numpy; ship them to HBM once (they are the FFTW-plan
    # analogue and must not be re-uploaded per call)
    plans = jax.device_put(filter_plans((h, w), precision, mask=mask_np))
    fn = jax.jit(lambda a, m, pl: fused_filter_2d(a, m, pl, precision))

    x = jax.device_put(x_np)
    m = jax.device_put(mask_np.astype(np.float32))

    probe = jax.jit(lambda a: a.reshape(-1)[0])

    # warmup / compile (both the pipeline and the probe); if the Mosaic
    # int8 kernel cannot compile in this environment, fall back to the
    # pruned f32 chain rather than failing the bench
    try:
        y = fn(x, m, plans)
        _ = jax.device_get(probe(y))
    except Exception as e:  # noqa: BLE001
        print(f"i8 path unavailable ({str(e)[:120]}); f32 fallback",
              file=sys.stderr)
        precision = Precision(coeff="float32", intermediate="f32", tol=1e-6)
        plans = jax.device_put(filter_plans((h, w), precision, mask=mask_np))
        fn = jax.jit(lambda a, mm, pl: fused_filter_2d(a, mm, pl, precision))
        y = fn(x, m, plans)
        _ = jax.device_get(probe(y))

    # accuracy from the warm-up output (one ~100 MB D2H, ~5 s), before
    # timing, so the artifact line needs nothing after the measurement
    err = float(np.max(np.abs(np.asarray(jax.device_get(y), np.float64) - ref)))

    # Shared two-point estimator (benchmarks/timing.py): delta-sized
    # fori_loop chains, spike-confirmed stop, median over the positive
    # readings, (min, max) band for the artifact.  *0.5 keeps
    # magnitudes finite over long chains (the mask's 1.25x boost would
    # compound); the multiply fuses into the chain and is far below
    # measurement noise.
    from benchmarks.timing import time_fori

    dt, band = time_fori(lambda v: fn(v, m, plans) * 0.5, x, iters=5)
    if band is None:
        band = (dt, dt)
    spread = [(h * w) / band[1] / 1e6, (h * w) / band[0] / 1e6]
    ours_mps = (h * w) / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "megapixels/sec fused 2D DCT+filter+IDCT (4K RGB)",
                "value": round(ours_mps, 2),
                "unit": "MP/s",
                "vs_baseline": round(ours_mps / base_mps, 2),
                "baseline_MP/s": round(base_mps, 2),
                "max_abs_err_vs_f64": err,
                "spread_MP/s": [round(spread[0], 2), round(spread[1], 2)],
                "timing": "median of 5 two-point measurements",
                "device": str(jax.devices()[0]),
            }
        ),
        flush=True,
    )
    return 0


def _retrying_main() -> int:
    """The axon tunnel occasionally refuses init for a stretch
    (UNAVAILABLE: TPU backend setup/compile error); a failed backend
    init is cached for the process, so retry in fresh child processes
    rather than zeroing a whole round's capture on a transient outage.
    The JSON line is printed by the successful child only."""
    import subprocess

    env = {**os.environ, "DSPFUN_BENCH_CHILD": "1"}
    rc = 1
    for attempt in range(3):
        try:
            # a refused backend HANGS ~25-30 min in init before failing
            # (observed during the Aug-18 outage); bound each attempt so
            # one wedge cannot eat the whole capture budget.  The cap
            # comfortably covers a healthy run: worst observed warm-up
            # 13 min + bench body a few minutes.
            rc = subprocess.call([sys.executable, os.path.abspath(__file__)],
                                 env=env, timeout=2100)
        except subprocess.TimeoutExpired:
            rc = -9
        if rc == 0:
            return 0
        print(f"bench attempt {attempt + 1} failed (rc={rc})"
              + ("; retrying in 120 s" if attempt < 2 else ""),
              file=sys.stderr)
        if attempt < 2:
            time.sleep(120)
    return rc


if __name__ == "__main__":
    if os.environ.get("DSPFUN_BENCH_CHILD"):
        sys.exit(main())
    sys.exit(_retrying_main())
