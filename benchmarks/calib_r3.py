#!/usr/bin/env python
"""Round-3 precision-mode calibration on the real TPU.

Measures error + throughput for the tolerance-budgeted fast paths:
  * fused 4K chain: f32/HIGHEST (round-2 default) vs f32+tol (HIGH +
    rank-1 DC split) vs hilo+tol
  * 512^2 spec round trip: exact vs exact@1e-5 (budgeted digits)

Timing uses two-point fori_loop subtraction (the axon tunnel adds
~30 ms fixed cost per dispatch — CLAUDE.md).
"""

import json
import time

import numpy as np
import scipy.fft

import jax


def chain_time(fn, args, iters):
    """Per-iteration seconds of fn(x, *rest) -> like x, two-point."""
    probe = jax.jit(lambda a: a.reshape(-1)[0])

    def run(n):
        @jax.jit
        def f(a, *rest):
            return jax.lax.fori_loop(0, n, lambda i, v: fn(v, *rest), a)

        _ = jax.device_get(probe(f(*args)))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _ = jax.device_get(probe(f(*args)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(iters), run(2 * iters)
    dt = (t2 - t1) / iters
    return dt if dt > 0 else t2 / (2 * iters)


def main():
    from dspfun_tpu.core.precision import Precision
    from dspfun_tpu.models.fused import filter_plans, fused_filter_2d, lowpass_mask
    from dspfun_tpu.models.spec_pipeline import SpecChainParams, spec_forward, spec_inverse

    results = {}
    dev = str(jax.devices()[0])
    print("device:", dev, flush=True)

    # ---- fused 4K chain ----
    h, w, c = 2160, 3840, 3
    rng = np.random.default_rng(0)
    x_np = rng.random((h, w, c)).astype(np.float32)
    mask_np = lowpass_mask((h, w), cutoff=0.25, boost=1.25, damp=0.0)[:, :, None].astype(np.float32)
    xd = x_np.astype(np.float64)
    ref = scipy.fft.dctn(xd, type=2, axes=(0, 1), workers=-1)
    ref *= mask_np
    ref = scipy.fft.dctn(ref, type=3, axes=(0, 1), workers=-1) / (4.0 * w * h)

    x = jax.device_put(x_np)
    m = jax.device_put(mask_np)

    for name, p in [
        ("f32_HIGHEST", Precision(intermediate="f32")),
        ("f32_tol1e-5", Precision(intermediate="f32", tol=1e-5)),
        ("hilo_tol1e-5", Precision(intermediate="hilo", tol=1e-5)),
        ("f32_tol1e-6", Precision(intermediate="f32", tol=1e-6)),
    ]:
        plans = jax.device_put(filter_plans((h, w), p))
        fn = lambda a, mm, pl: fused_filter_2d(a, mm, pl, p)  # noqa: E731
        y = jax.jit(fn)(x, m, plans)
        err = float(np.max(np.abs(np.asarray(y, np.float64) - ref)))
        dt = chain_time(fn, (x, m, plans), 5)
        mps = h * w / dt / 1e6
        results[f"fused4k_{name}"] = {"err": err, "MP/s": round(mps, 2)}
        print(f"fused4k {name:14s} err={err:.3e}  {mps:8.2f} MP/s", flush=True)

    # ---- 512^2 spec round trip (suite config 6 shape: copy template) ----
    n = 512
    img = rng.random((n, n, 3)).astype(np.float32)
    params = SpecChainParams.template("copy")
    xi = jax.device_put(img)

    for name, p in [
        ("exact_full", Precision(intermediate="exact")),
        ("exact_tol1e-5", Precision(intermediate="exact", tol=1e-5)),
        ("exact_tol1e-6", Precision(intermediate="exact", tol=1e-6)),
    ]:
        def rt(a, p=p):
            f, dc = spec_forward(a, params, p)
            return spec_inverse(f, params, dc=dc, precision=p)

        y = jax.jit(rt)(xi)
        err = float(np.max(np.abs(np.asarray(y, np.float64) - img.astype(np.float64))))
        dt = chain_time(rt, (xi,), 20)
        mps = n * n / dt / 1e6
        results[f"spec512_{name}"] = {"err": err, "MP/s": round(mps, 2)}
        print(f"spec512 {name:14s} err={err:.3e}  {mps:8.2f} MP/s", flush=True)

    with open("/tmp/calib_r3.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("WROTE /tmp/calib_r3.json", flush=True)


if __name__ == "__main__":
    main()
