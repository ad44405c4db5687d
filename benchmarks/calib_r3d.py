#!/usr/bin/env python
"""Round-3 calibration, part 4: i8 Pallas digit-matmul fused chain at 4K."""

import json
import time

import numpy as np
import scipy.fft

import jax


def chain_time(fn, args, iters):
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

    results = {}
    print("device:", jax.devices()[0], flush=True)

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

    for name, p, use_mask, iters in [
        ("i8_pruned", Precision(intermediate="i8", tol=1e-5), True, 20),
        ("i8_dense", Precision(intermediate="i8", tol=1e-5), False, 8),
    ]:
        try:
            plans = jax.device_put(
                filter_plans((h, w), p, mask=mask_np if use_mask else None))
            fn = lambda a, mm, pl: fused_filter_2d(a, mm, pl, p)  # noqa: E731
            y = jax.jit(fn)(x, m, plans)
            err = float(np.max(np.abs(np.asarray(y, np.float64) - ref)))
            dt = chain_time(fn, (x, m, plans), iters)
            mps = h * w / dt / 1e6
            results[name] = {"err": err, "MP/s": round(mps, 2)}
            print(f"{name:14s} err={err:.3e}  {mps:8.2f} MP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:500]}
            print(f"{name:14s} FAILED: {str(e)[:300]}", flush=True)

    with open("/tmp/calib_r3d.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print("WROTE /tmp/calib_r3d.json", flush=True)


if __name__ == "__main__":
    main()
