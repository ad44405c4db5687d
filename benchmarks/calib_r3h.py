#!/usr/bin/env python
"""Round-3 calibration, part 8: same-session A/B of i8 tile choices on
the bench chain (same process -> tunnel variance cancels)."""

import time

import numpy as np
import scipy.fft

import jax

from dspfun_tpu.ops import int8mm


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
    p = Precision(intermediate="i8", tol=1e-5)
    plans = jax.device_put(filter_plans((h, w), p, mask=mask_np))

    orig_tiles = int8mm._tiles

    def variant(name, tiles_fn, iters=20):
        int8mm._tiles = tiles_fn
        int8mm._i8_call_left.clear_cache()
        int8mm._i8_call_right.clear_cache()
        try:
            fn = jax.jit(lambda a, mm, pl: fused_filter_2d(a, mm, pl, p))
            y = fn(x, m, plans)
            err = float(np.max(np.abs(np.asarray(y, np.float64) - ref)))
            dt = chain_time(lambda a, mm, pl: fused_filter_2d(a, mm, pl, p),
                            (x, m, plans), iters)
            mps = h * w / dt / 1e6
            print(f"{name:24s} err={err:.2e}  {mps:8.1f} MP/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAIL {str(e)[:200]}", flush=True)
        finally:
            int8mm._tiles = orig_tiles

    def t_current(mm, k):
        return orig_tiles(mm, k)

    def t_tr512_tm128(mm, k):
        tm, tr, mp = 128, 512, -(-mm // 128) * 128
        return tm, tr, mp

    def t_tr512_scorer(mm, k):
        tm, _, mp = orig_tiles(mm, k)
        tm = min(tm, 128 if k > 2400 else 256)
        mp = -(-mm // tm) * tm
        return tm, 512, mp

    variant("current (scorer,tr256)", t_current)
    variant("tm128,tr512", t_tr512_tm128)
    variant("scorer-capped,tr512", t_tr512_scorer)
    variant("current again", t_current)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
