#!/usr/bin/env python
"""Round-4 config-1 formulation calibration on the real TPU.

The suite's 8x8-blockwise spec round trip (BASELINE.md:31) currently
contracts axes 1/3 of [64,8,64,8,3] with [8,8] plans — K=8 contractions
that waste the 128-wide MXU.  The Kronecker-folded form (ops/blockdct)
batches all blocks as [NB, 64] @ [64, 64] with the diagonal spec
multipliers folded into the operators — same observable chain
(spectrum -> flat encode -> decode -> inverse), K=64.

Variants (all produce the identical chain output, error vs the f64
pocketfft oracle is printed for each):
  peraxis-hilo   : the current suite formulation
  kron-hilo      : folded [64,64] operators, hilo accumulation
  kron-f32       : folded, f32/HIGHEST (one matmul per direction)
  kron-exact     : folded, error-free bf16 digit contraction
"""

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dspfun_tpu  # noqa: F401,E402  (platform pinning)
import jax
import jax.numpy as jnp

from dspfun_tpu.core.precision import Precision
from dspfun_tpu.core.transforms import apply_plan, plan_axis, plan_matrix, uniform_grid
from dspfun_tpu.ops.blockdct import blocks_from_array, blocks_to_array, kron_dct_matrix


def chain_time(fn, x0, iters=512):
    probe = jax.jit(lambda a: a.reshape(-1)[0])

    def run(n):
        @jax.jit
        def f(a):
            return jax.lax.fori_loop(0, n, lambda i, v: fn(v), a)

        _ = jax.device_get(probe(f(x0)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = jax.device_get(probe(f(x0)))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(iters), run(2 * iters)
    dt = (t2 - t1) / iters
    return dt if dt > 0 else t2 / (2 * iters)


def oracle(img, n=8):
    import scipy.fft

    h, w, c = img.shape
    gain = 127.5 * math.sqrt(4 * n * n)
    grid = np.sqrt(2.0) ** (
        (np.arange(n) != 0)[:, None] + (np.arange(n) != 0)[None, :]
    )
    b = img.reshape(h // n, n, w // n, n, c).astype(np.float64)
    F = scipy.fft.dctn(b, type=2, axes=(1, 3), workers=1)
    f = F * (grid * (gain / (4.0 * n * n)))[None, :, None, :, None]
    stored = (f / (2 * gain) + 0.5) * 254 / 255
    f2 = (stored * 255 / 254 - 0.5) * (2 * gain)
    f2 = f2 / (grid * gain)[None, :, None, :, None]
    y = scipy.fft.dctn(f2, type=3, axes=(1, 3), workers=1) / (4.0 * n * n)
    return y.reshape(h, w, c)


def main():
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) \
        if "--iters" in sys.argv else 512
    n, size = 8, 512
    rng = np.random.default_rng(0)
    img = rng.random((size, size, 3)).astype(np.float32)
    gain = 127.5 * math.sqrt(4 * n * n)
    grid = uniform_grid((n, n))
    ref = oracle(img, n)
    x = jax.device_put(img)
    out = {"device": str(jax.devices()[0])}

    # --- per-axis (current suite formulation) --------------------------
    prec = Precision(coeff="float32", intermediate="hilo")
    p2 = jax.device_put(plan_axis(n, "dct2", prec))
    p3 = jax.device_put(plan_axis(n, "dct3", prec))
    fwd_mul = jnp.asarray(
        (grid * (gain / (4.0 * n * n)))[None, :, None, :, None], jnp.float32)
    inv_mul = jnp.asarray((1.0 / (grid * gain))[None, :, None, :, None],
                          jnp.float32)

    def peraxis(xv):
        b = xv.reshape(size // n, n, size // n, n, 3)
        F = apply_plan(apply_plan(b, p2, 1, prec), p2, 3, prec)
        stored = ((F * fwd_mul) / (2 * gain) + 0.5) * 254 / 255
        f2 = (stored * 255 / 254 - 0.5) * (2 * gain) * inv_mul
        y = apply_plan(apply_plan(f2, p3, 1, prec), p3, 3, prec) / (4.0 * n * n)
        return y.reshape(size, size, 3)

    # --- kron-folded [64,64] operators ---------------------------------
    m64 = (grid * (gain / (4.0 * n * n))).reshape(n * n)
    inv64 = (1.0 / (grid * gain)).reshape(n * n)
    a_fwd = m64[:, None] * kron_dct_matrix((n, n), "dct2")
    a_inv = (kron_dct_matrix((n, n), "dct3") * inv64[None, :]) / (4.0 * n * n)

    def make_kron(p):
        kf = jax.device_put(plan_matrix(a_fwd, p))
        ki = jax.device_put(plan_matrix(a_inv, p))

        def kron(xv):
            b = blocks_from_array(xv, (n, n))
            stored = (apply_plan(b, kf, 1, p) / (2 * gain) + 0.5) * 254 / 255
            f2 = (stored * 255 / 254 - 0.5) * (2 * gain)
            y = apply_plan(f2, ki, 1, p)
            return blocks_to_array(y, (n, n), size, size, 3)

        return kron

    # --- block-diagonal planar form -------------------------------------
    # Planar [C, H, W] with W on the lane axis; the blockwise DCT along
    # an axis is ONE dense [S, S] matmul with I_{S/n} (x) D8 and the
    # separable diag factors folded in — no reshapes, no transposes.
    from dspfun_tpu.core import basis as basis_mod

    g8 = np.sqrt(2.0) ** (np.arange(n) != 0)        # grid = g8 (x) g8
    sf = math.sqrt(gain / (4.0 * n * n))            # fwd scalar, per axis
    si = math.sqrt(1.0 / (gain * 4.0 * n * n))      # inv scalar, per axis
    eye = np.eye(size // n)
    bf = np.kron(eye, (g8[:, None] * basis_mod.dct2_matrix(n)) * sf)
    bi = np.kron(eye, (basis_mod.dct3_matrix(n) * (1.0 / g8)[None, :]) * si)
    ximg_pl = jax.device_put(np.moveaxis(img, -1, 0).copy())

    def make_bdiag(p):
        pf = jax.device_put(plan_matrix(bf, p))
        pi = jax.device_put(plan_matrix(bi, p))

        def bdiag(xv):                       # [3, H, W] -> [3, H, W]
            F = apply_plan(apply_plan(xv, pf, 1, p), pf, 2, p)
            stored = (F / (2 * gain) + 0.5) * 254 / 255
            f2 = (stored * 255 / 254 - 0.5) * (2 * gain)
            return apply_plan(apply_plan(f2, pi, 1, p), pi, 2, p)

        return bdiag

    variants = {
        "peraxis-hilo": (peraxis, x, False),
        "kron-hilo": (make_kron(prec), x, False),
        "kron-f32": (make_kron(Precision(coeff="float32",
                                         intermediate="f32")), x, False),
        "kron-exact": (make_kron(Precision(coeff="float32",
                                           intermediate="exact")), x, False),
        "bdiag-hilo": (make_bdiag(prec), ximg_pl, True),
        "bdiag-f32": (make_bdiag(Precision(coeff="float32",
                                           intermediate="f32")),
                      ximg_pl, True),
        "bdiag-i8": (make_bdiag(Precision(coeff="float32",
                                          intermediate="i8")),
                     ximg_pl, True),
    }
    for name, (fn, x0, planar) in variants.items():
        got = np.asarray(jax.jit(fn)(x0))
        if planar:
            got = np.moveaxis(got, 0, -1)
        err = float(np.max(np.abs(got - ref)))
        dt = chain_time(fn, x0, iters=iters)
        out[name] = {"us": round(dt * 1e6, 1),
                     "MP/s": round(size * size / dt / 1e6, 1),
                     "err_vs_f64": err}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
