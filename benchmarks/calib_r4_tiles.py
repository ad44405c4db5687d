#!/usr/bin/env python
"""Round-4 int8-kernel tile sweep on the real TPU.

The split-cost breakdown (calib_r4_split.py) showed the digit splits
are only ~13% of the 4K chain; the kernels themselves run at 54-89%
of the int8 peak depending on shape.  This sweeps (tm, tr) per chain
stage shape to see whether per-shape tiles beat the fixed tr=256 +
padding-heuristic tm (ops/int8mm._tiles).

Pure-kernel timing: digits pre-split, iterations serialized through a
one-element data dependence (no split or scale work in the chain).
"""

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dspfun_tpu  # noqa: F401,E402
import jax
import jax.numpy as jnp

from benchmarks.timing import time_fori
from dspfun_tpu.ops import int8mm

VMEM_BUDGET = 14_000_000  # leave headroom under the ~16 MB scope


def pad_to(a, axis, mult):
    n = a.shape[axis]
    m = -(-n // mult) * mult
    if m == n:
        return a
    w = [(0, 0)] * a.ndim
    w[axis] = (0, m - n)
    return np.pad(a, w)


def sweep(name, form, m, k, b, r):
    rng = np.random.default_rng(1)
    a_np = (rng.random((m, k)) - 0.5) / math.sqrt(k)
    ad_np, _ = int8mm.split_matrix_i8(a_np)          # [3, m, kp]
    kp = ad_np.shape[2]
    x_np = (rng.random((b, r, k)) - 0.5).astype(np.float32) if form == "right" \
        else (rng.random((b, k, r)) - 0.5).astype(np.float32)
    # device split once (values irrelevant; dtype/layout matter)
    if form == "right":
        xpad = np.pad(x_np, ((0, 0), (0, 0), (0, kp - k)))
        xd_np = [np.clip(np.round(xpad * 64), -64, 64).astype(np.int8)] * 3
    else:
        xpad = np.pad(x_np, ((0, 0), (0, kp - k), (0, 0)))
        xd_np = [np.clip(np.round(xpad * 64), -64, 64).astype(np.int8)] * 3

    results = {}
    macs = m * k * r * b * 6  # physical int8 MACs (6 digit pairs)
    for tm in (128, 256, 384, 512):
        mp = -(-m // tm) * tm
        ads = [jax.device_put(jnp.asarray(pad_to(d, 0, tm))) for d in ad_np]
        for tr in (128, 256, 512):
            vmem = (tm * kp + tr * kp) * 3 * 2 + tm * tr * 4
            if vmem > VMEM_BUDGET:
                results[f"tm{tm}_tr{tr}"] = "vmem-skip"
                continue
            ax = 1 if form == "right" else 2
            xds = tuple(jax.device_put(jnp.asarray(pad_to(d, ax, tr)))
                        for d in xd_np)
            call = int8mm._i8_call_right if form == "right" \
                else int8mm._i8_call_left

            interp = int8mm._use_interpret()

            def step(xt, ads=ads, call=call, tm=tm, tr=tr, interp=interp):
                y = call(*ads, *xt, tm=tm, tr=tr, interpret=interp)
                flag = (y[0, 0, 0] > 1e30).astype(jnp.int8)
                x0 = xt[0].at[0, 0, 0].add(flag)
                return (x0,) + xt[1:]

            try:
                dt, band = time_fori(step, xds, iters=8)
                tops = macs * 2 / dt / 1e12
                results[f"tm{tm}_tr{tr}"] = {
                    "us": round(dt * 1e6, 1), "TOPS": round(tops, 1),
                    "pct_peak": round(100 * tops / 394, 1)}
            except Exception as e:  # noqa: BLE001
                results[f"tm{tm}_tr{tr}"] = f"fail: {str(e)[:60]}"
            print(json.dumps({name: {f"tm{tm}_tr{tr}":
                                     results[f"tm{tm}_tr{tr}"]}}),
                  flush=True)
    cur_tm, cur_tr, _ = int8mm._tiles(m, kp)
    results["current"] = f"tm{cur_tm}_tr{cur_tr}"
    return results


def main():
    out = {"device": str(jax.devices()[0])}
    # the 4K chain stages (channel-first, lowpass 540x960 support)
    stages = {
        "c1_left_M540_K2160": ("left", 540, 2160, 3, 3840),
        "c2_right_M960_K3840": ("right", 960, 3840, 1, 1620),
        "c3_left_M2160_K540": ("left", 2160, 540, 3, 960),
        "c4_right_M3840_K960": ("right", 3840, 960, 1, 6480),
    }
    if os.environ.get("DSPFUN_CALIB_SMALL"):
        stages = {"s1_left": ("left", 130, 256, 2, 256),
                  "s2_right": ("right", 256, 130, 1, 256)}
    for name, args in stages.items():
        out[name] = sweep(name, *args)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
