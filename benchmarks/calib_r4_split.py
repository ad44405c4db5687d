#!/usr/bin/env python
"""Round-4 i8-chain component breakdown on the real TPU.

The 4K fused chain sits at ~50% of the int8 MXU peak (docs/NUMERICS.md
roofline).  This isolates where the other half goes: the XLA digit
splits of the x-side operands (per-slice max reduce + 3 round/sub
passes) vs the Pallas digit-product kernels themselves.

Per contraction of the 4K chain (channel-first [3, H, W], lowpass
support 540x960): measures (a) split-only and (b) full i8_contract
(split + kernel) at the four operand shapes, plus the full fused chain
for reference.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dspfun_tpu  # noqa: F401,E402  (platform pinning)
import jax
import jax.numpy as jnp

from benchmarks.timing import time_fori
from dspfun_tpu.core.precision import Precision
from dspfun_tpu.models.fused import filter_plans, fused_filter_2d, lowpass_mask
from dspfun_tpu.ops import int8mm


def main():
    if os.environ.get("DSPFUN_CALIB_SMALL"):
        h, w, sh, sw = 128, 256, 128, 128  # CPU smoke (interpret mode)
    else:
        h, w = 2160, 3840
        sh, sw = 540, 960  # lowpass 0.25 support
    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}

    # --- reference: the full chain --------------------------------------
    prec = Precision(coeff="float32", intermediate="i8", tol=1e-5)
    x_np = rng.random((h, w, 3)).astype(np.float32)
    mask_np = lowpass_mask((h, w), cutoff=0.25, boost=1.25, damp=0.0)[:, :, None]
    plans = jax.device_put(filter_plans((h, w), prec, mask=mask_np))
    m = jax.device_put(mask_np.astype(np.float32))
    fn = jax.jit(lambda a, mm, pl: fused_filter_2d(a, mm, pl, prec))
    x = jax.device_put(x_np)
    dt, band = time_fori(lambda v: fn(v, m, plans) * 0.5, x, iters=5)
    out["chain"] = {"ms": round(dt * 1e3, 3),
                    "MP/s": round(h * w / dt / 1e6, 1)}
    print(json.dumps({"chain": out["chain"]}), flush=True)

    # --- component shapes (channel-first) -------------------------------
    # c1: [sh,H]   digits x [3,H,W]    (split x along axis 1, K=H)
    # c2: [3,sh,W] x [W,sw] digits     (split along axis 2, K=W)
    # c3: [H,sh]   digits x [3,sh,sw]  (split along axis 1, K=sh)
    # c4: [3,H,sw] x [sw,W] digits     (split along axis 2, K=sw)
    shapes = {
        "c1": ((3, h, w), 1, (sh, h)),
        "c2": ((3, sh, w), 2, (sw, w)),   # right form: [M,K] with M=sw
        "c3": ((3, sh, sw), 1, (h, sh)),
        "c4": ((3, h, sw), 2, (w, sw)),
    }
    for name, (xshape, axis, (mdim, k)) in shapes.items():
        xs = jax.device_put(rng.random(xshape).astype(np.float32))

        # split-only: returns digits + scale; fold back to f32 so the
        # fori chain carries the input shape
        def split_only(v, axis=axis):
            digs, e = int8mm._split_operand_xla(v, axis)
            acc = digs[0].astype(jnp.float32) * (2.0 ** -7)
            for i, d in enumerate(digs[1:], start=2):
                acc = acc + d.astype(jnp.float32) * (2.0 ** (-7 * i))
            return acc * e * 0.9999  # ~reconstruct; keep finite

        dts, _ = time_fori(split_only, xs, iters=8)

        # full contraction (split + kernel) at the same shape
        a_np = rng.random((mdim, k)).astype(np.float32) / np.sqrt(k)
        digs_a, sc_a = int8mm.split_matrix_i8(a_np)
        digs_a, sc_a = jax.device_put((digs_a, sc_a))

        # output shape differs from input, so chain two contractions
        # (there and back) to keep the carry shape fixed
        b_np = rng.random((k, mdim)).astype(np.float32) / np.sqrt(mdim)
        digs_b, sc_b = int8mm.split_matrix_i8(b_np)
        digs_b, sc_b = jax.device_put((digs_b, sc_b))

        def roundtrip(v, axis=axis):
            y = int8mm.i8_contract(v, digs_a, sc_a, axis)
            z = int8mm.i8_contract(y, digs_b, sc_b, axis)
            return z * 0.5

        dtc, _ = time_fori(roundtrip, xs, iters=8)
        row = {"split_ms": round(dts * 1e3, 3),
               "pair_contract_ms": round(dtc * 1e3, 3)}
        out[name] = row
        print(json.dumps({name: row}), flush=True)

    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
