#!/usr/bin/env python
"""Round-4 slab-batching calibration for the motion i8-kron fast path.

Config 5's pruned i8-kron chain runs two int8 digit contractions per
16-frame slab: [M, 4096] x kp2[S=256, 4096] -> [M, 256], then
[M, 256] x kp3[4096, 256] -> [M, 4096] with M = nblocks ~ 920.  The
roofline table (docs/NUMERICS.md) puts it at ~35% of the int8 peak and
attributes the gap to short M tiles underfilling the MXU pipeline.

Hypothesis: batching B slabs per dispatch (M -> B*M) amortises the
pipeline ramp and the weight-tile streaming.  This script measures
filter_blocks per-block time at B in {1, 2, 4, 8} on the real chip
(identical math — blocks are independent across slabs).

Run: nohup python benchmarks/calib_r4_slabbatch.py > /tmp/slabbatch.log 2>&1 &
(first blocking sync on the tunnel takes 10-13 min; ONE TPU process at
a time.)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dspfun_tpu  # noqa: F401,E402  (platform pinning)
import jax
import jax.numpy as jnp

from benchmarks.timing import time_fori
from dspfun_tpu.models import motion_pipeline as mp


def main():
    w, h, d = 640, 360, 16
    g = mp.plan_geometry(w, h, d, 1, block=mp.Dims(16, 16, d),
                         bp_end=mp.Dims(8, 8, 4))[0]
    params = mp.MotionParams(boost=1.25, damp=0.0)
    plans = (*mp.make_plans(g), mp.maybe_kron_plans(g, params))
    rng = np.random.default_rng(4)
    frames = rng.random((d, h, w)).astype(np.float32) * 255
    one = mp.frames_to_blocks(frames, g)
    nb1 = one.shape[0]
    plans = jax.device_put(plans)
    bz = jnp.asarray(0)
    print(f"one slab: {nb1} blocks of {g.block}", flush=True)

    results = {}
    for B in (1, 2, 4, 8):
        blocks = jax.device_put(np.concatenate([one] * B, axis=0))
        nb = blocks.shape[0]
        bc = (jax.device_put(np.arange(nb, dtype=np.int32) % g.nblocks.w),
              jax.device_put(np.arange(nb, dtype=np.int32) // g.nblocks.w))

        def step(cur):
            out, _ = mp.filter_blocks(cur, plans, bc, bz, geom=g,
                                      params=params, plane_index=0,
                                      nplanes=1)
            return out * 0.5

        dt, band = time_fori(step, blocks, iters=32)
        per_slab_us = dt / B * 1e6
        fps = B * d / dt
        results[B] = per_slab_us
        print(f"B={B}: {dt*1e6:9.1f} us/iter = {per_slab_us:8.1f} us/slab "
              f"({fps:,.0f} fps) band {band[0]*1e6:.1f}-{band[1]*1e6:.1f} us "
              f"path={mp.LAST_FAST_PATH}", flush=True)

    print(json.dumps({"per_slab_us": results}), flush=True)


if __name__ == "__main__":
    main()
