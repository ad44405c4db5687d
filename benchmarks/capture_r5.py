#!/usr/bin/env python
"""One-process round-5 TPU capture.

Chains the headline bench, the pending slab-batch calibration
(CLAUDE.md round-4 PENDING item), and the full suite in a single
process so the tunnel's per-process warm-up (10-13 min worst case) is
paid once.  Artifacts land in benchmarks/results/:

  bench_r5.json            headline JSON line (same as bench.py)
  calib_r5_slabbatch.json  per-slab us at B in {1,2,4,8}
  suite_r5.jsonl           one JSON line per suite config

Run: nohup python benchmarks/capture_r5.py > /tmp/capture_r5.log 2>&1 &
(ONE TPU process at a time; a concurrent process can poison in-flight
work with spurious backend errors.)
"""

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dspfun_tpu  # noqa: F401,E402  (platform pinning)

RESULTS = os.path.join(os.path.dirname(__file__), "results")


def _capture(fn) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fn()
    return buf.getvalue()


def main() -> int:
    os.makedirs(RESULTS, exist_ok=True)
    t0 = time.time()

    # 1. headline bench (also warms the fused chain + XLA cache)
    os.environ["DSPFUN_BENCH_CHILD"] = "1"
    import bench
    out = _capture(lambda: bench.main())
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    with open(os.path.join(RESULTS, "bench_r5.json"), "w") as f:
        f.write(line + "\n")
    print(f"[{time.time()-t0:.0f}s] bench: {line}", flush=True)

    # 2. slab-batch calibration (pending since round 4's outage)
    from benchmarks import calib_r4_slabbatch
    out = _capture(calib_r4_slabbatch.main)
    print(out, flush=True)
    jl = [ln for ln in out.splitlines() if ln.startswith("{")]
    if jl:
        with open(os.path.join(RESULTS, "calib_r5_slabbatch.json"), "w") as f:
            f.write(jl[-1] + "\n")
    print(f"[{time.time()-t0:.0f}s] calibration done", flush=True)

    # 3. full suite
    from benchmarks import suite
    sys.argv = ["suite.py"]
    out = _capture(suite.main)
    with open(os.path.join(RESULTS, "suite_r5.jsonl"), "w") as f:
        f.write(out)
    print(out, flush=True)
    print(f"[{time.time()-t0:.0f}s] suite done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
