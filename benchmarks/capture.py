#!/usr/bin/env python
"""Capture the round's benchmark artifacts in ONE process (the axon
tunnel charges ~10 min of warm-up per process): runs bench.py's main
and the full suite, writing benchmarks/results/bench_rN.json and
suite_rN.json for benchmarks/report.py.

Usage: python - < benchmarks/capture.py   (stdin form keeps cwd on
sys.path without touching PYTHONPATH — see CLAUDE.md)
"""

import contextlib
import io
import json
import os
import sys

ROUND = int(os.environ.get("DSPFUN_ROUND", "3"))
ROOT = os.path.dirname(os.path.abspath("bench.py"))
RESULTS = os.path.join("benchmarks", "results")


def main() -> int:
    os.makedirs(RESULTS, exist_ok=True)
    sys.path.insert(0, ROOT)

    import bench

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = bench.main()
    line = buf.getvalue().strip().splitlines()[-1]
    print("bench:", line, flush=True)
    assert rc == 0 and line.startswith("{")
    with open(os.path.join(RESULTS, f"bench_r{ROUND}.json"), "w") as fh:
        fh.write(line + "\n")

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "suite", os.path.join("benchmarks", "suite.py"))
    suite = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(suite)

    rows = []
    for idx in sorted(suite.CONFIGS):
        try:
            res = {"config": idx, **suite.CONFIGS[idx](False)}
        except Exception as e:  # noqa: BLE001
            res = {"config": idx, "error": str(e)[:300]}
        print("suite:", json.dumps(res), flush=True)
        rows.append(res)
    with open(os.path.join(RESULTS, f"suite_r{ROUND}.json"), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    print("CAPTURED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
