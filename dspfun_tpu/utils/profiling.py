"""Tracing and per-stage timing.

The reference has no profiling beyond carriage-return progress counters
(SURVEY.md section 5).  Here every CLI accepts DSPFUN_PROFILE=<dir> to
capture a jax.profiler trace (viewable in TensorBoard/Perfetto), and
DSPFUN_TIMINGS=1 to print per-stage wall times to stderr.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

__all__ = ["maybe_profile", "stage", "timings_enabled"]


def timings_enabled() -> bool:
    return os.environ.get("DSPFUN_TIMINGS", "") not in ("", "0")


@contextlib.contextmanager
def maybe_profile():
    """Capture a device trace when DSPFUN_PROFILE=<dir> is set."""
    trace_dir = os.environ.get("DSPFUN_PROFILE")
    if not trace_dir:
        yield
        return
    import jax  # noqa: PLC0415

    with jax.profiler.trace(trace_dir):
        yield
    print(f"profile trace written to {trace_dir}", file=sys.stderr)


@contextlib.contextmanager
def stage(name: str):
    """Per-stage wall timing (printed when DSPFUN_TIMINGS is set)."""
    if not timings_enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        print(f"[dspfun] {name}: {dt * 1000:.1f} ms", file=sys.stderr)
