"""dspfun — dispatcher for the ten tool CLIs.

The reference installs ten separate binaries (top-level Makefile);
this framework additionally provides a single ``dspfun <tool>``
dispatcher alongside per-tool entry points.
"""

from __future__ import annotations

import importlib
import sys

TOOLS = {
    "spec": "dspfun_tpu.tools.spec",
    "ispec": "dspfun_tpu.tools.ispec",
    "motion": "dspfun_tpu.tools.motion",
    "rotate": "dspfun_tpu.tools.rotate",
    "transcode": "dspfun_tpu.tools.transcode",
    "applybasis": "dspfun_tpu.tools.applybasis",
    "genbasis": "dspfun_tpu.tools.genbasis",
    "draw": "dspfun_tpu.tools.draw",
    "zoom": "dspfun_tpu.tools.zoom",
    "scan": "dspfun_tpu.tools.scan",
}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("Usage: dspfun <tool> [options]\n\ntools:", file=sys.stderr)
        for name in TOOLS:
            print(f"   {name}", file=sys.stderr)
        return 0 if argv else 1
    name = argv[0]
    if name not in TOOLS:
        print(f"unknown tool {name!r}; available: {' '.join(TOOLS)}",
              file=sys.stderr)
        return 1
    mod = importlib.import_module(TOOLS[name])
    return mod.main(argv[1:])


if __name__ == "__main__":
    from dspfun_tpu.tools import run_main

    run_main(main)
