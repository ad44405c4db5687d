"""draw — draw DCT coefficients directly on a canvas.

CLI-compatible rebuild of reference applybasis/draw.c.
"""

from __future__ import annotations

import getopt
import sys

from dspfun_tpu.io import images
from dspfun_tpu.tools import parse_pair
from dspfun_tpu.models.basis_pipeline import draw_canvas

USAGE = "Usage: draw -b <WxH> [-f <XxY:strength> ...] <outfile>"

HELP = """Usage: draw -b <WxH> [-f <XxY:strength> ...] <outfile>

    Options:
  -b <WxH>           Size of the output image.
  -f <XxY:strength>  Frequency component position and value. May repeat.
"""


def main(argv: list[str] | None = None) -> int:
    from dspfun_tpu.core.precision import apply_tool_default  # noqa: PLC0415

    apply_tool_default("draw")
    argv = sys.argv[1:] if argv is None else argv
    try:
        flags, args = getopt.gnu_getopt(argv, "b:f:h")
    except getopt.GetoptError as e:
        print(e, file=sys.stderr)
        print(USAGE, file=sys.stderr)
        return 1

    size = (512, 512)
    coefs: list[tuple[int, int, float | None]] = []
    try:
        for flag, arg in flags:
            if flag == "-h":
                print(HELP)
                return 0
            if flag == "-b":
                size = parse_pair(arg)
            elif flag == "-f":
                pos, _, strength = arg.partition(":")
                x, y = parse_pair(pos)
                coefs.append((x, y, float(strength) if strength else None))
    except ValueError as e:
        print(e, file=sys.stderr)
        print(USAGE, file=sys.stderr)
        return 1
    for x, y, _ in coefs:
        if not (0 <= x < size[0] and 0 <= y < size[1]):
            print(f"coefficient ({x},{y}) outside the {size[0]}x{size[1]} "
                  "canvas", file=sys.stderr)
            return 1

    outfile = None
    if args:
        outfile = args[0]
    elif sys.stdout.isatty():
        outfile = "sixel:-"
    else:
        print(USAGE, file=sys.stderr)
        return 1

    canvas = draw_canvas(size, coefs)
    try:
        images.write_image(outfile, canvas[..., None], channels="I")
    except Exception as e:  # noqa: BLE001
        print(e, file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    from dspfun_tpu.tools import run_main

    run_main(main)
