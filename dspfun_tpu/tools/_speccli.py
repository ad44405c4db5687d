"""Shared spec/ispec CLI option processing (reference spec/spec.h:81-155)."""

from __future__ import annotations

import dataclasses
import sys

from dspfun_tpu.models.spec_pipeline import SpecChainParams

SPECTYPES = ("abs", "shift", "flat", "sign", "copy")
SIGNTYPES = ("abs", "shift", "saturate", "retain")
RANGETYPES = ("one", "dc", "dcs")
SCALETYPES = ("linear", "log")
GAINTYPES = ("native", "reference", "custom")


@dataclasses.dataclass
class SpecOpts:
    gamma: bool = False
    csp: str = "RGB"
    input: str = "-"
    output: str = "-"
    params: SpecChainParams = dataclasses.field(default_factory=SpecChainParams)


def spec_opt_proc(opts: SpecOpts, flag: str, arg: str) -> bool:
    """Process one spec option; returns False on invalid input
    (reference spec/spec.h:112-155)."""
    p = opts.params
    if flag == "-g":
        opts.gamma = True
    elif flag == "-c":
        opts.csp = arg
    elif flag == "-t":
        if arg not in SPECTYPES:
            print(f"Invalid spectrogram type '{arg}', use one of: {' '.join(SPECTYPES)}", file=sys.stderr)
            return False
        opts.params = SpecChainParams.template(arg, gain=p.gain)
    elif flag == "-R":
        if arg not in RANGETYPES:
            print(f"Invalid range type '{arg}', use one of: {' '.join(RANGETYPES)}", file=sys.stderr)
            return False
        opts.params = dataclasses.replace(p, rangetype=arg)
    elif flag == "-T":
        if arg not in SCALETYPES:
            print(f"Invalid scale type '{arg}', use one of: {' '.join(SCALETYPES)}", file=sys.stderr)
            return False
        opts.params = dataclasses.replace(p, scaletype=arg)
    elif flag == "-S":
        if arg not in SIGNTYPES:
            print(f"Invalid sign type '{arg}', use one of: {' '.join(SIGNTYPES)}", file=sys.stderr)
            return False
        opts.params = dataclasses.replace(p, signtype=arg)
    elif flag == "-G":
        if arg in GAINTYPES:
            opts.params = dataclasses.replace(p, gaintype=arg)
        else:
            try:
                opts.params = dataclasses.replace(p, gaintype="custom", gain=float(arg))
            except ValueError:
                print(f"Invalid gain type '{arg}', use a numeric value or one of: {' '.join(GAINTYPES)}", file=sys.stderr)
                return False
    else:
        return False
    return True


SPEC_HELP = """spectrogram options:
  -g             Generate in linear light
  -c <channels>  Color channels to use. [default: RGB]
  -t <template>  Spectrogram template. [default: abs]
                 values: abs shift flat sign copy
  -R <range>     Range to scale coefficients to. [default: dc]
                 values: one dc dcs
  -T <scale>     How to scale coefficients. [default: log]
                 values: linear log
  -S <sign>      How to represent signed values. [default: abs]
                 values: abs shift saturate retain
  -G <gain>      Multiplier for scaling. [default: native]
                 values: native reference custom (float)"""


def resolve_io(args: list[str], opts: SpecOpts) -> bool:
    """Positional input/output with the reference's tty rules
    (spec/spec.c:32-42): stdin refused on a tty; stdout defaults to
    sixel on a tty."""
    if args:
        opts.input = args[0]
    elif sys.stdin.isatty():
        return False
    if len(args) > 1:
        opts.output = args[1]
    elif sys.stdout.isatty():
        opts.output = "sixel:-"
    return True
