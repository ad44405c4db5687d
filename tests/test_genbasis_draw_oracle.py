"""genbasis/draw value-level oracles — straight numpy transcriptions
of the reference render loops (genbasis.c:227-272, draw.c:58-81),
completing the per-tool oracle set."""

import math

import numpy as np
import pytest
import scipy.fft

from dspfun_tpu.io import images
from dspfun_tpu.tools import draw as draw_tool
from dspfun_tpu.tools import genbasis as genbasis_tool

SQRT2 = math.sqrt(2.0)


def _fn(name):
    def dct2(k, n, N):
        return math.cos(math.pi * k * (2 * n + 1) / (2 * N))

    def dst2(k, n, N):
        return math.sin(math.pi * (k + 1) * (2 * n + 1) / (2 * N))

    def dft(k, n, N):
        return np.exp(-2j * np.pi * k * n / N)

    return {"DCT2": dct2, "DST2": dst2, "DFT": dft}[name]


def oracle_genbasis(function, size, terms, offset, natural, inverse,
                    plane, scale, padding, bg):
    sw, sh = size
    tw, th = terms
    f = _fn(function)
    off = list(offset)
    if natural:
        off[0] -= tw // 2
        off[1] -= th // 2
    fw = sw * tw * scale + padding * tw + padding
    fh = sh * th * scale + padding * th + padding
    frame = np.empty((fh, fw, 3), np.float64)
    frame[:] = bg

    def realize(v):
        # genbasis has its own realize set, each mapping through
        # (v+1)/2 (genbasis.c:21-49) — unlike applybasis's raw planes
        if plane == "real":
            return ((np.real(v) + 1) / 2,) * 3
        if plane == "imaginary":
            return ((np.imag(v) + 1) / 2,) * 3
        if plane == "magnitude":
            return ((abs(v) + 1) / 2,) * 3
        if plane == "complex":  # Re -> R, Im -> B (genbasis.c:45-49)
            return ((np.real(v) + 1) / 2, 0.0, (np.imag(v) + 1) / 2)
        raise ValueError(plane)

    for by in range(th):
        for bx in range(tw):
            for iy in range(sh):
                for ix in range(sw):
                    # inverse swaps which index is the basis argument
                    # k and which the sample (inverse == transpose)
                    if inverse:
                        comp = f(ix, bx + off[0], sw) * f(iy, by + off[1], sh)
                    else:
                        comp = f(bx + off[0], ix, sw) * f(by + off[1], iy, sh)
                    val = realize(comp)
                    y0 = (sh * by + iy) * scale + padding * by + padding
                    x0 = (sw * bx + ix) * scale + padding * bx + padding
                    frame[y0:y0 + scale, x0:x0 + scale] = val
    return np.clip(frame, 0.0, 1.0)


GB_CASES = [
    ("DCT2", (6, 4), None, (0, 0), False, False, "real", 1, 1),
    ("DCT2", (4, 4), (2, 3), (0, 0), False, False, "real", 2, 0),
    ("DCT2", (4, 4), None, (1, 1), False, False, "real", 1, 1),
    ("DFT", (4, 4), None, (0, 0), True, False, "complex", 1, 2),
    ("DFT", (4, 4), None, (0, 0), False, False, "magnitude", 1, 1),
    ("DST2", (4, 4), None, (0, 0), False, True, "real", 1, 1),
]


@pytest.mark.parametrize(
    "function,size,terms,offset,natural,inverse,plane,scale,padding",
    GB_CASES,
    ids=[f"{c[0]}-{c[6]}{'-nat' if c[4] else ''}{'-inv' if c[5] else ''}"
         for c in GB_CASES])
def test_genbasis_matches_reference_loop(tmp_path, function, size, terms,
                                         offset, natural, inverse, plane,
                                         scale, padding):
    out = str(tmp_path / "g.png")
    argv = ["-f", function, "-s", f"{size[0]}x{size[1]}",
            "-S", str(scale), "-p", str(padding)]
    if terms:
        argv += ["-t", f"{terms[0]}x{terms[1]}"]
    if offset != (0, 0):
        argv += ["-O", f"{offset[0]}x{offset[1]}"]
    if natural:
        argv += ["-n"]
    if inverse:
        argv += ["-I"]
    if plane != "real":
        argv += ["-P", plane]
    assert genbasis_tool.main([*argv, out]) == 0
    got = images.read_image(out).pixels
    # reference padding defaults: red, or the dim green complex bg
    # (genbasis.c:137,185)
    bg = (0.0625, 0.1875, 0.0625) if plane == "complex" else (1.0, 0.0, 0.0)
    want = oracle_genbasis(function, size, terms or size, offset, natural,
                           inverse, plane, scale, padding, bg)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2 / 255.0,
                               err_msg=f"{function}/{plane}")


def test_draw_matches_reference_loop(tmp_path):
    """draw.c:58-81: explicit strengths /4, remaining energy spread
    over strength-less coords, DC += 0.5, one unnormalised IDCT,
    grayscale output."""
    out = str(tmp_path / "d.png")
    assert draw_tool.main(["-b", "24x20", "-f", "2x3:0.4",
                           "-f", "5x1", "-f", "1x6", out]) == 0
    got = images.read_image(out).pixels

    coefs = np.zeros((20, 24))
    energy = 0.4
    share = (1 - energy) / 2  # two strength-less coords
    coefs[3, 2] = 0.4 / 4
    coefs[1, 5] = share / 4
    coefs[6, 1] = share / 4
    coefs[0, 0] += 0.5
    img = scipy.fft.dctn(coefs, type=3, axes=(0, 1), workers=1)
    want = np.clip(img, 0.0, 1.0)[..., None].repeat(3, axis=-1)
    np.testing.assert_allclose(got, want, atol=2 / 255.0)
