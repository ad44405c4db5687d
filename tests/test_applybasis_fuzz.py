"""applybasis forward-render fuzz vs a straight numpy transcription of
the reference render loop (applybasis.c:396-441): basis kernels,
partial sums, offsets, the rescale pair with two-point interpolation,
range display encodings, and the tiled scale/padding layout.  The
shift2 display aliasing bug (round 4) was exactly the kind of semantic
this oracle pins."""

import math

import numpy as np
import pytest

from dspfun_tpu.io import images
from dspfun_tpu.tools import applybasis as applybasis_tool

SQRT2 = math.sqrt(2.0)


def _fn(name):
    """Reference basis kernels (applybasis.c:77-140), scalar form."""
    def dft(k, n, N):
        return np.exp(-2j * np.pi * k * n / N)

    def dct2(k, n, N):
        return math.cos(math.pi * k * (2 * n + 1) / (2 * N))

    def dst2(k, n, N):
        return math.sin(math.pi * (k + 1) * (2 * n + 1) / (2 * N))

    def dht(k, n, N):
        return SQRT2 * math.cos(2 * math.pi * n * k / N - math.pi / 4)

    def wht(k, n, N):
        bits = int(math.log2(N))
        sig = (n & (k >> (bits - 1))) & 1
        b, nn = bits - 1, n >> 1
        while b:
            sig += (nn & ((k >> (b - 1)) + (k >> b))) & 1
            b -= 1
            nn >>= 1
        return (-1.0) ** sig

    return {"DFT": dft, "DCT2": dct2, "DST2": dst2, "DHT": dht,
            "WHT": wht}[name]


def oracle_forward(pixels, function, terms, partsum, offset, rng_kind,
                   rescale_kinds, scale, padding, bg=(0.0, 0.0, 0.0)):
    """[H, W, 3] pixels -> the rendered forward grid (float RGB)."""
    in_h, in_w = pixels.shape[:2]
    f = _fn(function)
    px = pixels.astype(np.float64).copy()
    if rng_kind == "shift2":
        px = px * 2 - 1
    tw, th = terms
    pw_, ph_ = partsum
    nw, nh = in_w // pw_, in_h // ph_
    coeff_scale = 1.0 * pw_ * ph_  # image input: inrange = 1

    def rescale_one(v, kind, cs):
        if kind == "linear":
            return v / cs
        if kind == "log":
            return np.copysign(np.log1p(abs(v)) / np.log1p(cs), v)
        if kind == "gain":
            s = math.sqrt(cs)
            v = v / s
            return np.copysign(np.log1p(abs(v)) / np.log1p(s), v)
        raise ValueError(kind)

    fw = tw * (nw * scale + padding) + padding
    fh = th * (nh * scale + padding) + padding
    frame = np.empty((fh, fw, 3), np.float64)
    frame[:] = bg
    for by in range(th):
        for bx in range(tw):
            for iy in range(nh):
                for ix in range(nw):
                    acc = np.zeros(3, np.complex128)
                    for sy in range(ph_):
                        for sx in range(pw_):
                            comp = (f(bx + offset[0],
                                      ix * pw_ + sx, in_w)
                                    * f(by + offset[1],
                                        iy * ph_ + sy, in_h))
                            acc += comp * px[iy * ph_ + sy,
                                             ix * pw_ + sx]
                    real = np.real(acc)
                    if len(rescale_kinds) == 1:
                        val = rescale_one(real, rescale_kinds[0],
                                          coeff_scale)
                    else:
                        a = rescale_one(real, rescale_kinds[0], coeff_scale)
                        b = rescale_one(real, rescale_kinds[1], coeff_scale)
                        NN = math.sqrt(in_w * in_h) - 1
                        nn = math.sqrt(coeff_scale) - 1
                        val = ((NN - nn) * a + nn * b) / NN
                    if rng_kind == "abs":
                        val = np.abs(val)
                    elif rng_kind == "invert":
                        val = val + (val < 0)
                    elif rng_kind in ("shift", "shift2"):
                        val = (val + 1) / 2
                    y0 = (nh * by + iy) * scale + padding * by + padding
                    x0 = (nw * bx + ix) * scale + padding * bx + padding
                    frame[y0:y0 + scale, x0:x0 + scale] = val
    return frame


CASES = [
    ("DCT2", (1, 1), (0, 0), "shift2", ("linear",), 1, 1),
    ("DCT2", (2, 2), (0, 0), "shift2", ("linear",), 1, 1),
    ("DCT2", (8, 8), (0, 0), "shift2", ("linear",), 2, 2),
    ("DCT2", (2, 2), (1, 2), "abs", ("linear",), 1, 0),
    ("DCT2", (4, 4), (0, 0), "shift", ("gain",), 1, 1),
    ("DFT", (1, 1), (0, 0), "shift2", ("linear",), 1, 1),
    ("DST2", (2, 2), (0, 0), "shift2", ("linear",), 1, 1),
    ("DHT", (1, 1), (0, 0), "abs", ("linear",), 1, 1),
    ("WHT", (2, 2), (0, 0), "shift2", ("linear",), 1, 1),
    ("DCT2", (2, 2), (0, 0), "shift2", ("linear", "log"), 1, 1),
]


@pytest.mark.parametrize(
    "function,partsum,offset,rng_kind,rescale,scale,padding", CASES,
    ids=[f"{c[0]}-u{c[1][0]}x{c[1][1]}-{c[3]}-{'_'.join(c[4])}"
         for c in CASES])
def test_forward_render_matches_oracle(tmp_path, function, partsum, offset,
                                       rng_kind, rescale, scale, padding):
    rng = np.random.default_rng(abs(__import__("zlib").crc32(f"{function}{partsum}".encode())))
    img = rng.random((8, 8, 3))
    src = str(tmp_path / "s.png")
    images.write_image(src, img)
    # PNG quantisation: feed the oracle the quantised pixels
    img_q = images.read_image(src).pixels
    out = str(tmp_path / "o.png")
    argv = ["-f", function, "-u", f"{partsum[0]}x{partsum[1]}",
            "-N", rng_kind, "-R", "".join(rescale),
            "-S", str(scale), "-p", str(padding)]
    if offset != (0, 0):
        argv += ["-O", f"{offset[0]}x{offset[1]}"]
    assert applybasis_tool.main([*argv, src, out]) == 0
    got = images.read_image(out).pixels
    # default terms = the full input dims regardless of partial-sum
    # granularity (applybasis.c:365-367); tiles are insize/partsum
    want = oracle_forward(img_q, function, (8, 8), partsum, offset,
                          rng_kind, rescale, scale, padding)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, np.clip(want, 0, 1), atol=2 / 255.0,
                               err_msg=f"{function} {partsum} {rng_kind}")
