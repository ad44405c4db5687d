"""scan frame-loop fuzz vs a straight numpy transcription of the
reference driver (scan/scan.c:289-298,380-505): DCT normalisation, DC
prefill, offset fill/skip, invert, per-step coordinate batching, frame
accumulation.  Methods' coordinate ORDER comes from our registry (each
method is separately oracled in test_scan_methods); this pins the
*driver* semantics around them."""

import numpy as np
import pytest
import scipy.fft

from dspfun_tpu.io import images, video
from dspfun_tpu.ops import scan_methods as sm
from dspfun_tpu.tools import scan as scan_tool


def oracle_scan(img, order, step, nframes, offset, fill_offset, invert):
    """[H, W, C] float pixels -> [nframes, H, W, C] accumulated frames
    (base pane, no trc)."""
    h, w, c = img.shape
    coeffs = scipy.fft.dctn(img.astype(np.float64), type=2,
                            axes=(0, 1), workers=1) / (4.0 * w * h)
    limit = order.limit
    starts = order.starts

    def coords_of(j):
        s, e = int(starts[j]), int(starts[j + 1])
        return order.ys[s:e], order.xs[s:e]

    sum_img = np.broadcast_to(coeffs[0, 0], (h, w, c)).copy()
    offset = min(offset, limit - 1) if offset else offset

    def idct_of(ys, xs):
        rec = np.zeros_like(coeffs)
        rec[ys, xs] = coeffs[ys, xs]
        rec[0, 0] = 0.0  # DC included unconditionally up front
        return scipy.fft.dctn(rec, type=3, axes=(0, 1), workers=1)

    if fill_offset and offset:
        ys_all, xs_all = [], []
        for i in range(offset):
            j = limit - i - 1 if invert else i
            ys, xs = coords_of(j)
            ys_all.append(ys)
            xs_all.append(xs)
        sum_img = sum_img + idct_of(np.concatenate(ys_all),
                                    np.concatenate(xs_all))

    frames = []
    for i in range(offset, offset + nframes):
        ys_all, xs_all = [], []
        for s in range(i * step, min(i * step + step, limit)):
            j = limit - s - 1 if invert else s
            ys, xs = coords_of(j)
            ys_all.append(ys)
            xs_all.append(xs)
        if ys_all:
            sum_img = sum_img + idct_of(
                np.concatenate(ys_all) if ys_all else np.zeros(0, int),
                np.concatenate(xs_all) if xs_all else np.zeros(0, int))
        frames.append(sum_img.copy())
    return np.stack(frames)


CASES = [
    ("zigzag", None, 3, False, 0, False),
    ("zigzag", None, 4, True, 0, False),
    ("horizontal", None, 5, False, 7, True),
    ("vertical", None, 2, False, 7, False),
    ("row", None, 1, False, 0, False),
    ("column", None, 2, True, 3, True),
    ("diagonal", None, 1, False, 0, False),
    ("mirror", None, 1, False, 2, True),
    ("box", None, 1, False, 0, False),
    ("ibox", None, 1, True, 0, False),
    ("radial", None, 2, False, 0, False),
    ("iradial", None, 2, False, 0, False),
    ("magnitude", None, 3, False, 1, True),
    ("random", "77", 6, False, 5, True),
]


@pytest.mark.parametrize(
    "method,opts,step,invert,offset,fill", CASES,
    ids=[f"{c[0]}-s{c[2]}{'-inv' if c[3] else ''}"
         f"{'-off' + str(c[4]) if c[4] else ''}" for c in CASES])
def test_scan_cli_matches_reference_loop(tmp_path, method, opts, step,
                                         invert, offset, fill):
    rng = np.random.default_rng(abs(__import__("zlib").crc32(f"{method}{step}".encode())))
    h, w = 13, 17
    img = rng.random((h, w, 3))
    src = str(tmp_path / "s.png")
    images.write_image(src, img)
    img_q = images.read_image(src).pixels

    nframes = 4
    out = str(tmp_path / "o.fvid")
    argv = ["-q", "-m", method, "-S", str(step), "-n", str(nframes),
            "--ff-format", "fvid"]
    if opts:
        argv += ["-o", opts]
    if invert:
        argv += ["-I"]
    if offset:
        argv += ["-O", str(offset)]
        if not fill:
            argv += ["--skip"]
    assert scan_tool.main([*argv, src, out]) == 0

    with video.open_input(out) as r:
        got = []
        while True:
            f = r.read_frame_rgb()
            if f is None:
                break
            got.append(f)
    got = np.stack(got)

    coeffs = scipy.fft.dctn(img_q.astype(np.float64), type=2,
                            axes=(0, 1), workers=1) / (4.0 * w * h)
    order = sm.get_method(method).build(w, h, coeffs=coeffs, args=opts)
    want = oracle_scan(img_q, order, step, nframes, offset, fill, invert)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2e-3,
                               err_msg=f"{method} s{step}")
