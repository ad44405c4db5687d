"""spec forward-chain fuzz vs a straight numpy transcription of the
reference scalar chain (spec/spec.c:56-156): DC capture, sqrt2
uniform-range renorm, normalisation, gain types, range maxima, scale
and sign encodings — every -s/-R/-S/-G combination class."""

import math

import numpy as np
import pytest
import scipy.fft

from dspfun_tpu.io import images
from dspfun_tpu.tools import spec as spec_tool

SQRT2 = math.sqrt(2.0)


def oracle_spec(img, gaintype, gain_custom, rangetype, scaletype, signtype):
    h, w, d = img.shape
    f = scipy.fft.dctn(img.astype(np.float64), type=2, axes=(0, 1),
                       workers=1)
    dc = f[0, 0] / (w * h * 4)
    f[0, :] /= SQRT2
    f[:, 0] /= SQRT2
    f = f / (w * h * 2)

    if gaintype == "native":
        gain = 127.5 * math.sqrt(w * h * 4)
    elif gaintype == "reference":
        gain = 127.5 * 1024
    else:
        gain = gain_custom
    f = f * gain

    if rangetype == "one":
        mx = np.full(d, gain)
    elif rangetype == "dc":
        mx = np.full(d, f[0, 0].max())
    else:  # dcs
        mx = f[0, 0].copy()

    if scaletype == "log":
        f = np.copysign(np.log1p(np.abs(f)), f) / np.log1p(mx)
    else:
        f = f / mx

    pre_sign = f.copy()
    if signtype == "abs":
        f = np.abs(f)
    elif signtype == "shift":
        f = (f / 2.0 + 0.5) * 254 / 255
    elif signtype == "saturate":
        dcvals = f[0, 0].copy()
        f = (~np.signbit(f)).astype(np.float64)
        f[0, 0] = dcvals  # the first d entries keep their values
    # retain: unchanged
    return np.clip(f, 0.0, 1.0), dc, pre_sign


CASES = [
    ("native", 0.0, "dc", "log", "abs"),
    ("native", 0.0, "dc", "log", "shift"),
    ("native", 0.0, "one", "linear", "shift"),
    ("reference", 0.0, "dc", "log", "retain"),
    ("custom", 1000.0, "one", "linear", "shift"),
    ("native", 0.0, "dcs", "log", "abs"),
    ("native", 0.0, "dc", "linear", "saturate"),
    ("custom", 500.0, "dcs", "linear", "retain"),
]


@pytest.mark.parametrize(
    "gaintype,gain,rangetype,scaletype,signtype", CASES,
    ids=[f"{c[0]}-{c[2]}-{c[3]}-{c[4]}" for c in CASES])
def test_spec_chain_matches_reference_transcription(
        tmp_path, gaintype, gain, rangetype, scaletype, signtype):
    rng = np.random.default_rng(abs(__import__("zlib").crc32(f"{rangetype}-{scaletype}".encode())))
    img = rng.random((12, 18, 3))
    src = str(tmp_path / "s.png")
    images.write_image(src, img)
    img_q = images.read_image(src).pixels

    out = str(tmp_path / "o.png")
    argv = ["-T", scaletype, "-R", rangetype, "-S", signtype]
    if gaintype == "custom":
        argv += ["-G", str(gain)]
    elif gaintype == "reference":
        argv += ["-G", "reference"]
    assert spec_tool.main([*argv, src, out]) == 0

    got = images.read_image(out).pixels
    want, dc, pre = oracle_spec(img_q, gaintype, gain, rangetype, scaletype,
                                signtype)
    if signtype == "saturate":
        # the sign bit of a near-zero coefficient legitimately differs
        # between the f32 pipeline and the f64 oracle; compare only
        # clearly-signed coefficients
        m = np.abs(pre) > 1e-4
        np.testing.assert_allclose(got[m], want[m],
                                   atol=2 / 65535.0 + 1e-5)
    else:
        np.testing.assert_allclose(got, want, atol=2 / 65535.0 + 1e-5,
                                   err_msg=f"{rangetype}/{scaletype}/"
                                           f"{signtype}")
