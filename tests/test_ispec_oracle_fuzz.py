"""ispec inverse-chain fuzz vs a straight numpy transcription of the
reference (spec/ispec.c:60-176): sign decode (incl. the -m signmap
sign+DC recovery and saturate's 2x-1), DC-based range maxima, expm1
unscale, gain/renorm, -p DC restore, REDFT01."""

import math

import numpy as np
import pytest
import scipy.fft

from dspfun_tpu.io import images
from dspfun_tpu.tools import ispec as ispec_tool
from dspfun_tpu.tools import spec as spec_tool

SQRT2 = math.sqrt(2.0)


def oracle_ispec(stored, dc, gaintype, gain_custom, rangetype, scaletype,
                 signtype, signmap_u8=None, preserve_dc=False):
    """stored: [H, W, C] spectrum pixel values in [0, 1]; dc: the DC
    property values (or None).  Returns the decoded image (pre-clip)."""
    h, w, d = stored.shape
    f = stored.astype(np.float64).copy()
    dc = None if dc is None else np.asarray(dc, np.float64)

    if signtype == "abs" and signmap_u8 is not None:
        dc = signmap_u8[0, 0].astype(np.float64) / 255.0
        sign = np.where(signmap_u8.astype(np.int32) - 128 >= 0, 1.0, -1.0)
        dc_texel = f[0, 0].copy()
        f = np.abs(f) * sign
        f[0, 0] = dc_texel  # the sign loop starts at i = d (ispec.c:94)
    elif signtype == "shift":
        f = (f * 255.0 / 254 - 0.5) * 2
    elif signtype == "saturate":
        dcvals = f[0, 0].copy()
        f = f * 2 - 1
        f[0, 0] = dcvals

    if gaintype == "native":
        gain = 127.5 * math.sqrt(w * h * 4)
    elif gaintype == "reference":
        gain = 127.5 * 1024
    else:
        gain = gain_custom

    if rangetype == "one":
        mx = np.full(d, gain)
    elif rangetype == "dc":
        mx = np.full(d, (dc * gain).max())
    else:
        mx = dc * gain

    if scaletype == "log":
        f = np.copysign(np.expm1(np.abs(f * np.log1p(mx))), f)
    else:
        f = f * mx

    f = f / gain
    f[0, :] *= SQRT2
    f[:, 0] *= SQRT2
    f = f / 2.0
    if preserve_dc:
        f[0, 0] = dc
    return scipy.fft.dctn(f, type=3, axes=(0, 1), workers=1)


CASES = [
    ("native", 0.0, "dc", "log", "shift", False, False),
    ("native", 0.0, "one", "linear", "shift", False, False),
    ("native", 0.0, "dc", "log", "abs", True, False),
    ("native", 0.0, "dcs", "log", "abs", True, True),
    ("custom", 1000.0, "one", "linear", "shift", False, False),
    ("native", 0.0, "dc", "linear", "saturate", False, True),
    ("reference", 0.0, "dc", "log", "retain", False, False),
    ("native", 0.0, "one", "log", "saturate", False, False),
    ("native", 0.0, "dcs", "linear", "abs", True, False),
]


@pytest.mark.parametrize(
    "gaintype,gain,rangetype,scaletype,signtype,use_map,pdc", CASES,
    ids=[f"{c[2]}-{c[3]}-{c[4]}{'-m' if c[5] else ''}{'-p' if c[6] else ''}"
         for c in CASES])
def test_ispec_chain_matches_reference_transcription(
        tmp_path, gaintype, gain, rangetype, scaletype, signtype,
        use_map, pdc):
    import zlib

    rng = np.random.default_rng(abs(zlib.crc32(
        f"{rangetype}{scaletype}{signtype}".encode())))
    img = rng.random((10, 14, 3))
    src = str(tmp_path / "s.png")
    images.write_image(src, img)

    sp = str(tmp_path / "spec.png")
    argv = ["-T", scaletype, "-R", rangetype, "-S", signtype]
    if gaintype == "custom":
        argv += ["-G", str(gain)]
    elif gaintype == "reference":
        argv += ["-G", "reference"]
    assert spec_tool.main([*argv, src, sp]) == 0

    sign_path = None
    signmap_u8 = None
    if use_map:
        sign_path = str(tmp_path / "sign.png")
        assert spec_tool.main(["-t", "sign", src, sign_path]) == 0
        # CharPixel semantics: round the [0,1] pixels to 8-bit
        # (ispec.c:90-92 exports the signmap at 8 bits)
        signmap_u8 = np.rint(
            images.read_image(sign_path).pixels * 255.0).astype(np.uint8)

    out = str(tmp_path / "back.png")
    iargv = list(argv)
    if use_map:
        iargv += ["-m", sign_path]
    if pdc:
        iargv += ["-p"]
    assert ispec_tool.main([*iargv, sp, out]) == 0
    got = images.read_image(out).pixels

    from PIL import Image

    simg = Image.open(sp)
    stored = images.read_image(sp).pixels
    info = simg.text if hasattr(simg, "text") else simg.info
    from dspfun_tpu.io.images import base16_decode

    dc = None
    if "DC" in info:
        dc = np.frombuffer(base16_decode(info["DC"]), np.float64)
    want = np.clip(oracle_ispec(stored, dc, gaintype, gain, rangetype,
                                scaletype, signtype, signmap_u8, pdc),
                   0.0, 1.0)
    np.testing.assert_allclose(got, want, atol=3 / 255.0,
                               err_msg=f"{rangetype}/{scaletype}/{signtype}")
