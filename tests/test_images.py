import numpy as np
import pytest

from dspfun_tpu.io import images
from dspfun_tpu.io.color import srgb_decode, srgb_encode


def test_base16_roundtrip():
    data = bytes(range(256))
    enc = images.base16_encode(data)
    assert images.base16_decode(enc) == data
    # matches the reference codec (spec/spec.h:157-168): nibbles + 'A'
    assert images.base16_encode(b"\x00") == "AA"
    assert images.base16_encode(b"\x01") == "BA"
    assert images.base16_encode(b"\x10") == "AB"


def test_dc_property_roundtrip():
    dc = np.array([0.25, 0.5, 0.125])
    prop = images.encode_dc_property(dc)
    out = images.decode_dc_property(prop, 3)
    np.testing.assert_array_equal(out, dc)


def test_png_roundtrip_with_properties(tmp_path):
    rng = np.random.default_rng(0)
    pix = rng.random((16, 24, 3))
    path = str(tmp_path / "t.png")
    images.write_image(path, pix, properties={"DC": "ABCD"})
    back = images.read_image(path)
    assert back.properties["DC"] == "ABCD"
    assert back.pixels.shape == (16, 24, 3)
    # 8-bit quantisation error only
    assert np.max(np.abs(back.pixels - pix)) <= 0.5 / 255 + 1e-12


def test_channel_specs(tmp_path):
    pix = np.zeros((4, 4, 3))
    pix[..., 0] = 1.0  # red
    path = str(tmp_path / "r.png")
    images.write_image(path, pix)
    gray = images.read_image(path, channels="I")
    assert gray.pixels.shape == (4, 4, 1)
    assert gray.pixels[0, 0, 0] == pytest.approx(0.299, abs=1e-2)
    bgr = images.read_image(path, channels="BGR")
    assert bgr.pixels[0, 0, 2] == pytest.approx(1.0)
    assert bgr.pixels[0, 0, 0] == pytest.approx(0.0)


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 100)
    np.testing.assert_allclose(srgb_encode(srgb_decode(x)), x, atol=1e-12)
    # reference threshold behaviour (applybasis.c:142-144)
    assert srgb_decode(np.float64(0.04)) == pytest.approx(0.04 / 12.92)


def test_sixel_output(tmp_path, capsysbinary):
    from dspfun_tpu.io.sixel import encode_sixel

    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[:4] = [255, 0, 0]
    data = encode_sixel(rgb)
    assert data.startswith(b"\x1bPq")
    assert data.endswith(b"\x1b\\")
