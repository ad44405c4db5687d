"""applybasis/genbasis/draw pipeline + CLI tests
(vs reference applybasis/*.c)."""

import numpy as np
import scipy.fft

from dspfun_tpu.io import images
from dspfun_tpu.models import basis_pipeline as bp
from dspfun_tpu.tools import applybasis as ab_tool
from dspfun_tpu.tools import draw as draw_tool
from dspfun_tpu.tools import genbasis as gb_tool
from dspfun_tpu.tools._colorspec import parse_color


def make_image(h, w, seed=5):
    return np.random.default_rng(seed).random((h, w, 3))


def test_full_sum_dct2_equals_scipy():
    """-u full with -f dct2 = the full DCT-II spectrum (kernel without
    the factor 2, so scipy dctn / 4)."""
    img = make_image(6, 8)
    vals = bp.apply_basis(img, "dct2", terms=(8, 6), partsum=(8, 6))
    assert vals.shape == (6, 8, 1, 1, 3)
    ref = scipy.fft.dctn(img, type=2, axes=(0, 1)) / 4.0
    assert np.max(np.abs(vals[:, :, 0, 0, :].real - ref)) < 1e-6


def test_no_sum_is_elementwise_product():
    """Default -u 1x1: out[k,n] = f_h(kh,nh) f_w(kw,nw) x[n]."""
    img = make_image(4, 4)
    vals = bp.apply_basis(img, "dct2", terms=(4, 4))
    # tile (0,0): kernel is 1 -> just the image
    np.testing.assert_allclose(vals[0, 0].real, img, atol=1e-12)
    # tile (1,2): cos profiles
    kh, kw = 1, 2
    n = np.arange(4)
    fh = np.cos(np.pi * kh * (2 * n + 1) / 8)
    fw = np.cos(np.pi * kw * (2 * n + 1) / 8)
    expect = fh[:, None, None] * fw[None, :, None] * img
    np.testing.assert_allclose(vals[kh, kw].real, expect, atol=1e-10)


def test_orthogonal_forward_inverse_roundtrip():
    """Forward full transform (ortho) then inverse full sum recovers the
    input after the linear rescale by w*h (applybasis README inversion
    recipe; coeff_scale math at applybasis.c:400-407)."""
    img = make_image(6, 6) * 2 - 1  # shift2'd input
    fwd = bp.apply_basis(img, "dct2", terms=(6, 6), partsum=(6, 6),
                         orthogonal=True)
    coeffs = fwd[:, :, 0, 0, :]  # [h, w, 3] spectrum
    # inversion uses the DCT3 family (applybasis/README.md inversion
    # recipe: `applybasis -f DCT3 -I ... out.coeff`)
    inv = bp.apply_basis(coeffs, "dct3", terms=(6, 6), partsum=(6, 6),
                         inverse=True, orthogonal=True)
    out = inv[0, 0].real / bp.coeff_scale_factor("dct3", (6, 6), 1.0)
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_dft_roundtrip_complex():
    img = make_image(4, 4) * 2 - 1
    fwd = bp.apply_basis(img, "dft", terms=(4, 4), partsum=(4, 4),
                         orthogonal=True)
    coeffs = fwd[:, :, 0, 0, :]
    inv = bp.apply_basis(coeffs, "idft", terms=(4, 4), partsum=(4, 4),
                         inverse=True, orthogonal=True)
    out = inv[0, 0].real / bp.coeff_scale_factor("idft", (4, 4), 1.0)
    np.testing.assert_allclose(out, img, atol=1e-8)


def test_coeff_file_roundtrip(tmp_path):
    img = make_image(4, 4)
    vals = bp.apply_basis(img, "dct2", terms=(4, 4), partsum=(4, 4),
                          orthogonal=True)
    path = str(tmp_path / "c.coeff")
    bp.write_coeff_file(path, vals)
    data, (w, h) = bp.read_coeff_file(path)
    assert (w, h) == (4, 4)
    np.testing.assert_allclose(data, vals[:, :, 0, 0, :], atol=0)


def test_rescale_types():
    c = np.array([4.0, -4.0])
    np.testing.assert_allclose(bp.rescale_values(c, ("linear", None), 4.0, (4, 4)),
                               [1.0, -1.0])
    lg = bp.rescale_values(c, ("log", None), 4.0, (4, 4))
    np.testing.assert_allclose(lg, [np.log1p(4) / np.log1p(4), -1.0])
    pair = bp.rescale_values(c, ("linear", "log"), 4.0, (16, 16))
    np.testing.assert_allclose(pair, [1.0, -1.0])


def test_range_encodings():
    c = np.array([[-0.5, 0.25, -1.0]])
    np.testing.assert_allclose(bp.range_encode(c, "abs"), [[0.5, 0.25, 1.0]])
    np.testing.assert_allclose(bp.range_encode(c, "invert"), [[0.5, 0.25, 0.0]])
    np.testing.assert_allclose(bp.range_encode(c, "shift"), [[0.25, 0.625, 0.0]])
    hue = bp.range_encode(c, "hue")
    assert hue.shape == c.shape
    pos = np.array([[0.1, 0.2, 0.3]])
    np.testing.assert_allclose(bp.range_encode(pos, "hue"), pos)


def test_render_grid_layout():
    vals = np.ones((2, 3, 4, 5, 3)) * 0.5
    frame = bp.render_grid(vals, scale=2, padding=1, bg=(1, 0, 0, 1))
    assert frame.shape == (4 * 2 * 2 + 1 * 2 + 1, 5 * 3 * 2 + 1 * 3 + 1, 4)
    assert tuple(frame[0, 0]) == (1, 0, 0, 1)  # padding
    assert tuple(frame[1, 1]) == (0.5, 0.5, 0.5, 1)  # first tile pixel


def test_gen_basis_grid_dct2():
    grid = bp.gen_basis_grid("dct2", (4, 4))
    assert grid.shape == (4, 4, 4, 4)
    n = np.arange(4)
    expect = np.cos(np.pi * 2 * (2 * n + 1) / 8)
    np.testing.assert_allclose(grid[0, 2, 0, :].real, expect, atol=1e-12)
    # inverse swaps the kernel's (k, n) arguments (genbasis.c:234-239):
    # tile (2,0) content = f(i, 2) f(j, 0)
    ginv = bp.gen_basis_grid("dct2", (4, 4), inverse=True)
    i = np.arange(4)
    expect_inv = np.cos(np.pi * i * (2 * 2 + 1) / 8)
    np.testing.assert_allclose(ginv[2, 0, :, 0].real, expect_inv, atol=1e-12)


def test_gen_basis_natural_centering():
    g = bp.gen_basis_grid("dft", (4, 4), natural=True)
    gm = bp.gen_basis_grid("dft", (4, 4), offset=(-2, -2))
    np.testing.assert_allclose(g, gm)


def test_draw_canvas():
    c = bp.draw_canvas((4, 4), [(0, 0, None)])
    # DC += 0.5 plus the distributed unit energy/4 at DC:
    # REDFT01 of DC d is constant d
    np.testing.assert_allclose(c, 0.75, atol=1e-6)
    c2 = bp.draw_canvas((8, 4), [(1, 0, 1.0)])
    k = np.arange(8)
    expect = 0.5 + 2 * (1.0 / 4) * np.cos(np.pi * (2 * k + 1) / 16)
    np.testing.assert_allclose(c2[0], expect, atol=1e-6)


def test_parse_color():
    assert parse_color("red") == (1, 0, 0, 1)
    assert parse_color("#FF0000") == (1, 0, 0, 1)
    r, g, b, a = parse_color("rgba(100%,0%,50%,1)")
    assert (r, g, b, a) == (1.0, 0.0, 0.5, 1.0)


def test_applybasis_cli_roundtrip(tmp_path):
    src = str(tmp_path / "in.png")
    images.write_image(src, make_image(8, 8))
    coeff = str(tmp_path / "c.coeff")
    out1 = str(tmp_path / "fwd.png")
    rc = ab_tool.main(["-f", "dct2", "-u", "8x8", "-d", coeff, src, out1])
    assert rc == 0
    out2 = str(tmp_path / "inv.png")
    rc = ab_tool.main(["-f", "dct3", "-u", "8x8", "--inverse", "-N", "shift",
                       coeff, out2])
    assert rc == 0
    orig = images.read_image(src).pixels
    rec = images.read_image(out2).pixels
    # inverse output is shift((2x-1)) = x up to 8-bit quantisation (x2)
    assert np.max(np.abs(rec[1:-1, 1:-1] - orig)) < 0.02


def test_genbasis_cli(tmp_path):
    out = str(tmp_path / "basis.png")
    rc = gb_tool.main(["--size", "8x8", "-f", "dct2", out])
    assert rc == 0
    img = images.read_image(out, channels="RGB").pixels
    assert img.shape == (8 * 8 + 9, 8 * 8 + 9, 3)
    # default padding is red
    np.testing.assert_allclose(img[0, 0], [1, 0, 0], atol=0.01)
    # DC tile is (1+1)/2 = 1.0 everywhere
    np.testing.assert_allclose(img[1:9, 1:9], 1.0, atol=0.01)


def test_draw_cli(tmp_path):
    out = str(tmp_path / "draw.png")
    rc = draw_tool.main(["-b", "16x8", "-f", "1x0:0.5", out])
    assert rc == 0
    img = images.read_image(out, channels="I").pixels
    assert img.shape == (8, 16, 1)
    assert img[0, 0, 0] > img[0, 15, 0]  # cosine falls across the row
