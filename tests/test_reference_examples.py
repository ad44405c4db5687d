"""The reference READMEs' documented example commands, run verbatim
(scaled-down assets) — the workflows a reference user would paste
first.  Sources cited per test."""

from fractions import Fraction

import numpy as np
import pytest
from PIL import Image

from dspfun_tpu.io import images, video
from dspfun_tpu.tools import applybasis as applybasis_tool
from dspfun_tpu.tools import draw as draw_tool
from dspfun_tpu.tools import genbasis as genbasis_tool
from dspfun_tpu.tools import ispec as ispec_tool
from dspfun_tpu.tools import motion as motion_tool
from dspfun_tpu.tools import rotate as rotate_tool
from dspfun_tpu.tools import spec as spec_tool
from dspfun_tpu.tools import transcode as transcode_tool
from dspfun_tpu.tools import zoom as zoom_tool


@pytest.fixture
def flower(tmp_path):
    """A small structured test image (stand-in for the README's
    flower.png)."""
    y, x = np.mgrid[0:32, 0:32] / 16.0
    img = np.stack([0.5 + 0.4 * np.sin(3 * x) * np.cos(2 * y),
                    0.5 + 0.3 * np.cos(4 * x + y),
                    0.4 + 0.3 * np.sin(x + 2 * y)], axis=-1)
    p = str(tmp_path / "flower.png")
    images.write_image(p, np.clip(img, 0, 1))
    return p


def _clip(tmp_path, name="clip.y4m", w=32, h=24, d=8, pix="yuv420p"):
    rng = np.random.default_rng(0)
    path = str(tmp_path / name)
    props = video.parse_color_props(f"pixel_format={pix}")
    with video.open_output(path, w, h, Fraction(25), props) as wr:
        for _ in range(d):
            wr.write_frame_rgb(rng.random((h, w, 3)))
    return path


def _frames(path):
    with video.open_input(path) as r:
        out = []
        while True:
            f = r.read_frame_rgb()
            if f is None:
                break
            out.append(f)
    return np.stack(out)


def test_spec_default_viewing(flower, tmp_path):
    """spec flower.png flower.spec.png (spec/README.md:58): the default
    (abs) viewing spectrum — same dims, DC smuggled as the base16 text
    property (spec/spec.h:157-168)."""
    sp = str(tmp_path / "flower.spec.png")
    assert spec_tool.main([flower, sp]) == 0
    img = Image.open(sp)
    assert img.size == (32, 32)
    assert "DC" in (img.text if hasattr(img, "text") else img.info)


def test_spec_flat_crop_lowpass(flower, tmp_path):
    """spec -tflat | crop 8x8+0+0 | ispec -tflat (spec/README.md:64):
    cropping the flat spectrum to the top-left corner is a lowpass."""
    sp = str(tmp_path / "s.png")
    cropped = str(tmp_path / "c.png")
    out = str(tmp_path / "o.png")
    assert spec_tool.main(["-tflat", flower, sp]) == 0
    img = Image.open(sp)
    img.crop((0, 0, 8, 8)).save(cropped)
    assert ispec_tool.main(["-tflat", cropped, out]) == 0
    rec = images.read_image(out).pixels
    assert rec.shape == (8, 8, 3)
    # the 8x8 lowpass approximates the downscaled original
    a = images.read_image(flower).pixels.reshape(8, 4, 8, 4, 3).mean((1, 3))
    assert np.sqrt(np.mean((rec - a) ** 2)) < 0.15


def test_spec_shift_depth_reduction(flower, tmp_path):
    """spec -tshift | -depth 8 | ispec -tshift (spec/README.md:68-70):
    the shift template survives 8-bit quantisation of the spectrum."""
    sp16 = str(tmp_path / "s16.png")
    sp8 = str(tmp_path / "s8.png")
    out = str(tmp_path / "o.png")
    assert spec_tool.main(["-tshift", flower, sp16]) == 0
    img = np.asarray(Image.open(sp16))
    if img.dtype != np.uint8:  # 16-bit PNG -> 8-bit
        img = (img // 257).astype(np.uint8)
    Image.fromarray(img).save(sp8)
    assert ispec_tool.main(["-tshift", sp8, out]) == 0
    a = images.read_image(flower).pixels
    b = images.read_image(out).pixels
    assert np.sqrt(np.mean((a - b) ** 2)) < 0.1


def test_spec_abs_signmap_steganography(flower, tmp_path):
    """The abs/signmap steganography workflow (spec/README.md:74-84):
    an abs spectrum decoded with a DIFFERENT image's signmap embeds the
    cover; re-speccing the cover reveals structure again."""
    absspec = str(tmp_path / "abs.png")
    sign = str(tmp_path / "sign.png")
    cover = str(tmp_path / "cover.png")
    revealed = str(tmp_path / "rev.png")
    assert spec_tool.main(["-tabs", flower, absspec]) == 0
    assert spec_tool.main(["-tsign", flower, sign]) == 0
    assert ispec_tool.main(["-tabs", "-m", sign, absspec, cover]) == 0
    a = images.read_image(flower).pixels
    c = images.read_image(cover).pixels
    assert np.sqrt(np.mean((a - c) ** 2)) < 0.1  # cover ~ original
    assert spec_tool.main(["-tabs", cover, revealed]) == 0


def test_genbasis_dft_complex_natural(tmp_path):
    """genbasis --function DFT --size 16x16 --padding 2 --natural
    --plane complex dftbasis.png (applybasis/README.md:29)."""
    out = str(tmp_path / "dftbasis.png")
    assert genbasis_tool.main(["--function", "DFT", "--size", "16x16",
                               "--padding", "2", "--natural",
                               "--plane", "complex", out]) == 0
    img = images.read_image(out).pixels
    n = 16 * (16 + 2) + 2
    assert img.shape == (n, n, 3)


def test_genbasis_dct2_pad_scale(tmp_path):
    """genbasis --function DCT2 --size 8x8 --padding 4 --scale 4
    dctbasis.png (applybasis/README.md:35)."""
    out = str(tmp_path / "dctbasis.png")
    assert genbasis_tool.main(["--function", "DCT2", "--size", "8x8",
                               "--padding", "4", "--scale", "4", out]) == 0
    img = images.read_image(out).pixels
    n = 8 * (8 * 4 + 4) + 4
    assert img.shape == (n, n, 3)


def test_applybasis_progressive_sums_and_inverse(tmp_path):
    """The applybasis README example loop (applybasis/README.md:81-84):
    progressively-summed 16x16 DCT, the full-sum coeff dump, and the
    full-sum inverse reconstructing the image.  (The README's
    `-s16x16` flag does not exist in the reference binary either — its
    getopt string has no 's'; the dump carries the dims.)"""
    y, x = np.mgrid[0:16, 0:16] / 8.0
    img = np.clip(np.stack([0.5 + 0.4 * np.sin(3 * x),
                            0.5 + 0.3 * np.cos(2 * y),
                            0.4 + 0.3 * np.sin(x + y)], -1), 0, 1)
    src = str(tmp_path / "flower16.png")
    images.write_image(src, img)
    for i in (1, 4, 16):
        out = str(tmp_path / f"fdct_{i}.png")
        assert applybasis_tool.main(["-f", "DCT2", "-u", f"{i}x{i}",
                                     "-S", str(i), src, out]) == 0
    coeff = str(tmp_path / "out.coeff")
    assert applybasis_tool.main(["-fDCT2", "-u", "16x16", "-S", "16",
                                 "-d", coeff, src,
                                 str(tmp_path / "full.png")]) == 0
    inv = str(tmp_path / "idct_16.png")
    # default range shift2: input encoded 2x-1 on the forward, display
    # (v+1)/2 on the inverse — the README commands need no -N
    assert applybasis_tool.main(["-f", "DCT3", "-I", "-u", "16x16",
                                 "-S", "16", coeff, inv]) == 0
    rec = images.read_image(inv).pixels
    # the full-sum inverse tile grid is a single 16x16 reconstruction
    # scaled 16x inside the default 1px padding frame; compare the
    # downsampled tile to the original
    assert rec.shape[0] == 16 * 16 + 2
    tile = rec[1:-1, 1:-1]
    small = tile.reshape(16, 16, 16, 16, 3).mean((1, 3))
    assert np.sqrt(np.mean((small - img) ** 2)) < 0.1


def test_draw_multiple_coefficients(tmp_path):
    """draw -b 64x64 -f 3x3:0.4 -f 2x5:0.2 -f 4x6:0.2 draw.png
    (applybasis/README.md:102, smaller canvas)."""
    out = str(tmp_path / "draw.png")
    assert draw_tool.main(["-b", "64x64", "-f", "3x3:0.4", "-f", "2x5:0.2",
                           "-f", "4x6:0.2", out]) == 0
    img = images.read_image(out).pixels
    assert img.shape[:2] == (64, 64)
    assert img.std() > 0.01  # cosine pattern present


def test_motion_quant_samesize_chroma(tmp_path):
    """motion --blocksize 8x8x8 --quant 20 --samesize-chroma
    (motion/README.md:77) on a 4:2:0 clip."""
    clip = _clip(tmp_path, d=8, pix="yuv420p")
    out = str(tmp_path / "o.y4m")
    assert motion_tool.main(["-Q", "--blocksize", "8x8x8", "--quant", "20",
                             "--samesize-chroma", clip, out]) == 0
    got = _frames(out)
    assert got.shape == _frames(clip).shape


def test_motion_temporal_only_lowpass(tmp_path):
    """motion --blocksize 1x1x0 --bandpass 0x0x0-0x0x20: temporal-only
    filtering with 1x1 spatial blocks (motion/README.md:89)."""
    clip = _clip(tmp_path, w=16, h=12, d=8, pix="yuv444p")
    out = str(tmp_path / "o.y4m")
    assert motion_tool.main(["-Q", "--blocksize", "1x1x0", "--bandpass",
                             "0x0x0-0x0x4", clip, out]) == 0
    got = _frames(out)
    # keeping the 4 lowest temporal frequencies smooths over time
    src = _frames(clip)
    assert np.abs(np.diff(got, axis=0)).mean() < \
        np.abs(np.diff(src, axis=0)).mean()


def test_motion_eval_fade(tmp_path):
    """motion --blocksize 0x0x120 --eval 'c * ((width-x)/width) * ...'
    (motion/README.md:85): whole-clip expression fade."""
    clip = _clip(tmp_path, w=16, h=12, d=4, pix="yuv444p")
    out = str(tmp_path / "o.y4m")
    expr = ("c * ((width-x)/width) * ((height-y)/height) "
            "* ((depth-z)/depth)")
    assert motion_tool.main(["-Q", "--blocksize", "0x0x0", "--eval", expr,
                             clip, out]) == 0
    assert _frames(out).shape == _frames(clip).shape


def test_rotate_timeline_roundtrip(tmp_path):
    """rotate zy-x input timeline; rotate zyx timeline back
    (motion/README.md:120-124).  The documented pair actually restores
    the original mirrored in x (the README's "original" elides the -x);
    the exact inverse of zy-x is -zyx — both asserted."""
    clip = _clip(tmp_path, w=16, h=12, d=6, pix="yuv444p")
    timeline = str(tmp_path / "t.y4m")
    back = str(tmp_path / "b.y4m")
    exact = str(tmp_path / "e.y4m")
    assert rotate_tool.main(["-q", "zy-x", clip, timeline]) == 0
    assert rotate_tool.main(["-q", "zyx", timeline, back]) == 0
    assert rotate_tool.main(["-q", "--", "-zyx", timeline, exact]) == 0
    src = _frames(clip)
    np.testing.assert_allclose(_frames(back), src[:, :, ::-1],
                               atol=2 / 255.0)
    np.testing.assert_allclose(_frames(exact), src, atol=2 / 255.0)


def test_transcode_containers(tmp_path):
    """transcode input output (motion/README.md:149) across container
    families."""
    clip = _clip(tmp_path, pix="yuv444p")
    out = str(tmp_path / "o.fvid")
    assert transcode_tool.main(["-q", clip, out]) == 0
    np.testing.assert_allclose(_frames(out), _frames(clip), atol=2 / 255.0)


def test_zoom_accelerating_zoom_animation(flower, tmp_path):
    """zoom -n N -S '0.25+3.75*(i/n)^2' -x '(w*xs-vw)/2' -y
    '(h*ys-vh)/2' (zoom/README.md:67): centered accelerating zoom."""
    out = str(tmp_path / "z.fvid")
    assert zoom_tool.main(["-n", "6", "-S", "0.25+3.75*(i/n)^2",
                           "-x", "(w*xs-vw)/2", "-y", "(h*ys-vh)/2",
                           "-v", "16x16", "-q", flower, out]) == 0
    fr = _frames(out)
    assert fr.shape == (6, 16, 16, 3)


def test_zoom_pan_animations(flower, tmp_path):
    """zoom -n N -x 'i/n' (constant-rate pan, zoom/README.md:74) and
    the accumulating -x 'x+1/n' form (README:78) produce identical
    frames."""
    a = str(tmp_path / "a.fvid")
    b = str(tmp_path / "b.fvid")
    assert zoom_tool.main(["-n", "4", "-x", "i/n", "-v", "16x16", "-q",
                           flower, a]) == 0
    assert zoom_tool.main(["-n", "4", "-x", "x+1/n", "-v", "16x16", "-q",
                           flower, b]) == 0
    fa, fb = _frames(a), _frames(b)
    # 'x+1/n' evaluates before the first frame too, so its frame k
    # shows i/n's frame k+1 (x starts at the initial offset 0)
    np.testing.assert_allclose(fb[:-1], fa[1:], atol=1e-4)
