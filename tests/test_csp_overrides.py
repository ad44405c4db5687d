"""--csp color-property overrides through motion/rotate/transcode.

The reference applies the *whole* colorspace option string at open
(range/matrix/trc, ffapi.c:94-114 + swscale setup at :283-326); round 1
only honoured pixel_format (VERDICT item 8).
"""

from fractions import Fraction

import numpy as np

from dspfun_tpu.io import video
from dspfun_tpu.tools import motion as motion_tool
from dspfun_tpu.tools import rotate as rotate_tool
from dspfun_tpu.tools import transcode as transcode_tool


def write_y4m(path, frames):
    t, h, w = frames.shape[:3]
    props = video.parse_color_props("pixel_format=yuv420p")
    with video.open_output(path, w, h, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)


def read_rgb(path):
    with video.open_input(path) as r:
        out = []
        while True:
            f = r.read_frame_rgb()
            if f is None:
                break
            out.append(f)
        return np.stack(out), r.props.copy(), r.pix_fmt.name


def test_motion_csp_range_mpeg_to_jpeg(tmp_path):
    """VERDICT done-criterion: converting mpeg -> jpeg range through
    motion.  The y4m source is limited range; the requested processing/
    output range is full; pixel values must survive the conversion."""
    rng = np.random.default_rng(0)
    frames = rng.random((2, 8, 16, 3)).astype(np.float64)
    src = str(tmp_path / "in.y4m")
    write_y4m(src, frames)
    out = str(tmp_path / "out.y4m")
    rc = motion_tool.main(["-Q", "-b", "8x8x1",
                           "--csp", "color_range=jpeg", src, out])
    assert rc == 0
    got, props, _pf = read_rgb(out)
    assert props.color_range == "jpeg"
    src_rgb, _, _ = read_rgb(src)
    # identity filter chain; error budget = two 8-bit quantisations +
    # 420 chroma resampling
    assert np.abs(got - src_rgb).max() < 0.08
    np.testing.assert_allclose(got[..., :], src_rgb, atol=0.08)
    # and the stored luma bytes really are full-range (mpeg caps at 235)
    with video.open_input(out) as r:
        raw = r.read_frame(raw=True)
    assert raw[0].max() > 240


def test_motion_csp_matrix_override(tmp_path):
    """colorspace=bt709 re-matrixes the planes; decoded RGB matches."""
    rng = np.random.default_rng(1)
    frames = rng.random((2, 8, 16, 3)).astype(np.float64)
    src = str(tmp_path / "in.y4m")
    write_y4m(src, frames)
    # fvid output: y4m has no colorspace signalling, fvid's S tag does
    out = str(tmp_path / "out.fvid")
    rc = motion_tool.main(["-Q", "-b", "8x8x1",
                           "--csp", "colorspace=bt709:pixel_format=yuv444pf32",
                           src, out])
    assert rc == 0
    got, props, _ = read_rgb(out)
    assert props.color_space == "bt709"
    src_rgb, _, _ = read_rgb(src)
    np.testing.assert_allclose(got, src_rgb, atol=0.08)


def test_rotate_subsampled_color_correct(tmp_path):
    """Identity rotation of a yuv420p clip must preserve colors (the
    RGB-through volume used to be written as mislabelled yuv444p)."""
    rng = np.random.default_rng(2)
    frames = rng.random((2, 8, 16, 3)).astype(np.float64)
    src = str(tmp_path / "in.y4m")
    write_y4m(src, frames)
    out = str(tmp_path / "out.y4m")
    assert rotate_tool.main(["-q", "xyz", src, out]) == 0
    got, _, pf = read_rgb(out)
    assert pf == "yuv444p"
    src_rgb, _, _ = read_rgb(src)
    np.testing.assert_allclose(got, src_rgb, atol=0.08)


def test_transcode_matrix_conversion(tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.random((2, 8, 16, 3)).astype(np.float64)
    src = str(tmp_path / "in.y4m")
    write_y4m(src, frames)
    out = str(tmp_path / "out.fvid")
    rc = transcode_tool.main(
        ["-q", "-c", "colorspace=bt709:pixel_format=yuv444pf32", src, out])
    assert rc == 0
    got, props, _ = read_rgb(out)
    assert props.color_space == "bt709"
    src_rgb, _, _ = read_rgb(src)
    np.testing.assert_allclose(got, src_rgb, atol=0.08)


def test_transcode_range_conversion(tmp_path):
    rng = np.random.default_rng(4)
    frames = rng.random((2, 8, 16, 3)).astype(np.float64)
    src = str(tmp_path / "in.y4m")
    write_y4m(src, frames)
    out = str(tmp_path / "out.y4m")
    rc = transcode_tool.main(["-q", "-c", "color_range=jpeg", src, out])
    assert rc == 0
    got, props, _ = read_rgb(out)
    assert props.color_range == "jpeg"
    src_rgb, _, _ = read_rgb(src)
    np.testing.assert_allclose(got, src_rgb, atol=0.05)


def test_transcode_negotiated_format_converts(tmp_path):
    """fvid float RGB -> y4m: the container negotiates yuv444p, so the
    pass-through must convert (used to write G,B,R planes as Y,Cb,Cr)."""
    rng = np.random.default_rng(5)
    frames = rng.random((2, 8, 16, 3)).astype(np.float32)
    src = str(tmp_path / "in.fvid")
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(src, 16, 8, Fraction(25), props,
                           format="fvid") as w:
        for f in frames:
            w.write_frame_rgb(f)
    out = str(tmp_path / "o.y4m")
    assert transcode_tool.main(["-q", src, out]) == 0
    got, _, _ = read_rgb(out)
    np.testing.assert_allclose(got, frames, atol=0.05)


def test_rotate_negotiated_format_converts(tmp_path):
    rng = np.random.default_rng(6)
    frames = rng.random((2, 8, 16, 3)).astype(np.float32)
    src = str(tmp_path / "in.fvid")
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(src, 16, 8, Fraction(25), props,
                           format="fvid") as w:
        for f in frames:
            w.write_frame_rgb(f)
    out = str(tmp_path / "o.y4m")
    assert rotate_tool.main(["-q", "xyz", src, out]) == 0
    got, _, _ = read_rgb(out)
    np.testing.assert_allclose(got, frames, atol=0.05)


def test_rotate_range_conversion(tmp_path):
    """Same-layout rotate with a range-only override requantises per
    plane (the raw pel copy must NOT engage)."""
    rng = np.random.default_rng(9)
    frames = rng.random((2, 8, 16, 3)).astype(np.float64)
    src = str(tmp_path / "in444.y4m")
    props = video.parse_color_props("pixel_format=yuv444p")
    with video.open_output(src, 16, 8, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    out = str(tmp_path / "out.y4m")
    rc = rotate_tool.main(
        ["-q", "-c", "color_range=jpeg", "xyz", src, out])
    assert rc == 0
    got, oprops, _ = read_rgb(out)
    assert oprops.color_range == "jpeg"
    src_rgb, _, _ = read_rgb(src)
    np.testing.assert_allclose(got, src_rgb, atol=0.05)
