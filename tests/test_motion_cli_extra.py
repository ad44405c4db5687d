"""motion CLI: chroma geometry, per-plane filters, coeff-limit, csp."""

from fractions import Fraction

import numpy as np

from dspfun_tpu.io import video
from dspfun_tpu.tools import motion as motion_tool


def write_y4m(tmp_path, name, frames, pix="yuv420p"):
    t, h, w = frames.shape[:3]
    path = str(tmp_path / name)
    props = video.parse_color_props(f"pixel_format={pix}")
    with video.open_output(path, w, h, Fraction(25), props, format="y4m") as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    return path


def read_clip(path):
    with video.open_input(path) as r:
        out = []
        while True:
            f = r.read_frame_rgb()
            if f is None:
                break
            out.append(f)
    return np.stack(out)


def test_samesize_chroma(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.random((2, 16, 16, 3)).astype(np.float32)
    src = write_y4m(tmp_path, "in.y4m", frames)
    out = str(tmp_path / "o.y4m")
    rc = motion_tool.main(["-Q", "-b", "8x8x1", "--samesize-chroma", src, out])
    assert rc == 0
    a, b = read_clip(src), read_clip(out)
    assert np.abs(a - b).max() < 0.02


def test_per_plane_damp_list(tmp_path):
    """-D 0:1:1 damps only the luma plane's stop band."""
    rng = np.random.default_rng(1)
    frames = rng.random((2, 8, 8, 3)).astype(np.float32)
    src = write_y4m(tmp_path, "in.y4m", frames, pix="yuv444p")
    out = str(tmp_path / "o.y4m")
    rc = motion_tool.main(
        ["-Q", "-p", "0x0x0-2x2x2", "-D", "0:1:1", src, out]
    )
    assert rc == 0
    got = read_clip(out)
    # luma heavily filtered, chroma untouched: compare overall change
    assert not np.allclose(got, read_clip(src), atol=0.02)


def test_coeff_limit_cli(tmp_path):
    rng = np.random.default_rng(2)
    frames = rng.random((1, 8, 8, 3)).astype(np.float32)
    src = str(tmp_path / "in.fvid")
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(src, 8, 8, Fraction(25), props, format="fvid") as wr:
        wr.write_frame_rgb(frames[0])
    out = str(tmp_path / "o.fvid")
    rc = motion_tool.main(["-Q", "--coeff-limit", "1", src, out])
    assert rc == 0
    got = read_clip(out)
    # only DC per block plane survives -> flat channels
    assert np.abs(got[0] - got[0].mean(axis=(0, 1))).max() < 1e-3


def test_csp_conversion_yuv_to_rgb_float(tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.random((1, 8, 8, 3)).astype(np.float32)
    src = write_y4m(tmp_path, "in.y4m", frames, pix="yuv444p")
    out = str(tmp_path / "o.fvid")
    rc = motion_tool.main(
        ["-Q", "-c", "pixel_format=gbrpf32le", src, out]
    )
    assert rc == 0
    with video.open_input(out) as r:
        assert r.pix_fmt.name == "gbrpf32le"
        got = r.read_frame_rgb()
    np.testing.assert_allclose(got, read_clip(src)[0], atol=0.02)


def test_motion_linear_light(tmp_path):
    rng = np.random.default_rng(4)
    frames = rng.random((1, 8, 8, 3)).astype(np.float32)
    src = str(tmp_path / "in.fvid")
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(src, 8, 8, Fraction(25), props, format="fvid") as wr:
        wr.write_frame_rgb(frames[0])
    out = str(tmp_path / "o.fvid")
    # identity chain in linear light: decode+encode trc cancels
    rc = motion_tool.main(["-Q", "--linear", src, out])
    assert rc == 0
    got = read_clip(out)
    np.testing.assert_allclose(got[0], frames[0], atol=5e-3)


def test_whole_clip_3d_block(tmp_path):
    """-b 0x0x0 transforms the entire input as one 3-D volume
    (motion/README.md 'Blocks')."""
    rng = np.random.default_rng(5)
    frames = rng.random((4, 8, 8, 3)).astype(np.float32)
    src = str(tmp_path / "in.fvid")
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(src, 8, 8, Fraction(25), props, format="fvid") as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    out = str(tmp_path / "o.fvid")
    assert motion_tool.main(["-Q", "-b", "0x0x0", src, out]) == 0
    got = read_clip(out)
    assert got.shape[0] == 4
    np.testing.assert_allclose(got, frames, atol=2e-3)


def test_partial_blocksize_keeps_default_depth(tmp_path):
    """-b 8x8 (two fields) keeps depth 1 like the reference's sscanf."""
    rng = np.random.default_rng(6)
    frames = rng.random((2, 8, 8, 3)).astype(np.float32)
    src = str(tmp_path / "in.fvid")
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(src, 8, 8, Fraction(25), props, format="fvid") as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    out = str(tmp_path / "o.fvid")
    assert motion_tool.main(["-Q", "-b", "8x8", src, out]) == 0
    with video.open_input(out) as r:
        assert r.frames == 2  # depth-1 blocks: every frame written


def test_rotate_subsampled_input_converts(tmp_path):
    rng = np.random.default_rng(7)
    frames = rng.random((3, 8, 8, 3)).astype(np.float32)
    src = write_y4m(tmp_path, "in420.y4m", frames, pix="yuv420p")
    out = str(tmp_path / "rot.y4m")
    from dspfun_tpu.tools import rotate as rotate_tool

    assert rotate_tool.main(["-q", "zyx", src, out]) == 0
    with video.open_input(out) as r:
        # x<->z swap: width becomes clip length, frames become old width
        assert (r.width, r.height) == (3, 8)
        assert r.frames == 8
        assert r.pix_fmt.name == "yuv444p"  # converted, non-subsampled


def test_motion_8bit_spectrogram_roundtrip(tmp_path):
    """The 8-bit spectrogram editing workflow: spec shift at yuv444p,
    invert with ispectrogram, compare (reference motion/README.md)."""
    rng = np.random.default_rng(8)
    base = rng.random((8, 8, 3)).astype(np.float32)
    frames = np.stack([base, base])  # static clip: benign spectrum
    src = write_y4m(tmp_path, "in.y4m", frames, pix="yuv444p")
    spec = str(tmp_path / "spec.y4m")
    back = str(tmp_path / "back.y4m")
    # both legs must process in the stored format (here: per-plane
    # YCbCr spectrograms), exactly as with the reference's -c option
    assert motion_tool.main(["-Q", "-c", "pixel_format=yuv444p",
                             "--spectrogram=shift", src, spec]) == 0
    assert motion_tool.main(["-Q", "--ispectrogram=shift", spec, back]) == 0
    a, b = read_clip(src), read_clip(back)
    # 8-bit log-spectrum quantisation bounds accuracy
    assert np.sqrt(((a - b) ** 2).mean()) < 0.06


def test_rotate_passthrough_byte_exact(tmp_path):
    """Non-subsampled same-format rotate copies stored pels directly
    (raw buffering, reference rotate.c:139-172): out-of-range mpeg
    pels (superblack/superwhite) survive byte-exactly where a
    dequantize->requantize round trip would clip them."""
    from dspfun_tpu.tools import rotate as rotate_tool

    h, w = 6, 8
    rng = np.random.default_rng(11)
    planes = rng.integers(0, 256, size=(2, 3, h, w), dtype=np.uint8)
    planes[0, 0, 0, :4] = [0, 3, 250, 255]  # outside mpeg 16..235
    src = str(tmp_path / "in.y4m")
    props = video.parse_color_props("pixel_format=yuv444p")
    with video.open_output(src, w, h, Fraction(25), props,
                           format="y4m") as wr:
        for f in planes:
            wr.write_frame(list(f), raw=True)
    out = str(tmp_path / "copy.y4m")
    # identity axis map: pure pel copy through the whole-clip buffer
    assert rotate_tool.main(["-q", "xyz", src, out]) == 0
    with video.open_input(out) as r:
        got = [r.read_frame(raw=True) for _ in range(2)]
    for t in range(2):
        for c in range(3):
            np.testing.assert_array_equal(got[t][c], planes[t, c])


def test_transcode_passthrough_byte_exact(tmp_path):
    """Same-format transcode is a stored-pel copy (transcode.c:107-121):
    out-of-range mpeg pels survive byte-exactly."""
    from dspfun_tpu.tools import transcode as transcode_tool

    h, w = 6, 8
    rng = np.random.default_rng(12)
    planes = rng.integers(0, 256, size=(3, 3, h, w), dtype=np.uint8)
    planes[1, 2, -1, :4] = [0, 5, 240, 255]
    src = str(tmp_path / "in.y4m")
    props = video.parse_color_props("pixel_format=yuv444p")
    with video.open_output(src, w, h, Fraction(25), props,
                           format="y4m") as wr:
        for f in planes:
            wr.write_frame(list(f), raw=True)
    out = str(tmp_path / "copy.y4m")
    assert transcode_tool.main(["-q", src, out]) == 0
    with video.open_input(out) as r:
        got = [r.read_frame(raw=True) for _ in range(3)]
    for t in range(3):
        for c in range(3):
            np.testing.assert_array_equal(got[t][c], planes[t, c])


def test_slab_batch_byte_identical(tmp_path):
    """--slab-batch N runs several slabs' blocks as one dispatch; the
    output is byte-identical to the streaming per-slab run, including
    the --eval `bz` variable (which rides per-block when batched) and
    the sequential dither."""
    import numpy as np
    from fractions import Fraction
    from dspfun_tpu.io import video
    from dspfun_tpu.tools import motion as motion_tool

    rng = np.random.default_rng(31)
    props = video.parse_color_props("pixel_format=yuv420p")
    clip = str(tmp_path / "c.y4m")
    with video.open_output(clip, 32, 16, Fraction(25), props) as wr:
        for _ in range(20):  # 5 slabs of depth 4: batch 3 hits the tail
            wr.write_frame([rng.integers(0, 256, (16, 32)).astype(float),
                            rng.integers(0, 256, (8, 16)).astype(float),
                            rng.integers(0, 256, (8, 16)).astype(float)],
                           raw=True)
    for extra in ([], ["--eval", "c*gte(bz,2)"], ["-q", "8", "-d"]):
        a, b = str(tmp_path / "a.y4m"), str(tmp_path / "b.y4m")
        args = ["-Q", "-b", "8x8x4", "-p", "0x0x0-4x4x2", "-D", "0", *extra]
        assert motion_tool.main([*args, clip, a]) == 0
        assert motion_tool.main([*args, "--slab-batch", "3", clip, b]) == 0
        assert open(a, "rb").read() == open(b, "rb").read(), extra
