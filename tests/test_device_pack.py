"""Device-side frame packing (io/device_pack) vs the host writer path
(VERDICT r3 item 9: the frame-emission D2H bottleneck)."""

from fractions import Fraction

import numpy as np
import pytest

from dspfun_tpu.io import video
from dspfun_tpu.io.device_pack import make_packer


def _host_payload(frame, pf, props):
    planes = video.rgb_to_planes(frame, pf, props)
    return b"".join(
        video._quantize_plane(p, pf, i, props.color_range).tobytes()
        for i, p in enumerate(planes))


@pytest.mark.parametrize("fmt,range_", [
    ("yuv444p", "mpeg"), ("yuv444p", "jpeg"), ("yuv420p", "mpeg"),
    ("gray", "jpeg"), ("yuv444p16le", "mpeg"), ("gbrpf32le", "jpeg"),
    ("grayf32le", "jpeg"),
])
def test_packed_payload_matches_host_writer(fmt, range_):
    rng = np.random.default_rng(3)
    h, w = 10, 14
    frames = rng.random((3, h, w, 3)).astype(np.float32)
    props = video.parse_color_props(
        f"pixel_format={fmt}:color_range={'pc' if range_ == 'jpeg' else 'tv'}")
    pf = video.PIXEL_FORMATS[fmt]
    packer = make_packer(pf, props, h, w)
    assert packer is not None
    packed = np.asarray(packer(frames))
    for k in range(3):
        got = packed[k].tobytes()
        want = _host_payload(frames[k].astype(np.float64), pf, props)
        assert len(got) == len(want)
        if pf.is_float:
            np.testing.assert_allclose(
                np.frombuffer(got, np.float32),
                np.frombuffer(want, np.float32), atol=1e-7)
        else:
            dt = np.uint8 if pf.depth <= 8 else np.uint16
            g = np.frombuffer(got, dt).astype(np.int32)
            w_ = np.frombuffer(want, dt).astype(np.int32)
            # f32 device vs f64 host rounding can differ by 1 LSB at
            # exact .5 boundaries; must be rare and never larger
            diff = np.abs(g - w_)
            assert diff.max() <= 1
            assert (diff != 0).mean() < 0.02


def test_scan_tool_packed_output_matches_pane_path(tmp_path):
    """The scan CLI's packed y4m emission must match the host-writer
    path (forced via the visualize pane, then cropped)."""
    from PIL import Image

    from dspfun_tpu.tools import scan as scan_tool

    rng = np.random.default_rng(5)
    src = str(tmp_path / "s.png")
    Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
                    ).save(src)
    packed, paned = str(tmp_path / "p.y4m"), str(tmp_path / "v.y4m")
    assert scan_tool.main(["-q", "-m", "zig", "-S", "32", src, packed]) == 0
    assert scan_tool.main(["-q", "-m", "zig", "-S", "32", "-v",
                           src, paned]) == 0

    def frames_of(path, crop_w=None):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f[:, :crop_w] if crop_w else f)
        return np.stack(out)

    a = frames_of(packed)
    b = frames_of(paned, crop_w=16)
    np.testing.assert_allclose(a, b, atol=2 / 255.0)


def test_zoom_tool_packed_float_output(tmp_path):
    """zoom's packed fvid emission is bit-identical to the reference
    host path (float reorder only)."""
    from PIL import Image

    from dspfun_tpu.tools import zoom as zoom_tool

    rng = np.random.default_rng(6)
    src = str(tmp_path / "s.png")
    Image.fromarray(rng.integers(0, 256, (12, 12, 3)).astype(np.uint8)
                    ).save(src)
    out = str(tmp_path / "z.fvid")
    assert zoom_tool.main(["-s", "2", "-q", src, out]) == 0
    with video.open_input(out) as r:
        f = r.read_frame_rgb()
        assert f is not None and f.shape == (24, 24, 3)


def test_motion_tool_packed_vs_converted_path(tmp_path):
    """The motion CLI's packed emission must byte-match the host write
    path.  Forcing `--csp` output conversion disables packing, giving a
    host-path reference for the same edit."""
    from dspfun_tpu.tools import motion as motion_tool

    rng = np.random.default_rng(8)
    clip = str(tmp_path / "in.fvid")
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(clip, 16, 16, Fraction(25), props) as wr:
        for _ in range(4):
            wr.write_frame_rgb(rng.random((16, 16, 3)).astype(np.float32))
    packed = str(tmp_path / "p.fvid")
    assert motion_tool.main(["-Q", "-b", "8x8x2", "-D", "0.5",
                             clip, packed]) == 0

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    # independent reference: the library chain on the same clip
    import jax.numpy as jnp

    from dspfun_tpu.models import motion_pipeline as mp

    src = frames_of(clip)
    g = mp.plan_geometry(16, 16, 4, 1, block=mp.Dims(8, 8, 2))[0]
    got = frames_of(packed)
    assert got.shape == src.shape
    # damp=0.5 over everything outside the (default full) bandpass box;
    # spot-check the G plane (gbrp plane 0 = rgb channel 1) via
    # filter_blocks directly
    params = mp.MotionParams(damp=0.5)
    plane_g = np.stack([f[..., 1] for f in src]) * 255.0
    outs_g = []
    for bz in range(2):
        blocks = mp.frames_to_blocks(plane_g[bz * 2:(bz + 1) * 2], g)
        nb = blocks.shape[0]
        bc = (jnp.asarray(np.arange(nb, dtype=np.int32) % g.nblocks.w),
              jnp.asarray(np.arange(nb, dtype=np.int32) // g.nblocks.w))
        o, _ = mp.filter_blocks(jnp.asarray(blocks), mp.make_plans(g),
                                bc, jnp.asarray(bz), geom=g, params=params,
                                plane_index=0, nplanes=3)
        outs_g.append(mp.blocks_to_frames(np.asarray(o), g))
    wantg = np.concatenate(outs_g) / 255.0
    np.testing.assert_allclose(got[..., 1], wantg, atol=1e-4)


def test_scan_tool_packed_linear_light(tmp_path):
    """-g packed emission parity: the sRGB OETF runs on device before
    packing; the pane-forced host path must byte-match."""
    from PIL import Image

    from dspfun_tpu.tools import scan as scan_tool

    rng = np.random.default_rng(12)
    src = str(tmp_path / "s.png")
    Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
                    ).save(src)
    packed, paned = str(tmp_path / "p.y4m"), str(tmp_path / "v.y4m")
    assert scan_tool.main(["-q", "-g", "-m", "zig", "-S", "32",
                           src, packed]) == 0
    assert scan_tool.main(["-q", "-g", "-m", "zig", "-S", "32", "-v",
                           src, paned]) == 0

    def frames_of(path, crop_w=None):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f[:, :crop_w] if crop_w else f)
        return np.stack(out)

    np.testing.assert_allclose(frames_of(packed), frames_of(paned, 16),
                               atol=2 / 255.0)


@pytest.mark.parametrize("pix", ["yuv444p", "yuv420p", "gray"])
def test_scan_packed_odd_dims_matches_host(pix, tmp_path):
    """Packed emission on odd dims (17x13; ceil-div chroma planes) is
    byte-exact vs the host writer path across subsampled formats."""
    import dspfun_tpu.io.device_pack as dp
    from PIL import Image

    from dspfun_tpu.tools import scan as scan_tool

    rng = np.random.default_rng(9)
    src = str(tmp_path / "s.png")
    Image.fromarray(rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
                    ).save(src)
    packed, host = str(tmp_path / "p.y4m"), str(tmp_path / "h.y4m")
    argv = ["-q", "-m", "zig", "-S", "64", "--ff-opts",
            f"pixel_format={pix}", src]
    assert scan_tool.main([*argv, packed]) == 0
    orig = dp.make_packer
    dp.make_packer = lambda *args, **kw: None
    try:
        assert scan_tool.main([*argv, host]) == 0
    finally:
        dp.make_packer = orig

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    np.testing.assert_array_equal(frames_of(packed), frames_of(host))
