"""End-to-end scan CLI tests (reference scan/scan.c flag surface)."""

import numpy as np
import pytest

from dspfun_tpu.io import images, video
from dspfun_tpu.tools import scan as scan_tool


@pytest.fixture
def small_png(tmp_path):
    rng = np.random.default_rng(7)
    # smooth-ish content: low-frequency mixture
    y, x = np.mgrid[0:12, 0:16] / 8.0
    img = np.stack(
        [0.5 + 0.4 * np.sin(x + c) * np.cos(y - c) for c in range(3)], axis=-1
    )
    img += rng.normal(0, 0.01, img.shape)
    img = np.clip(img, 0, 1)
    path = str(tmp_path / "in.png")
    images.write_image(path, img)
    return path, img


def test_scan_full_reconstruction_to_fvid(small_png, tmp_path):
    path, img = small_png
    out = str(tmp_path / "out.fvid")
    rc = scan_tool.main(["-m", "zigzag", "-q", path, out])
    assert rc == 0
    with video.open_input(out) as r:
        assert r.frames == 12 * 16
        r.seek_frame(r.frames - 1)
        last = r.read_frame_rgb()
    src = images.read_image(path).pixels
    assert np.max(np.abs(last - src)) < 2e-4


def test_scan_step_and_frames(small_png, tmp_path):
    path, _ = small_png
    out = str(tmp_path / "out.fvid")
    rc = scan_tool.main(["-m", "horiz", "-S", "8", "-n", "5", "-q", path, out])
    assert rc == 0
    with video.open_input(out) as r:
        assert r.frames == 5


def test_scan_visualize_panes(small_png, tmp_path):
    path, _ = small_png
    out = str(tmp_path / "o.fvid")
    rc = scan_tool.main(["-m", "diag", "-v", "-i", "-q", "-n", "3", path, out])
    assert rc == 0
    with video.open_input(out) as r:
        assert (r.width, r.height) == (32, 24)
        f0 = r.read_frame_rgb()
        # frame 0: only (0,0) painted in the viz pane (value 1.0)
        assert f0[0, 16 + 0, 0] == pytest.approx(1.0)
        assert np.count_nonzero(f0[:12, 16:, 0]) == 1


def test_scan_spectrogram_pane(small_png, tmp_path):
    path, _ = small_png
    out = str(tmp_path / "o.fvid")
    rc = scan_tool.main(
        ["-m", "diag", "-s", "-q", "-n", "2", "--spec-opts", "preset=shift",
         path, out]
    )
    assert rc == 0
    with video.open_input(out) as r:
        f0 = r.read_frame_rgb()
        v = f0[0, 16, :]
        assert (v > 0.4).all() and (v < 1.01).all()  # shifted spectrum value


def test_scan_serialize_only(small_png, tmp_path):
    path, _ = small_png
    sfile = str(tmp_path / "scan.txt")
    rc = scan_tool.main(["-m", "zig", "-f", sfile, "-t", "index", path])
    assert rc == 0
    text = open(sfile).read()
    first = text.split("\n")[0].split()
    assert [int(v) for v in first[:3]] == [0, 1, 5]  # zigzag top row


def test_scan_measure_parity(small_png, tmp_path, capsys):
    path, _ = small_png
    out = str(tmp_path / "o.fvid")
    rc = scan_tool.main(["-m", "horizontal", "-q", "-P", path, out])
    assert rc == 0
    err = capsys.readouterr().err
    assert "parity with the original image" in err


def test_scan_offset_with_and_without_skip(small_png, tmp_path):
    path, _ = small_png
    out1 = str(tmp_path / "a.fvid")
    out2 = str(tmp_path / "b.fvid")
    assert scan_tool.main(["-m", "vert", "-O", "20", "-q", "-n", "2", path, out1]) == 0
    assert scan_tool.main(
        ["-m", "vert", "-O", "20", "--skip", "-q", "-n", "2", path, out2]
    ) == 0
    with video.open_input(out1) as r1, video.open_input(out2) as r2:
        a = r1.read_frame_rgb()
        b = r2.read_frame_rgb()
    # filled run has more energy than the skipped run
    assert a.var() > b.var() * 0.5 and not np.allclose(a, b)


def test_scan_invalid_method_lists_options(small_png, capsys):
    path, _ = small_png
    rc = scan_tool.main(["-m", "nope", path])
    assert rc == 0
    assert "Invalid method" in capsys.readouterr().err


def test_scan_y4m_output(small_png, tmp_path):
    path, _ = small_png
    out = str(tmp_path / "o.y4m")
    rc = scan_tool.main(["-m", "diag", "-q", "-n", "2", "--ff-rate", "30", path, out])
    assert rc == 0
    head = open(out, "rb").readline().decode()
    assert head.startswith("YUV4MPEG2 W16 H12 F30:1")


def test_scan_radial_rounding_option(small_png, tmp_path):
    path, _ = small_png
    sfile1 = str(tmp_path / "a.txt")
    sfile2 = str(tmp_path / "b.txt")
    assert scan_tool.main(["-m", "radial", "-o", "ceil", "-f", sfile1, path]) == 0
    assert scan_tool.main(["-m", "radial", "-o", "floor", "-f", sfile2, path]) == 0
    assert open(sfile1).read() != open(sfile2).read()


def test_scan_evalxy_cli(small_png, tmp_path):
    path, _ = small_png
    out = str(tmp_path / "o.fvid")
    rc = scan_tool.main(["-m", "evalxy", "-o", "x+y", "-q", "-n", "2",
                         path, out])
    assert rc == 0
    with video.open_input(out) as r:
        assert r.frames == 2


def test_scan_file_method_cli(small_png, tmp_path):
    path, _ = small_png
    sfile = str(tmp_path / "s.txt")
    assert scan_tool.main(["-m", "zig", "-f", sfile, path]) == 0
    out = str(tmp_path / "o.fvid")
    rc = scan_tool.main(["-m", "file", "-o", sfile, "-q", "-n", "2",
                         path, out])
    assert rc == 0
