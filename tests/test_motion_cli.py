"""motion / rotate / transcode CLI end-to-end tests."""

from fractions import Fraction

import numpy as np
import pytest

from dspfun_tpu.io import video
from dspfun_tpu.tools import motion as motion_tool
from dspfun_tpu.tools import rotate as rotate_tool
from dspfun_tpu.tools import transcode as transcode_tool


def write_clip(path, frames, fmt="fvid", pix="gbrpf32le", rate=Fraction(25)):
    t, h, w = frames.shape[:3]
    props = video.parse_color_props(f"pixel_format={pix}")
    with video.open_output(path, w, h, rate, props, format=fmt) as wr:
        for f in frames:
            wr.write_frame_rgb(f)


def read_clip(path):
    with video.open_input(path) as r:
        out = []
        while True:
            f = r.read_frame_rgb()
            if f is None:
                break
            out.append(f)
    return np.stack(out)


@pytest.fixture
def clip(tmp_path):
    rng = np.random.default_rng(11)
    frames = rng.random((4, 8, 16, 3)).astype(np.float32)
    path = str(tmp_path / "in.fvid")
    write_clip(path, frames)
    return path, frames


def test_transcode_lossless_float(clip, tmp_path):
    path, frames = clip
    out = str(tmp_path / "out.fvid")
    assert transcode_tool.main(["-q", path, out]) == 0
    got = read_clip(out)
    np.testing.assert_allclose(got, frames, atol=1e-7)


def test_transcode_offset_frames(clip, tmp_path):
    path, frames = clip
    out = str(tmp_path / "o.fvid")
    assert transcode_tool.main(["-q", "-s", "1:2", path, out]) == 0
    got = read_clip(out)
    assert got.shape[0] == 2
    np.testing.assert_allclose(got, frames[1:3], atol=1e-7)


def test_rotate_volume_matches_reference_loop():
    import itertools

    rng = np.random.default_rng(12)
    vol = rng.random((3, 4, 5, 1))
    # exhaustive: all 6 permutations x 8 sign patterns (pins the
    # reference's invert[map[i]] indexing quirk on every 3-cycle)
    specs = ["".join(s + a for s, a in zip(signs, perm))
             for perm in itertools.permutations("xyz")
             for signs in itertools.product("+-", repeat=3)]
    for spec in specs:
        axmap, inv = rotate_tool.parse_axis_map(spec)
        got = rotate_tool.rotate_volume(vol, axmap, inv)
        lens = [5, 4, 3]  # x, y, z
        # direct transcription of reference rotate.c:159-172
        out_shape = (lens[axmap[2]], lens[axmap[1]], lens[axmap[0]])
        expect = np.zeros(out_shape + (1,))
        axis = [0, 0, 0]
        for a2 in range(lens[axmap[2]]):
            axis[axmap[2]] = a2
            for a1 in range(lens[axmap[1]]):
                axis[axmap[1]] = a1
                for a0 in range(lens[axmap[0]]):
                    axis[axmap[0]] = a0
                    def INV(i):
                        return (lens[i] - axis[i] - 1) if inv[axmap[i]] else axis[i]
                    expect[a2, a1, a0] = vol[INV(2), INV(1), INV(0)]
        np.testing.assert_allclose(got, expect, err_msg=spec)


def test_rotate_cli_self_inverse(clip, tmp_path):
    path, frames = clip
    mid = str(tmp_path / "rot.fvid")
    back = str(tmp_path / "back.fvid")
    assert rotate_tool.main(["-q", "zyx", path, mid]) == 0
    with video.open_input(mid) as r:
        assert (r.width, r.height) == (4, 8)  # x<->z swapped: w=T=4? no: w'=len[z]=4
        assert r.frames == 16
    assert rotate_tool.main(["-q", "zyx", mid, back]) == 0
    got = read_clip(back)
    np.testing.assert_allclose(got, frames, atol=1e-7)


def test_rotate_r_same_scales_rate(clip, tmp_path):
    path, _ = clip
    out = str(tmp_path / "r.fvid")
    assert rotate_tool.main(["-q", "-r", "same", "zyx", path, out]) == 0
    with video.open_input(out) as r:
        # fps = len[map[2]] * 25 / len[2] = 16*25/4
        assert r.rate == Fraction(16 * 25, 4)


def test_motion_identity(clip, tmp_path):
    path, frames = clip
    out = str(tmp_path / "id.fvid")
    assert motion_tool.main(["-Q", "-b", "8x8x2", path, out]) == 0
    got = read_clip(out)
    np.testing.assert_allclose(got, frames, atol=2e-3)


def test_motion_no_outfile_prints_dims(clip, capsys):
    path, _ = clip
    assert motion_tool.main([path]) == 0
    assert "source: 16 x 8 x 4" in capsys.readouterr().err


def test_motion_temporal_lowpass(clip, tmp_path):
    path, frames = clip
    out = str(tmp_path / "lp.fvid")
    assert motion_tool.main(
        ["-Q", "-b", "0x0x4", "-p", "0x0x0-0x0x1", path, out]
    ) == 0
    got = read_clip(out)
    # only temporal DC kept: all frames identical = temporal mean
    np.testing.assert_allclose(got[0], got[3], atol=1e-4)
    np.testing.assert_allclose(got[0], frames.mean(axis=0), atol=2e-3)


def test_motion_scale_up(clip, tmp_path):
    path, frames = clip
    out = str(tmp_path / "up.fvid")
    assert motion_tool.main(
        ["-Q", "-b", "8x8x1", "-s", "16x16x1", path, out]
    ) == 0
    with video.open_input(out) as r:
        assert (r.width, r.height) == (32, 16)


def test_motion_time_scale_changes_rate_and_frames(clip, tmp_path):
    path, _ = clip
    out = str(tmp_path / "t.fvid")
    assert motion_tool.main(
        ["-Q", "-b", "0x0x2", "-s", "0x0x4", path, out]
    ) == 0
    with video.open_input(out) as r:
        assert r.frames == 8
        assert r.rate == Fraction(50)  # 25 * 4/2


def test_motion_spec_ispec_roundtrip(clip, tmp_path):
    path, frames = clip
    spec = str(tmp_path / "spec.fvid")
    back = str(tmp_path / "back.fvid")
    assert motion_tool.main(
        ["-Q", "-b", "8x8x2", "--spectrogram=shift", path, spec]
    ) == 0
    assert motion_tool.main(
        ["-Q", "-b", "8x8x2", "--ispectrogram=shift", spec, back]
    ) == 0
    got = read_clip(back)
    np.testing.assert_allclose(got, frames, atol=5e-3)


def test_motion_quant_stats(clip, tmp_path, capsys):
    path, _ = clip
    out = str(tmp_path / "q.fvid")
    assert motion_tool.main(["-q", "5", "-b", "8x8x2", path, out]) == 0
    err = capsys.readouterr().err
    assert "coeffs:" in err and "zeroes:" in err


def test_motion_eval(clip, tmp_path):
    path, frames = clip
    out = str(tmp_path / "e.fvid")
    assert motion_tool.main(["-Q", "--eval", "c*0.5", path, out]) == 0
    got = read_clip(out)
    np.testing.assert_allclose(got, frames * 0.5, atol=2e-3)


def test_motion_yuv420_chroma_blocks(tmp_path):
    """y4m 4:2:0 input: chroma planes get half-size blocks."""
    rng = np.random.default_rng(13)
    frames = rng.random((2, 16, 16, 3)).astype(np.float32)
    path = str(tmp_path / "in.y4m")
    write_clip(path, frames, fmt="y4m", pix="yuv420p")
    out = str(tmp_path / "o.y4m")
    assert motion_tool.main(["-Q", "-b", "8x8x1", path, out]) == 0
    a = read_clip(path)
    b = read_clip(out)
    # identity chain through 8-bit quantisation
    assert np.abs(a - b).max() < 0.02


def test_motion_dither_8bit(tmp_path):
    rng = np.random.default_rng(14)
    frames = rng.random((1, 8, 8, 3)).astype(np.float32)
    path = str(tmp_path / "in.y4m")
    write_clip(path, frames, fmt="y4m", pix="yuv444p")
    out = str(tmp_path / "d.y4m")
    assert motion_tool.main(["-Q", "--dither", "-q", "3", path, out]) == 0
    with video.open_input(out) as r:
        assert r.read_frame() is not None


def test_overlong_frame_budget_fails(clip, tmp_path):
    """-s 0:100 on a 4-frame clip: transcode takes the budget unclamped
    (transcode.c:97 `nframes = frames`), reads past EOF and fails;
    rotate clamps to the known count (rotate.c:117 FFMIN) and
    succeeds with all 4 frames."""
    path, _ = clip
    assert transcode_tool.main(["-q", "-s", "0:100", path,
                                str(tmp_path / "t.fvid")]) == 1
    assert rotate_tool.main(["-q", "-s", "0:100", "xyz", path,
                             str(tmp_path / "r.fvid")]) == 0
    assert read_clip(str(tmp_path / "r.fvid")).shape[0] == 4
    # within budget still succeeds
    assert transcode_tool.main(["-q", "-s", "1:2", path,
                                str(tmp_path / "ok.fvid")]) == 0
    assert read_clip(str(tmp_path / "ok.fvid")).shape[0] == 2


def test_plan_cache_keys_on_precision(clip, tmp_path, monkeypatch):
    """The in-process device-plan cache must key on the ACTIVE
    precision policy: make_plans() sizes its digit splits from
    get_precision(), so a rerun under a different policy reusing the
    first run's plans would silently compute with the wrong accuracy
    class (round-5 review finding).  coeff is a storage dtype and the
    intermediate modes agree to ~1e-7 on 4-point blocks by design, so
    the pin is structural: distinct policies occupy distinct cache
    slots, and returning to a policy returns its exact bytes."""
    from dspfun_tpu.core import precision as pr

    path, _ = clip
    args = ["-Q", "-b", "4x4x2", "-D", "0.5"]

    def run(tag, precision):
        pr.set_precision(pr.Precision.parse(precision))
        out = str(tmp_path / f"{tag}.fvid")
        assert motion_tool.main([*args, path, out]) == 0
        return read_clip(out)

    motion_tool._PLAN_CACHE.clear()
    try:
        a1 = run("p1", "f32:hilo")
        run("p2", "f32:f32")
        a2 = run("p3", "f32:hilo")
    finally:
        monkeypatch.setattr(pr, "_explicit", False)
        pr.apply_tool_default("motion")
    precisions = {k[1] for k in motion_tool._PLAN_CACHE}
    assert precisions == {pr.Precision.parse("f32:hilo"),
                          pr.Precision.parse("f32:f32")}
    np.testing.assert_array_equal(a1, a2)
