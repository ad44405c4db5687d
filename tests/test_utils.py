"""Aux subsystem tests: profiling, checkpoint/resume, wisdom cache."""

import os

import numpy as np

from dspfun_tpu.io import video
from dspfun_tpu.utils import checkpoint, profiling
from dspfun_tpu.tools import motion as motion_tool


def test_stage_timer(capsys, monkeypatch):
    monkeypatch.setenv("DSPFUN_TIMINGS", "1")
    with profiling.stage("demo"):
        pass
    assert "demo:" in capsys.readouterr().err


def test_checkpoint_state_roundtrip(tmp_path):
    p = str(tmp_path / "state.json")
    assert checkpoint.load_state(p) == {}
    checkpoint.save_state(p, {"slab": 3})
    assert checkpoint.load_state(p)["slab"] == 3


def test_motion_resume_continues_output(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.random((6, 8, 8, 3)).astype(np.float32)
    src = str(tmp_path / "in.fvid")
    from fractions import Fraction

    with video.open_output(src, 8, 8, Fraction(25), format="fvid") as w:
        for f in frames:
            w.write_frame_rgb(f)

    full = str(tmp_path / "full.fvid")
    assert motion_tool.main(["-Q", "-b", "8x8x2", src, full]) == 0

    # simulate an interrupted run: process only the first slab by
    # recording the state as if slab 1 of 3 was done
    part = str(tmp_path / "part.fvid")
    state = str(tmp_path / "state.json")
    assert motion_tool.main(["-Q", "-b", "8x8x2", "--frames", "2",
                             "--resume-file", state, src, part]) == 0
    st = checkpoint.load_state(state)
    assert st["slab"] == 1
    # now resume the full-length job: state newres mismatch (d differs)
    # is ignored, so rewrite with the full-run newres and slab=1
    checkpoint.save_state(state, {"slab": 1, "newres": [8, 8, 6]})
    assert motion_tool.main(["-Q", "-b", "8x8x2", "--resume-file", state,
                             src, part]) == 0

    with video.open_input(full) as a, video.open_input(part) as b:
        assert b.frames == 6
        for _ in range(6):
            fa = a.read_frame_rgb()
            fb = b.read_frame_rgb()
            np.testing.assert_allclose(fa, fb, atol=1e-6)


def test_y4m_append_mode(tmp_path):
    from fractions import Fraction

    path = str(tmp_path / "c.y4m")
    rgb = np.full((4, 4, 3), 0.5)
    with video.open_output(path, 4, 4, Fraction(25)) as w:
        w.write_frame_rgb(rgb)
    with video.open_output(path, 4, 4, Fraction(25), append=True) as w:
        w.write_frame_rgb(rgb)
    with video.open_input(path) as r:
        assert r.frames == 2


def test_scan_resume_matches_single_run(tmp_path):
    """scan --resume-file: interrupt after N frames, rerun, outputs
    concatenate to the uninterrupted run (completed frames become
    prefill so the reconstruction state carries over)."""
    import numpy as np
    from PIL import Image

    from dspfun_tpu.io import video
    from dspfun_tpu.tools import scan as scan_tool

    rng = np.random.default_rng(0)
    src = str(tmp_path / "s.png")
    Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)).save(src)

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    full = str(tmp_path / "full.fvid")
    args = ["-q", "-m", "zig", "-S", "16", "-v"]
    assert scan_tool.main([*args, src, full]) == 0
    ref = frames_of(full)

    part = str(tmp_path / "part.fvid")
    state = str(tmp_path / "state.json")
    # first run limited to 5 frames, recording state
    assert scan_tool.main([*args, "-n", "5", "--resume-file", state,
                           src, part]) == 0
    # hack: the limited run records nframes=5; rewrite cfg to the full
    # schedule so the resume matches the full-run flags
    import json

    st = json.load(open(state))
    st["cfg"][-1] = ref.shape[0]
    json.dump(st, open(state, "w"))
    assert scan_tool.main([*args, "--resume-file", state, src, part]) == 0
    got = frames_of(part)
    assert got.shape[0] == ref.shape[0]
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_zoom_resume_appends(tmp_path):
    import numpy as np
    from PIL import Image

    from dspfun_tpu.io import video
    from dspfun_tpu.tools import zoom as zoom_tool

    rng = np.random.default_rng(1)
    src = str(tmp_path / "s.png")
    Image.fromarray(rng.integers(0, 256, (8, 12, 3)).astype(np.uint8)).save(src)

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    full = str(tmp_path / "full.fvid")
    args = ["-s", "2", "-n", "4", "-S", "1+i", "-q"]
    assert zoom_tool.main([*args, src, full]) == 0
    ref = frames_of(full)

    part = str(tmp_path / "part.fvid")
    state = str(tmp_path / "state.json")
    import json

    json.dump({"cfg": [24, 16, 4], "frame": 0}, open(state, "w"))
    assert zoom_tool.main([*args, "--resume-file", state, src, part]) == 0
    # simulate interruption: rewind the state and truncate the output
    st = json.load(open(state))
    assert st["frame"] == 4
    data = open(part, "rb").read()
    # cut after 2 frames: header + 2 * (6 + frame_bytes)
    with video.open_input(part) as r:
        fb = r.pix_fmt.frame_bytes(r.width, r.height)
        hdr_end = data.index(b"FRAME")
    open(part, "wb").write(data[: hdr_end + 2 * (6 + fb)])
    json.dump({"cfg": [24, 16, 4], "frame": 2}, open(state, "w"))
    assert zoom_tool.main([*args, "--resume-file", state, src, part]) == 0
    got = frames_of(part)
    np.testing.assert_allclose(got, ref, atol=1e-6)
