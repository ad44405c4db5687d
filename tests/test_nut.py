"""Native NUT container (VERDICT r3 item 4): the reference's default
`.nut` output paths (motion.c:447) must open and write with zero
external binaries — rawvideo payloads, spec-exact packet structure."""

from fractions import Fraction

import numpy as np
import pytest
from PIL import Image

from dspfun_tpu.io import video
from dspfun_tpu.io.nut import (
    FILE_ID, NutReader, crc32_nut, put_s, put_v, _Parser,
)


def test_value_coding_roundtrip():
    buf = bytearray()
    vals = [0, 1, 127, 128, 300, 2**21, 2**40]
    for v in vals:
        put_v(buf, v)
    svals = [0, 1, -1, 2, -2, 1000, -1000, 2**30, -2**30]
    for v in svals:
        put_s(buf, v)
    p = _Parser(bytes(buf))
    assert [p.get_v() for _ in vals] == vals
    assert [p.get_s() for _ in svals] == svals
    assert p.remaining() == 0


def test_crc32_nut_known_vector():
    # poly 0x104C11DB7, init 0, MSB-first, no reflection/xor: "123456789"
    # under CRC-32/MPEG-2 with init 0 (not 0xFFFFFFFF)
    assert crc32_nut(b"") == 0
    c1 = crc32_nut(b"123456789")
    # incremental == one-shot
    assert crc32_nut(b"456789", crc32_nut(b"123")) == c1


def _roundtrip(path, frames, props_str, rate=Fraction(30)):
    props = video.parse_color_props(props_str)
    h, w = frames.shape[1:3]
    with video.open_output(str(path), w, h, rate, props) as wr:
        assert type(wr).__name__ == "NutVideoWriter"
        for f in frames:
            wr.write_frame_rgb(f)
    with video.open_input(str(path)) as r:
        assert type(r).__name__ == "NutVideoReader"
        got = []
        while True:
            f = r.read_frame_rgb()
            if f is None:
                break
            got.append(f)
        return r, np.stack(got)


def test_nut_float_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.random((4, 10, 14, 3)).astype(np.float32)
    r, got = _roundtrip(tmp_path / "a.nut", frames,
                        "pixel_format=gbrpf32le:color_range=jpeg:"
                        "color_trc=iec61966-2-1:colorspace=rgb")
    np.testing.assert_allclose(got, frames, atol=1e-6)
    assert r.frames == 4
    assert r.rate == Fraction(30)
    assert r.props.color_trc == "iec61966-2-1"
    assert r.props.color_space == "rgb"


def test_nut_yuv_tag_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.random((3, 8, 8, 3)).astype(np.float32)
    r, got = _roundtrip(tmp_path / "b.nut", frames, "pixel_format=yuv444p")
    assert r.pix_fmt.name == "yuv444p"
    np.testing.assert_allclose(got, frames, atol=0.05)  # 8-bit yuv loss


def test_nut_highdepth_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    frames = rng.random((2, 8, 8, 3)).astype(np.float32)
    r, got = _roundtrip(tmp_path / "c.nut", frames,
                        "pixel_format=yuv444p16le")
    assert r.pix_fmt.name == "yuv444p16le"
    np.testing.assert_allclose(got, frames, atol=2e-3)


def test_nut_seek_and_append(tmp_path):
    rng = np.random.default_rng(3)
    frames = rng.random((5, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "d.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(path), 8, 6, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    with video.open_input(str(path)) as r:
        r.seek_frame(3)
        np.testing.assert_allclose(r.read_frame_rgb(), frames[3], atol=1e-6)
    with video.open_output(str(path), 8, 6, Fraction(25), props,
                           append=True) as wr:
        assert wr.frame_index == 5
        wr.write_frame_rgb(frames[0])
    with video.open_input(str(path)) as r:
        assert r.frames == 6


def test_nut_magic_over_wrong_extension(tmp_path):
    """Content sniffing: NUT bytes under a foreign name still open
    natively; fvid bytes under .nut open as fvid."""
    rng = np.random.default_rng(4)
    frames = rng.random((2, 6, 8, 3)).astype(np.float32)
    props = video.parse_color_props("pixel_format=gbrpf32le")
    nut_as_avi = tmp_path / "x.avi"
    with video.open_output(str(nut_as_avi), 8, 6, Fraction(25), props,
                           format="nut") as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    with video.open_input(str(nut_as_avi)) as r:
        assert type(r).__name__ == "NutVideoReader"
        assert r.frames == 2
    fvid_as_nut = tmp_path / "y.nut"
    with video.open_output(str(fvid_as_nut), 8, 6, Fraction(25), props,
                           format="fvid") as wr:
        wr.write_frame_rgb(frames[0])
    with video.open_input(str(fvid_as_nut)) as r:
        assert "Fvid" in type(r).__name__ or "NativeBacked" in type(r).__name__


def test_nut_foreign_codec_routes_to_bridge(tmp_path):
    """A genuinely foreign codec on a .nut output is bridge territory
    (which raises without an ffmpeg binary here); -c ffv1 is native
    since the io/ffv1.py codec landed (reference default,
    motion.c:447)."""
    props = video.parse_color_props("pixel_format=yuv420p")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        video.open_output(str(tmp_path / "e.nut"), 8, 6, Fraction(25),
                          props, codec="h264")
    with video.open_output(str(tmp_path / "f.nut"), 8, 6, Fraction(25),
                           props, codec="ffv1") as wr:
        assert wr.codec == "ffv1"
        wr.write_frame([np.zeros((6, 8))] + [np.zeros((3, 4))] * 2,
                       raw=True)
    with video.open_input(str(tmp_path / "f.nut")) as r:
        assert r.pix_fmt.name == "yuv420p"
        assert all(np.all(p == 0) for p in r.read_frame(raw=True))


def test_nut_headers_parse_standalone(tmp_path):
    """The raw NutReader exposes spec-level structures (startcodes,
    framecode table, stream header fields)."""
    rng = np.random.default_rng(5)
    frames = rng.random((2, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "f.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(path), 8, 6, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    raw = path.read_bytes()
    assert raw.startswith(FILE_ID)
    with open(path, "rb") as f:
        nr = NutReader(f)
        st = nr.state
        assert st.streams[0]["width"] == 8
        assert st.streams[0]["height"] == 6
        assert st.flags[ord("N")] & 0x2000  # 'N' framecode invalid
        assert st.time_bases == [Fraction(1, 25)]
        pts0, data0 = nr.read_frame_bytes()
        assert pts0 == 0 and len(data0) == 8 * 6 * 3 * 4


@pytest.mark.parametrize("tool", ["motion", "zoom", "scan"])
def test_tools_roundtrip_through_nut(tool, tmp_path):
    """motion/zoom/scan write and (for motion) read .nut natively —
    the reference's default output path with zero external binaries."""
    from dspfun_tpu.tools import motion as motion_tool
    from dspfun_tpu.tools import scan as scan_tool
    from dspfun_tpu.tools import zoom as zoom_tool

    rng = np.random.default_rng(6)
    src_png = tmp_path / "src.png"
    Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
                    ).save(src_png)
    out = tmp_path / f"{tool}.nut"
    if tool == "zoom":
        assert zoom_tool.main(["-s", "2", "-q", str(src_png), str(out)]) == 0
    elif tool == "scan":
        assert scan_tool.main(["-q", "-m", "zig", "-S", "64",
                               str(src_png), str(out)]) == 0
    else:
        clip = tmp_path / "clip.nut"
        props = video.parse_color_props("pixel_format=gbrpf32le")
        with video.open_output(str(clip), 16, 16, Fraction(25), props) as wr:
            for _ in range(4):
                wr.write_frame_rgb(rng.random((16, 16, 3)))
        assert motion_tool.main(["-Q", "-b", "8x8x2", "-D", "0.5",
                                 str(clip), str(out)]) == 0
    with video.open_input(str(out)) as r:
        assert type(r).__name__ == "NutVideoReader"
        n = 0
        while r.read_frame_rgb() is not None:
            n += 1
        assert n >= 1


def test_nut_truncated_and_corrupt_streams(tmp_path):
    """Robustness: a truncated tail ends the stream cleanly after the
    complete frames (no garbage frame), and a corrupted *stream
    header* still raises at open — without valid headers the file is
    undecodable (the framecode table is unknown)."""
    rng = np.random.default_rng(9)
    frames = rng.random((3, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "t.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(path), 8, 6, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    raw = path.read_bytes()

    # truncate mid-frame: reader yields the complete frames, then the
    # damaged tail resyncs to EOF -> clean end of stream
    cut = tmp_path / "cut.nut"
    cut.write_bytes(raw[: len(raw) - 100])
    with open(cut, "rb") as f:
        nr = NutReader(f)
        assert nr.read_frame_bytes() is not None
        assert nr.read_frame_bytes() is not None
        assert nr.read_frame_bytes() is None
        assert nr.damaged == 1

    # flip a byte inside the stream-header packet payload: CRC mismatch
    bad = bytearray(raw)
    idx = raw.index(b"DSPF")  # inside the stream header fourcc
    bad[idx] ^= 0xFF
    badf = tmp_path / "bad.nut"
    badf.write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="checksum"):
        with open(badf, "rb") as f:
            NutReader(f)


def test_nut_resync_at_syncpoint(tmp_path):
    """Mid-file damage recovers at the next syncpoint (the spec's
    resync procedure): only the damaged frame is lost."""
    from dspfun_tpu.io.nut import SYNCPOINT_STARTCODE

    rng = np.random.default_rng(10)
    frames = rng.random((4, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "r.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(path), 8, 6, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    raw = bytearray(path.read_bytes())

    # locate frame 1's header: second syncpoint packet (8-byte
    # startcode + 1-byte forward_ptr + 2-byte payload + 4-byte CRC),
    # then its framecode byte; corrupt it to an invalid code
    pat = SYNCPOINT_STARTCODE.to_bytes(8, "big")
    sp2 = raw.index(pat, raw.index(pat) + 1)
    assert raw[sp2 + 15] == 1  # framecode byte of frame 1
    raw[sp2 + 15] = 0xFF
    dam = tmp_path / "dam.nut"
    dam.write_bytes(bytes(raw))

    with open(dam, "rb") as f:
        nr = NutReader(f)
        got = []
        while True:
            r = nr.read_frame_bytes()
            if r is None:
                break
            got.append(r)
    assert nr.damaged == 1
    assert [pts for pts, _ in got] == [0, 2, 3]  # frame 1 lost, rest intact
    clean = []
    with open(path, "rb") as f:
        cr = NutReader(f)
        while True:
            r = cr.read_frame_bytes()
            if r is None:
                break
            clean.append(r)
    for (pts, data) in got:
        assert data == clean[pts][1]

    # the container-level reader sees the same recovered stream
    with video.open_input(str(dam)) as r:
        n = 0
        while r.read_frame() is not None:
            n += 1
        assert n == 3


def test_nut_main_header_framecode_count_interop(tmp_path):
    """ffmpeg's decode_main_header validates count <= 256 - (i <= 'N')
    - i per table entry ('N' consumes NO count); 253 at i=3 made every
    written file unreadable by libavformat (round-4 review)."""
    path = tmp_path / "ic.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(path), 8, 6, Fraction(25), props) as wr:
        wr.write_frame_rgb(np.zeros((6, 8, 3), np.float32))
    from dspfun_tpu.io.nut import MAIN_STARTCODE

    raw = path.read_bytes()
    i0 = raw.index(MAIN_STARTCODE.to_bytes(8, "big")) + 8
    p = _Parser(raw[i0 + 1:])          # 1-byte forward_ptr for our header
    version = p.get_v()
    assert version == 3
    p.get_v()                          # stream_count
    p.get_v()                          # max_distance
    tb = p.get_v()
    for _ in range(tb):
        p.get_v(); p.get_v()
    i = 0
    while i < 256:
        p.get_v()                      # tmp_flag
        fields = p.get_v()
        if fields > 0:
            p.get_s()
        if fields > 1:
            p.get_v()
        if fields > 2:
            p.get_v()
        if fields > 3:
            p.get_v()
        if fields > 4:
            p.get_v()
        count = p.get_v() if fields > 5 else 1
        # ffmpeg nutdec check: 'N' is excluded from count
        assert 0 < count <= 256 - (1 if i <= ord("N") else 0) - i, (i, count)
        for j in range(count):
            if i == ord("N"):
                i += 1                 # reserved, consumes no count
            i += 1
    assert i == 256


def test_nut_per_stream_pts_prediction(tmp_path):
    """Interleaved frames of a second stream must not perturb the
    video stream's pts prediction (the spec's per-stream model; a
    shared last_pts decoded video pts through the audio timeline)."""
    from dspfun_tpu.io.nut import (
        MSB_PTS_SHIFT, NutWriter, SYNCPOINT_STARTCODE, _write_packet,
        crc32_nut, put_v,
    )

    rng = np.random.default_rng(21)
    frames = rng.random((3, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "pts.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with open(path, "wb") as f:
        nw = NutWriter(f, 8, 6, Fraction(25), video.PIXEL_FORMATS["gbrpf32le"],
                       props)
        nw.write_header()
        nw._header_written = True

        def frame(code, sid, coded_pts, payload):
            hdr = bytearray([code])
            if sid is not None:
                put_v(hdr, sid)
            put_v(hdr, coded_pts)
            put_v(hdr, len(payload))
            hdr.extend(crc32_nut(bytes(hdr)).to_bytes(4, "big"))
            f.write(bytes(hdr))
            f.write(payload)

        for i, fr in enumerate(frames):
            b = bytearray()
            put_v(b, i)                # syncpoint resets prediction to i
            put_v(b, 0)
            _write_packet(f, SYNCPOINT_STARTCODE, bytes(b))
            # audio-like frame on a WILDLY different pts scale
            # (absolute coding), then the video frame with LSB-coded
            # pts — the foreign-muxer form whose decode depends on the
            # per-stream prediction
            frame(2, 1, i * 48000 + (1 << MSB_PTS_SHIFT), b"\x11" * 9)
            g = fr
            vdata = b"".join([g[..., 1].tobytes(), g[..., 2].tobytes(),
                              g[..., 0].tobytes()])
            frame(1, None, i & 0x7F, vdata)
    with open(path, "rb") as f:
        nr = NutReader(f)
        pts = []
        while True:
            r = nr.read_frame_bytes()
            if r is None:
                break
            pts.append(r[0])
    assert pts == [0, 1, 2]
    assert nr.damaged == 0


def test_nut_corrupt_length_field_recovers_overconsumed(tmp_path):
    """A corrupted forward_ptr (continuation bit set) makes the packet
    parser slurp bytes containing later good syncpoints; recovery must
    push the over-consumed bytes back so only the damaged frame is
    lost — not everything the bogus length swallowed."""
    from dspfun_tpu.io.nut import SYNCPOINT_STARTCODE

    rng = np.random.default_rng(14)
    frames = rng.random((3, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "o.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(path), 8, 6, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    raw = bytearray(path.read_bytes())

    # frame 1's syncpoint: 8-byte startcode, then a 1-byte forward_ptr;
    # 0xFF turns it into a multi-byte varint that consumes far past it
    pat = SYNCPOINT_STARTCODE.to_bytes(8, "big")
    sp2 = raw.index(pat, raw.index(pat) + 1)
    raw[sp2 + 8] = 0xFF
    dam = tmp_path / "od.nut"
    dam.write_bytes(bytes(raw))
    with open(dam, "rb") as f:
        nr = NutReader(f)
        got = []
        while True:
            r = nr.read_frame_bytes()
            if r is None:
                break
            got.append(r[0])
    assert got == [0, 2]  # frame 1 lost to the damage; frame 2 recovered
    assert nr.damaged >= 1

    # extreme corrupt varint (would decode to ~2^34): the plausibility
    # cap must reject it without attempting the allocation, and the
    # later frames must still be recovered
    raw2 = bytearray(path.read_bytes())
    raw2[sp2 + 8:sp2 + 13] = b"\xff\xff\xff\xff\x7f"
    dam2 = tmp_path / "oe.nut"
    dam2.write_bytes(bytes(raw2))
    with open(dam2, "rb") as f:
        nr = NutReader(f)
        got = []
        while True:
            r = nr.read_frame_bytes()
            if r is None:
                break
            got.append(r[0])
    assert 2 in got and got[0] == 0


def test_nut_truncated_count_matches_read(tmp_path):
    """count_frames must not count a final truncated frame that
    read_frame_bytes will never deliver (interrupted write — exactly
    what append/resume mode makes likely)."""
    rng = np.random.default_rng(15)
    frames = rng.random((3, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "tc.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(path), 8, 6, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    raw = path.read_bytes()
    for cut in (100, 1, len(raw) - (len(raw) // 3)):
        cutf = tmp_path / f"tc{cut}.nut"
        cutf.write_bytes(raw[: len(raw) - cut])
        with open(cutf, "rb") as f:
            nr = NutReader(f)
            cnt = nr.count_frames()
            n = 0
            while nr.read_frame_bytes() is not None:
                n += 1
            assert cnt == n, f"cut={cut}: counted {cnt}, delivered {n}"


def test_scan_mesh_with_packed_emission(tmp_path):
    """--mesh and the packed device-side emission compose."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(10)
    src = str(tmp_path / "s.png")
    Image.fromarray(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
                    ).save(src)
    from dspfun_tpu.tools import scan as scan_tool

    one, meshed = str(tmp_path / "one.y4m"), str(tmp_path / "mesh.y4m")
    assert scan_tool.main(["-q", "-m", "zig", "-S", "16", src, one]) == 0
    assert scan_tool.main(["-q", "-m", "zig", "-S", "16", "--mesh", "8",
                           src, meshed]) == 0

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    np.testing.assert_allclose(frames_of(meshed), frames_of(one),
                               atol=2 / 255.0)


def test_nut_multistream_skips_foreign_frames(tmp_path):
    """A NUT file with a second (audio-like) stream: frame counting,
    indexing, and reads must consider only stream 0 (ffmpeg-muxed
    files carry audio)."""
    from dspfun_tpu.io.nut import (
        MSB_PTS_SHIFT, NutWriter, SYNCPOINT_STARTCODE, _write_packet,
        crc32_nut, put_v,
    )

    rng = np.random.default_rng(11)
    frames = rng.random((3, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "ms.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with open(path, "wb") as f:
        nw = NutWriter(f, 8, 6, Fraction(25), video.PIXEL_FORMATS["gbrpf32le"],
                       props)
        nw.write_header()
        nw._header_written = True
        for i, fr in enumerate(frames):
            # interleave a foreign-stream frame before each video frame
            # (framecode 1 + explicit stream_id via FLAG_CODED)
            payload = b"\x55" * 37
            b = bytearray()
            put_v(b, i)
            put_v(b, 0)
            _write_packet(f, SYNCPOINT_STARTCODE, bytes(b))
            hdr = bytearray([2])             # framecode 2: stream-id field
            put_v(hdr, 1)                    # stream_id 1
            put_v(hdr, i + (1 << MSB_PTS_SHIFT))
            put_v(hdr, len(payload))
            hdr.extend(crc32_nut(bytes(hdr)).to_bytes(4, "big"))
            f.write(bytes(hdr))
            f.write(payload)
            # the real video frame
            g = fr
            chunks = [g[..., 1].tobytes(), g[..., 2].tobytes(),
                      g[..., 0].tobytes()]
            nw.write_frame_bytes(b"".join(chunks))
    # If the foreign frames were not skipped the frame count and
    # payload sizes would be wrong.
    with video.open_input(str(path)) as r:
        if r._native is not None:
            assert r.frames == 3
        got = []
        while True:
            fr = r.read_frame_rgb()
            if fr is None:
                break
            got.append(fr)
    assert len(got) == 3
    np.testing.assert_allclose(np.stack(got), frames, atol=1e-6)


def test_nut_value_coding_fuzz():
    import zlib

    rng = np.random.default_rng(zlib.crc32(b"nutvals"))
    vals = [int(v) for v in rng.integers(0, 2**62, 200)] + [2**62 - 1]
    svals = [int(v) for v in rng.integers(-2**60, 2**60, 200)]
    buf = bytearray()
    for v in vals:
        put_v(buf, v)
    for v in svals:
        put_s(buf, v)
    p = _Parser(bytes(buf))
    assert [p.get_v() for _ in vals] == vals
    assert [p.get_s() for _ in svals] == svals
    assert p.remaining() == 0


@pytest.mark.parametrize("draw", range(6))
def test_nut_roundtrip_fuzz(draw, tmp_path):
    """Randomized mux->demux round trips over odd dims, frame counts,
    rates, and the pixel formats the native muxer carries."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(f"nutfuzz{draw}".encode()))
    w = int(rng.integers(1, 33))
    h = int(rng.integers(1, 25))
    n = int(rng.integers(1, 7))
    rate = Fraction(int(rng.integers(1, 120)), int(rng.integers(1, 4)))
    pf, atol = [("gbrpf32le", 1e-6), ("yuv444p", 0.05),
                ("yuv444p16le", 2e-3)][draw % 3]
    frames = rng.random((n, h, w, 3)).astype(np.float32)
    r, got = _roundtrip(tmp_path / f"f{draw}.nut", frames,
                        f"pixel_format={pf}", rate=rate)
    assert r.frames == n
    assert r.rate == rate
    np.testing.assert_allclose(got, frames, atol=atol)


def test_nut_resync_corruption_fuzz(tmp_path):
    """Randomized byte corruption after the header region: the reader
    must always terminate, never raise, and every delivered (pts,
    payload) with an intact header is one of 0..n-1 (payloads are not
    checksummed by NUT, so a payload hit passes through silently —
    only the header CRC / framecode / startcode damage is detectable)."""
    from dspfun_tpu.io.nut import SYNCPOINT_STARTCODE

    rng = np.random.default_rng(13)
    frames = rng.random((5, 6, 8, 3)).astype(np.float32)
    path = tmp_path / "f.nut"
    props = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(path), 8, 6, Fraction(25), props) as wr:
        for f in frames:
            wr.write_frame_rgb(f)
    raw = path.read_bytes()
    first_sp = raw.index(SYNCPOINT_STARTCODE.to_bytes(8, "big"))

    for draw in range(25):
        bad = bytearray(raw)
        nflips = int(rng.integers(1, 4))
        for _ in range(nflips):
            pos = int(rng.integers(first_sp, len(raw)))
            bad[pos] ^= int(rng.integers(1, 256))
        dam = tmp_path / f"fz{draw}.nut"
        dam.write_bytes(bytes(bad))
        with open(dam, "rb") as f:
            nr = NutReader(f)
            pts_seen = []
            for _ in range(64):  # termination cap
                r = nr.read_frame_bytes()
                if r is None:
                    break
            else:
                raise AssertionError("reader did not terminate")
            # second pass collecting pts, reopened (also covers
            # count_frames on the damaged file)
        with open(dam, "rb") as f:
            nr = NutReader(f)
            cnt = nr.count_frames()
            for _ in range(64):
                r = nr.read_frame_bytes()
                if r is None:
                    break
                pts_seen.append(r[0])
            assert all(0 <= p < 5 for p in pts_seen)
            assert sorted(set(pts_seen)) == pts_seen  # strictly increasing
            assert cnt == len(pts_seen)
