"""Native FFV1 codec (native/ffv1.cpp via io/ffv1.py, RFC 9043).

FFV1 is the reference's default output codec for every video tool
(reference motion/motion.c:447, rotate.c:128, transcode.c:76,
zoom/zoom.c:306, scan/scan.c:326); these tests pin the native
implementation: lossless round-trips over the full supported format
matrix, bitstream-drift goldens, NUT integration (default codec,
append inheritance, device-packed payload path), and the bridge
fallback for unsupported variants.
"""

import hashlib
import os
import zlib
from fractions import Fraction

import numpy as np
import pytest

from dspfun_tpu.io import ffv1, video

pytestmark = pytest.mark.skipif(
    not ffv1.available(), reason="native FFV1 library unavailable")


def _planes_for(pf, w, h, rng, smooth=False):
    maxv = (1 << pf.depth) - 1
    out = []
    for (pw, ph) in pf.plane_dims(w, h):
        if smooth:
            base = (np.arange(ph)[:, None] * 2 + np.arange(pw)[None, :]) \
                % (maxv + 1)
            p = (base + rng.integers(0, 3, (ph, pw))) % (maxv + 1)
        else:
            p = rng.integers(0, maxv + 1, (ph, pw))
        out.append(p.astype(pf.dtype))
    return out


@pytest.mark.parametrize("name", [
    "gray", "gray16le", "yuv420p", "yuv422p", "yuv444p",
    "yuv420p10le", "yuv422p12le", "yuv444p16le", "gbrp",
])
@pytest.mark.parametrize("size", [(1, 1), (2, 2), (17, 9), (64, 48)])
def test_roundtrip_matrix(name, size):
    pf = video.PIXEL_FORMATS[name]
    w, h = size
    rng = np.random.default_rng(
        zlib.crc32(name.encode()) ^ (size[0] << 16) ^ size[1])
    params = ffv1.params_for_pix_fmt(pf)
    planes = _planes_for(pf, w, h, rng)
    pkt = ffv1.encode_frame(planes, params, w, h)
    got = ffv1.probe(pkt, w, h)
    assert got.pix_fmt_name() == name
    dec = ffv1.FFV1Decoder(w, h)
    out = dec.decode(pkt)
    for a, b in zip(planes, out):
        assert np.array_equal(a, b)
    dec.close()


def test_multiframe_decoder_state():
    """Keyframes reset context state; a stream of several frames
    decodes each one exactly (every native frame is a keyframe)."""
    pf = video.PIXEL_FORMATS["yuv420p"]
    params = ffv1.params_for_pix_fmt(pf)
    rng = np.random.default_rng(7)
    dec = ffv1.FFV1Decoder(24, 16)
    for _ in range(6):
        planes = _planes_for(pf, 24, 16, rng, smooth=True)
        pkt = ffv1.encode_frame(planes, params, 24, 16)
        out = dec.decode(pkt)
        for a, b in zip(planes, out):
            assert np.array_equal(a, b)
    dec.close()


def test_bitstream_golden():
    """Encoded bytes for a fixed input are pinned — the bitstream
    cannot drift silently (a format, not just an invertible pair)."""
    pf = video.PIXEL_FORMATS["yuv420p"]
    params = ffv1.params_for_pix_fmt(pf)
    rng = np.random.default_rng(12345)
    planes = _planes_for(pf, 32, 24, rng, smooth=True)
    pkt = ffv1.encode_frame(planes, params, 32, 24)
    digest = hashlib.sha256(pkt).hexdigest()
    # regenerate with: python -c "import tests.test_ffv1 as t; ..."
    assert digest == GOLDEN_SHA256, (digest, len(pkt))


GOLDEN_SHA256 = \
    "4b9ce4fad35512e075143950bcf8adc31fd5d3d86bc6946a9f435285c01b3930"


def test_compression_on_smooth_content():
    pf = video.PIXEL_FORMATS["yuv420p"]
    params = ffv1.params_for_pix_fmt(pf)
    rng = np.random.default_rng(3)
    planes = _planes_for(pf, 128, 96, rng, smooth=True)
    pkt = ffv1.encode_frame(planes, params, 128, 96)
    raw = sum(p.nbytes for p in planes)
    assert len(pkt) < 0.5 * raw, (len(pkt), raw)


def test_corrupt_packet_raises():
    pf = video.PIXEL_FORMATS["yuv420p"]
    params = ffv1.params_for_pix_fmt(pf)
    rng = np.random.default_rng(5)
    planes = _planes_for(pf, 16, 16, rng)
    pkt = bytearray(ffv1.encode_frame(planes, params, 16, 16))
    # a truncated-to-garbage header must fail cleanly, not crash
    with pytest.raises(ValueError):
        ffv1.probe(bytes(255 - b for b in pkt[:8]), 16, 16)


def test_inter_frame_before_keyframe_rejected():
    """A packet whose first rac bit decodes as 'inter' cannot start a
    stream (RFC 9043 section 4.3: no parameter set yet)."""
    dec = ffv1.FFV1Decoder(8, 8)
    with pytest.raises(ValueError):
        # 0xFF.. decodes the keyframe bit as 0 with the fresh 128 state
        dec.decode(b"\xff" * 64)
    dec.close()


# ---------------------------------------------------------------------------
# NUT integration
# ---------------------------------------------------------------------------


def test_nut_default_codec_is_ffv1_for_integer_formats(tmp_path):
    """Non-pipe .nut outputs default to FFV1 exactly like the reference
    (motion/README.md:70); float keeps rawvideo payloads."""
    props = video.parse_color_props("pixel_format=yuv420p")
    p = tmp_path / "a.nut"
    rng = np.random.default_rng(11)
    pf = video.PIXEL_FORMATS["yuv420p"]
    frames = [_planes_for(pf, 24, 18, rng, smooth=True) for _ in range(3)]
    with video.open_output(str(p), 24, 18, Fraction(30), props) as wr:
        assert wr.codec == "ffv1"
        for f in frames:
            wr.write_frame([x.astype(np.float64) for x in f], raw=True)
    with video.open_input(str(p)) as r:
        assert r.pix_fmt.name == "yuv420p"
        assert r.frames == 3
        for f in frames:
            got = r.read_frame(raw=True)
            for a, b in zip(f, got):
                assert np.array_equal(a, b)
        assert r.read_frame() is None

    fprops = video.parse_color_props("pixel_format=gbrpf32le")
    with video.open_output(str(tmp_path / "f.nut"), 8, 6, Fraction(25),
                           fprops) as wr:
        assert wr.codec == "rawvideo"


def test_nut_ffv1_append_inherits_codec(tmp_path):
    props = video.parse_color_props("pixel_format=yuv420p")
    p = tmp_path / "ap.nut"
    pf = video.PIXEL_FORMATS["yuv420p"]
    rng = np.random.default_rng(13)
    frames = [_planes_for(pf, 16, 12, rng) for _ in range(4)]
    with video.open_output(str(p), 16, 12, Fraction(25), props) as wr:
        assert wr.codec == "ffv1"
        for f in frames[:2]:
            wr.write_frame([x.astype(np.float64) for x in f], raw=True)
    with video.open_output(str(p), 16, 12, Fraction(25), props,
                           append=True) as wr:
        assert wr.codec == "ffv1"
        assert wr.frame_index == 2
        for f in frames[2:]:
            wr.write_frame([x.astype(np.float64) for x in f], raw=True)
    with video.open_input(str(p)) as r:
        assert r.frames == 4
        for f in frames:
            got = r.read_frame(raw=True)
            for a, b in zip(f, got):
                assert np.array_equal(a, b)
    # a rawvideo file keeps rawvideo on append even though the format
    # default is now ffv1
    q = tmp_path / "raw.nut"
    with video.open_output(str(q), 16, 12, Fraction(25), props,
                           codec="rawvideo") as wr:
        wr.write_frame([x.astype(np.float64) for x in frames[0]], raw=True)
    with video.open_output(str(q), 16, 12, Fraction(25), props,
                           append=True) as wr:
        assert wr.codec == "rawvideo"


def test_nut_ffv1_payload_path_matches_write_frame(tmp_path):
    """The device-packed payload path (quantized plane bytes) encodes
    to the same decoded planes as write_frame."""
    props = video.parse_color_props("pixel_format=yuv420p")
    pf = video.PIXEL_FORMATS["yuv420p"]
    rng = np.random.default_rng(17)
    planes = _planes_for(pf, 24, 16, rng, smooth=True)
    payload = b"".join(p.tobytes() for p in planes)
    p = tmp_path / "pl.nut"
    with video.open_output(str(p), 24, 16, Fraction(25), props) as wr:
        assert wr.codec == "ffv1"
        wr.write_frame_payload(payload)
    with video.open_input(str(p)) as r:
        got = r.read_frame(raw=True)
        for a, b in zip(planes, got):
            assert np.array_equal(a, b)


def test_nut_ffv1_16bit_and_seek(tmp_path):
    props = video.parse_color_props("pixel_format=yuv444p16le")
    pf = video.PIXEL_FORMATS["yuv444p16le"]
    rng = np.random.default_rng(19)
    frames = [_planes_for(pf, 12, 10, rng) for _ in range(5)]
    p = tmp_path / "hd.nut"
    with video.open_output(str(p), 12, 10, Fraction(25), props) as wr:
        assert wr.codec == "ffv1"
        for f in frames:
            wr.write_frame([x.astype(np.float64) for x in f], raw=True)
    with video.open_input(str(p)) as r:
        r.seek_frame(3)
        got = r.read_frame(raw=True)
        for a, b in zip(frames[3], got):
            assert np.array_equal(a, b)


@pytest.mark.parametrize("name,size", [
    ("yuv420p", (24, 18)), ("gray", (9, 7)), ("yuv444p16le", (6, 5)),
])
def test_python_reference_decoder_agrees(name, size):
    """An independent pure-Python decoder (tests/ffv1_pyref.py, written
    from RFC 9043) decodes the C++ encoder's bitstream to the same
    planes — a mirrored encoder/decoder bug in the C++ would round-trip
    silently but fail here."""
    from tests import ffv1_pyref

    pf = video.PIXEL_FORMATS[name]
    w, h = size
    params = ffv1.params_for_pix_fmt(pf)
    rng = np.random.default_rng(zlib.crc32(name.encode()) ^ 0xFF51)
    planes = _planes_for(pf, w, h, rng, smooth=True)
    pkt = ffv1.encode_frame(planes, params, w, h)
    got_params, got = ffv1_pyref.decode_keyframe(pkt, w, h)
    assert got_params["bits"] == pf.depth
    assert bool(got_params["chroma_planes"]) == (pf.ncomp == 3)
    for a, b in zip(planes, got):
        assert np.array_equal(a, b)


def test_decoder_fuzz_never_crashes():
    """Random garbage, truncations, and bit-flipped real packets decode
    to an error or to (wrong) planes — never a crash or hang, and never
    a write outside the caller's plane buffers (mid-stream parameter
    changes are rejected)."""
    pf = video.PIXEL_FORMATS["yuv420p"]
    params = ffv1.params_for_pix_fmt(pf)
    rng = np.random.default_rng(23)
    planes = _planes_for(pf, 24, 16, rng, smooth=True)
    good = ffv1.encode_frame(planes, params, 24, 16)
    dec = ffv1.FFV1Decoder(24, 16)
    dec.decode(good)  # establish parameters
    for trial in range(200):
        kind = trial % 3
        if kind == 0:
            pkt = rng.bytes(rng.integers(1, 400))
        elif kind == 1:
            cut = int(rng.integers(1, len(good)))
            pkt = good[:cut]
        else:
            buf = bytearray(good)
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] ^= \
                    int(rng.integers(1, 256))
            pkt = bytes(buf)
        try:
            out = dec.decode(pkt)
            for p, ref in zip(out, planes):
                assert p.shape == ref.shape
        except ValueError:
            pass
    # the decoder still works after all that abuse
    out = dec.decode(good)
    for a, b in zip(planes, out):
        assert np.array_equal(a, b)
    dec.close()

    # a stream whose second keyframe changes the parameter set is
    # rejected (buffers were sized from the first)
    other = ffv1.encode_frame(
        [planes[0]], ffv1.FFV1Params(bits=8, chroma_planes=False), 24, 16)
    dec2 = ffv1.FFV1Decoder(24, 16)
    dec2.decode(good)
    with pytest.raises(ValueError):
        dec2.decode(other)
    dec2.close()


def _hostile_header(table0_runs, table1_runs=()):
    """Craft a v1 keyframe whose header carries attacker-chosen quant
    table runs (tests/ffv1_pyref.RangeEncoder)."""
    from tests import ffv1_pyref as ref

    enc = ref.RangeEncoder()
    ks = bytearray([128])
    enc.put(ks, 0, 1)  # keyframe
    st = ref.fresh_state()
    for v in (1, 1, 0, 8):  # version, coder, colorspace, bits
        enc.put_symbol(st, v, False)
    enc.put(st, 0, 1)  # chroma_planes
    enc.put_symbol(st, 1, False)
    enc.put_symbol(st, 1, False)
    enc.put(st, 0, 0)  # transparency
    for runs in (table0_runs, table1_runs):
        qst = ref.fresh_state()
        for r in runs:
            enc.put_symbol(qst, r, False)
    return enc.terminate()


def test_rejected_keyframe_leaves_decoder_state_intact():
    """A keyframe whose header fails validation mid-parse (review
    finding: 255x255-level quant tables trip the 32768-context guard
    AFTER table 0 parsed) must not leave torn quant/context state that
    a following inter frame indexes out of bounds."""
    pf = video.PIXEL_FORMATS["yuv420p"]
    params = ffv1.params_for_pix_fmt(pf)
    rng = np.random.default_rng(41)
    planes = _planes_for(pf, 16, 12, rng, smooth=True)
    good = ffv1.encode_frame(planes, params, 16, 12)
    dec = ffv1.FFV1Decoder(16, 12)
    dec.decode(good)
    # 128 single-entry runs per table -> 255 distinct levels each;
    # 255*255 > 32768 fails read_header after table 0 completed
    hostile = _hostile_header([0] * 128, [0] * 128)
    with pytest.raises(ValueError):
        dec.decode(hostile)
    # an inter frame right after the rejected keyframe: decodes as
    # garbage samples or raises — must not touch memory out of bounds
    from tests import ffv1_pyref as ref

    enc = ref.RangeEncoder()
    ks = bytearray([128])
    enc.put(ks, 0, 0)  # inter
    inter = enc.terminate() + bytes(256)
    try:
        out = dec.decode(inter)
        for p, g in zip(out, planes):
            assert p.shape == g.shape
    except ValueError:
        pass
    # and the decoder still decodes good frames exactly
    out = dec.decode(good)
    for a, b in zip(planes, out):
        assert np.array_equal(a, b)
    dec.close()


def test_int32_max_quant_run_rejected():
    """A quant-table run symbol of INT32_MAX must be rejected without
    signed overflow (review finding: 'run + 1' UB; ffmpeg guards this
    with unsigned arithmetic for the same reason)."""
    hostile = _hostile_header([2**31 - 1])
    dec = ffv1.FFV1Decoder(8, 8)
    with pytest.raises(ValueError):
        dec.decode(hostile)
    dec.close()
    with pytest.raises(ValueError):
        ffv1.probe(hostile, 8, 8)


def test_transcode_rotate_e_flag_selects_codec(tmp_path):
    """transcode/rotate -e (reference transcode.c:23, rotate.c:39)
    selects between the native codecs; the default is FFV1 like the
    reference."""
    from dspfun_tpu.io.nut import NutReader
    from dspfun_tpu.tools import rotate, transcode

    props = video.parse_color_props("pixel_format=yuv420p")
    clip = tmp_path / "c.y4m"
    with video.open_output(str(clip), 16, 12, Fraction(25), props) as wr:
        for i in range(3):
            wr.write_frame([np.full((12, 16), 60.0 + i),
                            np.full((6, 8), 128.0),
                            np.full((6, 8), 128.0)], raw=True)
    assert transcode.main(["-q", str(clip), str(tmp_path / "d.nut")]) == 0
    assert transcode.main(["-q", "-e", "rawvideo", str(clip),
                           str(tmp_path / "r.nut")]) == 0
    assert rotate.main(["-q", "zyx", str(clip),
                        str(tmp_path / "rot.nut")]) == 0
    for name, tag in (("d.nut", b"FFV1"), ("r.nut", b"I420"),
                      ("rot.nut", b"FFV1")):
        with open(tmp_path / name, "rb") as f:
            assert bytes(NutReader(f).state.streams[0]["fourcc"]) == tag
    # and the FFV1 transcode inverts byte-exactly
    back = tmp_path / "back.y4m"
    assert transcode.main(["-q", str(tmp_path / "d.nut"), str(back)]) == 0
    assert back.read_bytes() == clip.read_bytes()


def test_version0_keyframe_decodes():
    """Version-0 streams omit bits_per_raw_sample (implied 8); the
    decoder handles them (docs/TOOLS.md claims v0 decode — this crafts
    one, since the native encoder only writes v1)."""
    from tests import ffv1_pyref as ref

    enc = ref.RangeEncoder()
    ks = bytearray([128])
    enc.put(ks, 0, 1)  # keyframe
    st = ref.fresh_state()
    for v in (0, 1, 0):  # version 0, range coder, YCbCr — NO bits field
        enc.put_symbol(st, v, False)
    enc.put(st, 0, 0)  # no chroma planes (gray)
    enc.put_symbol(st, 0, False)
    enc.put_symbol(st, 0, False)
    enc.put(st, 0, 0)  # no alpha
    for _ in range(5):  # trivial quant tables: one 128-run of zeros
        qst = ref.fresh_state()
        enc.put_symbol(qst, 127, False)
    # one 1x1 gray plane: context 0, predict 0 -> diff == sample
    cst = bytearray([128] * 32)
    enc.put_symbol(cst, 199, True)
    pkt = enc.terminate()
    got = ffv1.probe(pkt, 1, 1)
    assert got.version == 0 and got.bits == 8 and not got.chroma_planes
    dec = ffv1.FFV1Decoder(1, 1)
    (plane,) = dec.decode(pkt)
    assert plane.shape == (1, 1) and plane[0, 0] == 199
    dec.close()


def test_stored_golden_file_decodes():
    """A checked-in FFV1-in-NUT file pins the DECODER against stored
    bytes (the sha golden pins the encoder; this catches decode-side
    regressions independently)."""
    rng = np.random.default_rng(777)
    path = os.path.join(os.path.dirname(__file__), "goldens",
                        "ffv1_golden.nut")
    with video.open_input(path) as r:
        assert r.pix_fmt.name == "yuv420p" and r.frames == 3
        for i in range(3):
            y = ((np.arange(16)[:, None] * 3 + np.arange(24)[None, :] * 2
                  + i * 7) % 256).astype(np.uint8)
            u = rng.integers(0, 256, (8, 12)).astype(np.uint8)
            v = rng.integers(0, 256, (8, 12)).astype(np.uint8)
            got = r.read_frame(raw=True)
            for a, b in zip((y, u, v), got):
                assert np.array_equal(a, b), i


def test_damaged_ffv1_payload_skips_frame(tmp_path):
    """Payload-level damage inside a NUT FFV1 frame drops that frame
    and decoding continues at the next packet (every native frame is a
    keyframe), mirroring the container's syncpoint recovery."""
    props = video.parse_color_props("pixel_format=yuv420p")
    pf = video.PIXEL_FORMATS["yuv420p"]
    rng = np.random.default_rng(53)
    frames = [_planes_for(pf, 24, 16, rng, smooth=True) for _ in range(4)]
    p = tmp_path / "dmg.nut"
    pkts = []
    with video.open_output(str(p), 24, 16, Fraction(25), props) as wr:
        for f in frames:
            pkt = wr._encode_planes([x.astype(pf.dtype) for x in f])
            pkts.append(pkt)
            wr._write_header()
            wr._nw.write_frame_bytes(pkt)
            wr.frame_index = wr._nw.frame_index
    raw = p.read_bytes()
    # flip bytes in the middle of frame 1's payload (found by content)
    at = raw.find(pkts[1][8:24])
    assert at > 0
    dam = bytearray(raw)
    for k in range(4):
        dam[at + 4 + k] ^= 0x5A
    q = tmp_path / "dmg2.nut"
    q.write_bytes(bytes(dam))
    with video.open_input(str(q)) as r:
        got = []
        while True:
            fr = r.read_frame(raw=True)
            if fr is None:
                break
            got.append(fr)
    # frame 1 may decode to garbage (wrong samples) or be dropped; all
    # other frames are exact and the stream terminates cleanly
    assert len(got) in (3, 4)
    rest = [f for f in (frames[0], frames[2], frames[3])]
    decoded_exact = 0
    for f in rest:
        for g in got:
            if all(np.array_equal(a, b) for a, b in zip(f, g)):
                decoded_exact += 1
                break
    assert decoded_exact == 3


def test_unsupported_variant_routes_to_bridge(tmp_path):
    """A NUT file whose FFV1 stream the native decoder rejects falls
    back to the ffmpeg bridge (which raises here: no binary)."""
    from dspfun_tpu.io.nut import NutWriter

    props = video.parse_color_props("pixel_format=yuv420p")
    pf = video.PIXEL_FORMATS["yuv420p"]
    p = tmp_path / "alien.nut"
    with open(p, "wb") as f:
        nw = NutWriter(f, 8, 6, Fraction(25), pf, props, codec="ffv1")
        nw.write_header()
        nw.write_frame_bytes(b"\x00" * 64)  # keyframe bit then garbage
    with pytest.raises(RuntimeError, match="ffmpeg"):
        video.open_input(str(p))


def test_v3_ycbcr_chroma_slice_decodes():
    """The v3 YCbCr-with-chroma slice path has no real-file oracle
    (OpenCV's writer only produces gray/RGB), so craft one: extradata
    (v3, range coder, 420 chroma, one slice, CRC'd) plus a range-coded
    slice with trailing size, built with the pyref primitives."""
    from tests import ffv1_pyref as ref

    w, h = 12, 10
    rng = np.random.default_rng(61)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (5, 6)).astype(np.uint8)
    v = rng.integers(0, 256, (5, 6)).astype(np.uint8)

    # --- extradata --------------------------------------------------
    enc = ref.RangeEncoder()
    st = ref.fresh_state()
    for val in (3, 4, 1, 0, 8):  # version, micro, coder=range, cs, bits
        enc.put_symbol(st, val, False)
    enc.put(st, 0, 1)  # chroma_planes
    enc.put_symbol(st, 1, False)
    enc.put_symbol(st, 1, False)
    enc.put(st, 0, 0)  # transparency
    enc.put_symbol(st, 0, False)  # num_h_slices - 1
    enc.put_symbol(st, 0, False)  # num_v_slices - 1
    enc.put_symbol(st, 1, False)  # quant_table_count
    for runs in ([0, 1, 1, 3, 7, 110],) * 3 + ([127],) * 2:
        qst = ref.fresh_state()
        for r in runs:
            enc.put_symbol(qst, r, False)
    enc.put(st, 0, 0)  # no initial states for table set 0
    enc.put_symbol(st, 0, False)  # ec
    enc.put_symbol(st, 0, False)  # intra (micro > 2)
    body = enc.terminate()

    def crc32_ieee(data):
        crc = 0
        for b in data:
            crc ^= b << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                    if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
        return crc

    extradata = body + crc32_ieee(body).to_bytes(4, "big")

    # --- one keyframe slice ------------------------------------------
    # quant tables: same shape the native encoder writes (3x11-level)
    def quant11(d):
        a = abs(d)
        q = 0 if a == 0 else 1 if a <= 2 else 2 if a <= 4 else \
            3 if a <= 8 else 4 if a <= 16 else 5
        return -q if d < 0 else q

    scale = [1, 11, 121]
    qt = [[0] * 256 for _ in range(5)]
    for t in range(3):
        for i in range(1, 128):
            qt[t][i] = scale[t] * quant11(i)
        for i in range(1, 128):
            qt[t][256 - i] = -qt[t][i]
        qt[t][128] = -qt[t][127]
    contexts = 666

    enc = ref.RangeEncoder()
    ks = bytearray([128])
    enc.put(ks, 0, 1)  # keyframe
    st = ref.fresh_state()
    for val in (0, 0, 0, 0):  # sx, sy, sw-1, sh-1
        enc.put_symbol(st, val, False)
    for _ in range(2):  # quant idx per context set (plane_count = 2)
        enc.put_symbol(st, 0, False)
    enc.put_symbol(st, 0, False)  # picture_structure
    enc.put_symbol(st, 0, False)  # sar num
    enc.put_symbol(st, 0, False)  # sar den

    def encode_plane(plane, states):
        ph, pw = plane.shape
        rows = [[0] * (pw + 6) for _ in range(3)]
        for yy in range(ph):
            rows = [rows[2], rows[0], rows[1]]
            cur, above, above2 = rows
            cur[2] = above[3]
            above[3 + pw] = above[3 + pw - 1]
            for x in range(pw):
                l_, lt = cur[x + 2], above[x + 2]
                t_, rt = above[x + 3], above[x + 4]
                ctx = (qt[0][(l_ - lt) & 0xFF] + qt[1][(lt - t_) & 0xFF]
                       + qt[2][(t_ - rt) & 0xFF])
                sign = ctx < 0
                if sign:
                    ctx = -ctx
                pred = sorted((l_, l_ + t_ - lt, t_))[1]
                diff = int(plane[yy, x]) - pred
                if sign:
                    diff = -diff
                diff = ((diff + 128) & 0xFF) - 128
                base = ctx * 32
                stv = bytearray(states[base:base + 32])
                enc.put_symbol(stv, diff, True)
                states[base:base + 32] = stv
                cur[x + 3] = int(plane[yy, x])

    sets = [bytearray([128] * (contexts * 32)) for _ in range(2)]
    encode_plane(y, sets[0])
    encode_plane(u, sets[1])
    encode_plane(v, sets[1])
    slice_body = enc.terminate()
    packet = slice_body + (len(slice_body)).to_bytes(3, "big")

    dec = ffv1.FFV1Decoder(w, h, extradata=extradata)
    assert dec.params.chroma_planes and dec.params.h_shift == 1
    gy, gu, gv = dec.decode(packet)
    assert np.array_equal(gy, y)
    assert np.array_equal(gu, u)
    assert np.array_equal(gv, v)
    dec.close()


# ---- version 3 encoder (round 5) -------------------------------------
#
# v3 = ffmpeg's `-level 3`: out-of-band extradata, independent slice
# grid with 24-bit-size + error-status + CRC-32 trailers, every frame
# an intra keyframe.  The reference gets this encoder from libavcodec
# (motion/motion.c:447 default codec path); interop with real
# libavcodec is pinned in tests/test_interop_cv2.py.

V3_MATRIX = [
    # (pix_fmt, W, H, num_h, num_v)
    ("yuv420p", 48, 32, 2, 2),
    ("yuv420p", 640, 360, 4, 4),
    ("yuv422p", 44, 31, 2, 1),
    ("yuv444p", 641, 361, 3, 3),
    ("yuv444p16le", 47, 29, 2, 2),
    ("yuv420p16le", 33, 17, 2, 2),
    ("gray", 40, 40, 2, 2),
    ("gray16le", 40, 40, 1, 1),
    ("gbrp", 46, 30, 2, 2),
    ("gbrp16le", 46, 30, 2, 3),
]


@pytest.mark.parametrize("name,w,h,nh,nv", V3_MATRIX)
def test_v3_encode_roundtrip(name, w, h, nh, nv):
    pf = video.PIXEL_FORMATS[name]
    rng = np.random.default_rng(hash(name) & 0xFFFF)
    params = ffv1.params_for_pix_fmt(pf, version=3)
    ed = ffv1.extradata(params, w, h, nh, nv)
    dec = ffv1.FFV1Decoder(w, h, extradata=ed)
    assert dec.params.version == 3
    assert dec.params.bits == pf.depth
    for _ in range(3):  # several frames: slice contexts reset per key
        planes = _planes_for(pf, w, h, rng)
        pkt = ffv1.encode_frame_v3(planes, params, w, h, nh, nv)
        got = dec.decode(pkt)
        for a, b in zip(got, planes):
            assert np.array_equal(a, b)
    dec.close()


def test_v3_slice_trailers_and_crc():
    """Every slice span ends size24+status+crc32 and CRCs to zero; a
    flipped bit is rejected (ec=1 semantics, RFC 9043 section 4.4)."""
    pf = video.PIXEL_FORMATS["gray"]
    rng = np.random.default_rng(0)
    params = ffv1.params_for_pix_fmt(pf, version=3)
    ed = ffv1.extradata(params, 40, 40, 2, 2)
    planes = _planes_for(pf, 40, 40, rng)
    pkt = ffv1.encode_frame_v3(planes, params, 40, 40, 2, 2)
    # walk the slice table back to front (RFC 9043 section 4.4)
    spans, end = [], len(pkt)
    for _ in range(4):
        n = int.from_bytes(pkt[end - 8:end - 5], "big") + 8
        spans.append((end - n, n))
        end -= n
    assert end == 0
    for off, n in spans:
        crc = 0
        for byte in pkt[off:off + n]:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                    if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
        assert crc == 0
    bad = bytearray(pkt)
    bad[len(pkt) // 2] ^= 0x40
    dec = ffv1.FFV1Decoder(40, 40, extradata=ed)
    with pytest.raises(ValueError):
        dec.decode(bytes(bad))
    dec.close()


def test_v3_rejects_chroma_misaligned_grid():
    """Interior slice boundaries off the chroma grid would leave a
    never-coded chroma column (the floor/ceil slice geometry both we
    and libavcodec use): the encoder refuses them."""
    pf = video.PIXEL_FORMATS["yuv420p"]
    params = ffv1.params_for_pix_fmt(pf, version=3)
    with pytest.raises(ValueError):
        ffv1.extradata(params, 46, 30, 2, 2)  # x0 = 23: odd
    with pytest.raises(ValueError):
        ffv1.encode_frame_v3([np.zeros((30, 46), np.uint8),
                              np.zeros((15, 23), np.uint8),
                              np.zeros((15, 23), np.uint8)],
                             params, 46, 30, 2, 2)


def test_slice_grid_chooser():
    p420 = ffv1.params_for_pix_fmt(video.PIXEL_FORMATS["yuv420p"], 3)
    pgray = ffv1.params_for_pix_fmt(video.PIXEL_FORMATS["gray"], 3)
    # ffmpeg slice-count table
    assert ffv1.slice_grid(pgray, 1024, 1024, slices=9) == (3, 3)
    assert ffv1.slice_grid(pgray, 1024, 1024, slices=6) == (3, 2)
    # chroma alignment shrinks the grid: 46/2=23 is odd for 420
    assert ffv1.slice_grid(p420, 46, 30, slices=4) == (1, 1)
    assert ffv1.slice_grid(p420, 48, 32, slices=4) == (2, 2)
    # default: at least 2x2, more for large frames
    nh, nv = ffv1.slice_grid(pgray, 3840, 2160)
    assert nh >= 4 and nv >= 4
    # never exceeds the frame
    assert ffv1.slice_grid(pgray, 3, 3, slices=16) <= (3, 3)


def test_ffv1_encoder_config():
    pf = video.PIXEL_FORMATS["yuv420p"]
    enc = ffv1.FFV1Encoder(pf, 48, 32)  # default: level 1, no extradata
    assert enc.params.version == 1 and enc.extradata == b""
    enc3 = ffv1.FFV1Encoder(pf, 48, 32, "level=3:slices=4")
    assert enc3.params.version == 3 and enc3.extradata
    assert (enc3.num_h, enc3.num_v) == (2, 2)
    # 16-bit RGB auto-selects the v3 layout (v0/1 cannot carry it)
    enc16 = ffv1.FFV1Encoder(video.PIXEL_FORMATS["gbrp16le"], 48, 32)
    assert enc16.params.version == 3 and enc16.params.colorspace == 1
    assert ffv1.parse_codec_opts("level=3:slices=9,slicecrc=1:junk=zz") \
        == {"level": 3, "slices": 9, "slicecrc": 1}


def test_v3_nut_output_and_native_readback(tmp_path):
    """open_output with level=3 writes a v3 FFV1 NUT (extradata in
    codec_specific_data) that the native reader round-trips."""
    p = str(tmp_path / "v3.nut")
    rng = np.random.default_rng(5)
    w = video.open_output(p, 64, 48, Fraction(25, 1),
                          video.ColorProps(pix_fmt="yuv420p"),
                          options="level=3:slices=4")
    frames = []
    for _ in range(3):
        fr = [rng.random((48, 64)), rng.random((24, 32)),
              rng.random((24, 32))]
        frames.append(fr)
        w.write_frame(fr)
    w.close()
    r = video.open_input(p)
    assert r.pix_fmt.name == "yuv420p"
    for fr in frames:
        got = r.read_frame(raw=True)
        want = np.clip(np.rint(np.asarray(fr[0]) * 255), 0, 255)
        assert np.array_equal(got[0], want.astype(np.uint8))
    r.close()


def test_v3_append_parameter_mismatch_refused(tmp_path):
    p = str(tmp_path / "v3a.nut")
    w = video.open_output(p, 64, 48, Fraction(25, 1),
                          video.ColorProps(pix_fmt="yuv420p"),
                          options="level=3")
    w.write_frame([np.zeros((48, 64)), np.zeros((24, 32)),
                   np.zeros((24, 32))])
    w.close()
    with pytest.raises(RuntimeError, match="do not match"):
        video.open_output(p, 64, 48, Fraction(25, 1),
                          video.ColorProps(pix_fmt="yuv420p"),
                          append=True)  # level 1 vs existing v3 header
    # matching options append fine
    w2 = video.open_output(p, 64, 48, Fraction(25, 1),
                           video.ColorProps(pix_fmt="yuv420p"),
                           options="level=3", append=True)
    w2.write_frame([np.zeros((48, 64)), np.zeros((24, 32)),
                    np.zeros((24, 32))])
    w2.close()
    r = video.open_input(p)
    assert r.frames == 2
    r.close()


def test_float_negotiate_optin(tmp_path):
    """`negotiate=1` maps float content onto the encoder's best
    integer format (reference ffapi.c:137-149,239-253 semantics):
    gbrpf32le rides 16-bit RGB FFV1 (v3)."""
    p = str(tmp_path / "neg.nut")
    rng = np.random.default_rng(6)
    w = video.open_output(p, 32, 24, Fraction(25, 1),
                          video.ColorProps(pix_fmt="gbrpf32le"),
                          options="negotiate=1")
    assert w.pix_fmt.name == "gbrp16le" and w.codec == "ffv1"
    rgb = rng.random((24, 32, 3))
    w.write_frame_rgb(rgb)
    w.close()
    r = video.open_input(p)
    assert r.pix_fmt.name == "gbrp16le"
    got = r.read_frame(raw=True)
    want = np.clip(np.rint(rgb * 65535), 0, 65535).astype(np.uint16)
    assert np.array_equal(got[0], want[:, :, 1])  # G plane
    r.close()


def test_float_negotiate_zero_is_opt_out(tmp_path):
    """`negotiate=0` is an explicit opt-OUT: float content must keep
    the lossless float rawvideo path, not silently quantise to 16-bit
    (round-5 review finding — the check was a raw substring test)."""
    p = str(tmp_path / "negoff.nut")
    w = video.open_output(p, 32, 24, Fraction(25, 1),
                          video.ColorProps(pix_fmt="gbrpf32le"),
                          options="negotiate=0")
    assert w.pix_fmt.name == "gbrpf32le" and w.codec == "rawvideo"
    rgb = np.random.default_rng(7).random((24, 32, 3))
    w.write_frame_rgb(rgb)
    w.close()
    r = video.open_input(p)
    assert r.pix_fmt.name == "gbrpf32le"
    got = r.read_frame(raw=True)
    assert np.allclose(got[0], rgb[:, :, 1].astype(np.float32))  # lossless
    r.close()


def test_split_codec_opts_mixed_separators():
    """level=3,range=pc: the color property must not ride into the
    codec bucket just because the user mixed , with : (round-5 review
    finding — split_codec_opts only split on ':')."""
    props, codec = video.split_codec_opts("level=3,range=pc")
    assert codec == "level=3"
    assert props == "range=pc"
    props, codec = video.split_codec_opts("slices=9:gamma=2.2|negotiate=1")
    assert codec == "slices=9:negotiate=1"
    assert props == "gamma=2.2"
