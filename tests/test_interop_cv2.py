"""Cross-implementation interop tests against a REAL FFmpeg.

OpenCV (cv2) bundles genuine libavformat/libavcodec; these tests
validate the native containers and the FFV1 codec against it — the
contract the ffmpeg-binary bridge's shim tests cannot cover (no
standalone binary exists in this environment).  What is pinned here:

* the native NUT muxer's bytes parse in real libavformat (main header
  framecode table + elision count, stream header, syncpoints, and the
  EOF index packet giving exact duration and seeking),
* the native FFV1 encoder's bitstream decodes BIT-EXACTLY in real
  libavcodec (state tables, range coder, flush, header, quant tables,
  context model, borders),
* real libavformat-muxed NUT and Matroska demux in the native
  readers, and real-FFmpeg FFV1 version 3 (golomb/RGB/slices) decodes
  natively, sample-exact,
* the native Matroska muxer's files open in real libavformat with
  exact metadata and decode bit-exactly.

Skipped when cv2 is not installed (e.g. the minimal CI environment).
"""

from fractions import Fraction

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dspfun_tpu.io import video  # noqa: E402


def _write_gray(path, frames, codec=None):
    props = video.parse_color_props("pixel_format=gray")
    h, w = frames[0].shape
    with video.open_output(str(path), w, h, Fraction(25), props,
                           codec=codec) as wr:
        for f in frames:
            wr.write_frame([f.astype(float)], raw=True)


def _cv_frames(path, raw=False):
    cap = cv2.VideoCapture(str(path), cv2.CAP_FFMPEG)
    assert cap.isOpened()
    if raw:
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    out = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        out.append(frame)
    cap.release()
    return out


def test_ffv1_bitstream_decodes_bit_exactly_in_real_libavcodec(tmp_path):
    rng = np.random.default_rng(101)
    frames = [rng.integers(0, 256, (16, 24)).astype(np.uint8)
              for _ in range(4)]
    p = tmp_path / "g.nut"
    _write_gray(p, frames)  # default codec: ffv1
    got = _cv_frames(p)
    assert len(got) == 4
    for f, bgr in zip(frames, got):
        # gray -> BGR is channel replication: lossless
        assert np.array_equal(bgr[..., 0], f)
        assert np.array_equal(bgr[..., 1], f)


def test_ffv1_yuv420_luma_bit_exact_in_real_libavcodec(tmp_path):
    rng = np.random.default_rng(102)
    props = video.parse_color_props("pixel_format=yuv420p")
    y = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    u = rng.integers(0, 256, (8, 12)).astype(np.uint8)
    v = rng.integers(0, 256, (8, 12)).astype(np.uint8)
    p = tmp_path / "c.nut"
    with video.open_output(str(p), 24, 16, Fraction(25), props) as wr:
        assert wr.codec == "ffv1"
        wr.write_frame([a.astype(float) for a in (y, u, v)], raw=True)
    (raw,) = _cv_frames(p, raw=True)
    assert np.array_equal(raw.reshape(-1)[: 24 * 16].reshape(16, 24), y)


def test_rawvideo_nut_and_y4m_parse_in_real_libavformat(tmp_path):
    rng = np.random.default_rng(103)
    props = video.parse_color_props("pixel_format=yuv420p")
    y = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    u = np.full((8, 12), 128, np.uint8)
    v = np.full((8, 12), 90, np.uint8)
    for name, codec in (("r.nut", "rawvideo"), ("r.y4m", None)):
        p = tmp_path / name
        with video.open_output(str(p), 24, 16, Fraction(25), props,
                               codec=codec) as wr:
            wr.write_frame([a.astype(float) for a in (y, u, v)], raw=True)
        (raw,) = _cv_frames(p, raw=True)
        assert np.array_equal(raw.reshape(-1)[: 24 * 16].reshape(16, 24),
                              y), name


def test_index_gives_exact_count_and_seeking(tmp_path):
    rng = np.random.default_rng(104)
    frames = [rng.integers(0, 256, (16, 24)).astype(np.uint8)
              for _ in range(7)]
    p = tmp_path / "ix.nut"
    _write_gray(p, frames)
    cap = cv2.VideoCapture(str(p), cv2.CAP_FFMPEG)
    assert cap.isOpened()
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == 7.0
    assert cap.get(cv2.CAP_PROP_FPS) == 25.0
    for target in (5, 2, 6, 0):
        cap.set(cv2.CAP_PROP_POS_FRAMES, target)
        ok, bgr = cap.read()
        assert ok and np.array_equal(bgr[..., 0], frames[target]), target
    cap.release()


def test_real_libavformat_muxed_nut_demuxes_natively(tmp_path):
    rng = np.random.default_rng(105)
    frames = [rng.integers(0, 256, (16, 24)).astype(np.uint8)
              for _ in range(3)]
    p = tmp_path / "real.nut"
    wr = cv2.VideoWriter(str(p), cv2.CAP_FFMPEG,
                         cv2.VideoWriter_fourcc(*"I420"), 25, (24, 16))
    assert wr.isOpened()
    for f in frames:
        wr.write(np.dstack([f, f, f]))
    wr.release()
    with video.open_input(str(p)) as r:
        assert type(r).__name__ == "NutVideoReader"
        assert r.pix_fmt.name == "yuv420p"
        assert (r.width, r.height) == (24, 16)
        n = 0
        while r.read_frame(raw=True) is not None:
            n += 1
        assert n == 3


def test_real_ffv1_v3_rgb_decodes_natively_bit_exact(tmp_path):
    """Real FFmpeg writes FFV1 version 3 — extradata parameters,
    Golomb-Rice coder, RGB with the reversible color transform, 2x2
    slices with CRC trailers.  The native decoder handles all of it;
    every sample matches real libavcodec's own decode."""
    rng = np.random.default_rng(106)
    frames = [rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
              for _ in range(3)]
    p = tmp_path / "v3.nut"
    wr = cv2.VideoWriter(str(p), cv2.CAP_FFMPEG,
                         cv2.VideoWriter_fourcc(*"FFV1"), 25, (24, 16))
    assert wr.isOpened()
    for f in frames:
        wr.write(f)
    wr.release()
    cap = cv2.VideoCapture(str(p), cv2.CAP_FFMPEG)
    with video.open_input(str(p)) as r:
        assert type(r).__name__ == "NutVideoReader"
        assert r.pix_fmt.name == "gbrp"
        n = 0
        while True:
            pl = r.read_frame(raw=True)
            if pl is None:
                break
            ok, bgr = cap.read()
            assert ok
            g, b, rr = pl
            assert np.array_equal(g, bgr[..., 1])
            assert np.array_equal(b, bgr[..., 0])
            assert np.array_equal(rr, bgr[..., 2])
            n += 1
        assert n == 3
    cap.release()


def test_real_matroska_ffv1_decodes_natively_bit_exact(tmp_path):
    """Real libavformat-written .mkv with an FFV1 v3 track demuxes and
    decodes natively (io/mkv.py + io/ffv1.py), sample-exact against
    real libavcodec; foreign codecs fall back to the bridge."""
    rng = np.random.default_rng(108)
    frames = [rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
              for _ in range(3)]
    p = tmp_path / "a.mkv"
    wr = cv2.VideoWriter(str(p), cv2.CAP_FFMPEG,
                         cv2.VideoWriter_fourcc(*"FFV1"), 25, (24, 16))
    assert wr.isOpened()
    for f in frames:
        wr.write(f)
    wr.release()
    cap = cv2.VideoCapture(str(p), cv2.CAP_FFMPEG)
    with video.open_input(str(p)) as r:
        assert type(r).__name__ == "MkvVideoReader"
        assert r.pix_fmt.name == "gbrp"
        assert r.frames == 3 and r.rate == Fraction(25)
        n = 0
        while True:
            pl = r.read_frame(raw=True)
            if pl is None:
                break
            ok, bgr = cap.read()
            assert ok
            assert np.array_equal(pl[0], bgr[..., 1])
            assert np.array_equal(pl[1], bgr[..., 0])
            assert np.array_equal(pl[2], bgr[..., 2])
            n += 1
        assert n == 3
    cap.release()
    # foreign codec inside mkv: binary-less, the OpenCV input fallback
    # decodes it (8-bit RGB presentation, io/cv2_bridge.py)
    q = tmp_path / "m.mkv"
    wr = cv2.VideoWriter(str(q), cv2.CAP_FFMPEG,
                         cv2.VideoWriter_fourcc(*"MJPG"), 25, (24, 16))
    wr.write(frames[0])
    wr.release()
    with video.open_input(str(q)) as r:
        assert r.pix_fmt.name == "gbrp" and r.frames == 1
        pl = r.read_frame(raw=True)
        assert pl is not None and pl[0].shape == (16, 24)
        assert r.read_frame() is None


def test_real_matroska_tool_chain(tmp_path):
    """A real .mkv drives a full tool run: motion reads the archive
    natively and writes the default FFV1-in-NUT."""
    from dspfun_tpu.tools import transcode

    rng = np.random.default_rng(109)
    frames = [rng.integers(0, 256, (16, 24)).astype(np.uint8)
              for _ in range(3)]
    p = tmp_path / "src.mkv"
    wr = cv2.VideoWriter(str(p), cv2.CAP_FFMPEG,
                         cv2.VideoWriter_fourcc(*"FFV1"), 25, (24, 16),
                         isColor=False)
    for f in frames:
        wr.write(f)
    wr.release()
    out = tmp_path / "out.nut"
    assert transcode.main(["-q", str(p), str(out)]) == 0
    with video.open_input(str(out)) as r:
        assert r.pix_fmt.name == "gray"
        for f in frames:
            (got,) = r.read_frame(raw=True)
            assert np.array_equal(got, f)


def test_native_mkv_write_reads_in_real_libav(tmp_path, monkeypatch):
    """The native Matroska muxer's files open in real libavformat with
    exact frame count/fps and decode bit-exactly in real libavcodec;
    the Colour range element is honored (full-range files come back
    range-converted, so the exactness check uses limited range)."""
    import shutil

    monkeypatch.setattr(shutil, "which", lambda name: None)  # no binary
    rng = np.random.default_rng(110)
    props = video.parse_color_props(
        "pixel_format=yuv420p:color_range=limited")
    p = tmp_path / "ours.mkv"
    frames = []
    with video.open_output(str(p), 24, 16, Fraction(30), props) as wr:
        assert type(wr).__name__ == "MkvVideoWriter"
        for _ in range(4):
            y = rng.integers(16, 236, (16, 24)).astype(float)
            u = rng.integers(16, 241, (8, 12)).astype(float)
            v = rng.integers(16, 241, (8, 12)).astype(float)
            frames.append((y, u, v))
            wr.write_frame([y, u, v], raw=True)
    # our own demuxer round-trips every plane
    with video.open_input(str(p)) as r:
        assert type(r).__name__ == "MkvVideoReader"
        for (y, u, v) in frames:
            gy, gu, gv = r.read_frame(raw=True)
            assert np.array_equal(gy, y.astype(np.uint8))
            assert np.array_equal(gu, u.astype(np.uint8))
            assert np.array_equal(gv, v.astype(np.uint8))
    # real libav: exact metadata + bit-exact luma
    cap = cv2.VideoCapture(str(p), cv2.CAP_FFMPEG)
    assert cap.isOpened()
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == 4.0
    assert cap.get(cv2.CAP_PROP_FPS) == 30.0
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    for (y, _, _) in frames:
        ok, raw = cap.read()
        assert ok and np.array_equal(raw, y.astype(np.uint8))
    cap.release()


def test_real_ffv1_v3_gray_decodes_natively_bit_exact(tmp_path):
    rng = np.random.default_rng(107)
    frames = [np.clip(np.arange(16)[:, None] * 5 + np.arange(24)[None, :]
                      + rng.integers(0, 9, (16, 24)), 0, 255).astype(np.uint8)
              for _ in range(3)]
    p = tmp_path / "v3g.nut"
    wr = cv2.VideoWriter(str(p), cv2.CAP_FFMPEG,
                         cv2.VideoWriter_fourcc(*"FFV1"), 25, (24, 16),
                         isColor=False)
    assert wr.isOpened()
    for f in frames:
        wr.write(f)
    wr.release()
    with video.open_input(str(p)) as r:
        assert r.pix_fmt.name == "gray"
        for f in frames:
            (got,) = r.read_frame(raw=True)
            assert np.array_equal(got, f)
        assert r.read_frame() is None


def test_mkv_demuxer_fuzz_never_hangs(tmp_path):
    """Truncated/bit-flipped/garbage EBML input terminates with a clean
    error or a bounded packet walk — never a hang or crash; corrupt
    length fields cannot trigger unbounded reads."""
    import io as _io

    rng = np.random.default_rng(111)
    props = video.parse_color_props("pixel_format=gray")
    p = tmp_path / "f.mkv"
    import shutil as _sh
    frames = [rng.integers(0, 256, (8, 16)).astype(np.uint8)
              for _ in range(2)]
    # craft via the native muxer directly (independent of PATH state)
    from dspfun_tpu.io.mkv import MkvDemuxer, MkvMuxer
    from dspfun_tpu.io import ffv1 as _ffv1

    params = _ffv1.params_for_pix_fmt(video.PIXEL_FORMATS["gray"])
    with open(p, "wb") as f:
        m = MkvMuxer(f, 16, 8, Fraction(25))
        for fr in frames:
            m.write_frame_bytes(_ffv1.encode_frame([fr], params, 16, 8))
        m.finalize()
    raw = p.read_bytes()
    for trial in range(150):
        kind = trial % 3
        if kind == 0:
            data = b"\x1a\x45\xdf\xa3" + bytes(
                rng.integers(0, 256, int(rng.integers(8, 200)),
                             dtype=np.uint8))
        elif kind == 1:
            data = raw[: int(rng.integers(5, len(raw)))]
        else:
            b = bytearray(raw)
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
            data = bytes(b)
        try:
            d = MkvDemuxer(_io.BytesIO(data))
            n = 0
            while n < 1000 and d.read_packet() is not None:
                n += 1
            assert n < 1000
        except (ValueError, MemoryError, OverflowError):
            pass


def test_blockgroup_with_reference_block_offsets(tmp_path):
    """Inter frames mux as BlockGroup(Block + ReferenceBlock); the
    packet index must record the Block payload's true offset, not a
    position shifted by trailing group elements (review finding)."""
    import io as _io

    from dspfun_tpu.io import mkv as M

    buf = _io.BytesIO()
    mux = M.MkvMuxer(buf, 16, 8, Fraction(25))
    mux._header()
    payload = b"BBBBBBB"
    block = M._enc_size(1) + (0).to_bytes(2, "big") + bytes([0]) + payload
    group = M._el(M._BLOCK, block) + M._el(0xFB, b"\x81")
    buf.write(M._el(M._CLUSTER,
                    M._el(M._CLUSTER_TS, M._uint(0))
                    + M._el(M._BLOCK_GROUP, group)))
    raw = buf.getvalue()
    d = M.MkvDemuxer(_io.BytesIO(raw))
    ((ts, off, ln),) = d.scan_packets()
    assert raw[off:off + ln] == payload
    d2 = M.MkvDemuxer(_io.BytesIO(raw))
    assert d2.read_packet() == (0, payload)


def test_ffv1_16bit_bit_exact_in_real_libavcodec(tmp_path):
    """16-bit samples code through WRAPPED signed-16 intermediates (the
    reference implementation's int16 buffers order wrapped values in
    the median predictor); found by this cross-check — the unwrapped
    median diverged above 2^15."""
    rng = np.random.default_rng(112)
    props = video.parse_color_props("pixel_format=gray16le")
    frames = [rng.integers(0, 65536, (16, 24)).astype(np.uint16),
              (np.arange(384).reshape(16, 24) * 170).astype(np.uint16)]
    p = tmp_path / "hd.nut"
    with video.open_output(str(p), 24, 16, Fraction(25), props) as wr:
        assert wr.codec == "ffv1"
        for f in frames:
            wr.write_frame([f.astype(float)], raw=True)
    cap = cv2.VideoCapture(str(p), cv2.CAP_FFMPEG)
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    for f in frames:
        ok, raw = cap.read()
        assert ok and raw.dtype == np.uint16
        assert np.array_equal(raw.reshape(16, 24), f)
    cap.release()


def test_native_rgb_ffv1_encode_bit_exact_in_real_libav(tmp_path):
    """The encoder's RGB mode (colorspace 1: line-interleaved G,B,R at
    9 bits with the forward reversible color transform) decodes
    bit-exactly in real libavcodec, and round-trips natively."""
    rng = np.random.default_rng(113)
    props = video.parse_color_props("pixel_format=gbrp")
    G = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    B = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    R = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    p = tmp_path / "rgb.nut"
    with video.open_output(str(p), 24, 16, Fraction(25), props) as wr:
        assert wr.codec == "ffv1"
        wr.write_frame([x.astype(float) for x in (G, B, R)], raw=True)
    with video.open_input(str(p)) as r:
        assert r.pix_fmt.name == "gbrp"
        g2, b2, r2 = r.read_frame(raw=True)
        assert np.array_equal(g2, G) and np.array_equal(b2, B)
        assert np.array_equal(r2, R)
    cap = cv2.VideoCapture(str(p), cv2.CAP_FFMPEG)
    ok, bgr = cap.read()
    cap.release()
    assert ok
    assert np.array_equal(bgr[..., 1], G)
    assert np.array_equal(bgr[..., 0], B)
    assert np.array_equal(bgr[..., 2], R)


# ---- our version-3 encoder x real libavcodec (round 5) ---------------


def test_v3_encoder_rgb_bit_exact_in_real_libavcodec(tmp_path):
    """Our sliced v3 bitstream (extradata, slice size/CRC trailers,
    ff_rac_terminate-style slice flush) decodes BIT-EXACTLY in real
    libavcodec.  Distinct frames guard against silent error
    concealment: a slice marked damaged is replaced by the previous
    picture, which identical-frame tests cannot see."""
    from dspfun_tpu.io import ffv1
    if not ffv1.available():
        pytest.skip("native FFV1 unavailable")
    p = tmp_path / "v3rgb.mkv"
    rng = np.random.default_rng(42)
    W, H = 46, 30
    props = video.parse_color_props("pixel_format=gbrp")
    frames = [rng.integers(0, 256, (H, W, 3), np.uint8) for _ in range(4)]
    with video.open_output(str(p), W, H, Fraction(25), props,
                           format="matroska",
                           options="level=3:slices=4") as wr:
        for f in frames:
            # gbrp plane order G, B, R
            wr.write_frame([f[:, :, 1].astype(float), f[:, :, 0].astype(float),
                            f[:, :, 2].astype(float)], raw=True)
    assert isinstance(wr, video.MkvVideoWriter)
    assert wr._enc.params.version == 3 and wr._enc.num_h == 2
    got = _cv_frames(p)
    assert len(got) == 4
    for f, g in zip(frames, got):  # cv2 returns BGR
        assert np.array_equal(g[:, :, 0], f[:, :, 0])
        assert np.array_equal(g[:, :, 1], f[:, :, 1])
        assert np.array_equal(g[:, :, 2], f[:, :, 2])


def test_v3_encoder_yuv420_luma_bit_exact_in_real_libavcodec(tmp_path):
    from dspfun_tpu.io import ffv1
    if not ffv1.available():
        pytest.skip("native FFV1 unavailable")
    p = tmp_path / "v3yuv.nut"
    rng = np.random.default_rng(43)
    W, H = 64, 48
    frames = [[rng.integers(0, 256, (H, W)).astype(float),
               rng.integers(0, 256, (H // 2, W // 2)).astype(float),
               rng.integers(0, 256, (H // 2, W // 2)).astype(float)]
              for _ in range(3)]
    props = video.parse_color_props("pixel_format=yuv420p")
    with video.open_output(str(p), W, H, Fraction(25), props,
                           options="level=3:slices=4") as wr:
        for f in frames:
            wr.write_frame(f, raw=True)
    got = _cv_frames(p, raw=True)  # CONVERT_RGB=0: luma plane only
    assert len(got) == 3
    for f, g in zip(frames, got):
        luma = np.asarray(g).squeeze().reshape(-1)[:H * W].reshape(H, W)
        assert np.array_equal(luma, f[0].astype(np.uint8))


def test_v3_encoder_16bit_decodes_clean_in_real_libavcodec(tmp_path):
    """cv2 cannot present 16-bit planes, but strict-libav decode (ec=1
    CRC + byte-count checks) completing with DISTINCT output frames
    proves the 16-bit v3 bitstream parses without error concealment;
    sample-exactness is pinned by the native round-trip tests."""
    from dspfun_tpu.io import ffv1
    if not ffv1.available():
        pytest.skip("native FFV1 unavailable")
    for name, shape_fn in [
        ("yuv444p16le", lambda rng, W, H: [rng.integers(0, 65536, (H, W)).astype(float)] * 3),
        ("gbrp16le", lambda rng, W, H: [rng.integers(0, 65536, (H, W)).astype(float) for _ in range(3)]),
    ]:
        p = tmp_path / f"v3_{name}.mkv"
        rng = np.random.default_rng(44)
        W, H = 48, 32
        props = video.parse_color_props(f"pixel_format={name}")
        with video.open_output(str(p), W, H, Fraction(25), props,
                               format="matroska",
                               options="level=3:slices=4") as wr:
            for _ in range(3):
                wr.write_frame(shape_fn(rng, W, H), raw=True)
        got = _cv_frames(p, raw=True)
        assert len(got) == 3, name
        for i in range(1, 3):
            assert not np.array_equal(got[i], got[i - 1]), name


def test_srgb_transfer_matches_real_av_csp():
    """The reference's -g linear-light path calls av_csp's transfer
    functions (motion/motion.c:342-348, zoom/zoom.c:312); our f64 sRGB
    pair must match the REAL av_csp (cv2's bundled libavutil) to a few
    ulp across the whole 0..1 range."""
    import ctypes
    import glob
    import os

    from dspfun_tpu.io.color import srgb_decode, srgb_encode

    root = os.path.join(os.path.dirname(os.path.dirname(cv2.__file__)),
                        "opencv_python.libs")
    libs = sorted(glob.glob(os.path.join(root, "libavutil*.so*")))
    if not libs:
        pytest.skip("no bundled libavutil")
    lib = ctypes.CDLL(libs[0])
    trcfn = ctypes.CFUNCTYPE(ctypes.c_double, ctypes.c_double)
    lib.av_csp_trc_func_from_id.restype = trcfn
    lib.av_csp_trc_func_inv_from_id.restype = trcfn
    enc = lib.av_csp_trc_func_from_id(13)      # AVCOL_TRC_IEC61966_2_1
    dec = lib.av_csp_trc_func_inv_from_id(13)
    if not enc or not dec:
        pytest.skip("libavutil predates av_csp trc funcs")
    xs = np.linspace(0.0, 1.0, 4001)
    want_e = np.asarray([enc(float(x)) for x in xs])
    want_d = np.asarray([dec(float(x)) for x in xs])
    np.testing.assert_allclose(srgb_encode(xs), want_e, rtol=0, atol=1e-16 * 8)
    np.testing.assert_allclose(srgb_decode(xs), want_d, rtol=0, atol=1e-16 * 8)


def test_ffv1_random_geometry_sweep(tmp_path):
    """Randomized codec sweep: dims 1..66 (odd, tiny, non-multiples of
    the slice grid), 8/16-bit, gray/yuv444/gbrp, slices 1/4/9, v1/v3 —
    every config must round-trip natively bit-exactly and (8-bit
    gray/gbrp) decode bit-exactly in real libavcodec.  Slice-boundary
    and 1-pixel-plane edges live here, not in the happy-path tests."""
    from dspfun_tpu.io import ffv1
    if not ffv1.available():
        pytest.skip("native FFV1 unavailable")
    rng = np.random.default_rng(7)
    for trial in range(40):
        W = int(rng.integers(1, 67)); H = int(rng.integers(1, 67))
        depth = int(rng.choice([8, 16]))
        kind = rng.choice(["gray", "yuv444", "gbrp"])
        slices = int(rng.choice([1, 4, 9]))
        level = 3 if slices > 1 or rng.random() < 0.5 else 1
        if kind == "gbrp" and depth == 16:
            level = 3  # 16-bit RGB needs the v3 extradata path
        pf = {"gray": "gray", "yuv444": "yuv444p", "gbrp": "gbrp"}[kind]
        nc = 1 if kind == "gray" else 3
        if depth == 16:
            pf += "16le"
        hi = 1 << depth
        frames = [[rng.integers(0, hi, (H, W)).astype(float)
                   for _ in range(nc)] for _ in range(2)]
        props = video.parse_color_props(f"pixel_format={pf}")
        cfg = f"[{trial}] {W}x{H} {pf} level={level} slices={slices}"
        p = tmp_path / f"t{trial}.nut"
        with video.open_output(str(p), W, H, Fraction(25), props,
                               options=f"level={level}:slices={slices}") as wr:
            assert wr.codec == "ffv1", cfg
            for f in frames:
                wr.write_frame(f, raw=True)
        with video.open_input(str(p)) as r:
            for f in frames:
                got = r.read_frame(raw=True)
                for a, b in zip(got, f):
                    assert np.array_equal(np.asarray(a, float), b), cfg
        if depth == 8 and kind in ("gray", "gbrp"):
            cap = cv2.VideoCapture(str(p), cv2.CAP_FFMPEG)
            if kind == "gray":
                cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
            for f in frames:
                ok, raw = cap.read()
                assert ok, cfg
                raw = np.asarray(raw)
                if kind == "gray":
                    luma = raw.squeeze().reshape(-1)[:H * W].reshape(H, W)
                    assert np.array_equal(luma, f[0].astype(np.uint8)), cfg
                else:  # cv2 converts gbrp to BGR
                    g, b_, r_ = (x.astype(np.uint8) for x in f)
                    assert np.array_equal(raw[:, :, 1], g), cfg
                    assert np.array_equal(raw[:, :, 0], b_), cfg
                    assert np.array_equal(raw[:, :, 2], r_), cfg
            cap.release()
