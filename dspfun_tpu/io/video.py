"""Video I/O: the ffapi surface of the reference, rebuilt without FFmpeg.

The reference wraps libavformat/libavcodec/libswscale (include/ffapi.{h,c})
for frame-by-frame video read/write with color-property negotiation.
This environment has no FFmpeg, so the framework carries its own
containers, chosen to preserve the reference's observable conventions:

* **y4m** (YUV4MPEG2) — the reference's default for pipe video
  (ffapi.c:177-178,396-397).  8-bit planar YCbCr (mono/420/422/444),
  full header parsing incl. C-tag chroma siting and the XCOLORRANGE
  extension.  This is the interchange format with other tools.
* **fvid** — this framework's lossless float32 planar container, the
  stand-in for the reference's FFV1-in-NUT float default
  (motion.c:447, zoom.c:306: AV_CODEC_ID_FFV1 + GBRPF32): a one-line
  text header and raw little-endian float planes.
* **image2** — printf-pattern image sequences (``frame%04d.png``) via
  the still-image layer.
* ``ffplay:`` pseudo-outputs (ffapi.c:455-485) are gated on an ffplay
  binary being present.

Color properties mirror FFColorProperties (ffapi.h:16-23): pixel
format, range (jpeg/mpeg), primaries, transfer, matrix, chroma siting,
parsed from the same "k=v:k=v" strings (ffapi.c:94-114), with the
per-format defaults of ffapi.c:33-92 (y4m implies limited-range
SMPTE170M; image2 implies full-range sRGB).
"""

from __future__ import annotations

import dataclasses
import io
import os
import re
import sys
from fractions import Fraction

import numpy as np

__all__ = [
    "ColorProps",
    "PixelFormat",
    "PIXEL_FORMATS",
    "parse_color_props",
    "parse_rate",
    "open_input",
    "open_output",
    "VideoReader",
    "VideoWriter",
    "rgb_to_planes",
    "planes_to_rgb",
]


# ---------------------------------------------------------------------------
# Pixel formats
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PixelFormat:
    """Planar pixel format descriptor (the av_pix_fmt_desc analogue).

    ``chroma_shift`` = (log2 horizontal, log2 vertical) subsampling of
    planes 1..2; plane 0 (and 3) are full resolution.
    """

    name: str
    ncomp: int
    chroma_shift: tuple[int, int] = (0, 0)
    depth: int = 8
    is_float: bool = False
    is_rgb: bool = False  # component order for rgb planar is G, B, R (FFmpeg gbrp)

    @property
    def dtype(self):
        if self.is_float:
            return np.dtype("<f4")
        return np.dtype("<u2") if self.depth > 8 else np.dtype("u1")

    def plane_dims(self, width: int, height: int) -> list[tuple[int, int]]:
        """[(w, h)] per plane, chroma rounded up (ceiling shift)."""
        dims = []
        sx, sy = self.chroma_shift
        for p in range(self.ncomp):
            if p in (1, 2) and not self.is_rgb:
                dims.append(((width + (1 << sx) - 1) >> sx,
                             (height + (1 << sy) - 1) >> sy))
            else:
                dims.append((width, height))
        return dims

    def frame_bytes(self, width: int, height: int) -> int:
        return sum(w * h for w, h in self.plane_dims(width, height)) * self.dtype.itemsize


PIXEL_FORMATS = {
    f.name: f
    for f in [
        PixelFormat("gray", 1),
        PixelFormat("gray16le", 1, depth=16),
        PixelFormat("yuv420p", 3, (1, 1)),
        PixelFormat("yuv422p", 3, (1, 0)),
        PixelFormat("yuv444p", 3),
        PixelFormat("yuv420p10le", 3, (1, 1), depth=10),
        PixelFormat("yuv420p12le", 3, (1, 1), depth=12),
        PixelFormat("yuv420p16le", 3, (1, 1), depth=16),
        PixelFormat("yuv422p10le", 3, (1, 0), depth=10),
        PixelFormat("yuv422p12le", 3, (1, 0), depth=12),
        PixelFormat("yuv422p16le", 3, (1, 0), depth=16),
        PixelFormat("yuv444p10le", 3, depth=10),
        PixelFormat("yuv444p12le", 3, depth=12),
        PixelFormat("yuv444p16le", 3, depth=16),
        PixelFormat("gbrp", 3, is_rgb=True),
        PixelFormat("gbrp16le", 3, depth=16, is_rgb=True),
        PixelFormat("gbrpf32le", 3, is_float=True, is_rgb=True),
        PixelFormat("grayf32le", 1, is_float=True),
        PixelFormat("yuv444pf32", 3, is_float=True),
    ]
}


# ---------------------------------------------------------------------------
# Color properties
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ColorProps:
    """Mirror of FFColorProperties (reference ffapi.h:16-23)."""

    pix_fmt: str | None = None
    color_range: str | None = None       # "jpeg" (full) | "mpeg" (limited)
    color_primaries: str | None = None   # "bt709", "smpte170m", ...
    color_trc: str | None = None         # "iec61966-2-1", "smpte170m", "linear", ...
    color_space: str | None = None       # "rgb", "bt709", "smpte170m", ...
    chroma_location: str | None = None   # "left", "center", "topleft"
    sample_aspect: str | None = None     # pixel SAR "num:den"; None unknown

    def copy(self) -> "ColorProps":
        return dataclasses.replace(self)


_RANGE_ALIASES = {"full": "jpeg", "pc": "jpeg", "jpeg": "jpeg",
                  "limited": "mpeg", "tv": "mpeg", "mpeg": "mpeg"}


# --ff-opts keys that address the ENCODER rather than color
# properties (the reference passes one option dict to the codec,
# zoom.c:217-228; here FFV1 level/slices and the negotiate opt-in ride
# the same flag and split off before color parsing)
_CODEC_OPT_KEYS = {"level", "slices", "slicecrc", "negotiate"}


def split_codec_opts(optstring: str | None) -> tuple[str, str]:
    """Split a "k=v:k=v" option string into (color-prop string,
    codec-option string).  Accepts the same ``:``/``,``/``|``
    separators as the codec-side parser (ffv1.parse_codec_opts) — a
    mixed-separator string must not silently drop a color property
    into the codec bucket (round-5 review finding)."""
    props, codec = [], []
    for part in re.split(r"[:,|]", optstring or ""):
        k = part.split("=", 1)[0].strip()
        (codec if k in _CODEC_OPT_KEYS else props).append(part)
    return ":".join(p for p in props if p), ":".join(c for c in codec if c)


def _wants_negotiate(options: str | None) -> bool:
    """Parse the ``negotiate`` opt-in VALUE: ``negotiate=0`` is an
    explicit opt-OUT and must not down-convert float content (a bare
    substring test enabled it — round-5 review finding)."""
    for part in re.split(r"[:,|]", options or ""):
        k, eq, v = part.strip().partition("=")
        if k == "negotiate":
            return v.strip().lower() not in ("0", "false", "no") if eq else True
    return False


def parse_color_props(props: str | None) -> ColorProps:
    """Parse a "k=v:k=v" color property string (reference ffapi.c:94-114)."""
    c = ColorProps()
    if not props:
        return c
    for pair in props.split(":"):
        if not pair:
            continue
        key, _, val = pair.partition("=")
        if key == "pixel_format":
            if val not in PIXEL_FORMATS:
                raise ValueError(f"unknown pixel format {val!r}")
            c.pix_fmt = val
        elif key == "color_range":
            if val not in _RANGE_ALIASES:
                raise ValueError(f"unknown color range {val!r}")
            c.color_range = _RANGE_ALIASES[val]
        elif key == "color_primaries":
            c.color_primaries = val
        elif key == "color_trc":
            c.color_trc = val
        elif key == "colorspace":
            c.color_space = val
        elif key == "chroma_sample_location":
            c.chroma_location = val
        else:
            raise ValueError(f"unknown color property {key!r}")
    return c


def parse_rate(s: str) -> Fraction:
    """Frame rate: "30", "30000/1001", "29.97" (av_parse_video_rate)."""
    if "/" in s:
        n, d = s.split("/", 1)
        return Fraction(int(n), int(d))
    if ":" in s:
        n, d = s.split(":", 1)
        return Fraction(int(n), int(d))
    return Fraction(s).limit_denominator(1001 * 60000)


# ---------------------------------------------------------------------------
# RGB <-> planar conversion (host side; device variants live in ops)
# ---------------------------------------------------------------------------


def _matrix_for(space: str | None) -> str:
    if space in ("bt709",):
        return "bt709"
    if space in ("bt2020nc", "bt2020"):
        return "bt2020"
    return "bt601"  # smpte170m / bt470bg / unspecified


def rgb_to_planes(rgb: np.ndarray, pf: PixelFormat, props: ColorProps) -> list[np.ndarray]:
    """[H,W,3] float RGB in [0,1] -> list of float planes in [0,1]
    (or raw floats for float formats).  Chroma is box-filtered when
    subsampled (swscale's default average filter in spirit)."""
    from dspfun_tpu.io import color as _color

    h, w = rgb.shape[:2]
    if pf.is_rgb:  # planar G, B, R (FFmpeg gbrp order)
        return [rgb[..., 1].copy(), rgb[..., 2].copy(), rgb[..., 0].copy()]
    if pf.ncomp == 1:
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        return [y]
    m = _color.ycbcr_matrix(_matrix_for(props.color_space))
    ycc = rgb @ m.T  # Y in [0,1], Cb/Cr in [-0.5, 0.5]
    y, cb, cr = ycc[..., 0], ycc[..., 1] + 0.5, ycc[..., 2] + 0.5
    sx, sy = pf.chroma_shift
    if sx or sy:
        fx, fy = 1 << sx, 1 << sy
        ph, pw = (h + fy - 1) // fy, (w + fx - 1) // fx
        def down(p):
            pad = np.pad(p, ((0, ph * fy - h), (0, pw * fx - w)), mode="edge")
            return pad.reshape(ph, fy, pw, fx).mean(axis=(1, 3))
        cb, cr = down(cb), down(cr)
    return [y, cb, cr]


def planes_to_rgb(planes: list[np.ndarray], pf: PixelFormat, props: ColorProps,
                  width: int, height: int) -> np.ndarray:
    """Inverse of :func:`rgb_to_planes`; chroma upsampled by pixel
    replication."""
    from dspfun_tpu.io import color as _color

    if pf.is_rgb:
        g, b, r = planes
        return np.stack([r, g, b], axis=-1)
    if pf.ncomp == 1:
        y = planes[0]
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes
    sx, sy = pf.chroma_shift
    if sx or sy:
        cb = cb.repeat(1 << sy, axis=0).repeat(1 << sx, axis=1)[:height, :width]
        cr = cr.repeat(1 << sy, axis=0).repeat(1 << sx, axis=1)[:height, :width]
    ycc = np.stack([y, cb - 0.5, cr - 0.5], axis=-1)
    minv = _color.ycbcr_inverse_matrix(_matrix_for(props.color_space))
    return ycc @ minv.T


def plane_to_pel(p: np.ndarray, pf: PixelFormat, plane_idx: int,
                 crange: str | None) -> np.ndarray:
    """Float [0,1] plane -> stored pel units as float (no rounding):
    what raw (getpel_direct-style) processing paths operate on.  mpeg
    range maps to 16-235/16-240 like :func:`_quantize_plane`."""
    p = np.asarray(p, dtype=np.float64)
    if pf.is_float:
        return p
    scale8 = 1 << (pf.depth - 8)
    if crange == "mpeg" and not pf.is_rgb:
        if plane_idx in (1, 2) and pf.ncomp > 1:
            return (p * 224.0 + 16.0) * scale8
        return (p * 219.0 + 16.0) * scale8
    return p * ((1 << pf.depth) - 1)


def plane_from_pel(p: np.ndarray, pf: PixelFormat, plane_idx: int,
                   crange: str | None) -> np.ndarray:
    """Float stored-pel units -> normalized [0,1] (no rounding); the
    inverse of :func:`plane_to_pel`."""
    return _dequantize_plane(np.asarray(p, dtype=np.float64), pf,
                             plane_idx, crange)


def _quantize_plane(p: np.ndarray, pf: PixelFormat, plane_idx: int,
                    crange: str | None) -> np.ndarray:
    """Float [0,1] -> stored integers; mpeg range maps Y to 16-235 and
    chroma to 16-240 (x256 at 16-bit)."""
    if pf.is_float:
        return np.asarray(p, dtype=pf.dtype)
    maxv = (1 << pf.depth) - 1
    scale8 = 1 << (pf.depth - 8)
    if crange == "mpeg" and not pf.is_rgb:
        if plane_idx in (1, 2) and pf.ncomp > 1:
            v = (p * 224.0 + 16.0) * scale8
        else:
            v = (p * 219.0 + 16.0) * scale8
    else:
        v = p * maxv
    return np.clip(np.rint(v), 0, maxv).astype(pf.dtype)


def dequantize_planes(planes: list[np.ndarray], pf: "PixelFormat",
                      crange: str | None) -> list[np.ndarray]:
    """Stored-dtype planes -> normalized floats: the read_frame(raw=False)
    mapping, for callers that buffered raw pels (e.g. rotate)."""
    return [plane_from_pel(p, pf, i, crange) for i, p in enumerate(planes)]


def _dequantize_plane(v: np.ndarray, pf: PixelFormat, plane_idx: int,
                      crange: str | None) -> np.ndarray:
    if pf.is_float:
        return np.asarray(v, dtype=np.float64)
    scale8 = 1 << (pf.depth - 8)
    v = np.asarray(v, dtype=np.float64)
    if crange == "mpeg" and not pf.is_rgb:
        if plane_idx in (1, 2) and pf.ncomp > 1:
            return (v / scale8 - 16.0) / 224.0
        return (v / scale8 - 16.0) / 219.0
    return v / ((1 << pf.depth) - 1)


# ---------------------------------------------------------------------------
# y4m container
# ---------------------------------------------------------------------------

_Y4M_CTAGS = {
    "mono": ("gray", "center"),
    "mono16": ("gray16le", "center"),
    "420jpeg": ("yuv420p", "center"),
    "420": ("yuv420p", "center"),
    "420mpeg2": ("yuv420p", "left"),
    "420paldv": ("yuv420p", "topleft"),
    "422": ("yuv422p", "left"),
    "444": ("yuv444p", "left"),
    # high-bit-depth tags as written/read by ffmpeg's y4m (de)muxer
    # ("C420p16" etc.); siting follows the mpeg2 "left" convention
    **{f"{sub}p{d}": (f"yuv{sub}p{d}le", "left")
       for sub in ("420", "422", "444") for d in (10, 12, 16)},
}


def _y4m_ctag(pix_fmt: str, chroma_location: str | None) -> str:
    if pix_fmt == "gray":
        return "mono"
    if pix_fmt == "gray16le":
        return "mono16"
    if pix_fmt == "yuv422p":
        return "422"
    if pix_fmt == "yuv444p":
        return "444"
    if pix_fmt == "yuv420p":
        return {"left": "420mpeg2", "topleft": "420paldv"}.get(
            chroma_location or "center", "420jpeg"
        )
    m = re.fullmatch(r"yuv(420|422|444)p(10|12|16)le", pix_fmt)
    if m:
        return f"{m.group(1)}p{m.group(2)}"
    raise ValueError(f"pixel format {pix_fmt!r} not representable in y4m")


# ---------------------------------------------------------------------------
# Readers / writers
# ---------------------------------------------------------------------------


class VideoReader:
    """Frame-by-frame reader; planes come back as float arrays in [0,1]
    (raw floats for float formats)."""

    def __init__(self, stream, spec: str, fmt: str):
        self._stream = stream
        self.spec = spec
        self.format = fmt
        self.width = 0
        self.height = 0
        self.rate = Fraction(25, 1)
        self.pix_fmt: PixelFormat = PIXEL_FORMATS["yuv420p"]
        self.props = ColorProps()
        self.frames: int | None = None
        self.frame_index = 0

    # -- interface ----------------------------------------------------

    def read_frame(self, raw: bool = False) -> list[np.ndarray] | None:
        raise NotImplementedError

    def read_frame_rgb(self) -> np.ndarray | None:
        planes = self.read_frame()
        if planes is None:
            return None
        return planes_to_rgb(planes, self.pix_fmt, self.props, self.width, self.height)

    def seek_frame(self, n: int) -> None:
        """Decode-and-discard seek (reference ffapi.c:578-596)."""
        while self.frame_index < n:
            if self.read_frame() is None:
                break

    def plane_dims(self) -> list[tuple[int, int]]:
        return self.pix_fmt.plane_dims(self.width, self.height)

    def close(self) -> None:
        # getattr: under contextlib.redirect_stdout/-stdin the
        # replacement (e.g. StringIO) has no .buffer, and evaluating it
        # just for the identity check would raise
        if self._stream is not getattr(sys.stdin, "buffer", None):
            self._stream.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class _HeaderedReader(VideoReader):
    """Shared FRAME-marker logic for y4m and fvid."""

    def _parse_header(self):
        raise NotImplementedError

    def _count_frames(self):
        """Count FRAME markers by seeking through the stream (the
        analogue of ffapi's decode-count-then-reopen, ffapi.c:215-237)."""
        if not self._stream.seekable():
            return
        pos = self._stream.tell()
        fsize = self.pix_fmt.frame_bytes(self.width, self.height)
        end = self._stream.seek(0, os.SEEK_END)
        self._stream.seek(pos)
        n = 0
        while True:
            line = self._stream.readline()
            if not line:
                break
            if not line.startswith(b"FRAME"):
                raise ValueError(f"bad frame marker in {self.spec!r}")
            if self._stream.tell() + fsize > end:
                # truncated final frame (interrupted write): read_frame
                # will return None for it, so counting it would make
                # callers (motion's source_d sizing) abort mid-run
                break
            self._stream.seek(fsize, os.SEEK_CUR)
            n += 1
        self.frames = n
        self._stream.seek(pos)

    def read_frame(self, raw: bool = False) -> list[np.ndarray] | None:
        """``raw=True`` returns stored pel values (8-bit: 0..255) in the
        container's native dtype with no range conversion — the
        ffapi_getpel_direct path the motion tool uses (reference
        ffapi.h:58-77); integer planes stay 1-2 bytes/sample until the
        device-side f32 cast."""
        line = self._stream.readline()
        if not line:
            return None
        if not line.startswith(b"FRAME"):
            raise ValueError(f"bad frame marker in {self.spec!r}")
        planes = _read_frame_payload(self._stream, self.pix_fmt, self.width,
                                     self.height, self.props, raw)
        if planes is not None:
            self.frame_index += 1
        return planes


def _read_frame_payload(stream, pf: PixelFormat, width: int, height: int,
                        props: ColorProps, raw: bool):
    """Read one frame's raw plane payload and split/dequantize it."""
    nbytes = pf.frame_bytes(width, height)
    data = stream.read(nbytes)
    if data is None or len(data) < nbytes:
        return None
    out = []
    off = 0
    for i, (w, h) in enumerate(pf.plane_dims(width, height)):
        nb = w * h * pf.dtype.itemsize
        arr = np.frombuffer(data[off : off + nb], dtype=pf.dtype).reshape(h, w)
        if raw:
            # native stored dtype (u8/u16/f32): integer pels stay 1-2
            # bytes/sample all the way to the device H2D (motion's
            # staging), where the jitted chain casts to f32 — exact for
            # every container depth
            out.append(np.array(arr))
        else:
            out.append(_dequantize_plane(arr, pf, i, props.color_range))
        off += nb
    return out


class Y4MReader(_HeaderedReader):
    def __init__(self, stream, spec):
        super().__init__(stream, spec, "yuv4mpegpipe")
        self._parse_header()
        self._count_frames()

    def _parse_header(self):
        line = self._stream.readline().decode("ascii", "replace")
        if not line.startswith("YUV4MPEG2"):
            raise ValueError(f"{self.spec!r} is not a y4m stream")
        ctag = "420jpeg"
        self.props = ColorProps(
            # y4m default color properties (reference ffapi.c:33-43)
            color_range="mpeg", color_primaries="smpte170m",
            color_trc="smpte170m", color_space="smpte170m",
        )
        for tok in line.split()[1:]:
            k, v = tok[0], tok[1:]
            if k == "W":
                self.width = int(v)
            elif k == "H":
                self.height = int(v)
            elif k == "F":
                n, d = v.split(":")
                self.rate = Fraction(int(n), int(d))
            elif k == "C":
                ctag = v
            elif k == "A":
                # pixel aspect; 0:0 means unknown (y4m convention)
                if v not in ("0:0", ""):
                    self.props.sample_aspect = v
            elif k == "X":
                if v.upper() in ("COLORRANGE=FULL",):
                    self.props.color_range = "jpeg"
                elif v.upper() in ("COLORRANGE=LIMITED",):
                    self.props.color_range = "mpeg"
        if ctag not in _Y4M_CTAGS:
            raise ValueError(f"unsupported y4m chroma tag C{ctag}")
        name, loc = _Y4M_CTAGS[ctag]
        self.pix_fmt = PIXEL_FORMATS[name]
        self.props.pix_fmt = name
        self.props.chroma_location = loc


class FvidReader(_HeaderedReader):
    def __init__(self, stream, spec):
        super().__init__(stream, spec, "fvid")
        self._parse_header()
        self._count_frames()

    def _parse_header(self):
        line = self._stream.readline().decode("ascii", "replace")
        if not line.startswith("DSPFVID"):
            raise ValueError(f"{self.spec!r} is not an fvid stream")
        self.props = ColorProps()
        for tok in line.split()[1:]:
            k, v = tok[0], tok[1:]
            if k == "W":
                self.width = int(v)
            elif k == "H":
                self.height = int(v)
            elif k == "F":
                n, d = v.split(":")
                self.rate = Fraction(int(n), int(d))
            elif k == "C":
                self.pix_fmt = PIXEL_FORMATS[v]
                self.props.pix_fmt = v
            elif k == "R":
                self.props.color_range = v
            elif k == "T":
                self.props.color_trc = v
            elif k == "S":
                self.props.color_space = v
            elif k == "P":
                self.props.color_primaries = v
            elif k == "L":
                self.props.chroma_location = v
            elif k == "A":
                self.props.sample_aspect = v


class ImageSeqReader(VideoReader):
    def __init__(self, pattern, spec, rate=Fraction(25, 1)):
        super().__init__(None, spec, "image2")
        from dspfun_tpu.io.images import read_image

        self._read_image = read_image
        self.pattern = pattern
        self.rate = rate
        self.pix_fmt = PIXEL_FORMATS["gbrpf32le"]
        self.props = ColorProps(
            # image2 default: full-range sRGB (reference ffapi.c:50-59)
            color_range="jpeg", color_primaries="bt709",
            color_trc="iec61966-2-1", color_space="rgb",
        )
        self._single = _PATTERN_RE.search(pattern) is None
        if self._single:
            # a plain image path is a one-frame sequence (ffmpeg's
            # image2 does the same for single files)
            n, start = (1 if os.path.exists(pattern) else 0), 0
        else:
            n = 0
            while os.path.exists(pattern % n):
                n += 1
            start = 0
            if n == 0:  # some sequences are 1-based
                if os.path.exists(pattern % 1):
                    start = 1
                    n = 1
                    while os.path.exists(pattern % (n + 1)):
                        n += 1
        self.frames = n
        self._start = start
        if n:
            first = self._read_image(self._path(start))
            self.height, self.width = first.pixels.shape[:2]

    def _path(self, index: int) -> str:
        return self.pattern if self._single else self.pattern % index

    def read_frame(self, raw: bool = False):
        if self.frames is not None and self.frame_index >= self.frames:
            return None
        img = self._read_image(self._path(self._start + self.frame_index))
        self.frame_index += 1
        rgb = img.pixels
        # image2 planes are float (gbrpf32le): stored pel units and
        # normalized values coincide, so ``raw`` needs no conversion —
        # guard against a future non-float pix_fmt silently skipping it
        assert self.pix_fmt.is_float
        planes = [rgb[..., 1], rgb[..., 2], rgb[..., 0]]  # gbr planar
        return planes

    def close(self):
        pass


class VideoWriter:
    def __init__(self, stream, spec, fmt, width, height, rate, pix_fmt: PixelFormat,
                 props: ColorProps):
        self._stream = stream
        self.spec = spec
        self.format = fmt
        self.width = width
        self.height = height
        self.rate = rate
        self.pix_fmt = pix_fmt
        self.props = props
        self.frame_index = 0
        self._wrote_header = False

    def _write_header(self):
        pass

    def write_frame(self, planes: list[np.ndarray], raw: bool = False) -> None:
        """Write float planes in [0,1] (raw floats for float formats).

        ``raw=True`` writes stored pel values directly (8-bit: already
        0..255) — the ffapi_setpel_direct path (reference ffapi.h:78-95).
        """
        if not self._wrote_header:
            self._write_header()
            self._wrote_header = True
        self._stream.write(b"FRAME\n")
        pf = self.pix_fmt
        for i, p in enumerate(planes):
            if raw and not pf.is_float:
                maxv = (1 << pf.depth) - 1
                q = np.clip(np.rint(p), 0, maxv).astype(pf.dtype)
            elif raw:
                q = np.asarray(p, dtype=pf.dtype)
            else:
                q = _quantize_plane(p, pf, i, self.props.color_range)
            self._stream.write(q.tobytes())
        self.frame_index += 1

    def write_frame_rgb(self, rgb: np.ndarray) -> None:
        self.write_frame(rgb_to_planes(rgb, self.pix_fmt, self.props))

    def supports_payload(self) -> bool:
        """True when :meth:`write_frame_payload` is available (raw
        plane-payload framing — y4m/fvid/nut/rawvideo)."""
        return True

    def write_frame_payload(self, payload: bytes) -> None:
        """Write one frame from pre-packed plane-payload bytes (the
        device-side packer's output, io/device_pack.py) — skips the
        host-side RGB->planes conversion and quantisation entirely."""
        if not self._wrote_header:
            self._write_header()
            self._wrote_header = True
        self._stream.write(b"FRAME\n")
        self._stream.write(payload)
        self.frame_index += 1

    def plane_dims(self) -> list[tuple[int, int]]:
        return self.pix_fmt.plane_dims(self.width, self.height)

    def close(self) -> None:
        if not self._wrote_header:
            self._write_header()
            self._wrote_header = True
        # getattr: a redirected sys.stdout (StringIO) has no .buffer
        if self._stream is not None and \
                self._stream is not getattr(sys.stdout, "buffer", None):
            self._stream.close()
        elif self._stream is not None:
            self._stream.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Y4MWriter(VideoWriter):
    def _write_header(self):
        ctag = _y4m_ctag(self.pix_fmt.name, self.props.chroma_location)
        sar = self.props.sample_aspect or "1:1"
        hdr = f"YUV4MPEG2 W{self.width} H{self.height} " \
              f"F{self.rate.numerator}:{self.rate.denominator} Ip A{sar} C{ctag}"
        if self.props.color_range == "jpeg":
            hdr += " XCOLORRANGE=FULL"
        self._stream.write((hdr + "\n").encode("ascii"))


class FvidWriter(VideoWriter):
    def _write_header(self):
        hdr = f"DSPFVID W{self.width} H{self.height} " \
              f"F{self.rate.numerator}:{self.rate.denominator} C{self.pix_fmt.name}"
        for tag, val in (
            ("R", self.props.color_range), ("T", self.props.color_trc),
            ("S", self.props.color_space), ("P", self.props.color_primaries),
            ("L", self.props.chroma_location),
            ("A", self.props.sample_aspect),
        ):
            if val:
                hdr += f" {tag}{val}"
        self._stream.write((hdr + "\n").encode("ascii"))


class NutVideoReader(VideoReader):
    """Native NUT demux (io/nut.py): FFV1 and rawvideo payloads — the
    reference's default motion container family (FFV1-in-NUT at
    motion.c:447) decoded by the native codec (io/ffv1.py)."""

    def __init__(self, stream, spec):
        from dspfun_tpu.io import nut as _nut  # noqa: PLC0415

        super().__init__(stream, spec, "nut")
        self._nr = _nut.NutReader(stream)
        st = self._nr.state
        if not st.streams:
            raise ValueError(f"{spec!r}: NUT stream header missing")
        s0 = st.streams[0]
        tag = bytes(s0["fourcc"])
        self.width, self.height = s0["width"], s0["height"]
        self._ffv1 = None
        self._first_packet: bytes | None = None
        if tag == b"FFV1":
            from dspfun_tpu.io import ffv1 as _ffv1  # noqa: PLC0415

            if not _ffv1.available():
                raise ValueError(
                    f"{spec!r}: FFV1-in-NUT needs the native codec "
                    "(toolchain missing) or the ffmpeg bridge")
            csd = bytes(s0["codec_specific"])
            if csd:
                # version >= 2: parameters ride in the extradata —
                # real-FFmpeg files (v3, either coder, YCbCr or RGB).
                # Unsupported variants raise ValueError here and the
                # open path falls back to the bridge.
                self._ffv1 = _ffv1.FFV1Decoder(self.width, self.height,
                                               extradata=csd)
                params = self._ffv1.params
            else:
                # version 0/1: the parameter set rides in the first
                # keyframe — probe it (the packet replays on first read)
                got = self._nr.read_frame_bytes()
                if got is None:
                    raise ValueError(
                        f"{spec!r}: FFV1 NUT stream has no frames")
                _, pkt = got
                params = _ffv1.probe(pkt, self.width, self.height)
                self._ffv1 = _ffv1.FFV1Decoder(self.width, self.height)
                self._first_packet = pkt
            name = params.pix_fmt_name()
        elif tag == b"DSPF":
            name = s0["codec_specific"].decode("ascii", "replace")
        else:
            from dspfun_tpu.io.nut import _TAG_TO_FMT  # noqa: PLC0415

            name = _TAG_TO_FMT.get(tag, "")
        if name not in PIXEL_FORMATS:
            raise ValueError(
                f"{spec!r}: NUT codec {tag!r} is not native FFV1 or "
                "rawvideo; use the ffmpeg bridge (--format nut) for "
                "foreign codecs")
        self.pix_fmt = PIXEL_FORMATS[name]
        tbid = s0["time_base_id"]
        tb = (st.time_bases[tbid] if 0 <= tbid < len(st.time_bases)
              else Fraction(1, 25))
        info = st.info
        if "X-dspfun-rate" in info:
            num, _, den = info["X-dspfun-rate"].partition("/")
            self.rate = Fraction(int(num), int(den or 1))
        elif tb:
            self.rate = 1 / tb
        self.props = ColorProps(
            pix_fmt=name,
            color_range=info.get("X-dspfun-color_range"),
            color_primaries=info.get("X-dspfun-color_primaries"),
            color_trc=info.get("X-dspfun-color_trc"),
            color_space=info.get("X-dspfun-color_space"),
            chroma_location=info.get("X-dspfun-chroma_location"),
        )
        sw, sh = s0.get("sample_width", 0), s0.get("sample_height", 0)
        if sw and sh:
            self.props.sample_aspect = f"{sw}:{sh}"
        if self.props.color_range is None:
            # colorspace_type carries range class (nut.txt): >= 16 full
            cs = s0.get("colorspace_type", 0)
            self.props.color_range = "jpeg" if cs >= 16 or cs == 0 else "mpeg"
        # ONE packet-structure walk at open: the payload-offset scan
        # both indexes the native demuxer (round 4: payload preads +
        # the prefetch ring run in the C++ runtime, native/dspio.cpp
        # dspio_open_indexed) and yields the frame count; count_frames
        # is the fallback when the scan bails (irregular payloads,
        # header elision, damage) or the native path is unavailable.
        self._native = None
        self._prefetch = 4
        if self._ffv1 is not None:
            # variable packet sizes: no raw-payload index; v0/1 probing
            # consumed (and holds) the first packet
            held = 1 if self._first_packet is not None else 0
            cf = self._nr.count_frames()
            self.frames = None if cf is None else cf + held
            return
        offs = None
        fb = self.pix_fmt.frame_bytes(self.width, self.height)
        if (stream.seekable() and spec not in ("-", "pipe:", "pipe:0")
                and os.path.exists(spec)):
            try:
                from dspfun_tpu.io import native as _native  # noqa: PLC0415

                if _native.available():
                    offs = self._nr.scan_payload_offsets(fb)
            except Exception:  # noqa: BLE001 — pure-Python fallback
                offs = None
        self.frames = (len(offs) if offs is not None
                       else self._nr.count_frames())
        if offs:
            try:
                from dspfun_tpu.io import native as _native  # noqa: PLC0415

                self._native = _native.NativeVideoReader(
                    spec, prefetch=0,
                    index=(offs, fb,
                           self.pix_fmt.plane_dims(self.width,
                                                   self.height),
                           self.pix_fmt.dtype.itemsize,
                           (self.width, self.height),
                           (self.rate.numerator,
                            self.rate.denominator)))
            except Exception:  # noqa: BLE001 — pure-Python fallback
                self._native = None

    def seek_frame(self, n: int) -> None:
        if self._native is not None and not self._native._pf:
            self._native.seek(n)
            self.frame_index = n
            return
        super().seek_frame(n)

    def read_frame(self, raw: bool = False):
        pf = self.pix_fmt
        if self._ffv1 is not None:
            while True:
                if self._first_packet is not None:
                    pkt, self._first_packet = self._first_packet, None
                else:
                    got = self._nr.read_frame_bytes()
                    if got is None:
                        return None
                    _, pkt = got
                try:
                    planes = self._ffv1.decode(pkt)
                    break
                except ValueError:
                    # payload-level damage: drop the frame and continue
                    # at the next packet (every native frame is a
                    # keyframe with reset contexts), mirroring the
                    # container-level syncpoint recovery
                    self._nr.damaged += 1
                    print("nut: damaged FFV1 frame, skipping",
                          file=sys.stderr)
            self.frame_index += 1
            if raw:
                return planes
            return [
                _dequantize_plane(p, pf, i, self.props.color_range)
                for i, p in enumerate(planes)
            ]
        if self._native is not None:
            if self._prefetch:
                self._native.start_prefetch(self._prefetch)
                self._prefetch = 0
            planes = self._native.read_frame()
            if planes is None:
                return None
            self.frame_index += 1
            if raw:
                return [np.asarray(p) for p in planes]
            return [
                _dequantize_plane(p, pf, i, self.props.color_range)
                for i, p in enumerate(planes)
            ]
        got = self._nr.read_frame_bytes()
        if got is None:
            return None
        _, data = got
        if len(data) < pf.frame_bytes(self.width, self.height):
            raise ValueError(f"{self.spec!r}: short NUT frame")
        # one plane split/dequantize implementation for every container
        # (the y4m/fvid payload reader) — only the byte source differs
        planes = _read_frame_payload(io.BytesIO(data), pf, self.width,
                                     self.height, self.props, raw)
        self.frame_index += 1
        return planes

    def close(self) -> None:
        if getattr(self, "_native", None) is not None:
            self._native.close()
            self._native = None
        if getattr(self, "_ffv1", None) is not None:
            self._ffv1.close()
            self._ffv1 = None
        super().close()


class MkvVideoReader(VideoReader):
    """Native Matroska demux (io/mkv.py) for FFV1 video tracks — the
    real-world archival pairing of the reference's default codec
    (ffapi.c:362-559 + AV_CODEC_ID_FFV1).  Seekable sources only;
    anything the native stack can't decode raises ValueError and the
    open path falls back to the ffmpeg bridge."""

    def __init__(self, stream, spec):
        from dspfun_tpu.io import ffv1 as _ffv1  # noqa: PLC0415
        from dspfun_tpu.io import mkv as _mkv  # noqa: PLC0415

        super().__init__(stream, spec, "matroska")
        if not stream.seekable():
            raise ValueError(f"{spec!r}: matroska on a pipe needs the "
                             "ffmpeg bridge")
        d = _mkv.MkvDemuxer(stream)
        t = d.track
        if t.codec_id != "V_FFV1":
            raise ValueError(
                f"{spec!r}: matroska codec {t.codec_id!r} is not native "
                "FFV1; use the ffmpeg bridge")
        if not _ffv1.available():
            raise ValueError(f"{spec!r}: native FFV1 unavailable "
                             "(toolchain missing)")
        self.width, self.height = t.width, t.height
        self.rate = d.rate()
        if t.codec_private:
            self._ffv1 = _ffv1.FFV1Decoder(t.width, t.height,
                                           extradata=t.codec_private)
            params = self._ffv1.params
            self._packets = d.scan_packets()
        else:
            self._ffv1 = _ffv1.FFV1Decoder(t.width, t.height)
            self._packets = d.scan_packets()
            if not self._packets:
                raise ValueError(f"{spec!r}: matroska FFV1 track is empty")
            ts, off, ln = self._packets[0]
            stream.seek(off)
            params = _ffv1.probe(stream.read(ln), t.width, t.height)
        name = params.pix_fmt_name()
        if name not in PIXEL_FORMATS:
            raise ValueError(f"{spec!r}: FFV1 format {name!r} unsupported")
        self.pix_fmt = PIXEL_FORMATS[name]
        self.frames = len(self._packets)
        self.props = ColorProps(
            pix_fmt=name, color_range=t.color_range,
            color_space=t.color_space, color_trc=t.color_trc,
            color_primaries=t.color_primaries,
        )
        if self.props.color_range is None:
            self.props.color_range = "jpeg" if self.pix_fmt.is_rgb else "mpeg"
        if self.props.color_space is None and self.pix_fmt.is_rgb:
            self.props.color_space = "rgb"

    def read_frame(self, raw: bool = False):
        if self.frame_index >= len(self._packets):
            return None
        _, off, ln = self._packets[self.frame_index]
        self._stream.seek(off)
        pkt = self._stream.read(ln)
        planes = self._ffv1.decode(pkt)
        self.frame_index += 1
        if raw:
            return planes
        pf = self.pix_fmt
        return [
            _dequantize_plane(p, pf, i, self.props.color_range)
            for i, p in enumerate(planes)
        ]

    def close(self) -> None:
        if getattr(self, "_ffv1", None) is not None:
            self._ffv1.close()
            self._ffv1 = None
        super().close()


class MkvVideoWriter(VideoWriter):
    """Native Matroska mux (io/mkv.py) with FFV1 payloads — the
    zero-binary fallback for `.mkv` outputs; with an ffmpeg binary on
    PATH the bridge handles mkv exactly like the reference's
    libavformat would."""

    def __init__(self, stream, spec, width, height, rate, pix_fmt, props,
                 options: str | None = None):
        from dspfun_tpu.io import ffv1 as _ffv1  # noqa: PLC0415
        from dspfun_tpu.io import mkv as _mkv  # noqa: PLC0415

        super().__init__(stream, spec, "matroska", width, height, rate,
                         pix_fmt, props)
        self.codec = "ffv1"
        self._enc = _ffv1.FFV1Encoder(pix_fmt, width, height, options)
        self._mux = _mkv.MkvMuxer(stream, width, height, rate,
                                  codec_private=self._enc.extradata,
                                  color_range=props.color_range,
                                  color_space=props.color_space)

    def _write_header(self):
        pass  # the muxer writes its header lazily

    def write_frame(self, planes: list[np.ndarray], raw: bool = False) -> None:
        pf = self.pix_fmt
        quantized = []
        for i, p in enumerate(planes):
            if raw:
                maxv = (1 << pf.depth) - 1
                q = np.clip(np.rint(p), 0, maxv).astype(pf.dtype)
            else:
                q = _quantize_plane(p, pf, i, self.props.color_range)
            quantized.append(q)
        self._mux.write_frame_bytes(self._enc.encode(quantized))
        self.frame_index = self._mux.frame_index

    def write_frame_payload(self, payload: bytes) -> None:
        pf = self.pix_fmt
        planes = []
        off = 0
        buf = np.frombuffer(payload, dtype=np.uint8)
        for (w, h) in pf.plane_dims(self.width, self.height):
            nb = w * h * pf.dtype.itemsize
            planes.append(buf[off:off + nb].view(pf.dtype).reshape(h, w))
            off += nb
        self._mux.write_frame_bytes(self._enc.encode(planes))
        self.frame_index = self._mux.frame_index

    def close(self) -> None:
        try:
            self._mux.finalize()
        except (OSError, ValueError):
            pass
        super().close()


class NutVideoWriter(VideoWriter):
    """Native NUT mux (io/nut.py): FFV1 payloads by default (the
    reference's default codec, motion.c:447, via the native codec in
    io/ffv1.py) or rawvideo."""

    def __init__(self, stream, spec, width, height, rate, pix_fmt, props,
                 start_index: int = 0, codec: str = "rawvideo",
                 options: str | None = None):
        from dspfun_tpu.io import nut as _nut  # noqa: PLC0415

        super().__init__(stream, spec, "nut", width, height, rate,
                         pix_fmt, props)
        self.codec = codec
        self._ffv1_params = None
        self._enc = None
        csd = b""
        if codec == "ffv1":
            from dspfun_tpu.io import ffv1 as _ffv1  # noqa: PLC0415

            self._enc = _ffv1.FFV1Encoder(pix_fmt, width, height, options)
            self._ffv1_params = self._enc.params
            csd = self._enc.extradata
        self._nw = _nut.NutWriter(stream, width, height, rate, pix_fmt,
                                  props, start_index=start_index,
                                  codec=codec, codec_private=csd)
        self.frame_index = start_index
        self._wrote_header = start_index > 0  # appending: header exists

    def _write_header(self):
        if not self._nw._header_written:
            self._nw.write_header()
            self._nw._header_written = True

    def _encode_planes(self, planes: list[np.ndarray]) -> bytes:
        return self._enc.encode(planes)

    def write_frame_payload(self, payload: bytes) -> None:
        self._write_header()
        self._wrote_header = True
        if self._ffv1_params is not None:
            # device-packed payload bytes are the quantized planes in
            # layout order: split and run them through the encoder
            pf = self.pix_fmt
            planes = []
            off = 0
            buf = np.frombuffer(payload, dtype=np.uint8)
            for (w, h) in pf.plane_dims(self.width, self.height):
                nb = w * h * pf.dtype.itemsize
                planes.append(buf[off:off + nb].view(pf.dtype).reshape(h, w))
                off += nb
            self._nw.write_frame_bytes(self._encode_planes(planes))
        else:
            self._nw.write_frame_bytes(payload)
        self.frame_index = self._nw.frame_index

    def write_frame(self, planes: list[np.ndarray], raw: bool = False) -> None:
        self._write_header()
        self._wrote_header = True
        pf = self.pix_fmt
        quantized = []
        for i, p in enumerate(planes):
            if raw and not pf.is_float:
                maxv = (1 << pf.depth) - 1
                q = np.clip(np.rint(p), 0, maxv).astype(pf.dtype)
            elif raw:
                q = np.asarray(p, dtype=pf.dtype)
            else:
                q = _quantize_plane(p, pf, i, self.props.color_range)
            quantized.append(q)
        if self._ffv1_params is not None:
            data = self._encode_planes(quantized)
        else:
            data = b"".join(q.tobytes() for q in quantized)
        self._nw.write_frame_bytes(data)
        self.frame_index = self._nw.frame_index

    def close(self) -> None:
        # EOF index packet: exact duration/seek for libavformat readers
        try:
            self._nw.write_index()
        except (OSError, ValueError):
            pass  # index is an optimisation; never fail the close
        super().close()


class RawReader(VideoReader):
    """Headerless fixed-size frames (ffmpeg ``-f rawvideo`` transport).

    Used by the ffmpeg bridge for float/high-depth content (the
    reference decodes any libav pix_fmt at native depth,
    ffapi.c:239-326); geometry/rate/props come from the probe."""

    def __init__(self, stream, spec: str, pf: PixelFormat, width: int,
                 height: int, rate: Fraction, props: ColorProps):
        super().__init__(stream, spec, "rawvideo")
        self.width, self.height = width, height
        self.rate = rate
        self.pix_fmt = pf
        self.props = props

    def read_frame(self, raw: bool = False):
        planes = _read_frame_payload(self._stream, self.pix_fmt, self.width,
                                     self.height, self.props, raw)
        if planes is not None:
            self.frame_index += 1
        return planes


class RawWriter(VideoWriter):
    """Headerless fixed-size frame writer (ffmpeg ``-f rawvideo``)."""

    def write_frame_payload(self, payload: bytes) -> None:
        self._stream.write(payload)
        self.frame_index += 1

    def write_frame(self, planes: list[np.ndarray], raw: bool = False) -> None:
        pf = self.pix_fmt
        for i, p in enumerate(planes):
            if raw and not pf.is_float:
                maxv = (1 << pf.depth) - 1
                q = np.clip(np.rint(p), 0, maxv).astype(pf.dtype)
            elif raw:
                q = np.asarray(p, dtype=pf.dtype)
            else:
                q = _quantize_plane(p, pf, i, self.props.color_range)
            self._stream.write(q.tobytes())
        self.frame_index += 1


class ImageSeqWriter(VideoWriter):
    def __init__(self, pattern, spec, width, height, rate, pix_fmt, props):
        super().__init__(None, spec, "image2", width, height, rate, pix_fmt, props)
        self.pattern = pattern
        self._single = _PATTERN_RE.search(pattern) is None

    def supports_payload(self) -> bool:
        return False

    def write_frame(self, planes, raw: bool = False):
        if raw:
            # stored pel units -> normalized [0,1] before RGB conversion
            # (the setpel_direct analogue; float formats are already raw)
            planes = [
                p if self.pix_fmt.is_float
                else _dequantize_plane(np.asarray(p), self.pix_fmt, i,
                                       self.props.color_range)
                for i, p in enumerate(planes)
            ]
        rgb = planes_to_rgb(planes, self.pix_fmt, self.props, self.width, self.height)
        self.write_frame_rgb(rgb)

    def write_frame_rgb(self, rgb):
        from dspfun_tpu.io.images import write_image

        if self._single:
            if self.frame_index >= 1:
                raise RuntimeError(
                    f"single-image output {self.pattern!r} can hold one "
                    "frame; use a printf pattern (frame%04d.png) for "
                    "sequences"
                )
            path = self.pattern
        else:
            path = self.pattern % self.frame_index
        write_image(path, np.clip(rgb, 0.0, 1.0))
        self.frame_index += 1

    def close(self):
        pass


# ---------------------------------------------------------------------------
# open_input / open_output
# ---------------------------------------------------------------------------

_PATTERN_RE = re.compile(r"%0?\d*d")


def _open_stream_in(path: str):
    if path in ("-", "pipe:", "pipe:0"):
        return sys.stdin.buffer
    return open(path, "rb")


def _open_stream_out(path: str):
    if path in ("-", "pipe:", "pipe:1"):
        return sys.stdout.buffer
    return open(path, "wb")


_FFMPEG_EXTS = ("avi", "mkv", "mp4", "mov", "m4v", "webm", "mpg",
                "mpeg", "ts", "gif", "flv", "wmv", "ogv")


def _sniff_format(path: str, fmt: str | None, for_output: bool) -> str:
    if fmt:
        aliases = {"yuv4mpegpipe": "y4m", "y4m": "y4m", "fvid": "fvid",
                   "image2": "image2", "nut": "nut"}
        # any other format name is an ffmpeg container/demuxer request,
        # served by the ffmpeg-binary bridge (reference --format passes
        # straight to libavformat)
        return aliases.get(fmt, "ffmpeg")
    if _PATTERN_RE.search(path):
        return "image2"
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if ext == "nut":
        return "nut"
    if ext == "y4m":
        return "y4m"
    if ext == "fvid":
        return "fvid"
    if ext in _FFMPEG_EXTS:
        return "ffmpeg"
    if ext in ("png", "jpg", "ppm"):
        return "image2"
    # pipes default to y4m for output (reference ffapi.c:396-397) and
    # sniffing for input
    return "pipe"


class NativeBackedReader(VideoReader):
    """Demux through the native C++ runtime (libdspio) with lazy
    background prefetch; header metadata comes from the Python parser
    so color semantics match the pure-Python readers exactly."""

    def __init__(self, meta: VideoReader, spec: str, prefetch: int = 4):
        from dspfun_tpu.io import native as _native  # noqa: PLC0415

        super().__init__(None, spec, meta.format)
        self.width, self.height = meta.width, meta.height
        self.rate, self.pix_fmt, self.props = meta.rate, meta.pix_fmt, meta.props
        self.frames = meta.frames
        meta.close()
        self._nr = _native.NativeVideoReader(spec, prefetch=0)
        self._prefetch = prefetch

    def seek_frame(self, n: int) -> None:
        self._nr.seek(n)
        self.frame_index = n

    def read_frame(self, raw: bool = False):
        if self._prefetch:
            # first read pins the position; start read-ahead from here
            self._nr.start_prefetch(self._prefetch)
            self._prefetch = 0
        planes = self._nr.read_frame()
        if planes is None:
            return None
        self.frame_index += 1
        if raw:
            return [np.asarray(p) for p in planes]
        return [
            _dequantize_plane(p, self.pix_fmt, i, self.props.color_range)
            for i, p in enumerate(planes)
        ]

    def close(self) -> None:
        if getattr(self, "_nr", None) is not None:
            self._nr.close()
            self._nr = None


class _RecordingStream:
    """Wraps a pipe while a native container probe runs, so the bytes
    the probe consumed can be replayed to the ffmpeg bridge when the
    content turns out foreign (a codec the native demuxer does not
    carry).  ``stop()`` ends recording once the native open succeeds;
    ``replay()`` yields a read-only stream of recorded + live bytes."""

    def __init__(self, s):
        self._s = s
        self._rec: bytearray | None = bytearray()

    def read(self, n=-1):
        data = self._s.read(n)
        if self._rec is not None and data:
            self._rec += data
        return data

    def stop(self) -> None:
        self._rec = None

    def replay(self):
        head = io.BytesIO(bytes(self._rec or b""))
        live = self._s

        class _Chain:
            def read(self, n=-1):
                out = head.read(n)
                if n is None or n < 0:
                    return out + (live.read() or b"")
                if len(out) < n:
                    out += live.read(n - len(out)) or b""
                return out

            def close(self):
                try:
                    live.close()
                except OSError:
                    pass

        return _Chain()

    def seekable(self):
        return False

    def close(self):
        self._s.close()


def open_input(spec: str, format: str | None = None,
               native: bool = True, options: str | None = None) -> VideoReader:
    """Open a video input (path, ``-`` pipe, or printf image pattern).

    Native containers (y4m/fvid/image2) are recognised by magic bytes
    first (so e.g. fvid content under a foreign extension still opens
    natively); anything else goes through the ffmpeg-binary bridge when
    one is on PATH.  Seekable y4m/fvid files demux through the native
    C++ runtime with background read-ahead when available
    (``native=False`` forces the pure-Python reader)."""
    fmt = _sniff_format(spec, format, for_output=False)
    if fmt == "image2":
        return ImageSeqReader(spec, spec)
    if fmt == "ffmpeg" and format is not None and format != "nut":
        from dspfun_tpu.io import ffmpeg_bridge  # noqa: PLC0415

        return ffmpeg_bridge.open_ffmpeg_input(spec, format, options=options)
    if fmt == "ffmpeg":
        fmt = "pipe"  # extension suggests ffmpeg, but trust magic first
    stream = _open_stream_in(spec)
    if fmt in ("pipe", "nut"):
        magic = stream.peek(9)[:9] if hasattr(stream, "peek") else b""
        if magic.startswith(b"DSPFVID"):
            fmt = "fvid"
        elif magic.startswith(b"YUV4MPEG"):
            fmt = "y4m"
        elif magic.startswith(b"nut/"):
            # native NUT demux; genuinely foreign codecs inside fall
            # back to the ffmpeg-binary bridge
            pipe_src = (spec in ("-", "pipe:", "pipe:0")
                        or not stream.seekable())
            rec = _RecordingStream(stream) if pipe_src else stream
            try:
                r = NutVideoReader(rec, spec)
                if pipe_src:
                    rec.stop()  # don't accumulate the whole stream
                return r
            except ValueError:
                from dspfun_tpu.io import ffmpeg_bridge  # noqa: PLC0415

                if pipe_src:
                    # the NUT probe consumed header bytes the bridge's
                    # ffmpeg must also see: replay them ahead of the
                    # still-live pipe (closing fd 0 and reopening '-'
                    # by name would hand ffmpeg a dead, headerless
                    # stdin)
                    return ffmpeg_bridge.open_ffmpeg_input(
                        spec, "nut", options=options,
                        stdin_stream=rec.replay())
                stream.close()
                return ffmpeg_bridge.open_ffmpeg_input(spec, "nut",
                                                       options=options)
        elif magic.startswith(b"\x1a\x45\xdf\xa3") \
                and spec not in ("-", "pipe:", "pipe:0") \
                and stream.seekable():
            # matroska/webm: native demux for FFV1 video tracks (the
            # real-world archival pairing of the reference's default
            # codec); anything else falls back to the bridge
            try:
                return MkvVideoReader(stream, spec)
            except ValueError:
                from dspfun_tpu.io import ffmpeg_bridge  # noqa: PLC0415

                stream.close()
                # probe determines the container, like any foreign magic
                return ffmpeg_bridge.open_ffmpeg_input(spec, options=options)
        elif spec in ("-", "pipe:", "pipe:0"):
            if magic and not b"YUV4MPEG".startswith(magic[:8]) \
                    and not b"DSPFVID".startswith(magic[:7]):
                # a real container arriving on stdin: hand the buffered
                # stream to the bridge (the reference probes any stream,
                # ffapi.c:174-206)
                from dspfun_tpu.io import ffmpeg_bridge  # noqa: PLC0415

                return ffmpeg_bridge.open_ffmpeg_input(
                    spec, options=options, stdin_stream=stream)
            fmt = "y4m"  # pipes default to y4m (reference ffapi.c:177)
        else:
            # foreign magic (incl. a .nut extension over non-NUT
            # content): the ffmpeg-binary bridge probes it
            stream.close()
            from dspfun_tpu.io import ffmpeg_bridge  # noqa: PLC0415

            return ffmpeg_bridge.open_ffmpeg_input(spec, options=options)
    if fmt == "y4m":
        reader: VideoReader = Y4MReader(stream, spec)
    elif fmt == "fvid":
        reader = FvidReader(stream, spec)
    else:
        raise ValueError(f"cannot determine input format for {spec!r}")
    if (native and reader.frames is not None
            and spec not in ("-", "pipe:", "pipe:0")):
        try:
            from dspfun_tpu.io import native as _native  # noqa: PLC0415

            if _native.available():
                return NativeBackedReader(reader, spec)
        except Exception:  # noqa: BLE001 — fall back to pure Python
            pass
    return reader


def open_output(
    spec: str,
    width: int,
    height: int,
    rate: Fraction = Fraction(25, 1),
    props: ColorProps | None = None,
    format: str | None = None,
    options: str | None = None,
    codec: str | None = None,
    append: bool = False,
) -> VideoWriter:
    """Open a video output.

    Format selection: explicit ``format`` > ``%d`` pattern (image2) >
    extension (.y4m / .fvid / .nut...) > pipe defaults to y4m
    (reference ffapi.c:390-397).  ``ffplay:`` sinks require an ffplay
    binary (reference ffapi.c:455-485).
    """
    props = (props or ColorProps()).copy()
    if spec.startswith("ffplay:"):
        import shutil  # noqa: PLC0415

        if not shutil.which("ffplay"):
            raise RuntimeError("ffplay: outputs require an ffplay binary on PATH")
        import subprocess  # noqa: PLC0415

        # full color-property handoff, mirroring the reference's ffplay
        # command line (ffapi.c:455-465)
        pf = PIXEL_FORMATS[_negotiate_pix_fmt("y4m", props)]
        pprops = props.copy()
        _default_props("y4m", pprops)
        cmd = [
            "ffplay", "-loglevel", "quiet", "-f", "yuv4mpegpipe",
            "-video_size", f"{width}x{height}",
            "-framerate", f"{rate.numerator}/{rate.denominator}",
            "-pixel_format", pf.name,
            "-color_range", "pc" if pprops.color_range == "jpeg" else "tv",
        ]
        for val, flag in ((pprops.color_primaries, "-color_primaries"),
                          (pprops.color_trc, "-color_trc"),
                          (pprops.color_space, "-colorspace"),
                          (pprops.chroma_location, "-chroma_sample_location")):
            if val:
                cmd += [flag, val]
        cmd += ["-"]
        sub = subprocess.Popen(cmd, stdin=subprocess.PIPE)
        w = Y4MWriter(sub.stdin, spec, "yuv4mpegpipe", width, height, rate,
                      pf, pprops)
        orig_close = w.close

        def close():  # pclose semantics: wait for the player to exit
            orig_close()
            sub.wait()

        w.close = close
        return w

    fmt = _sniff_format(spec, format, for_output=True)
    if fmt == "nut":
        pf = PIXEL_FORMATS[_negotiate_pix_fmt(fmt, props)]
        # Opt-in reference-parity negotiation (`negotiate=1` in the
        # encoder options): float content down-converts to the
        # encoder's best integer format, exactly as the reference's
        # ffapi filters pix_fmts for the encoder
        # (ffapi.c:137-149,239-253 — zoom's GBRPF32 default lands in
        # integer FFV1 there).  Without it, float keeps the lossless
        # rawvideo payloads (documented deviation, docs/TOOLS.md).
        if pf.is_float and _wants_negotiate(options):
            req = {"gbrpf32le": "gbrp16le", "grayf32le": "gray16le",
                   "yuv444pf32": "yuv444p16le"}[pf.name]
            pf = PIXEL_FORMATS[req]
            props.pix_fmt = req
        # FFV1 is the reference's default for FFV1-capable outputs
        # (motion/README.md:70, motion.c:447); the native codec covers
        # integer YCbCr/gray and 8/16-bit RGB (16-bit rides the v3
        # layout).  Float content keeps the rawvideo payloads (FFV1
        # has no float pixel formats).
        def can_ffv1():
            # availability may trigger the on-demand native build:
            # probe it only when ffv1 could actually be selected
            if pf.is_float or (pf.is_rgb and pf.depth not in (8, 16)):
                return False
            from dspfun_tpu.io import ffv1 as _ffv1  # noqa: PLC0415

            return _ffv1.available()

        if codec in (None, ""):
            use = "ffv1" if can_ffv1() else "rawvideo"
        elif codec == "rawvideo":
            use = "rawvideo"
        elif codec == "ffv1" and can_ffv1():
            use = "ffv1"
        else:
            use = None  # genuinely foreign codec: bridge territory
        if use is None:
            fmt = "ffmpeg"
        else:
            _default_props(fmt, props)
            start = 0
            if append and spec not in ("-", "pipe:", "pipe:1") \
                    and os.path.exists(spec) and os.path.getsize(spec) > 0:
                with open(spec, "rb") as f:
                    from dspfun_tpu.io.nut import NutReader  # noqa: PLC0415

                    r = NutReader(f)
                    start = r.count_frames() or 0
                    # appended frames must match the existing payloads
                    tag = (bytes(r.state.streams[0]["fourcc"])
                           if r.state.streams else b"")
                use = "ffv1" if tag == b"FFV1" else "rawvideo"
                if use == "ffv1" and not can_ffv1():
                    raise RuntimeError(
                        f"{spec!r}: cannot append to an FFV1 NUT file "
                        "without the native codec")
                # appended packets must match the header already in the
                # file: its codec_specific_data decides v1 vs v3
                prior_csd = (bytes(r.state.streams[0].get(
                    "codec_specific", b"")) if r.state.streams else b"")
                stream = open(spec, "ab")
                w = NutVideoWriter(stream, spec, width, height, rate, pf,
                                   props, start_index=start, codec=use,
                                   options=options)
                if use == "ffv1" and w._enc.extradata != prior_csd:
                    stream.close()
                    raise RuntimeError(
                        f"{spec!r}: appended FFV1 parameters (level/"
                        "slices) do not match the existing stream header")
                return w
            else:
                stream = _open_stream_out(spec)
            return NutVideoWriter(stream, spec, width, height, rate, pf,
                                  props, start_index=start, codec=use,
                                  options=options)
    if fmt == "ffmpeg":
        if append:
            # resuming would re-run `ffmpeg -y` and destroy the frames
            # already encoded; refuse rather than lose data
            raise RuntimeError(
                f"cannot append/resume into an ffmpeg container "
                f"({spec!r}); use a y4m or fvid output for resumable runs"
            )
        from dspfun_tpu.io import ffmpeg_bridge  # noqa: PLC0415

        ext = spec.rsplit(".", 1)[-1].lower() if "." in spec else ""
        if (not ffmpeg_bridge.have_ffmpeg()
                and ext in ("mkv", "matroska")
                and (format in (None, "", "matroska", "mkv"))
                and codec in (None, "", "ffv1")
                and spec not in ("-", "pipe:", "pipe:1")):
            # zero-binary fallback: native FFV1-in-Matroska (io/mkv.py)
            # — with a binary present the bridge mirrors the
            # reference's libavformat behavior instead.  Content that
            # FFV1 cannot carry negotiates to the nearest integer
            # YCbCr/gray format (the reference's ffapi would likewise
            # convert through the encoder's pix_fmt list)
            req = props.pix_fmt
            if req in PIXEL_FORMATS:
                rf = PIXEL_FORMATS[req]
                if rf.is_float:
                    # the encoder's best integer formats (16-bit FFV1;
                    # RGB floats keep RGB through gbrp16le/v3)
                    req = {1: "gray16le"}.get(
                        rf.ncomp, "gbrp16le" if rf.is_rgb else "yuv444p16le")
                elif rf.is_rgb and rf.depth not in (8, 16):
                    req = "yuv444p"
            else:
                req = "yuv420p"
            from dspfun_tpu.io import ffv1 as _ffv1  # noqa: PLC0415

            if _ffv1.available():
                pf = PIXEL_FORMATS[req]
                props.pix_fmt = req
                if (pf.ncomp == 3 and not pf.is_rgb
                        and props.color_space in (None, "rgb")):
                    # RGB content CONVERTED to YCbCr goes through the
                    # bt601 matrix (rgb_to_planes/_matrix_for): the
                    # container must not claim the identity matrix for
                    # it; native FFV1-RGB (gbrp) keeps its rgb matrix
                    props.color_space = "smpte170m"
                _default_props("nut", props)
                stream = _open_stream_out(spec)
                return MkvVideoWriter(stream, spec, width, height, rate,
                                      pf, props, options=options)
        return ffmpeg_bridge.open_ffmpeg_output(
            spec, width, height, rate, props,
            format=None if format in (None, "") else format,
            codec=codec, options=options,
        )
    if fmt == "pipe":
        fmt = "y4m"
    if fmt == "image2":
        pf = PIXEL_FORMATS[props.pix_fmt or "gbrpf32le"]
        _default_props(fmt, props)
        w = ImageSeqWriter(spec, spec, width, height, rate, pf, props)
        if append:
            # resume: continue numbering after the existing frames
            if w._single:
                w.frame_index = 1 if os.path.exists(spec) else 0
            else:
                n = 0
                while os.path.exists(spec % n):
                    n += 1
                w.frame_index = n
        return w
    pf = PIXEL_FORMATS[_negotiate_pix_fmt(fmt, props)]
    _default_props(fmt, props)
    cls = Y4MWriter if fmt == "y4m" else FvidWriter
    name = "yuv4mpegpipe" if fmt == "y4m" else "fvid"
    if append and spec not in ("-", "pipe:", "pipe:1") and os.path.exists(spec) \
            and os.path.getsize(spec) > 0:
        # checkpoint/resume: continue an existing stream in place
        stream = open(spec, "ab")
        w = cls(stream, spec, name, width, height, rate, pf, props)
        w._wrote_header = True
        return w
    stream = _open_stream_out(spec)
    return cls(stream, spec, name, width, height, rate, pf, props)


def _negotiate_pix_fmt(fmt: str, props: ColorProps) -> str:
    """Per-container pixel format negotiation: y4m cannot carry RGB or
    floats (an RGB request becomes yuv444p, reference ffapi.c:78-80);
    fvid is float planar."""
    req = props.pix_fmt
    if fmt == "y4m":
        if req in ("gray", "yuv420p", "yuv422p", "yuv444p"):
            return req
        if req and (req == "gray16le"
                    or re.fullmatch(r"yuv(420|422|444)p(10|12|16)le", req)):
            return req  # high-depth y4m C-tags (C420p16 etc.)
        if req in ("grayf32le",):
            return "gray"
        return "yuv444p"
    if fmt == "fvid":
        if req in PIXEL_FORMATS and PIXEL_FORMATS[req].is_float:
            return req
        if req in ("gray", "gray16le", "grayf32le"):
            return "grayf32le"
        if req and req.startswith("yuv"):
            return "yuv444pf32"
        return "gbrpf32le"
    return req or "gbrpf32le"


def _default_props(fmt: str, props: ColorProps) -> None:
    """Per-format color defaults where unset (reference ffapi.c:33-92)."""
    if fmt == "y4m":
        props.color_range = props.color_range or "mpeg"
        props.color_primaries = props.color_primaries or "smpte170m"
        props.color_trc = props.color_trc or "smpte170m"
        if props.color_space in (None, "rgb"):
            # RGB input to a YCbCr container defaults to BT.601
            # (reference ffapi.c:89-92)
            props.color_space = "smpte170m"
    elif fmt == "image2":
        props.color_range = props.color_range or "jpeg"
        props.color_primaries = props.color_primaries or "bt709"
        props.color_trc = props.color_trc or "iec61966-2-1"
        props.color_space = props.color_space or "rgb"
    else:
        props.color_range = props.color_range or "jpeg"
