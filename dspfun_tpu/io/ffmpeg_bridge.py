"""Real-media I/O via ffmpeg/ffprobe binaries on PATH.

The reference links libavformat/libavcodec directly (include/ffapi.c);
this environment has no FFmpeg libraries, so arbitrary containers
(mp4/mkv/nut/webm/...) are bridged through the ffmpeg *binary* when one
is installed: inputs are demuxed+decoded to a yuv4mpegpipe stream we
parse natively, outputs are piped as y4m into an ffmpeg encode process
(FFV1 default for mkv/nut/avi, matching the reference's default encoder
— motion/motion.c:447).  Without the binary these paths raise a clear
error; the native y4m/fvid/image2 containers remain the fast path.

Transport is 8-bit y4m: bridged outputs quantise float content (use the
native fvid container for lossless float).  Stream metadata (frame
count, rate, color properties) comes from ffprobe when available.
"""

from __future__ import annotations

import json
import shutil
import subprocess
from fractions import Fraction
from functools import lru_cache

__all__ = [
    "have_ffmpeg",
    "have_ffprobe",
    "probe",
    "open_ffmpeg_input",
    "open_ffmpeg_output",
]


@lru_cache(maxsize=1)
def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


@lru_cache(maxsize=1)
def have_ffprobe() -> bool:
    return shutil.which("ffprobe") is not None


def probe(spec: str) -> dict | None:
    """ffprobe stream/format metadata as a dict (None when
    unavailable or the probe fails)."""
    if not have_ffprobe():
        return None
    try:
        out = subprocess.run(
            ["ffprobe", "-v", "error", "-print_format", "json",
             "-show_streams", "-show_format", spec],
            capture_output=True, timeout=60, check=True,
        ).stdout
        return json.loads(out)
    except Exception:  # noqa: BLE001
        return None


_PROBE_RANGE = {"tv": "mpeg", "pc": "jpeg", "mpeg": "mpeg", "jpeg": "jpeg"}
_Y4M_NATIVE = ("gray", "yuv420p", "yuv422p", "yuv444p")


def _first_video_stream(meta: dict | None) -> dict:
    for st in (meta or {}).get("streams", []):
        if st.get("codec_type") == "video":
            return st
    return {}


def open_ffmpeg_input(spec: str, format: str | None = None,
                      options: str | None = None):
    """Demux/decode any ffmpeg-supported input to a y4m pipe.

    The returned reader is a regular VideoReader (frame count and color
    properties filled from ffprobe where available; count may be None
    for unindexed streams — callers then need --frames, same as pipes).
    """
    from dspfun_tpu.io import video as _video

    if not have_ffmpeg():
        raise RuntimeError(
            f"opening {spec!r} requires an ffmpeg binary on PATH "
            "(native containers: .y4m, .fvid, image patterns)"
        )
    meta = probe(spec)
    st = _first_video_stream(meta)
    src_fmt = st.get("pix_fmt", "")
    cmd = ["ffmpeg", "-nostdin", "-loglevel", "error"]
    if format:
        cmd += ["-f", format]
    if options:  # --decopts "k=v:k=v" demuxer/decoder options
        for pair in options.split(":"):
            if pair:
                k, _, v = pair.partition("=")
                cmd += [f"-{k}", v]
    cmd += ["-i", spec, "-map", "0:v:0"]
    if src_fmt not in _Y4M_NATIVE:
        cmd += ["-pix_fmt", "yuv444p"]
    cmd += ["-f", "yuv4mpegpipe", "-"]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
    try:
        reader = _video.Y4MReader(proc.stdout, spec)
    except Exception:
        proc.terminate()
        proc.wait()
        raise
    reader.format = "ffmpeg"
    reader._proc = proc

    # metadata from the probe beats y4m-container defaults
    if st:
        nb = st.get("nb_frames")
        if nb is not None:
            try:
                reader.frames = int(nb)
            except ValueError:
                pass
        elif st.get("duration") and st.get("avg_frame_rate"):
            try:
                rate = Fraction(st["avg_frame_rate"])
                if rate > 0:
                    reader.frames = int(float(st["duration"]) * rate)
            except (ValueError, ZeroDivisionError):
                pass
        rng = _PROBE_RANGE.get(st.get("color_range", ""))
        if rng:
            reader.props.color_range = rng
        for key, attr in (("color_space", "color_space"),
                          ("color_transfer", "color_trc"),
                          ("color_primaries", "color_primaries")):
            if st.get(key):
                setattr(reader.props, attr, st[key])

    orig_close = reader.close

    def close():
        orig_close()
        if proc.poll() is None:
            proc.terminate()
        proc.wait()

    reader.close = close
    return reader


# extensions AND ffmpeg muxer names that default to the reference's
# lossless FFV1 encoder (motion/motion.c:447)
_FFV1_DEFAULT_EXTS = ("nut", "mkv", "avi", "matroska")


def open_ffmpeg_output(
    spec: str,
    width: int,
    height: int,
    rate: Fraction,
    props,
    format: str | None = None,
    codec: str | None = None,
    options: str | None = None,
):
    """Encode a y4m pipe into any ffmpeg-supported container.

    Default codec is FFV1 for nut/mkv/avi (the reference's default
    encoder, motion/motion.c:447); otherwise ffmpeg's per-container
    default applies.  ``options`` is the reference's "k=v:k=v" codec
    option string (--encopts), passed through as -k v flags.
    """
    from dspfun_tpu.io import video as _video

    if not have_ffmpeg():
        raise RuntimeError(
            f"writing {spec!r} requires an ffmpeg binary on PATH "
            "(native containers: .y4m, .fvid, image patterns)"
        )
    ext = spec.rsplit(".", 1)[-1].lower() if "." in spec else ""
    if codec is None and (format in _FFV1_DEFAULT_EXTS
                          or (format is None and ext in _FFV1_DEFAULT_EXTS)):
        codec = "ffv1"
    cmd = ["ffmpeg", "-nostdin", "-loglevel", "error", "-y",
           "-f", "yuv4mpegpipe", "-i", "-"]
    if codec:
        cmd += ["-c:v", codec]
    for val, flag in ((props.color_primaries, "-color_primaries"),
                      (props.color_trc, "-color_trc"),
                      (props.color_space, "-colorspace")):
        if val and val != "rgb":
            cmd += [flag, val]
    if options:
        for pair in options.split(":"):
            if pair:
                k, _, v = pair.partition("=")
                cmd += [f"-{k}", v]
    if format:
        cmd += ["-f", format]
    cmd += [spec]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE)
    pf = _video.PIXEL_FORMATS[_video._negotiate_pix_fmt("y4m", props)]
    wprops = props.copy()
    _video._default_props("y4m", wprops)
    writer = _video.Y4MWriter(proc.stdin, spec, "ffmpeg", width, height,
                              rate, pf, wprops)
    orig_close = writer.close

    def close():
        orig_close()
        rc = proc.wait()
        if rc:
            raise RuntimeError(f"ffmpeg encode of {spec!r} failed (rc={rc})")

    writer.close = close
    return writer
