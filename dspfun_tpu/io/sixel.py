"""Sixel terminal graphics encoder.

Every reference tool that writes images defaults to Sixel inline
display when stdout is a tty (reference spec/spec.c:41-42,
applybasis/genbasis.c:132, draw.c:60-61 — via ImageMagick's "sixel:"
coder).  This is a self-contained encoder: adaptive <=256-colour
palette (via PIL quantisation) and run-length encoded sixel bands.
"""

from __future__ import annotations

import sys

import numpy as np

__all__ = ["encode_sixel", "write_sixel"]


def encode_sixel(rgb: np.ndarray, max_colors: int = 256) -> bytes:
    """Encode an [H, W, 3] uint8 array as a sixel byte string."""
    from PIL import Image  # noqa: PLC0415

    img = Image.fromarray(rgb, mode="RGB")
    pal_img = img.quantize(colors=max_colors, dither=Image.Dither.FLOYDSTEINBERG)
    idx = np.asarray(pal_img, dtype=np.int32)
    palette = np.array(pal_img.getpalette(), dtype=np.int64).reshape(-1, 3)
    ncolors = int(idx.max()) + 1
    h, w = idx.shape

    out = bytearray()
    out += b"\x1bPq"
    out += f'"1;1;{w};{h}'.encode()
    for c in range(ncolors):
        r, g, b = (palette[c] * 100 // 255).tolist()
        out += f"#{c};2;{r};{g};{b}".encode()

    for band_start in range(0, h, 6):
        band = idx[band_start : band_start + 6]
        rows = band.shape[0]
        colors_here = np.unique(band)
        first = True
        for c in colors_here.tolist():
            if not first:
                out += b"$"  # carriage return within band
            first = False
            out += f"#{c}".encode()
            mask = band == c
            bits = np.zeros(w, dtype=np.uint8)
            for r in range(rows):
                bits |= mask[r].astype(np.uint8) << r
            chars = bits + 63
            # run-length encode
            x = 0
            while x < w:
                run = 1
                ch = chars[x]
                while x + run < w and chars[x + run] == ch:
                    run += 1
                if run > 3:
                    out += f"!{run}".encode() + bytes([ch])
                else:
                    out += bytes([ch]) * run
                x += run
        out += b"-"  # next band
    out += b"\x1b\\"
    return bytes(out)


def write_sixel(rgb: np.ndarray, stream=None) -> None:
    stream = stream or sys.stdout.buffer
    stream.write(encode_sixel(rgb))
    stream.flush()
