"""Colorspace transfer functions.

The reference converts between sRGB and linear RGB either through
MagickWand (MagickTransformImageColorspace, spec/spec.c:57,
ispec.c:173-176) or FFmpeg's av_csp trc functions (zoom.c:312,
motion.c:342-348).  The exact piecewise sRGB decode it inlines is at
applybasis/applybasis.c:142-144 / genbasis.c:95-97:

    srgbdec(x) = x/12.92                    if x <= 0.0404482362771082
                 ((x+0.055)/1.055)^2.4      otherwise

This module provides that function and its inverse (the IEC 61966-2-1
OETF), plus BT.601/BT.709 RGB<->YCbCr matrices used by the video layer.
Vectorised over numpy or jax.numpy via the ``xp`` argument.
"""

from __future__ import annotations

import numpy as np

__all__ = ["srgb_decode", "srgb_encode", "ycbcr_matrix", "ycbcr_inverse_matrix"]

_DEC_THRESH = 0.0404482362771082
_ENC_THRESH = _DEC_THRESH / 12.92


def srgb_decode(x, xp=np):
    """sRGB electrical -> linear light (EOTF)."""
    return xp.where(
        x <= _DEC_THRESH, x / 12.92, xp.power((xp.abs(x) + 0.055) / 1.055, 2.4)
    )


def srgb_encode(x, xp=np):
    """Linear light -> sRGB electrical (OETF), inverse of srgb_decode."""
    return xp.where(
        x <= _ENC_THRESH,
        x * 12.92,
        1.055 * xp.power(xp.maximum(x, 0.0), 1.0 / 2.4) - 0.055,
    )


def _ycbcr(kr: float, kb: float) -> np.ndarray:
    kg = 1.0 - kr - kb
    return np.array(
        [
            [kr, kg, kb],
            [-0.5 * kr / (1 - kb), -0.5 * kg / (1 - kb), 0.5],
            [0.5, -0.5 * kg / (1 - kr), -0.5 * kb / (1 - kr)],
        ],
        dtype=np.float64,
    )


_MATRICES = {
    "bt601": _ycbcr(0.299, 0.114),
    "bt709": _ycbcr(0.2126, 0.0722),
    "bt2020": _ycbcr(0.2627, 0.0593),
}


def ycbcr_matrix(name: str = "bt601") -> np.ndarray:
    """RGB -> (Y, Cb, Cr) matrix (Cb/Cr centered at 0)."""
    return _MATRICES[name]


def ycbcr_inverse_matrix(name: str = "bt601") -> np.ndarray:
    return np.linalg.inv(_MATRICES[name])
