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


def _pow_5_12(x, xp):
    """``x ** (5/12)`` (= 1/2.4) to ~2 ulp in f32.

    TPU's f32 ``pow`` (exp2/log2 VPU approximations) carries ~7e-6
    relative error — the accuracy floor of every post-OETF comparison.
    One Newton polish of the pow guess against ``y^12 = x^5`` (both
    sides exact-rational multiply chains) squares that error below the
    f32 ulp: the residual (y^12 - x^5)/y^12 is ~12*err, carrying ~4 ulp
    of chain rounding that enters y at /12.
    """
    from jax import lax  # noqa: PLC0415  (this path is device-only)

    y = xp.power(x, 5.0 / 12.0)
    x2 = x * x
    x5 = x2 * x2 * x
    y3 = y * y * y
    y6 = y3 * y3
    y12 = y6 * y6
    # divide via rsqrt (no VPU divide; its approximation error only
    # enters the ~1e-4-magnitude correction term).  rsqrt(0)=inf makes
    # the correction inf*0=nan on the x=0 lane — masked by the where.
    r6 = lax.rsqrt(y12)
    return xp.where(x5 > 0,
                    y - y * (y12 - x5) * (r6 * r6) * (1.0 / 12.0), y)


def _pow_12_5(x, xp):
    """``x ** 2.4`` (= 12/5) to ~2 ulp in f32 as ``x^2 * (x^2)^(1/5)``
    with a Newton-refined fifth root — the root's residual error
    propagates x1 into the product (a ^12 chain would amplify it x12)."""
    a = x * x
    r = xp.power(a, 0.2)
    r4 = (r * r) ** 2
    r = xp.where(a > 0, r - (r4 * r - a) / (5.0 * r4 + 1e-38), r)
    return a * r


def srgb_decode(x, xp=np):
    """sRGB electrical -> linear light (EOTF)."""
    if xp is np:
        p = np.power((np.abs(x) + 0.055) / 1.055, 2.4)
    else:
        p = _pow_12_5((xp.abs(x) + 0.055) / 1.055, xp)
    return xp.where(x <= _DEC_THRESH, x / 12.92, p)


def srgb_encode(x, xp=np):
    """Linear light -> sRGB electrical (OETF), inverse of srgb_decode."""
    if xp is np:
        p = np.power(np.maximum(x, 0.0), 1.0 / 2.4)
    else:
        p = _pow_5_12(xp.maximum(x, 0.0), xp)
    return xp.where(x <= _ENC_THRESH, x * 12.92, 1.055 * p - 0.055)


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
