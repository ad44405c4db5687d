"""Fused spectral pipelines — the flagship compute graphs.

These are the jittable end-to-end "models" of the framework: whole
transform -> coefficient filter -> inverse chains in a single jit so
XLA fuses the elementwise filter work into the MXU contractions
(the BASELINE.json north star: fuse blockwise transform + filter +
inverse per tool).
"""

from __future__ import annotations

import jax
import numpy as np

from dspfun_tpu.core.precision import Precision, get_precision
from dspfun_tpu.core.transforms import apply_plan_nd, plan_axis

__all__ = ["fused_filter_2d", "fused_filter_3d", "lowpass_mask", "filter_plans"]


def filter_plans(shape, precision: Precision | None = None):
    """(forward, inverse) AxisPlan tuples for an ND fused filter.

    Pass the result into the jitted pipeline as an argument — plans are
    device arrays (the FFTW-plan analogue) and must not be baked into
    the compiled program as constants.
    """
    fwd = tuple(plan_axis(n, "dct2", precision) for n in shape)
    inv = tuple(plan_axis(n, "dct3", precision) for n in shape)
    return fwd, inv


def lowpass_mask(shape, cutoff: float = 0.25, boost: float = 1.0, damp: float = 0.0) -> np.ndarray:
    """Brick-wall lowpass over an ND coefficient grid: ``boost`` inside
    the pass box [0, cutoff*n) on every axis, ``damp`` outside — the
    motion-style bandpass of reference motion/motion.c:683-719."""
    m = np.ones(shape, dtype=np.float64)
    inside = np.ones(shape, dtype=bool)
    for ax, n in enumerate(shape):
        idx = [None] * len(shape)
        idx[ax] = slice(None)
        inside &= (np.arange(n) < max(1, int(n * cutoff)))[tuple(idx)]
    m = np.where(inside, boost, damp)
    return m


def fused_filter_2d(
    x: jax.Array,
    mask: jax.Array,
    plans,
    precision: Precision | None = None,
) -> jax.Array:
    """IDCT(mask * DCT2(x)) / (4wh) over leading two axes of [H, W, ...].

    The bench config "fused 2D DCT+filter+IDCT" (BASELINE.md).
    ``plans`` is the (forward, inverse) pair from :func:`filter_plans`.
    """
    p = precision or get_precision()
    h, w = x.shape[:2]
    fwd, inv = plans
    F = apply_plan_nd(x, fwd, (0, 1), p)
    F = F * mask.astype(F.dtype)
    y = apply_plan_nd(F, inv, (0, 1), p)
    return y / (4.0 * w * h)


def fused_filter_3d(
    cube: jax.Array,
    mask: jax.Array,
    plans,
    precision: Precision | None = None,
) -> jax.Array:
    """IDCT3(mask * DCT2_3d(cube)) / (8 t h w) over [T, H, W, ...] — the
    core of motion's frequency-space edit (motion/motion.c:641-753)."""
    p = precision or get_precision()
    t, h, w = cube.shape[:3]
    fwd, inv = plans
    F = apply_plan_nd(cube, fwd, (0, 1, 2), p)
    F = F * mask.astype(F.dtype)
    y = apply_plan_nd(F, inv, (0, 1, 2), p)
    return y / (8.0 * t * h * w)
