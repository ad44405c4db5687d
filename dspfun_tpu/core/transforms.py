"""ND separable spectral transforms as MXU matrix contractions.

The reference runs FFTW r2r plans (REDFT10/REDFT01) over whole images
(spec/ispec/zoom/scan) and over 3-D blocks (motion).  On TPU the
idiomatic fast path for the sizes involved is a dense basis-matrix
contraction on the MXU, batched over channels/blocks/frames; XLA fuses
the surrounding elementwise filter chains into the matmuls.

Precision: the `hilo` intermediate mode implements double-float
compensated contraction — the float64 basis matrix is split into
hi + lo float32 parts and two HIGHEST-precision matmuls are summed.
For float32 inputs (exactly representable) this bounds the basis
representation error at ~2^-48, recovering the reference's
"intermediate precision > coeff precision" behaviour
(reference include/precision.h:26-57) while staying on the MXU.

Also provides the dspfun "uniform range" normalisation grids:
sqrt(2)^(#nonzero indices) per coefficient — reference
include/speclib.c:79-92 (spec_normalization), spec/spec.c:70-74,
motion/motion.c:643-647.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dspfun_tpu.core import basis as basis_mod
from dspfun_tpu.core.precision import Precision, get_precision

__all__ = [
    "apply_matrix",
    "dct2",
    "dct3",
    "dct2_nd",
    "dct3_nd",
    "uniform_grid",
    "split_hilo",
    "AxisPlan",
    "plan_axis",
    "plan_matrix",
    "apply_plan",
    "apply_plan_nd",
]


def split_hilo(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split a float64 matrix into hi + lo float32 parts (double-float)."""
    hi = m.astype(np.float32)
    lo = (m - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


class AxisPlan(NamedTuple):
    """A planned 1-D transform: basis matrix array(s).

    The TPU analogue of an FFTW plan (reference motion/motion.c:518-557
    plans + wisdom): materialised once per (size, kind, precision).
    Held as *host* numpy arrays so a cached plan is safe to use both as
    a jit argument (lives in HBM, not inlined) and inside jit/shard_map
    traces (becomes a compile-time constant).  ``lo`` is the
    double-float compensation term (None outside hilo mode);
    ``digits``/``scale`` are the error-free bf16 digit split (None
    outside exact mode — see core/exact.py).
    """

    hi: jax.Array | np.ndarray
    lo: jax.Array | np.ndarray | None
    digits: jax.Array | np.ndarray | None = None
    scale: jax.Array | np.ndarray | None = None


def plan_matrix(m: np.ndarray, precision: Precision | None = None) -> AxisPlan:
    """Build an AxisPlan from an arbitrary float64 matrix."""
    p = precision or get_precision()
    m = np.asarray(m, dtype=np.float64)
    if p.intermediate == "f64":
        return AxisPlan(m, None)
    if p.intermediate == "exact":
        from dspfun_tpu.core.exact import split_matrix_digits  # noqa: PLC0415

        digits, scale = split_matrix_digits(m)
        return AxisPlan(m.astype(np.float32), None, digits, scale)
    if p.intermediate == "hilo":
        hi, lo = split_hilo(m)
        return AxisPlan(hi, lo)
    return AxisPlan(m.astype(np.float32), None)


@functools.lru_cache(maxsize=128)
def _plan_axis_cached(n: int, kind: str, intermediate: str) -> AxisPlan:
    m = basis_mod.dct2_matrix(n) if kind == "dct2" else basis_mod.dct3_matrix(n)
    return plan_matrix(m, Precision(intermediate=intermediate))


def plan_axis(n: int, kind: str, precision: Precision | None = None) -> AxisPlan:
    """Cached plan for an FFTW-convention DCT along an axis of length n."""
    p = precision or get_precision()
    if kind not in ("dct2", "dct3"):
        raise ValueError(kind)
    return _plan_axis_cached(int(n), kind, p.intermediate)


def apply_plan(
    x: jax.Array,
    plan: AxisPlan,
    axis: int,
    precision: Precision | None = None,
) -> jax.Array:
    """Contract a planned [K, N] matrix against ``axis`` of ``x``."""
    p = precision or get_precision()
    axis = axis % x.ndim

    def tdot(mat: jax.Array, operand: jax.Array,
             prec=jax.lax.Precision.HIGHEST) -> jax.Array:
        y = jnp.tensordot(
            mat,
            operand,
            axes=[[1], [axis]],
            precision=prec,
            preferred_element_type=jnp.float32
            if p.intermediate != "f64"
            else jnp.float64,
        )
        return jnp.moveaxis(y, 0, axis)

    if plan.digits is not None:
        from dspfun_tpu.core.exact import exact_contract  # noqa: PLC0415

        y = exact_contract(x.astype(jnp.float32), plan.digits, plan.scale, axis)
    elif p.intermediate == "f64":
        y = tdot(plan.hi, x.astype(jnp.float64))
    elif p.intermediate == "hilo" and plan.lo is not None:
        xf = x.astype(jnp.float32)
        # the lo compensation term is ~2^-24 of the main term, so one
        # DEFAULT (single-pass bf16) matmul suffices: its ~4e-3 relative
        # error lands near 2^-32 of the result, far below the HIGHEST
        # accumulation floor (~1.8e-7) — and saves 5 of hilo's 12 bf16
        # MXU passes
        y = tdot(plan.hi, xf) + tdot(plan.lo, xf,
                                     prec=jax.lax.Precision.DEFAULT)
    else:
        y = tdot(plan.hi, x.astype(plan.hi.dtype))
    return y.astype(p.coeff_dtype)


def apply_plan_nd(
    x: jax.Array,
    plans: Sequence[AxisPlan],
    axes: Sequence[int],
    precision: Precision | None = None,
) -> jax.Array:
    for plan, ax in zip(plans, axes):
        x = apply_plan(x, plan, ax, precision)
    return x


def apply_matrix(
    x: jax.Array,
    m: np.ndarray,
    axis: int,
    precision: Precision | None = None,
) -> jax.Array:
    """Contract float64 matrix ``m`` [K, N] against axis ``axis`` of ``x``.

    Convenience form for small matrices (embeds them as program
    constants); large/production paths should build an AxisPlan and pass
    it as a jit argument instead.
    """
    return apply_plan(x, plan_matrix(m, precision), axis, precision)


def dct2(x: jax.Array, axis: int, precision: Precision | None = None) -> jax.Array:
    """FFTW REDFT10 along one axis (unnormalised)."""
    return apply_matrix(x, basis_mod.dct2_matrix(x.shape[axis]), axis, precision)


def dct3(x: jax.Array, axis: int, precision: Precision | None = None) -> jax.Array:
    """FFTW REDFT01 along one axis (unnormalised)."""
    return apply_matrix(x, basis_mod.dct3_matrix(x.shape[axis]), axis, precision)


def dct2_nd(
    x: jax.Array, axes: Sequence[int], precision: Precision | None = None
) -> jax.Array:
    """Separable FFTW DCT-II over several axes (e.g. 2-D whole-image
    transform, reference spec/spec.c:63; 3-D block transform,
    motion/motion.c:535-538)."""
    for ax in axes:
        x = dct2(x, ax, precision)
    return x


def dct3_nd(
    x: jax.Array, axes: Sequence[int], precision: Precision | None = None
) -> jax.Array:
    """Separable FFTW DCT-III over several axes.  dct3_nd(dct2_nd(x))
    == x * prod(2*N_axis)."""
    for ax in axes:
        x = dct3(x, ax, precision)
    return x


@functools.lru_cache(maxsize=None)
def _uniform_grid_np(shape: tuple[int, ...]) -> np.ndarray:
    """sqrt(2)^(#nonzero indices) over an ND index grid (float64).

    reference include/speclib.h:44-51 / speclib.c:79-92: converts
    unnormalised FFTW DCT coefficients to dspfun's "uniform range"
    convention where every coefficient shares the same maximum
    magnitude.
    """
    g = np.zeros(shape, dtype=np.float64)
    for ax, n in enumerate(shape):
        idx = [None] * len(shape)
        idx[ax] = slice(None)
        g = g + (np.arange(n) != 0)[tuple(idx)]
    return np.sqrt(2.0) ** g


def uniform_grid(shape: Sequence[int]) -> np.ndarray:
    """Uniform-range multiplier grid for the given transform dims."""
    return _uniform_grid_np(tuple(int(s) for s in shape))
