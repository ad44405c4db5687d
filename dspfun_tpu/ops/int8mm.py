"""int8 Ozaki digit contraction on the MXU (the round-3 fast path).

The v5e MXU runs int8 x int8 -> int32 at 2x its bf16 FLOP rate
(measured 395 TOPS vs 205 TFLOP/s) **with exact int32 accumulation**.
Splitting both operands into B=7-bit signed-integer digits therefore
buys a contraction that is both *faster* than 6-pass ``HIGHEST`` f32
(6 digit products at 2x rate = 3 bf16-pass cost) and *more accurate*
(measured 9.2e-8 relative on a 2160-long DCT contraction vs HIGHEST's
1.8e-7): every digit product is exact, int32 accumulation is exact
(64*64*K <= 2^31 for K <= 2^19), and the only error is the 2^-22
digit-representation truncation.

The XLA formulation of the same math loses to HBM: the [DA*M, DX*R]
int32 digit-product tensor round-trips ~1 GB.  The Pallas kernel here
reads the *f32* operand tile, digit-splits it in VMEM (per-slice
power-of-two scaling), keeps every digit product in VMEM, and emits
only the weighted f32 combination — neither the digits nor the int32
products ever touch HBM.

Layout contract (Mosaic int8 tiling is (32, 128)): the contraction
length K must be padded to a multiple of 128 (zero digits contribute
zero), M tiles to 32, R tiles to 128; the wrapper pads and slices.

This replaces the reference's "intermediate = long double" knob
(include/precision.h:50-57) at a *better* speed/accuracy point than
bf16 re-passes — a TPU-native design, not a port.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["B_I8", "split_matrix_i8", "i8_contract"]

B_I8 = 7          # digit width: |digit| <= 64 after half-range scaling
_NDIG = 3         # 3 digits cover ~22 bits below each row/slice max
_PMAX = 2         # keep digit pairs with i+j <= 2 (weights >= 2^-28)


def split_matrix_i8(m: np.ndarray, ndig: int = _NDIG):
    """Host split of a float64 [M, K] matrix into int8 digits.

    Returns (digits int8 [D, M, Kp], row_scale f32 [M, 1]) with K padded
    to a lane multiple (128) and ``m ~= row_scale * sum_i digits[i] *
    2**(-B*(i+1))``; rows are scaled into (-1/2, 1/2] so every digit
    fits +-64 (carry-safe in int8).
    """
    m = np.asarray(m, dtype=np.float64)
    mm, k = m.shape
    mx = np.max(np.abs(m), axis=1, keepdims=True)
    e = np.where(mx > 0, np.ceil(np.log2(np.maximum(mx, 1e-300))) + 1.0, 0.0)
    r = m / 2.0**e
    digs = []
    for i in range(ndig):
        sc = 2.0 ** (B_I8 * (i + 1))
        d = np.round(r * sc)
        r = r - d / sc
        digs.append(d.astype(np.int8))
    digits = np.stack(digs)
    kp = -(-k // 128) * 128
    if kp != k:
        digits = np.pad(digits, ((0, 0), (0, 0), (0, kp - k)))
    return digits, (2.0**e).astype(np.float32)


def _make_kernel(pl):
    def kernel(a0, a1, a2, x_ref, out_ref, x0s, x1s, x2s, es):
        """One [TM, TR] output tile.  The f32 operand tile is digit-split
        *in VMEM* (per-column slice scaling; the split never touches
        HBM), hoisted into scratch once per column block (the M-tile
        grid dimension is innermost), then the 6 digit products with
        i+j <= 2 run on the MXU int8 path and combine weighted in f32
        with the slice scale folded in."""
        i = pl.program_id(1)

        @pl.when(i == 0)
        def _split():
            x = x_ref[:]
            mx = jnp.max(jnp.abs(x), axis=0, keepdims=True)
            e = jnp.where(mx > 0, jnp.ceil(jnp.log2(mx)) + 1.0, 0.0)
            r = x * jnp.exp2(-e)
            for d_ref, idx in ((x0s, 0), (x1s, 1), (x2s, 2)):
                sc = float(2.0 ** (B_I8 * (idx + 1)))
                d = jnp.round(r * sc)
                r = r - d * (1.0 / sc)
                d_ref[:] = d.astype(jnp.int8)
            es[:] = jnp.exp2(e)

        def dot(a, xx):
            return jnp.dot(a[:], xx[:], preferred_element_type=jnp.int32)

        w = [float(2.0 ** (-B_I8 * (p + 2))) for p in range(3)]
        acc = dot(a0, x0s).astype(jnp.float32) * w[0]
        acc += (dot(a0, x1s) + dot(a1, x0s)).astype(jnp.float32) * w[1]
        acc += (dot(a0, x2s) + dot(a1, x1s)
                + dot(a2, x0s)).astype(jnp.float32) * w[2]
        out_ref[:] = acc * es[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("tm", "tr", "interpret"))
def _i8_call(a0, a1, a2, x, tm, tr, interpret):
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    m, k = a0.shape
    r = x.shape[1]
    # grid order (R outer, M inner): the f32 operand tile is loaded and
    # split once per column block (scratch persists across the inner
    # M steps); the small int8 digit matrices re-stream per step
    grid = (r // tr, m // tm)
    a_spec = pl.BlockSpec((tm, k), lambda j, i: (i, 0),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((k, tr), lambda j, i: (0, j),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(pl),
        out_shape=jax.ShapeDtypeStruct((m, r), jnp.float32),
        grid=grid,
        in_specs=[a_spec, a_spec, a_spec, x_spec],
        out_specs=pl.BlockSpec((tm, tr), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k, tr), jnp.int8),
            pltpu.VMEM((k, tr), jnp.int8),
            pltpu.VMEM((k, tr), jnp.int8),
            pltpu.VMEM((1, tr), jnp.float32),
        ],
        interpret=interpret,
    )(a0, a1, a2, x)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def i8_contract(
    x: jax.Array,
    digits_a: jax.Array,     # [D, M, Kp] int8 from split_matrix_i8
    scale_a,                 # [M, 1] f32 row scales
    axis: int,
) -> jax.Array:
    """Contract the int8-digit [M, K] matrix against ``axis`` of ``x``
    (f32).  Shaped like ``x`` with ``axis`` replaced by M."""
    axis = axis % x.ndim
    da, m, kp = digits_a.shape
    k = x.shape[axis]
    xf = jnp.moveaxis(jnp.asarray(x, jnp.float32), axis, 0)
    rest = xf.shape[1:]
    r = int(np.prod(rest)) if rest else 1
    x2 = xf.reshape(k, r)

    # pad to Mosaic tiles: K -> 128 (zero digits), M -> 32*, R -> 128.
    # 128x128 output tiles keep the VMEM live set (A digits + f32
    # operand + digit scratch, ~12 MB at K=3840) under the 16 MB scope
    tm = min(128, -(-m // 32) * 32)
    tr = 128
    mp = -(-m // tm) * tm
    rp = -(-r // tr) * tr
    if kp != k or rp != r:
        x2 = jnp.pad(x2, ((0, kp - k), (0, rp - r)))
    a = digits_a
    if mp != m:
        a = jnp.pad(a, ((0, 0), (0, mp - m), (0, 0)))

    y = _i8_call(a[0], a[1], a[2], x2, tm, tr, _use_interpret())
    y = y[:m, :r] * jnp.asarray(scale_a)
    return jnp.moveaxis(y.reshape((m,) + rest), 0, axis)
