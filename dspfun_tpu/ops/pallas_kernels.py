"""Pallas TPU kernels for the fused blockwise hot path.

The "north star" op: blockwise transform -> coefficient filter ->
inverse in a single pass over HBM.  Blocks are flattened to [NB, V]
rows (V = block volume) and the separable DCTs become Kronecker-folded
[V, V] matrices (see dspfun_tpu.ops.blockdct), so the fused op is

    out = nonlinear( X @ (K2^T * mask) ) @ K3s^T

with the linear filter folded into the forward matrix columns and the
inverse normalisation folded into K3s.  The kernel tiles X over the
block-batch axis, keeps both [V, V] matrices and the intermediate
coefficients in VMEM, and runs the nonlinear middle (threshold zeroing
+ quantisation, reference motion/motion.c:721-744) on the VPU between
the two MXU matmuls — one HBM read and one write per block, no
materialised coefficient tensor.

Requires V to be a multiple of 128 (lane width) for full MXU
utilisation; the wrapper pads the batch axis to the row tile.

History: a hand-written bf16 *separable* kernel for V > 1024 lived here
through round 2 but measured 2x slower than the XLA separable
formulation on the calibrated motion config (299 us vs 146 us per
880x16^3 slab — XLA pipelines the small per-axis matmuls better than a
monolithic VMEM-resident kernel), so it was retired in round 3
(VERDICT r2 next item 3); `models/motion_pipeline.py` documents the
fast-path choice.  The Pallas investment moved to the int8
digit-matmul kernel (`ops/int8mm.py`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_block_filter", "has_pallas"]


def has_pallas() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401, PLC0415

        return True
    except ImportError:  # pragma: no cover
        return False


def _kernel(x_ref, k2m_ref, k3_ref, out_ref, *, quant: float,
            tmin: float, tmax: float):
    f = jnp.dot(x_ref[:], k2m_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    if tmax:
        a = jnp.abs(f)
        f = jnp.where((a < tmin) | (a > tmax), 0.0, f)
    if quant:
        f = jnp.round(f * (1.0 / quant)) * quant
    out_ref[:] = jnp.dot(f, k3_ref[:], preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


@functools.partial(
    jax.jit,
    static_argnames=("quant", "tmin", "tmax", "row_tile", "interpret"),
)
def _fused_call(blocks, k2m_t, k3s_t, quant, tmin, tmax, row_tile, interpret):
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    nb, v = blocks.shape
    grid = (nb // row_tile,)
    return pl.pallas_call(
        functools.partial(_kernel, quant=quant, tmin=tmin, tmax=tmax),
        out_shape=jax.ShapeDtypeStruct((nb, v), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, v), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((v, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, v), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(blocks, k2m_t, k3s_t)


def fused_block_filter(
    blocks: jax.Array,
    dims: tuple[int, ...],
    coeff_filter: np.ndarray,
    quant: float = 0.0,
    threshold: tuple[float, float] = (0.0, 0.0),
    post_filter: np.ndarray | None = None,
    row_tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused DCT -> (filter, threshold, quantise) -> IDCT over flat
    blocks [NB, V] of shape ``dims`` (V = prod(dims)).

    ``coeff_filter`` is the per-coefficient linear multiplier (folded
    into the forward matrix); ``quant``/``threshold`` run between the
    matmuls on the VPU in the filtered-coefficient domain — the
    threshold stage follows the reference's gating (motion.c:721): it
    is active only when ``threshold[1] != 0``, so a lower bound alone
    is a no-op, exactly as in motion;
    ``post_filter`` is a per-coefficient multiplier applied after the
    middle (folded into the inverse matrix — e.g. motion's inverse
    uniform renorm).  The round-trip normalisation 1/(2^n V) is folded
    into the inverse matrix.
    """
    from dspfun_tpu.ops.blockdct import kron_dct_matrix  # noqa: PLC0415

    nb, v = blocks.shape
    assert v == int(np.prod(dims))
    k2 = kron_dct_matrix(dims, "dct2")
    k3 = kron_dct_matrix(dims, "dct3") / (2.0 ** len(dims) * v)
    f = np.asarray(coeff_filter, dtype=np.float64).reshape(v)
    k2m_t = np.ascontiguousarray((k2 * f[:, None]).T, dtype=np.float32)
    if post_filter is not None:
        k3 = k3 * np.asarray(post_filter, dtype=np.float64).reshape(v)[None, :]
    k3s_t = np.ascontiguousarray(k3.T, dtype=np.float32)

    pad = (-nb) % row_tile
    x = jnp.asarray(blocks, jnp.float32)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    out = _fused_call(
        x, jnp.asarray(k2m_t), jnp.asarray(k3s_t),
        float(quant), float(threshold[0]), float(threshold[1]),
        int(row_tile), bool(interpret),
    )
    return out[:nb]
