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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_block_filter", "fused_block_filter_sep", "has_pallas",
           "SEP_VOL_MAX"]

# volume ceiling for the separable kernel: 4 VMEM-resident [R, V] f32
# buffers at R=8 rows minimum must fit ~12 MB
SEP_VOL_MAX = 32768


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


def _kernel_sep(x_ref, k2hw_ref, k3hw_ref, filt_ref, post_ref, out_ref, *,
                d, hw, quant, tmin, tmax, md_fwd, md_inv):
    """Mosaic-friendly separable chain on one [R, d*hw] row tile.

    The spatial (h, w) pair is Kronecker-folded into one [hw, hw]
    matmul (lane-aligned: hw % 128 == 0, so the (R, d*hw) <-> (R*d, hw)
    reshapes are pure sublane regroupings).  The tiny depth matrices
    run as unrolled scalar-weighted accumulations over hw-aligned lane
    slices, with the M_d entries baked in as compile-time constants.
    """
    r = x_ref.shape[0]

    def hw_mat(x, m_ref):
        y = jnp.dot(x.reshape(r * d, hw), m_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        return y.reshape(r, d * hw)

    def d_mat(x, rows):
        if d == 1:
            return x * rows[0][0]
        parts = []
        for row in rows:
            acc = None
            for j, coef in enumerate(row):
                if coef == 0.0:
                    continue
                term = x[:, j * hw : (j + 1) * hw] * coef
                acc = term if acc is None else acc + term
            parts.append(acc)
        return jnp.concatenate(parts, axis=1)

    f = hw_mat(x_ref[:], k2hw_ref)        # forward (h, w)
    f = d_mat(f, md_fwd)                  # forward depth
    f = f * filt_ref[:]
    if tmax:
        a = jnp.abs(f)
        f = jnp.where((a < tmin) | (a > tmax), 0.0, f)
    if quant:
        f = jnp.round(f * (1.0 / quant)) * quant
    f = f * post_ref[:]
    f = d_mat(f, md_inv)                  # inverse depth
    out_ref[:] = hw_mat(f, k3hw_ref)      # inverse (h, w) + norm


@functools.partial(
    jax.jit,
    static_argnames=("d", "hw", "quant", "tmin", "tmax", "md_fwd", "md_inv",
                     "row_tile", "interpret"),
)
def _fused_call_sep(blocks, k2hw_t, k3hw_t, filt, post, d, hw, quant, tmin,
                    tmax, md_fwd, md_inv, row_tile, interpret):
    from jax.experimental import pallas as pl  # noqa: PLC0415
    from jax.experimental.pallas import tpu as pltpu  # noqa: PLC0415

    nb, v = blocks.shape
    grid = (nb // row_tile,)
    return pl.pallas_call(
        functools.partial(_kernel_sep, d=d, hw=hw, quant=quant,
                          tmin=tmin, tmax=tmax, md_fwd=md_fwd, md_inv=md_inv),
        out_shape=jax.ShapeDtypeStruct((nb, v), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, v), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, v), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(blocks, k2hw_t, k3hw_t, filt, post)


def fused_block_filter_sep(
    blocks: jax.Array,
    dims: tuple[int, ...],
    coeff_filter: np.ndarray,
    quant: float = 0.0,
    threshold: tuple[float, float] = (0.0, 0.0),
    post_filter: np.ndarray | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Separable fused DCT -> filter -> IDCT for blocks too large for
    the Kronecker kernel (V > 1024; the [V, V] matrices would not fit
    VMEM).  The (h, w) pair folds into one [hw, hw] MXU matmul; the
    depth axis runs as unrolled constant-weighted lane-slice sums —
    O(V*(hw + d)) FLOPs instead of O(V^2), one HBM read + one write per
    block.  Lifts the round-1 V<=1024 cap to :data:`SEP_VOL_MAX`.
    Requires h*w % 128 == 0 (lane alignment of the fold boundary)."""
    from dspfun_tpu.core import basis as basis_mod  # noqa: PLC0415
    from dspfun_tpu.ops.blockdct import kron_dct_matrix  # noqa: PLC0415

    nb, v = blocks.shape
    dims3 = (1,) * (3 - len(dims)) + tuple(int(x) for x in dims)
    d, h, w = dims3
    hw = h * w
    assert v == d * hw
    if hw % 128:
        raise ValueError(f"separable kernel needs h*w % 128 == 0, got {hw}")
    if hw > 1024:
        # the two [hw, hw] f32 matrices are VMEM-resident (2 x 4 MB at
        # hw=1024, the same budget reasoning as the Kronecker kernel)
        raise ValueError(f"separable kernel needs h*w <= 1024, got {hw}")
    if v > SEP_VOL_MAX:
        raise ValueError(f"separable kernel needs volume <= {SEP_VOL_MAX}, "
                         f"got {v}")
    # per-axis round trip is x -> 2n*x; a padded size-1 depth axis
    # contributes exactly 2*1, so the total over the 3 padded axes is
    # 8*V — matching the caller's 2^n_axes*V convention for 2- and 3-D
    scale = 1.0 / (8.0 * v)
    k2hw_t = np.ascontiguousarray(
        kron_dct_matrix((h, w), "dct2").T, dtype=np.float32)
    k3hw_t = np.ascontiguousarray(
        kron_dct_matrix((h, w), "dct3").T * scale, dtype=np.float32)
    md_fwd = tuple(tuple(float(c) for c in row)
                   for row in basis_mod.dct2_matrix(d))
    md_inv = tuple(tuple(float(c) for c in row)
                   for row in basis_mod.dct3_matrix(d))

    filt = np.asarray(coeff_filter, np.float32).reshape(1, v)
    post = (np.ones((1, v), np.float32) if post_filter is None
            else np.asarray(post_filter, np.float32).reshape(1, v))

    # row tile from the VMEM budget: the live set is ~4 [R, V] f32
    # buffers (double-buffered in/out blocks across grid steps) plus
    # the depth-stage concat copies, all under the 16 MB scoped limit
    row_tile = max(8, min(64, (600_000 // max(v, 1)) // 8 * 8))
    pad = (-nb) % row_tile
    x = jnp.asarray(blocks, jnp.float32)
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    out = _fused_call_sep(
        x, jnp.asarray(k2hw_t), jnp.asarray(k3hw_t),
        jnp.asarray(filt), jnp.asarray(post),
        d, hw, float(quant), float(threshold[0]), float(threshold[1]),
        md_fwd, md_inv, int(row_tile), bool(interpret),
    )
    return out[:nb]


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
    matmuls on the VPU in the filtered-coefficient domain;
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
