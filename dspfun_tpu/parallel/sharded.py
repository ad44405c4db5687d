"""Multi-chip sharded spectral transforms.

The reference is single-process (SURVEY.md section 2.8).  This layer is
the framework's distributed backbone: frame cubes [T, H, W, C] are laid
out over a (space, time) `jax.sharding.Mesh` — rows over ``space``
(block/data parallelism), the temporal axis over ``time`` (the
sequence/context-parallel analog: motion's 3-D cubes, SURVEY.md
section 5).

A separable 3-D DCT under this layout is computed Ulysses-style inside
``shard_map``: transform the locally-complete axis, then `all_to_all`
over ICI to re-localise the next axis, transform, repeat.  Each
all_to_all moves exactly one axis's shards; the elementwise filter
runs in the fully-transformed layout; the inverse chain mirrors back.
All collectives ride ICI (one mesh), no host round-trips.

Layout walk-through for the forward half (per shard shapes):

    [T/t, H/s, W, C]   DCT over W (local)
    --all_to_all over space: W splits, H gathers-->
    [T/t, H, W/s, C]   DCT over H (local)
    --all_to_all over time: H splits, T gathers-->
    [T, H/t, W/s, C]   DCT over T (local)  -> filter here
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dspfun_tpu.core.precision import Precision, get_precision
from dspfun_tpu.core.transforms import apply_plan, plan_axis

__all__ = [
    "fused_filter_3d_sharded",
    "dct3d_sharded_fn",
    "cube_sharding",
    "mask_sharding",
]


def cube_sharding(mesh: Mesh) -> NamedSharding:
    """Input/output layout: T over 'time', H over 'space'."""
    return NamedSharding(mesh, P("time", "space", None, None))


def mask_sharding(mesh: Mesh) -> NamedSharding:
    """Coefficient-space filter layout: T local, H over 'time', W over
    'space' (the layout after the forward all_to_all chain)."""
    return NamedSharding(mesh, P(None, "time", "space", None))


def _swap(x, axis_name, split_axis, concat_axis):
    return jax.lax.all_to_all(
        x, axis_name, split_axis=split_axis, concat_axis=concat_axis, tiled=True
    )


def dct3d_sharded_fn(
    t: int, h: int, w: int, mesh: Mesh, precision: Precision | None = None
):
    """Returns (fwd, inv) shard-local functions for the 3-D DCT chain.

    ``fwd`` maps a [T/t, H/s, W, C] shard to the [T, H/t, W/s, C]
    coefficient shard; ``inv`` is its exact inverse (including the
    1/(8 t h w) round-trip normalisation).
    """
    p = precision or get_precision()
    plans = {
        "t2": plan_axis(t, "dct2", p), "t3": plan_axis(t, "dct3", p),
        "h2": plan_axis(h, "dct2", p), "h3": plan_axis(h, "dct3", p),
        "w2": plan_axis(w, "dct2", p), "w3": plan_axis(w, "dct3", p),
    }

    def fwd(shard):
        x = apply_plan(shard, plans["w2"], 2, p)     # W local
        x = _swap(x, "space", 2, 1)                  # -> [T/t, H, W/s, C]
        x = apply_plan(x, plans["h2"], 1, p)
        x = _swap(x, "time", 1, 0)                   # -> [T, H/t, W/s, C]
        return apply_plan(x, plans["t2"], 0, p)

    def inv(coeff):
        x = apply_plan(coeff, plans["t3"], 0, p)
        x = _swap(x, "time", 0, 1)                   # -> [T/t, H, W/s, C]
        x = apply_plan(x, plans["h3"], 1, p)
        x = _swap(x, "space", 1, 2)                  # -> [T/t, H/s, W, C]
        x = apply_plan(x, plans["w3"], 2, p)
        return x / (8.0 * t * h * w)

    return fwd, inv


def fused_filter_3d_sharded(
    cube: jax.Array,
    mask: jax.Array,
    mesh: Mesh,
    precision: Precision | None = None,
) -> jax.Array:
    """IDCT3(mask * DCT2_3d(cube)) over a (space, time) mesh.

    ``cube`` is [T, H, W, C] laid out per :func:`cube_sharding`;
    ``mask`` is the [T, H, W, 1] coefficient filter laid out per
    :func:`mask_sharding`.  The distributed analogue of
    :func:`dspfun_tpu.models.fused.fused_filter_3d`.
    """
    t, h, w, _ = cube.shape
    fwd, inv = dct3d_sharded_fn(t, h, w, mesh, precision)

    def local(cube_shard, mask_shard):
        coeff = fwd(cube_shard)
        return inv(coeff * mask_shard.astype(coeff.dtype))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("time", "space", None, None), P(None, "time", "space", None)),
        out_specs=P("time", "space", None, None),
        check_vma=False,
    )
    return fn(cube, mask)


@functools.lru_cache(maxsize=64)
def _blocks_fn(mesh, geom, params, plane_index, nplanes):
    """Cached jit wrapper: a fresh lambda per call would defeat the
    trace cache and retrace/recompile once per slab per plane."""
    from dspfun_tpu.models.motion_pipeline import filter_blocks

    bspec = NamedSharding(mesh, P("space"))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        lambda b, x, y, z, pl: filter_blocks(
            b, pl, (x, y), z, geom=geom, params=params,
            plane_index=plane_index, nplanes=nplanes,
        ),
        in_shardings=(bspec, bspec, bspec, rep, None),
        out_shardings=(bspec, bspec),
    )


def shard_blocks_filter(
    blocks,
    plans,
    block_coords,
    bz,
    mesh: Mesh,
    *,
    geom,
    params,
    plane_index: int,
    nplanes: int,
):
    """motion's per-slab block batch distributed over the mesh's
    'space' axis — pure data parallelism over the block grid
    (SURVEY.md section 2.8: blocks are independent).

    The batch is zero-padded internally up to a multiple of the space
    axis (zero blocks transform to zero and their per-block coded
    counts are sliced off, so padding never changes the result).
    Plans/scalars replicate.
    """
    import numpy as np  # noqa: PLC0415

    n_space = mesh.shape["space"]
    nb = blocks.shape[0]
    npad = (-nb) % n_space
    bx, by = block_coords
    if npad:
        blocks = jnp.concatenate(
            [jnp.asarray(blocks),
             jnp.zeros((npad,) + tuple(blocks.shape[1:]), blocks.dtype)]
        )
        pad_ix = np.zeros(npad, dtype=np.asarray(bx).dtype)
        bx = jnp.concatenate([jnp.asarray(bx), jnp.asarray(pad_ix)])
        by = jnp.concatenate([jnp.asarray(by), jnp.asarray(pad_ix)])
    bspec = NamedSharding(mesh, P("space"))
    rep = NamedSharding(mesh, P())
    blocks = jax.device_put(blocks, bspec)
    bx = jax.device_put(bx, bspec)
    by = jax.device_put(by, bspec)
    fn = _blocks_fn(mesh, geom, params, plane_index, nplanes)
    out, coded = fn(blocks, bx, by, jax.device_put(bz, rep), plans)
    if npad:
        out, coded = out[:nb], coded[:nb]
    return out, coded
