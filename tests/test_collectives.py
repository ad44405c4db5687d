"""Collective-structure assertions for the sharded paths (VERDICT r3
item 6): the compiled programs must contain exactly the intended
all_to_alls and no accidental all_gathers of the full cube.

Counts are taken from the lowered StableHLO (backend-independent; the
CPU backend decomposes collectives in its optimized HLO, so the
pre-partitioning representation is the stable thing to assert on).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspfun_tpu.core.precision import Precision
from dspfun_tpu.models import motion_pipeline as mp
from dspfun_tpu.parallel import motion_sharded as msh
from dspfun_tpu.parallel import sharded
from dspfun_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

PREC = Precision(coeff="float32", intermediate="f32")


def _counts(txt):
    return {op: txt.count(f"stablehlo.{op}")
            for op in ("all_to_all", "all_gather", "all_reduce",
                       "collective_permute", "reduce_scatter")}


@pytest.mark.parametrize("space,time", [(2, 4), (4, 2)])
def test_fused_3d_exactly_four_all_to_alls(space, time):
    """The Ulysses-style 3-D chain is 2 forward + 2 inverse axis swaps;
    nothing may gather the full cube."""
    mesh = make_mesh(8, space=space, time=time)
    t, h, w, c = 8, 16, 16, 3
    cube = np.zeros((t, h, w, c), np.float32)
    mask = np.ones((t, h, w, 1), np.float32)
    cs, ms = sharded.cube_sharding(mesh), sharded.mask_sharding(mesh)
    step = jax.jit(
        lambda a, m: sharded.fused_filter_3d_sharded(a, m, mesh, PREC),
        in_shardings=(cs, ms), out_shardings=cs)
    txt = step.lower(jax.device_put(cube, cs),
                     jax.device_put(mask, ms)).as_text()
    n = _counts(txt)
    assert n["all_to_all"] == 4, n
    assert n["all_gather"] == 0, n
    assert n["collective_permute"] == 0, n


def _volume_lowered_text(params, t=4, h=8, w=16):
    mesh = make_mesh(8, space=4, time=2)
    geom = mp.plan_geometry(w, h, t, 1, block=mp.Dims(0, 0, 0))[0]
    fn = msh._volume_fn(mesh, geom, params, 0, 1, 0, PREC, t, h, w)
    vol = jax.device_put(jnp.zeros((t, h, w), jnp.float32),
                         msh.volume_sharding(mesh))
    return _counts(fn.lower(vol).as_text())


def test_volume_chain_plain_collectives():
    """The basic volume filter chain: 4 all_to_alls + scalar
    all_reduces (DC mean, coded-count sum) only — no all_gather."""
    n = _volume_lowered_text(mp.MotionParams(boost=1.2, damp=0.5,
                                             quant=1.0, preserve_dc="dc"))
    assert n["all_to_all"] == 4, n
    assert n["all_gather"] == 0, n


def test_volume_chain_topn_gathers_deliberately():
    """Global top-N needs the full coefficient magnitudes on every
    shard (parallel/motion_sharded.py k-th selection) — the all_gather
    there is deliberate and bounded; the chain still runs exactly 4
    all_to_alls."""
    n = _volume_lowered_text(mp.MotionParams(coeff_limit=8))
    assert n["all_to_all"] == 4, n
    assert n["all_gather"] >= 1, n


def test_volume_chain_dither_gathers_rows_only():
    """Floyd-Steinberg dithering gathers pel rows per time shard
    (sequential diffusion needs whole frames) — deliberate; still 4
    all_to_alls."""
    n = _volume_lowered_text(mp.MotionParams(dither=True,
                                             float_pixels=False))
    assert n["all_to_all"] == 4, n
    assert n["all_gather"] >= 1, n


def test_spec_sharded_single_axis_swap_each_way():
    """The whole-image sharded spec transform is one Ulysses axis swap
    per direction (W local -> all_to_all -> H local) plus scalar
    all_reduces for the DC / range maxima; nothing may gather the
    full image."""
    from dspfun_tpu.models.spec_pipeline import SpecChainParams
    from dspfun_tpu.parallel import spec_sharded as ss

    mesh = make_mesh(8, space=8, time=1)
    h, w, c = 32, 16, 3
    params = SpecChainParams.template("flat", gain=1000.0)
    x = jax.device_put(jnp.zeros((h, w, c), jnp.float32),
                       ss.image_sharding(mesh))

    fwd = jax.jit(lambda v: ss.spec_forward_sharded(v, params, mesh, PREC))
    n = _counts(fwd.lower(x).as_text())
    assert n["all_to_all"] == 1, n
    assert n["all_gather"] == 0, n

    f = jax.device_put(jnp.zeros((h, w, c), jnp.float32),
                       ss.spectrum_sharding(mesh))
    inv = jax.jit(lambda v: ss.spec_inverse_sharded(v, params, mesh,
                                                    precision=PREC))
    n = _counts(inv.lower(f).as_text())
    assert n["all_to_all"] == 1, n
    assert n["all_gather"] == 0, n
