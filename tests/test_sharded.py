"""Multi-chip sharded 3-D DCT tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from dspfun_tpu.core.precision import Precision
from dspfun_tpu.models.fused import filter_plans, fused_filter_3d, lowpass_mask
from dspfun_tpu.parallel.mesh import make_mesh
from dspfun_tpu.parallel import sharded

PREC = Precision(coeff="float32", intermediate="f32")


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, space=4, time=2)


def test_sharded_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    t, h, w, c = 8, 16, 32, 3
    cube = rng.random((t, h, w, c)).astype(np.float32)
    mask = lowpass_mask((t, h, w), cutoff=0.5, boost=1.25, damp=0.1)[..., None].astype(
        np.float32
    )

    cube_s = jax.device_put(cube, sharded.cube_sharding(mesh))
    mask_s = jax.device_put(mask, sharded.mask_sharding(mesh))
    out = jax.jit(
        lambda a, m: sharded.fused_filter_3d_sharded(a, m, mesh, PREC),
        in_shardings=(sharded.cube_sharding(mesh), sharded.mask_sharding(mesh)),
        out_shardings=sharded.cube_sharding(mesh),
    )(cube_s, mask_s)

    ref = fused_filter_3d(cube, mask, filter_plans((t, h, w), PREC), PREC)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_sharded_identity_roundtrip(mesh):
    rng = np.random.default_rng(1)
    t, h, w, c = 4, 8, 16, 2
    cube = rng.random((t, h, w, c)).astype(np.float32)
    ones = np.ones((t, h, w, 1), dtype=np.float32)
    cube_s = jax.device_put(cube, sharded.cube_sharding(mesh))
    ones_s = jax.device_put(ones, sharded.mask_sharding(mesh))
    out = sharded.fused_filter_3d_sharded(cube_s, ones_s, mesh, PREC)
    np.testing.assert_allclose(np.asarray(out), cube, atol=1e-4)


def test_motion_blocks_sharded_over_space(mesh):
    import jax.numpy as jnp

    from dspfun_tpu.models import motion_pipeline as mp

    g = mp.plan_geometry(32, 32, 2, 1, block=mp.Dims(8, 8, 2),
                         bp_end=mp.Dims(4, 4, 1))[0]
    params = mp.MotionParams(boost=1.5, damp=0.0, preserve_dc="dc")
    plans = mp.make_plans(g)
    rng = np.random.default_rng(3)
    frames = rng.random((2, 32, 32)).astype(np.float32) * 255
    blocks = mp.frames_to_blocks(frames, g)
    nb = blocks.shape[0]
    bc = (np.arange(nb, dtype=np.int32) % g.nblocks.w,
          np.arange(nb, dtype=np.int32) // g.nblocks.w)

    out_s, _ = sharded.shard_blocks_filter(
        jnp.asarray(blocks), plans, bc, jnp.asarray(0), mesh,
        geom=g, params=params, plane_index=0, nplanes=1,
    )
    ref, _ = mp.filter_blocks(
        jnp.asarray(blocks), plans,
        (jnp.asarray(bc[0]), jnp.asarray(bc[1])), jnp.asarray(0),
        geom=g, params=params, plane_index=0, nplanes=1,
    )
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_shard_blocks_pads_ragged_batch(mesh):
    """Block batches that don't divide the space axis are zero-padded
    internally; outputs and per-block coded counts match single-device
    exactly (the padding blocks stay zero and are sliced off)."""
    import jax.numpy as jnp

    from dspfun_tpu.models import motion_pipeline as mp

    # 24x16 image with 8x8 blocks -> 6 blocks, not divisible by space=4
    g = mp.plan_geometry(24, 16, 1, 1, block=mp.Dims(8, 8, 1))[0]
    params = mp.MotionParams(quant=2.0, preserve_dc="grey", boost=1.2)
    plans = mp.make_plans(g)
    rng = np.random.default_rng(7)
    frames = rng.random((1, 16, 24)).astype(np.float32) * 255
    blocks = mp.frames_to_blocks(frames, g)
    nb = blocks.shape[0]
    assert nb % mesh.shape["space"] != 0
    bc = (np.arange(nb, dtype=np.int32) % g.nblocks.w,
          np.arange(nb, dtype=np.int32) // g.nblocks.w)

    out_s, coded_s = sharded.shard_blocks_filter(
        jnp.asarray(blocks), plans, bc, jnp.asarray(0), mesh,
        geom=g, params=params, plane_index=0, nplanes=1,
    )
    ref, coded_ref = mp.filter_blocks(
        jnp.asarray(blocks), plans,
        (jnp.asarray(bc[0]), jnp.asarray(bc[1])), jnp.asarray(0),
        geom=g, params=params, plane_index=0, nplanes=1,
    )
    assert out_s.shape[0] == nb
    np.testing.assert_array_equal(np.asarray(coded_s), np.asarray(coded_ref))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)
