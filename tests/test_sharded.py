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
