"""Sharded whole-image spec/ispec (the huge-image mesh path) vs the
single-device pipeline, plus the spec/ispec CLI -M flag."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspfun_tpu.core.precision import Precision
from dspfun_tpu.models.spec_pipeline import (
    SpecChainParams, spec_forward, spec_inverse,
)
from dspfun_tpu.parallel import spec_sharded as ss
from dspfun_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

PREC = Precision(coeff="float32", intermediate="f32")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, space=8, time=1)


@pytest.mark.parametrize("template", ["abs", "shift", "flat", "sign", "copy"])
def test_forward_matches_single_device(mesh, template):
    rng = np.random.default_rng(0)
    img = rng.random((32, 64, 3)).astype(np.float32)
    params = SpecChainParams.template(template, gain=1000.0)

    xs = jax.device_put(jnp.asarray(img), ss.image_sharding(mesh))
    f_s, dc_s = ss.spec_forward_sharded(xs, params, mesh, PREC)
    f_r, dc_r = spec_forward(jnp.asarray(img), params, PREC)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_r),
                               atol=3e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dc_s), np.asarray(dc_r), atol=1e-6)


@pytest.mark.parametrize("template", ["shift", "flat", "copy"])
def test_roundtrip_through_sharded_inverse(mesh, template):
    rng = np.random.default_rng(1)
    img = rng.random((32, 64, 3)).astype(np.float32)
    params = SpecChainParams.template(template, gain=1000.0)

    xs = jax.device_put(jnp.asarray(img), ss.image_sharding(mesh))
    f_s, dc_s = ss.spec_forward_sharded(xs, params, mesh, PREC)
    y = ss.spec_inverse_sharded(f_s, params, mesh, dc=dc_s, precision=PREC)
    np.testing.assert_allclose(np.asarray(y), img, atol=5e-4)

    # and the sharded inverse of the single-device forward
    f_r, dc_r = spec_forward(jnp.asarray(img), params, PREC)
    fs = jax.device_put(f_r, ss.spectrum_sharding(mesh))
    y2 = ss.spec_inverse_sharded(fs, params, mesh, dc=dc_r, precision=PREC)
    ref = spec_inverse(f_r, params, dc=dc_r, precision=PREC)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref), atol=1e-4)


def test_inverse_preserve_dc(mesh):
    rng = np.random.default_rng(2)
    img = rng.random((16, 32, 3)).astype(np.float32)
    params = SpecChainParams.template("shift")
    f, dc = spec_forward(jnp.asarray(img), params, PREC)
    fs = jax.device_put(f, ss.spectrum_sharding(mesh))
    y_s = ss.spec_inverse_sharded(fs, params, mesh, dc=dc, preserve_dc=True,
                                  precision=PREC)
    ref = spec_inverse(f, params, dc=dc, preserve_dc=True, precision=PREC)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(ref), atol=1e-4)


def test_spec_cli_mesh_roundtrip(tmp_path):
    from PIL import Image

    from dspfun_tpu.io import images
    from dspfun_tpu.tools import ispec as ispec_tool
    from dspfun_tpu.tools import spec as spec_tool

    rng = np.random.default_rng(3)
    src = str(tmp_path / "src.png")
    orig = rng.integers(0, 256, (32, 64, 3)).astype(np.uint8)
    Image.fromarray(orig).save(src)

    one = str(tmp_path / "one.png")
    meshed = str(tmp_path / "mesh.png")
    back = str(tmp_path / "back.png")
    assert spec_tool.main(["-t", "shift", src, one]) == 0
    assert spec_tool.main(["-t", "shift", "-M", "8", src, meshed]) == 0
    a = images.read_image(one).pixels
    b = images.read_image(meshed).pixels
    np.testing.assert_allclose(b, a, atol=2.0 / 65535)

    assert ispec_tool.main(["-t", "shift", "-M", "8", meshed, back]) == 0
    got = images.read_image(back).pixels
    assert np.sqrt(np.mean((got - orig / 255.0) ** 2)) < 2e-3


def test_spec_cli_mesh_indivisible_pads(tmp_path):
    """Round 3: an image that does not divide the mesh pads internally
    (zero basis rows/columns keep the transform exact) instead of
    falling back to single-device."""
    from PIL import Image

    from dspfun_tpu.io import images
    from dspfun_tpu.tools import ispec as ispec_tool
    from dspfun_tpu.tools import spec as spec_tool

    rng = np.random.default_rng(4)
    orig = rng.integers(0, 256, (30, 50, 3)).astype(np.uint8)
    src = str(tmp_path / "s.png")
    Image.fromarray(orig).save(src)
    one = str(tmp_path / "one.png")
    meshed = str(tmp_path / "mesh.png")
    back = str(tmp_path / "back.png")
    assert spec_tool.main(["-t", "shift", src, one]) == 0
    assert spec_tool.main(["-t", "shift", "-M", "8", src, meshed]) == 0
    a = images.read_image(one).pixels
    b = images.read_image(meshed).pixels
    assert b.shape == a.shape
    np.testing.assert_allclose(b, a, atol=2.0 / 65535)
    assert ispec_tool.main(["-t", "shift", "-M", "8", meshed, back]) == 0
    got = images.read_image(back).pixels
    assert got.shape == orig.shape
    assert np.sqrt(np.mean((got - orig / 255.0) ** 2)) < 2e-3


def test_zoom_cli_mesh_matches_single(tmp_path):
    from PIL import Image

    from dspfun_tpu.io import video
    from dspfun_tpu.tools import zoom as zoom_tool

    rng = np.random.default_rng(5)
    src = str(tmp_path / "src.png")
    Image.fromarray(rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)).save(src)

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    one = str(tmp_path / "one.fvid")
    meshed = str(tmp_path / "mesh.fvid")
    args = ["-s", "4", "-n", "3", "-S", "2+i", "-q", "--ff-format", "fvid"]
    assert zoom_tool.main([*args, src, one]) == 0
    assert zoom_tool.main([*args, "--mesh", "8", src, meshed]) == 0
    np.testing.assert_allclose(frames_of(meshed), frames_of(one),
                               atol=1e-5, rtol=1e-5)


def test_scan_chunks_sharded_matches_single(mesh8=None):
    from dspfun_tpu.models import scan_pipeline as sp
    from dspfun_tpu.ops import scan_methods as sm
    from dspfun_tpu.parallel.mesh import make_mesh

    mesh8 = make_mesh(8, space=8, time=1)
    n = 32
    rng = np.random.default_rng(6)
    img = rng.random((n, n, 3))
    order = sm.get_method("zigzag").build(n, n)
    coeffs = sp.forward_coeffs(img, PREC)
    plan = sp.plan_scan(order, n, n, 3, step=8, nframes=16, chunk=8,
                        precision=PREC)

    def collect(mesh):
        sums, parity = [], []
        for _, res in sp.scan_chunks(plan, coeffs, orig=img,
                                     parity_depth=8, inter_mode="unit",
                                     mesh=mesh):
            sums.append(res.sums)
            parity.append(res.parity)
        return np.concatenate(sums), np.concatenate(parity)

    s1, p1 = collect(None)
    s2, p2 = collect(mesh8)
    np.testing.assert_allclose(s2, s1, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(p2, p1)


def test_scan_cli_mesh_matches_single(tmp_path):
    from PIL import Image

    from dspfun_tpu.io import video
    from dspfun_tpu.tools import scan as scan_tool

    rng = np.random.default_rng(7)
    src = str(tmp_path / "src.png")
    Image.fromarray(rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)).save(src)

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    one = str(tmp_path / "one.fvid")
    meshed = str(tmp_path / "mesh.fvid")
    args = ["-q", "-m", "zig", "-S", "16", "-v", "-P"]
    assert scan_tool.main([*args, src, one]) == 0
    assert scan_tool.main([*args, "--mesh", "8", src, meshed]) == 0
    np.testing.assert_allclose(frames_of(meshed), frames_of(one),
                               atol=1e-5, rtol=1e-5)


def test_scan_chunks_sharded_exact_precision():
    """Regression: exact-mode AxisPlans carry rank-3 digit and rank-0
    scale leaves; the sharded scan's plan specs must shard digits by
    output rows and replicate the scale (used to crash in shard_map)."""
    from dspfun_tpu.models import scan_pipeline as sp
    from dspfun_tpu.ops import scan_methods as sm
    from dspfun_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, space=8, time=1)
    prec = Precision(coeff="float32", intermediate="exact")
    n = 32
    rng = np.random.default_rng(9)
    img = rng.random((n, n, 3))
    order = sm.get_method("zigzag").build(n, n)
    coeffs = sp.forward_coeffs(img, prec)
    plan = sp.plan_scan(order, n, n, 3, step=16, nframes=8, chunk=4,
                        use_pruned=False, precision=prec)
    assert plan.plans_inv[0].digits is not None

    def collect(mesh_arg):
        out = []
        for _, res in sp.scan_chunks(plan, coeffs, mesh=mesh_arg):
            out.append(res.sums)
        return np.concatenate(out)

    s1 = collect(None)
    s2 = collect(mesh)
    np.testing.assert_allclose(s2, s1, atol=1e-5, rtol=1e-5)


def test_scan_chunks_sharded_i8_padded_rows():
    """Regression (ADVICE r3): i8-mode AxisPlans carry a per-row [M, 1]
    scale; _pad_plan_rows must pad it along axis 0 and the plan spec
    must shard it by rows, or scan --mesh with intermediate="i8" crashes
    at trace time (broadcast [hp, W] vs [h, 1]) whenever the height
    pads.  h=260 engages the i8 branch (K >= 256) and 260 % 8 != 0
    forces padding to 264 rows."""
    from dspfun_tpu.models import scan_pipeline as sp
    from dspfun_tpu.ops import scan_methods as sm
    from dspfun_tpu.parallel.mesh import make_mesh

    mesh8 = make_mesh(8, space=8, time=1)
    prec = Precision(coeff="float32", intermediate="i8")
    h, w = 260, 16
    rng = np.random.default_rng(21)
    img = rng.random((h, w, 3))
    order = sm.get_method("zigzag").build(h, w)
    coeffs = sp.forward_coeffs(img, prec)
    plan = sp.plan_scan(order, h, w, 3, step=64, nframes=4, chunk=2,
                        use_pruned=False, precision=prec)
    assert plan.plans_inv[0].scale is not None
    assert np.ndim(plan.plans_inv[0].scale) == 2  # per-row i8 scale

    def collect(mesh_arg):
        out = []
        for _, res in sp.scan_chunks(plan, coeffs, mesh=mesh_arg):
            out.append(res.sums)
        return np.concatenate(out)

    s1 = collect(None)
    s2 = collect(mesh8)
    np.testing.assert_allclose(s2, s1, atol=1e-4, rtol=1e-4)


def test_zoom_cli_mesh_odd_height(tmp_path):
    """Round 3 (VERDICT r2 weak 5): an output height that does not
    divide the space axis pads internally instead of falling back."""
    from PIL import Image

    from dspfun_tpu.io import video
    from dspfun_tpu.tools import zoom as zoom_tool

    rng = np.random.default_rng(15)
    src = str(tmp_path / "src.png")
    # 3x scale of 15 rows -> vh = 45, not divisible by 8
    Image.fromarray(rng.integers(0, 256, (15, 16, 3)).astype(np.uint8)).save(src)

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    one = str(tmp_path / "one.fvid")
    meshed = str(tmp_path / "mesh.fvid")
    args = ["-s", "3", "-n", "2", "-q", "--ff-format", "fvid"]
    assert zoom_tool.main([*args, src, one]) == 0
    assert zoom_tool.main([*args, "--mesh", "8", src, meshed]) == 0
    a, b = frames_of(one), frames_of(meshed)
    assert a.shape[1] == 45
    np.testing.assert_allclose(b, a, atol=1e-5, rtol=1e-5)


def test_scan_cli_mesh_odd_height(tmp_path):
    """Scan --mesh engages for H % space != 0 (internal row padding)."""
    from PIL import Image

    from dspfun_tpu.io import video
    from dspfun_tpu.tools import scan as scan_tool

    rng = np.random.default_rng(16)
    src = str(tmp_path / "src.png")
    Image.fromarray(rng.integers(0, 256, (25, 25, 3)).astype(np.uint8)).save(src)

    def frames_of(path):
        with video.open_input(path) as r:
            out = []
            while True:
                f = r.read_frame_rgb()
                if f is None:
                    break
                out.append(f)
        return np.stack(out)

    one = str(tmp_path / "one.fvid")
    meshed = str(tmp_path / "mesh.fvid")
    args = ["-q", "-m", "zig", "-S", "13", "-P"]
    assert scan_tool.main([*args, src, one]) == 0
    assert scan_tool.main([*args, "--mesh", "8", src, meshed]) == 0
    np.testing.assert_allclose(frames_of(meshed), frames_of(one),
                               atol=1e-5, rtol=1e-5)


def test_scan_chunks_sharded_odd_height_parity():
    """Library-level: odd H with parity measurement over the mesh."""
    from dspfun_tpu.models import scan_pipeline as sp
    from dspfun_tpu.ops import scan_methods as sm
    from dspfun_tpu.parallel.mesh import make_mesh

    mesh8 = make_mesh(8, space=8, time=1)
    h, w = 21, 17
    rng = np.random.default_rng(17)
    img = rng.random((h, w, 3))
    order = sm.get_method("zigzag").build(w, h)  # build/plan take (W, H)
    coeffs = sp.forward_coeffs(img, PREC)
    plan = sp.plan_scan(order, w, h, 3, step=40, nframes=9, chunk=4,
                        precision=PREC)

    def collect(mesh):
        sums, parity = [], []
        for _, res in sp.scan_chunks(plan, coeffs, orig=img,
                                     parity_depth=8, mesh=mesh):
            sums.append(res.sums)
            parity.append(res.parity)
        return np.concatenate(sums), np.concatenate(parity)

    s1, p1 = collect(None)
    s2, p2 = collect(mesh8)
    assert s1.shape == s2.shape == (9, h, w, 3)
    np.testing.assert_allclose(s2, s1, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(p2, p1)


def test_scan_sharded_minmax_intermediates():
    """Round 3: minmax intermediates get their global per-frame extrema
    from a pmin/pmax over the mesh (was a single-device fallback);
    parity with the single-device path at an odd height (the padding
    rows must not contaminate the minimum)."""
    from dspfun_tpu.models import scan_pipeline as sp
    from dspfun_tpu.ops import scan_methods as sm
    from dspfun_tpu.parallel.mesh import make_mesh

    mesh8 = make_mesh(8, space=8, time=1)
    h, w = 21, 16
    rng = np.random.default_rng(18)
    img = rng.random((h, w, 3))
    order = sm.get_method("zigzag").build(w, h)
    coeffs = sp.forward_coeffs(img, PREC)
    plan = sp.plan_scan(order, w, h, 3, step=30, nframes=8, chunk=4,
                        precision=PREC)

    def collect(mesh):
        inter = []
        for _, res in sp.scan_chunks(plan, coeffs, inter_mode="minmax",
                                     mesh=mesh):
            inter.append(res.inter)
        return np.concatenate(inter)

    i1 = collect(None)
    i2 = collect(mesh8)
    assert i1.shape == i2.shape == (8, h, w, 3)
    np.testing.assert_allclose(i2, i1, atol=1e-5, rtol=1e-5)


def test_zoom_planned_sharded_matches_single():
    """Round 4: the planned (host-f64-basis) zoom path shards output
    rows over the mesh; parity vs single-device across precisions and
    odd heights."""
    from dspfun_tpu.models import zoom_pipeline as zp
    from dspfun_tpu.parallel.mesh import make_mesh

    mesh8 = make_mesh(8, space=8, time=1)
    rng = np.random.default_rng(17)
    img = rng.random((15, 16, 3))
    for prec in (Precision(coeff="float32", intermediate="hilo"),
                 Precision(coeff="float32", intermediate="i8", tol=8e-7)):
        spec = jnp.asarray(zp.forward_spectrum(img, prec), jnp.float32)
        # 3x of 15 rows -> vh 45, not divisible by 8: pads internally
        one = np.asarray(zp.zoom_frame(spec, "interpolated", (3, 1), (3, 1),
                                       0, 0, 48, 45, precision=prec,
                                       encode_trc=True))
        meshed = np.asarray(zp.zoom_frame(spec, "interpolated", (3, 1),
                                          (3, 1), 0, 0, 48, 45,
                                          precision=prec, encode_trc=True,
                                          mesh=mesh8))
        np.testing.assert_allclose(meshed, one, atol=2e-5, rtol=1e-5,
                                   err_msg=prec.intermediate)
