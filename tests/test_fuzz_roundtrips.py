"""Randomised round-trip fuzzing across CLI flag combinations."""

import itertools

import numpy as np
import pytest

from dspfun_tpu.io import images
from dspfun_tpu.tools import ispec as ispec_tool
from dspfun_tpu.tools import spec as spec_tool


def smooth(h, w, seed):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = 0.5 + 0.3 * np.sin(x / 3 + seed) * np.cos(y / 4)
    img = np.stack([np.clip(img + 0.05 * rng.normal(size=(h, w)), 0, 1)
                    for _ in range(3)], axis=-1)
    return np.clip(img, 0, 1)


# "copy" keeps signed spectrum values and cannot survive an unsigned
# 8-bit container (the reference documents it "for formats that support
# this", spec/README.md:53); flat/shift are the 8-bit-safe templates.
@pytest.mark.parametrize("template,tol", [
    ("flat", 0.08), ("shift", 0.04),
])
@pytest.mark.parametrize("size", [(12, 16), (17, 13)])
def test_spec_ispec_cli_roundtrip_matrix(tmp_path, template, tol, size):
    h, w = size
    src = str(tmp_path / "s.png")
    images.write_image(src, smooth(h, w, h * w))
    mid = str(tmp_path / "m.png")
    back = str(tmp_path / "b.png")
    args = ["-t", template]
    if template == "flat":
        args += ["-G", "2000"]
    assert spec_tool.main(args + [src, mid]) == 0
    assert ispec_tool.main(args + [mid, back]) == 0
    a = images.read_image(src).pixels
    b = images.read_image(back).pixels
    assert np.sqrt(((a - b) ** 2).mean()) < tol, (template, size)


@pytest.mark.parametrize("gaintype", ["native", "reference"])
@pytest.mark.parametrize("rangetype", ["one", "dc", "dcs"])
def test_spec_gain_range_matrix(tmp_path, gaintype, rangetype):
    src = str(tmp_path / "s.png")
    images.write_image(src, smooth(10, 14, 3))
    mid = str(tmp_path / "m.png")
    back = str(tmp_path / "b.png")
    args = ["-T", "log", "-S", "shift", "-G", gaintype, "-R", rangetype]
    assert spec_tool.main(args + [src, mid]) == 0
    assert ispec_tool.main(args + [mid, back]) == 0
    a = images.read_image(src).pixels
    b = images.read_image(back).pixels
    assert np.sqrt(((a - b) ** 2).mean()) < 0.05, (gaintype, rangetype)


@pytest.mark.parametrize("mode,tol_p", [
    ("f32", None), ("hilo", None), ("exact", 1e-5), ("i8", 1e-5),
    ("f32", 1e-4),
])
def test_spec_roundtrip_across_precision_modes(mode, tol_p):
    """Every accumulation mode (and budget) round-trips the whole-image
    spec chain within its accuracy class — guards the mode dispatch in
    apply_plan (split hints, digit paths, budget sizing)."""
    import jax

    from dspfun_tpu.core.precision import Precision
    from dspfun_tpu.models.spec_pipeline import (
        SpecChainParams, spec_forward, spec_inverse,
    )

    n = 96
    rng = np.random.default_rng(42)
    img = rng.random((n, n, 3)).astype(np.float32)
    params = SpecChainParams.template("copy")
    p = Precision(coeff="float32", intermediate=mode, tol=tol_p)

    @jax.jit
    def rt(x):
        f, dc = spec_forward(x, params, p)
        return spec_inverse(f, params, dc=dc, precision=p)

    err = float(np.max(np.abs(np.asarray(rt(img), np.float64) - img)))
    # CPU matmuls are true f32, so every mode lands ~1e-5-class here;
    # the bound guards against gross dispatch/algebra regressions
    assert err <= 1e-4, (mode, tol_p, err)
