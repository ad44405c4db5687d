import math

import numpy as np
import pytest

from dspfun_tpu.ops.speclib import (
    PRESETS,
    SpecParams,
    SpecScaler,
    parse_spec_params,
    spec_copysign,
    spec_normalization,
)


def test_parse_presets_and_overrides():
    p = parse_spec_params("shift")
    assert (p.scaletype, p.signtype) == ("log", "shift")
    p = parse_spec_params("preset=flat:sign=abs")
    assert (p.scaletype, p.signtype) == ("linear", "abs")
    p = parse_spec_params("scale=linear:sign=saturate")
    assert (p.scaletype, p.signtype) == ("linear", "saturate")
    with pytest.raises(ValueError):
        parse_spec_params("scale=bogus")
    with pytest.raises(ValueError):
        parse_spec_params("nonsense")


def test_normalization():
    assert spec_normalization(0) == 1.0
    assert spec_normalization(1) == pytest.approx(math.sqrt(2))
    assert spec_normalization(2) == pytest.approx(2.0)
    assert spec_normalization(3) == pytest.approx(2 * math.sqrt(2))


@pytest.mark.parametrize("preset", ["shift", "flat"])
def test_scaler_roundtrip_invertible_presets(preset):
    """shift/flat presets are sign-preserving, hence invertible
    (reference speclib.c:172-178)."""
    scale, sign = PRESETS[preset]
    sc = SpecScaler(SpecParams(scale, sign), max_input=1.0, gain=127.5 * 32)
    c = np.linspace(-1, 1, 101)
    enc = sc.scale(c, xp=np)
    assert np.all(enc >= 0) and np.all(enc <= 1)
    dec = sc.unscale(enc, xp=np)
    np.testing.assert_allclose(dec, c, atol=1e-12)


def test_abs_plus_signmap_roundtrip():
    sc = SpecScaler(SpecParams("log", "abs"), max_input=1.0, gain=1000.0)
    sm = SpecScaler(SpecParams("linear", "saturate"), max_input=1.0, gain=1.0)
    c = np.linspace(-1, 1, 31)
    enc = sc.scale(c, xp=np)
    signs = sm.scale(c, xp=np)
    dec = sc.unscale(spec_copysign(enc, signs, xp=np) * np.sign(spec_copysign(1.0, signs, xp=np)), xp=np)
    # simpler: copysign the encoded magnitudes, then unscale
    dec = sc.unscale(np.where(signs != 0, enc, -enc), xp=np)
    np.testing.assert_allclose(dec, c, atol=1e-12)
