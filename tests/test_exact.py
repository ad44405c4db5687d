"""core.exact: correctly-rounded f32 contraction (Ozaki digit scheme).

The accuracy claims here are the foundation of the whole-image TPU
precision story (BASELINE.md <=1e-5 vs double FFTW), so the oracle is
full float64 numpy.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from dspfun_tpu.core import basis as basis_mod
from dspfun_tpu.core.exact import digit_width, exact_contract, split_matrix_digits
from dspfun_tpu.core.precision import Precision
from dspfun_tpu.core.transforms import apply_plan, plan_axis, plan_matrix


def test_digit_width_exactness_condition():
    for k in (2, 8, 64, 512, 1024, 4096, 1 << 16):
        b = digit_width(k)
        assert 1 <= b <= 8
        assert 2 * b + math.ceil(math.log2(k)) <= 24


def test_split_matrix_digits_reconstructs():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((16, 512)) * 3.0
    digits, scale = split_matrix_digits(m)
    b = digit_width(512)
    rec = np.zeros_like(m)
    for i in range(digits.shape[0]):
        rec += np.asarray(digits[i], np.float64) * 2.0 ** (-b * (i + 1))
    rec *= float(scale)
    assert np.max(np.abs(rec - m)) <= float(scale) * 2.0 ** (-b * digits.shape[0])
    # digit slices are integer-valued and fit bf16 exactly
    d64 = np.asarray(digits, np.float64)
    assert np.array_equal(d64, np.round(d64))
    assert np.max(np.abs(d64)) <= 2.0**b


@pytest.mark.parametrize("k", [8, 64, 512, 2048])
def test_exact_contract_vs_f64(k):
    rng = np.random.default_rng(k)
    a = rng.standard_normal((32, k))
    x = rng.standard_normal((k, 24)).astype(np.float32)
    digits, scale = split_matrix_digits(a)
    got = np.asarray(exact_contract(jnp.asarray(x), jnp.asarray(digits),
                                    scale, 0))
    ref = a @ x.astype(np.float64)
    scale_mag = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) <= 4e-7 * scale_mag  # ~f32 ulp of max


def test_exact_contract_middle_axis_and_dynamic_range():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((16, 32))
    # operand spanning ~2^40 of dynamic range plus zeros and powers of 2
    x = (rng.standard_normal((4, 32, 5)) *
         np.exp2(rng.integers(-20, 20, (4, 32, 5)))).astype(np.float32)
    x[0, :3, 0] = 0.0
    x[1, 0, 0] = 2.0**10
    digits, scale = split_matrix_digits(a)
    got = np.asarray(exact_contract(jnp.asarray(x), jnp.asarray(digits),
                                    scale, 1))
    ref = np.moveaxis(
        np.tensordot(a, x.astype(np.float64), axes=[[1], [1]]), 0, 1
    )
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) <= 4e-7 * np.max(np.abs(ref))


def test_exact_contract_zero_input():
    a = np.eye(8)
    digits, scale = split_matrix_digits(a)
    out = np.asarray(exact_contract(jnp.zeros((8, 3), jnp.float32),
                                    jnp.asarray(digits), scale, 0))
    assert np.all(out == 0)


def test_apply_plan_exact_mode_dispatch():
    p = Precision(coeff="float32", intermediate="exact")
    plan = plan_axis(512, "dct2", p)
    assert plan.digits is not None
    rng = np.random.default_rng(3)
    x = rng.random((512, 8)).astype(np.float32)
    got = np.asarray(apply_plan(jnp.asarray(x), plan, 0, p))
    ref = basis_mod.dct2_matrix(512) @ x.astype(np.float64)
    assert np.max(np.abs(got - ref)) <= 4e-7 * np.max(np.abs(ref))


def test_plan_matrix_exact_roundtrip_512():
    """The round-1 failure case: 512^2 whole-image DCT2->DCT3 round trip
    must come back at f32-rounding level (was 1e-2 with per-pass
    accumulation rounding)."""
    p = Precision(coeff="float32", intermediate="exact")
    n = 512
    m2 = plan_matrix(basis_mod.dct2_matrix(n), p)
    m3 = plan_matrix(basis_mod.dct3_matrix(n), p)
    rng = np.random.default_rng(11)
    x = rng.random((n, n)).astype(np.float32)
    f = apply_plan(apply_plan(jnp.asarray(x), m2, 0, p), m2, 1, p)
    y = apply_plan(apply_plan(f, m3, 0, p), m3, 1, p) / (4.0 * n * n)
    err = np.max(np.abs(np.asarray(y) - x))
    assert err <= 5e-7, err


def test_spec_roundtrip_256_hilo_upgrades_to_exact():
    """Whole-image spec/ispec auto-upgrade hilo->exact at >=256 px and
    the pipeline round trip lands ~1e-7 (BASELINE 1e-5 with margin)."""
    import jax

    from dspfun_tpu.models.spec_pipeline import (
        SpecChainParams, spec_forward, spec_inverse,
    )

    prec = Precision(coeff="float32", intermediate="hilo")
    n = 256
    rng = np.random.default_rng(5)
    img = rng.random((n, n, 3)).astype(np.float32)

    # 'copy' stores the raw linear spectrum (relative f32 quantisation
    # only): the full transform+chain round trip sits at the f32 floor,
    # far under the 1e-5 BASELINE target.  This is the number that
    # measures the *transform*.
    params = SpecChainParams.template("copy")
    f, dc = jax.jit(lambda v: spec_forward(v, params, prec))(jnp.asarray(img))
    y = jax.jit(lambda v, d: spec_inverse(v, params, dc=d, precision=prec))(f, dc)
    err = float(np.max(np.abs(np.asarray(y) - img)))
    assert err <= 1e-6, err

    # 'shift'/'flat' templates add a +-0.5-offset sign encoding whose
    # f32 quantisation (ulp(0.5) amplified by the gain chain) floors the
    # round trip around 1e-4 at 256^2 regardless of matmul accuracy —
    # an encoding property, identical for the C reference at f32
    # storage.  Guard the order of magnitude so regressions show.
    params = SpecChainParams.template("shift")
    f, dc = jax.jit(lambda v: spec_forward(v, params, prec))(jnp.asarray(img))
    y = jax.jit(lambda v, d: spec_inverse(v, params, dc=d, precision=prec))(f, dc)
    assert float(np.max(np.abs(np.asarray(y) - img))) <= 3e-4


# ---------------------------------------------------------------------------
# Round 3: tolerance-budgeted digit contraction (VERDICT r2 next item 2/9).
# ---------------------------------------------------------------------------


def test_budget_bits_sizing():
    from dspfun_tpu.core.exact import budget_bits

    assert budget_bits(None, 512) is None
    b = budget_bits(1e-5, 512)
    # enough bits for tol * K accumulation with margin, far below f64
    assert 25 <= b <= 36
    assert budget_bits(1e-7, 512) > b


def test_budgeted_digits_fewer_passes():
    m = basis_mod.dct2_matrix(512)
    full, _ = split_matrix_digits(m)
    budget, _ = split_matrix_digits(m, tol=1e-5)
    assert budget.shape[0] < full.shape[0]


@pytest.mark.parametrize("tol", [1e-4, 1e-5, 1e-6])
def test_budgeted_contract_meets_tol(tol):
    """Truncation error stays under tol relative to the slice scale."""
    k = 512
    rng = np.random.default_rng(8)
    m = basis_mod.dct2_matrix(k)
    x = rng.random((k, 64)).astype(np.float32)
    digits, scale = split_matrix_digits(m, tol=tol)
    got = np.asarray(exact_contract(jnp.asarray(x), jnp.asarray(digits),
                                    scale, 0, tol=tol), np.float64)
    ref = m @ x.astype(np.float64)
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel <= tol, rel


def test_budgeted_plan_roundtrip_512():
    """Whole-image DCT2->DCT3 round trip at tol=1e-5 (suite config 6)."""
    n = 512
    p = Precision(intermediate="exact", tol=1e-5)
    rng = np.random.default_rng(9)
    x = rng.random((n, n)).astype(np.float32)
    f = apply_plan(jnp.asarray(x), plan_axis(n, "dct2", p), 0, p)
    y = apply_plan(f, plan_axis(n, "dct3", p), 0, p) / (2.0 * n)
    assert np.max(np.abs(np.asarray(y, np.float64) - x)) <= 1e-5
