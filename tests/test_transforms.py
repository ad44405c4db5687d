"""Transform-layer tests against scipy.fft (pocketfft) as the FFTW oracle.

scipy.fft.dct(type=2/3, norm=None) implements exactly FFTW's
REDFT10/REDFT01 conventions, which is what the reference plans
(e.g. spec/spec.c:63, ispec.c:165).
"""

import numpy as np
import pytest
import scipy.fft

from dspfun_tpu.core.precision import Precision
from dspfun_tpu.core.transforms import dct2, dct2_nd, dct3, dct3_nd, uniform_grid


@pytest.mark.parametrize("n", [1, 2, 7, 8, 64, 257])
@pytest.mark.parametrize("mode", ["f32", "hilo"])
def test_dct2_matches_fftw_convention(n, mode):
    rng = np.random.default_rng(0)
    x = rng.random((n, 5))
    want = scipy.fft.dct(x, type=2, axis=0)
    got = np.asarray(dct2(x, axis=0, precision=Precision(intermediate=mode)))
    tol = 1e-4 * n if mode == "f32" else 2e-6 * n
    np.testing.assert_allclose(got, want, atol=tol, rtol=0)


@pytest.mark.parametrize("n", [1, 8, 64, 257])
def test_dct3_matches_fftw_convention(n):
    rng = np.random.default_rng(1)
    x = rng.random((3, n))
    want = scipy.fft.dct(x, type=3, axis=1)
    got = np.asarray(dct3(x, axis=1, precision=Precision(intermediate="hilo")))
    np.testing.assert_allclose(got, want, atol=2e-6 * n, rtol=0)


def test_roundtrip_scaling_2d():
    """REDFT01(REDFT10(x)) == 4wh x in 2-D (the reference relies on this
    everywhere, e.g. scan.c:292-298)."""
    rng = np.random.default_rng(2)
    h, w = 24, 16
    x = rng.random((h, w, 3))
    p = Precision(intermediate="hilo")
    y = np.asarray(dct3_nd(dct2_nd(x, (0, 1), p), (0, 1), p)) / (4 * w * h)
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_hilo_accuracy_512():
    """BASELINE.md target: <=1e-5 max abs err vs double FFTW, 512x512,
    on the *normalised* (divided by 4wh) spectrum."""
    rng = np.random.default_rng(3)
    h = w = 512
    x = rng.random((h, w)).astype(np.float32)
    want = scipy.fft.dct(
        scipy.fft.dct(x.astype(np.float64), type=2, axis=0), type=2, axis=1
    ) / (4 * w * h)
    got = np.asarray(dct2_nd(x, (0, 1), Precision(intermediate="hilo"))) / (4 * w * h)
    assert np.max(np.abs(got - want)) <= 1e-5


def test_uniform_grid():
    g = uniform_grid((4, 4))
    s2 = np.sqrt(2)
    assert g[0, 0] == 1.0
    assert g[0, 1] == pytest.approx(s2)
    assert g[2, 0] == pytest.approx(s2)
    assert g[3, 2] == pytest.approx(2.0)
    g3 = uniform_grid((2, 2, 2))
    assert g3[1, 1, 1] == pytest.approx(2 * s2)


# ---------------------------------------------------------------------------
# Round 3: rank-1 DC-split contraction (the tol fast path) and
# mask-support-pruned fused plans.
# ---------------------------------------------------------------------------


def test_split_contract_matches_plain():
    """mean/zero0 splits are exact algebra: same result as the plain
    contraction to f32 noise (CPU matmuls are true f32 here)."""
    import jax.numpy as jnp

    from dspfun_tpu.core.transforms import apply_plan, plan_axis

    p_plain = Precision(intermediate="f32")
    p_split = Precision(intermediate="f32", tol=1e-5)
    n = 128
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((n, 40)).astype(np.float32) + 2.0)
    for kind, split in (("dct2", "mean"), ("dct3", "zero0")):
        plan = plan_axis(n, kind, p_plain)
        a = np.asarray(apply_plan(x, plan, 0, p_plain), np.float64)
        b = np.asarray(apply_plan(x, plan, 0, p_split, split=split), np.float64)
        assert np.max(np.abs(a - b)) <= 1e-3 * np.max(np.abs(a))

    # mean split: the DC row is computed analytically (rowsum = [2N,0..])
    plan = plan_axis(n, "dct2", p_split)
    y = np.asarray(apply_plan(x, plan, 0, p_split, split="mean"), np.float64)
    ref0 = 2.0 * np.asarray(x, np.float64).sum(axis=0)
    assert np.max(np.abs(y[0] - ref0)) <= 1e-4 * np.max(np.abs(ref0))


def test_pruned_filter_plans_exact():
    """Mask-support pruning (scan.c:20-41 generalised to the fused
    chain) computes the identical result at a fraction of the FLOPs."""
    import jax
    import scipy.fft

    from dspfun_tpu.models.fused import filter_plans, fused_filter_2d, lowpass_mask

    h, w = 96, 128
    rng = np.random.default_rng(4)
    x = rng.random((h, w, 3)).astype(np.float32)
    mask = lowpass_mask((h, w), cutoff=0.25, boost=1.25)[:, :, None].astype(np.float32)
    p = Precision(intermediate="f32")
    plans = filter_plans((h, w), p, mask=mask)
    assert plans.fwd[0].hi.shape[0] == h // 4    # pruned rows
    assert plans.inv[1].hi.shape == (w, w // 4)  # pruned cols
    y = np.asarray(jax.jit(
        lambda a, m, pl: fused_filter_2d(a, m, pl, p))(x, mask, plans),
        np.float64)
    ref = scipy.fft.dctn(x.astype(np.float64), type=2, axes=(0, 1))
    ref *= mask
    ref = scipy.fft.dctn(ref, type=3, axes=(0, 1)) / (4.0 * w * h)
    assert np.max(np.abs(y - ref)) <= 2e-6


def test_dense_mask_no_pruning():
    from dspfun_tpu.models.fused import filter_plans

    mask = np.ones((16, 16, 1), dtype=np.float32)
    plans = filter_plans((16, 16), Precision(intermediate="f32"), mask=mask)
    assert plans.support == (None, None)
    assert plans.fwd[0].hi.shape == (16, 16)
