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
