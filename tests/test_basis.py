"""Basis-family tests: the closed-form kernels of applybasis
(reference applybasis/applybasis.c:77-140) are themselves the oracle
for the fast paths (SURVEY.md section 4)."""

import numpy as np
import pytest
import scipy.fft
import scipy.linalg

from dspfun_tpu.core.basis import (
    basis_fn,
    basis_matrix,
    dct2_matrix,
    dct3_matrix,
    zoom_scaled_basis,
)


def test_dct2_dct3_inverse_pair():
    n = 16
    prod = dct3_matrix(n) @ dct2_matrix(n)
    np.testing.assert_allclose(prod, 2 * n * np.eye(n), atol=1e-10)


@pytest.mark.parametrize(
    "name,stype",
    [("dct1", 1), ("dct2", 2), ("dct3", 3), ("dct4", 4)],
)
def test_dct_families_match_scipy(name, stype):
    """applybasis kernels vs scipy, accounting for dspfun's boundary
    conventions: dct1 halves the n=0 and n=N-1 columns
    (applybasis.c:83-88) and dct3 halves the n=0 column
    (applybasis.c:95-99), matching FFTW's REDFT00/REDFT01 halved
    endpoints; scipy's unnormalised kinds fold those differently."""
    n = 8
    x = np.random.default_rng(0).random(n)
    B = basis_matrix(name, n, n).real
    got = B @ x
    if stype == 1:
        xs = x.copy()
        want = scipy.fft.dct(xs, type=1) / 2  # scipy REDFT00: x0,xN-1 full weight
        # scipy dct1: y_k = x_0 + (-1)^k x_{N-1} + 2 sum_{1..N-2} x_n cos(pi n k/(N-1))
        # dspfun dct1: x_0/2 + (-1)^k x_{N-1}/2 + sum interior cos  => exactly half
        np.testing.assert_allclose(got, want, atol=1e-12)
    elif stype == 2:
        want = scipy.fft.dct(x, type=2) / 2
        np.testing.assert_allclose(got, want, atol=1e-12)
    elif stype == 3:
        want = scipy.fft.dct(x, type=3) / 2
        np.testing.assert_allclose(got, want, atol=1e-12)
    else:
        want = scipy.fft.dct(x, type=4) / 2
        np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize(
    "name,stype", [("dst1", 1), ("dst2", 2), ("dst3", 3), ("dst4", 4)]
)
def test_dst_families_match_scipy(name, stype):
    n = 8
    x = np.random.default_rng(1).random(n)
    B = basis_matrix(name, n, n).real
    got = B @ x
    want = scipy.fft.dst(x, type=stype) / 2
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_dft_idft_pair():
    n = 8
    F = basis_matrix("dft", n, n)
    Fi = basis_matrix("idft", n, n)
    np.testing.assert_allclose(Fi @ F, n * np.eye(n), atol=1e-10)
    x = np.random.default_rng(2).random(n)
    np.testing.assert_allclose(F @ x, np.fft.fft(x), atol=1e-10)


def test_wht_is_walsh_ordered_hadamard():
    n = 8
    W = basis_matrix("wht", n, n).real
    # orthogonality
    np.testing.assert_allclose(W @ W.T, n * np.eye(n), atol=1e-12)
    H = scipy.linalg.hadamard(n).astype(np.float64)
    # same rows, in sequency (Walsh) order: row k has k sign changes
    changes = np.sum(np.abs(np.diff(W, axis=1)) > 0, axis=1)
    np.testing.assert_array_equal(changes, np.arange(n))
    rows = {tuple(r) for r in H}
    for r in W:
        assert tuple(r) in rows


def test_dht_involution():
    n = 16
    H = basis_matrix("dht", n, n).real
    np.testing.assert_allclose(H @ H, n * np.eye(n), atol=1e-9)


def test_basis_name_parsing():
    assert basis_fn("DCT") is basis_fn("dct2")
    assert basis_fn("dst") is basis_fn("dst2")
    assert basis_fn("iDFT") is basis_fn("idft")
    with pytest.raises(ValueError):
        basis_fn("nope")


def test_zoom_basis_identity_scale():
    """At scale 1 with interpolated boundaries and zero offset, the zoom
    basis plus implicit DC/2 column reproduces the IDCT: synthesising
    from REDFT10 coefficients recovers the input/(2N)... i.e. full
    round trip through zoom's formulation (zoom.c:361-375)."""
    n = 16
    rng = np.random.default_rng(3)
    x = rng.random(n)
    C = scipy.fft.dct(x, type=2)  # FFTW convention
    basis, ncomp = zoom_scaled_basis("interpolated", 1, 1, 0.0, n, n)
    assert ncomp == n
    out = C[0] / 2 + basis @ C[1:ncomp]
    np.testing.assert_allclose(out / n, x, atol=1e-9)


def test_zoom_basis_downscale_truncates():
    basis, ncomp = zoom_scaled_basis("interpolated", 1, 2, 0.0, 8, 16)
    assert ncomp == 8
    assert basis.shape == (8, 7)


def test_zoom_basis_ncomponents_rounds_half_away():
    """C round() keeps the frequency at exact-x.5 logical sizes
    (Python/np half-even dropped it: round(2.5)=2 vs lround's 3)."""
    from dspfun_tpu.core.basis import zoom_scaled_basis

    basis, ncomp = zoom_scaled_basis("interpolated", 1, 2, 0.0, 4, 5)
    assert ncomp == 3                    # round(5*1/2) = 3, not 2
    assert basis.shape == (4, 2)


def test_zoom_basis_centered_at_min_scale_is_silent():
    """Scale exactly 1/L: ncomponents == 1 (DC only) and the centered
    denominator is zero, but the basis is never evaluated — no warning,
    no NaN (the reference's loop body doesn't run either)."""
    import warnings

    from dspfun_tpu.core.basis import zoom_scaled_basis

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        basis, ncomp = zoom_scaled_basis("centered", 1, 8, 0.0, 4, 8)
    assert ncomp == 1
    assert basis.shape == (4, 0)
    assert np.isfinite(basis).all()


def test_cached_matrices_are_readonly():
    """lru_cached basis/grid matrices are shared across every plan; an
    in-place edit must fail loudly instead of corrupting the cache."""
    import pytest

    from dspfun_tpu.core.basis import dct2_matrix, dct3_matrix
    from dspfun_tpu.core.transforms import uniform_grid
    from dspfun_tpu.ops.blockdct import kron_dct_matrix

    for m in (dct2_matrix(8), dct3_matrix(8), uniform_grid((4, 4)),
              kron_dct_matrix((2, 2), "dct2")):
        with pytest.raises(ValueError):
            m[0, 0] = 99.0
