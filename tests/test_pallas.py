"""Fused blockwise Pallas kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest
import scipy.fft

from dspfun_tpu.ops import pallas_kernels as pk

pytestmark = pytest.mark.skipif(not pk.has_pallas(), reason="no pallas")


def oracle(blocks, dims, filt, quant=0.0, threshold=(0.0, 0.0)):
    nb = blocks.shape[0]
    xb = blocks.reshape(nb, *dims).astype(np.float64)
    axes = tuple(range(1, len(dims) + 1))
    F = scipy.fft.dctn(xb, axes=axes, type=2) * np.asarray(filt)[None]
    if threshold[1]:
        a = np.abs(F)
        F = np.where((a < threshold[0]) | (a > threshold[1]), 0.0, F)
    if quant:
        F = np.round(F / quant) * quant
    out = scipy.fft.dctn(F, axes=axes, type=3) / (2 ** len(dims) * np.prod(dims))
    return out.reshape(nb, -1)


def test_fused_identity():
    rng = np.random.default_rng(0)
    dims = (2, 8, 8)
    x = rng.random((10, 128)).astype(np.float32)
    y = np.asarray(pk.fused_block_filter(x, dims, np.ones(dims),
                                         row_tile=8, interpret=True))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_fused_lowpass_matches_oracle():
    rng = np.random.default_rng(1)
    dims = (16, 8)
    filt = np.zeros(dims)
    filt[:4, :4] = 1.5
    x = rng.random((20, 128)).astype(np.float32) * 255
    y = np.asarray(pk.fused_block_filter(x, dims, filt,
                                         row_tile=8, interpret=True))
    np.testing.assert_allclose(y, oracle(x, dims, filt), atol=1e-2)


def test_fused_quant_threshold():
    rng = np.random.default_rng(2)
    dims = (16, 8)
    filt = np.ones(dims)
    x = rng.random((9, 128)).astype(np.float32) * 255
    y = np.asarray(pk.fused_block_filter(
        x, dims, filt, quant=50.0, threshold=(10.0, 1e5),
        row_tile=8, interpret=True,
    ))
    ref = oracle(x, dims, filt, quant=50.0, threshold=(10.0, 1e5))
    np.testing.assert_allclose(y, ref, atol=1e-2)


def test_pad_to_row_tile():
    rng = np.random.default_rng(3)
    dims = (1, 128)
    x = rng.random((3, 128)).astype(np.float32)
    y = np.asarray(pk.fused_block_filter(x, dims, np.ones(dims),
                                         row_tile=8, interpret=True))
    assert y.shape == (3, 128)
    np.testing.assert_allclose(y, x, atol=1e-4)
