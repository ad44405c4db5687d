"""Scan-order registry tests (vs reference scan/scan_methods.c semantics)."""

import numpy as np
import pytest

from dspfun_tpu.ops import scan_methods as sm
from dspfun_tpu.ops.scan_order import serialize, unserialize


def order_of(name, w, h, coeffs=None, args=None):
    return sm.get_method(name).build(w, h, coeffs=coeffs, args=args)


def covers_all(order, w, h):
    flat = set(zip(order.ys.tolist(), order.xs.tolist()))
    assert flat == {(y, x) for y in range(h) for x in range(w)}


@pytest.mark.parametrize("w,h", [(4, 4), (5, 3), (3, 5), (8, 8), (1, 6), (6, 1)])
def test_zigzag_matches_diagonal_oracle(w, h):
    """Zigzag = anti-diagonals, y descending on even diagonals."""
    order = order_of("zigzag", w, h)
    expected = []
    for d in range(w + h - 1):
        ys = range(max(0, d - (w - 1)), min(d, h - 1) + 1)
        ys = list(ys) if d % 2 == 1 else list(ys)[::-1]
        expected.extend((y, d - y) for y in ys)
    got = list(zip(order.ys.tolist(), order.xs.tolist()))
    assert got == expected


def test_horizontal_vertical():
    o = order_of("horizontal", 3, 2)
    assert list(zip(o.ys, o.xs))[:4] == [(0, 0), (0, 1), (0, 2), (1, 0)]
    o = order_of("vertical", 3, 2)
    assert list(zip(o.ys, o.xs))[:4] == [(0, 0), (1, 0), (0, 1), (1, 1)]


def test_diagonal_README_example():
    """8x8 diagonal scan serializations match scan/README.md:118-151."""
    o = order_of("diagonal", 8, 8)
    coord = serialize(o, "coordinate")
    lines = coord.strip("\n").split("\n")
    assert lines[0].strip() == "0,0"
    assert lines[1].strip() == "0,1 1,0"
    assert lines[8].strip() == "1,7 2,6 3,5 4,4 5,3 6,2 7,1"
    assert lines[14].strip() == "7,7"
    idx = serialize(o, "index")
    rows = [r.split() for r in idx.strip("\n").split("\n")]
    assert [int(v) for v in rows[0]] == [0, 1, 2, 3, 4, 5, 6, 7]
    assert [int(v) for v in rows[7]] == [7, 8, 9, 10, 11, 12, 13, 14]


def test_serialize_roundtrip_both_formats():
    o = order_of("zigzag", 5, 4)
    for fmt in ("coordinate", "index"):
        o2 = unserialize(serialize(o, fmt))
        assert o2.limit == o.limit
        np.testing.assert_array_equal(o2.ys, o.ys)
        np.testing.assert_array_equal(o2.xs, o.xs)


def test_coordinate_roundtrip_keeps_trailing_empty_indexes():
    """Only str.split's final-newline artifact may be dropped: every
    newline-terminated blank line is a genuinely empty scan index (the
    reference's getline appends one per blank line) — dropping them
    shrank the limit on -f round trips (round-4 review)."""
    from dspfun_tpu.ops.scan_order import ScanOrder

    per = [([0], [0]), ([1, 0], [0, 1]), ([], [])]
    o = ScanOrder.from_lists(
        [(np.array(y, np.int32), np.array(x, np.int32)) for y, x in per])
    assert o.limit == 3
    text = serialize(o, "coordinate")
    assert text.endswith("\n\n")      # empty final index = blank line
    o2 = unserialize(text)
    assert o2.limit == 3
    y2, x2 = o2.coords(2)
    assert len(y2) == 0
    # an interior empty index survives too
    o3 = unserialize("0,0 \n\n1,1 \n")
    assert o3.limit == 3
    assert len(o3.coords(1)[0]) == 0


def test_row_column_intervals():
    o = order_of("row", 5, 3)
    assert o.limit == 3 and (o.intervals() == 5).all()
    o = order_of("column", 5, 3)
    assert o.limit == 5 and (o.intervals() == 3).all()
    covers_all(o, 5, 3)


def test_box_intervals_square():
    """interval = min(i,w-1) + min(i,h-1) + 1 (scan_methods.c:33-37)."""
    w = h = 6
    o = order_of("box", w, h)
    assert o.limit == max(w, h)
    iv = o.intervals()
    for i in range(o.limit):
        assert iv[i] == min(i, w - 1) + min(i, h - 1) + 1
    covers_all(o, w, h)


def test_ibox_intervals():
    """interval = w + h - 2i, corner counted twice (scan_methods.c:45,135-144)."""
    w, h = 5, 4
    o = order_of("ibox", w, h)
    assert o.limit == min(w, h)
    iv = o.intervals()
    for i in range(o.limit):
        assert iv[i] == w + h - 2 * i
    covers_all(o, w, h)


def test_mirror_limit_and_coverage():
    w, h = 5, 3
    o = order_of("mirror", w, h)
    assert o.limit == max(w, h)
    assert o.intervals()[0] == min(w, h)
    covers_all(o, w, h)
    # index 1 pairs super/sub diagonal walked toward origin
    y, x = o.coords(1)
    assert (x[: min(h, w - 1)] - y[: min(h, w - 1)] == 1).all()


def test_radial_and_iradial():
    o = order_of("radial", 4, 4)
    y, x = o.coords(0)
    assert list(zip(y, x)) == [(0, 0)]
    # (0,1),(1,0) and (1,1) all land at index 1 with rint
    y, x = o.coords(1)
    assert set(zip(y.tolist(), x.tolist())) == {(0, 1), (1, 0), (1, 1)}
    covers_all(o, 4, 4)
    o = order_of("iradial", 4, 4)
    covers_all(o, 4, 4)
    # farthest-corner-first ends at (h-1, w-1)
    y, x = o.coords(o.limit - 1)
    assert (3, 3) in set(zip(y.tolist(), x.tolist()))


def test_magnitude_ordering_and_tie_grouping():
    coeffs = np.zeros((2, 2, 1))
    coeffs[0, 0, 0] = 5.0
    coeffs[0, 1, 0] = 3.0  # *sqrt2 ~ 4.24
    coeffs[1, 0, 0] = 3.0  # tie with above after normalization
    coeffs[1, 1, 0] = 0.5
    o = order_of("magnitude", 2, 2, coeffs=coeffs)
    # descending: (0,0) alone; the two ties: first at its own index,
    # rest grouped one later (reference scan_methods.c:266-274)
    assert list(o.coords(0)[0]) == [0] and list(o.coords(0)[1]) == [0]
    first_tie = set(zip(*[a.tolist() for a in o.coords(1)]))
    # index 2 holds the tie's second member AND the following smaller
    # value, which is assigned before the index advances
    second = set(zip(*[a.tolist() for a in o.coords(2)]))
    assert len(first_tie) == 1 and first_tie < {(0, 1), (1, 0)}
    assert second == ({(0, 1), (1, 0)} - first_tie) | {(1, 1)}
    assert o.limit == 3 and o.total == 4


def test_magnitude_quantized_grouping():
    coeffs = np.zeros((1, 3, 1))
    coeffs[0, 0, 0] = 1.00
    coeffs[0, 1, 0] = 0.705
    coeffs[0, 2, 0] = 0.707  # ~ equal after *sqrt2 & coarse quantization
    o = order_of("magnitude", 3, 1, coeffs=coeffs, args="10")
    assert o.limit <= 3


def test_evalxy():
    o = order_of("evalxy", 4, 4, args="x+y")
    # index d = anti-diagonal number
    for d in range(o.limit):
        y, x = o.coords(d)
        assert ((y + x) == d).all()


def test_evalxy_skips_invalid():
    o = order_of("evalxy", 4, 2, args="if(gt(x,1),x-2,sqrt(0-1))")
    assert o.total == 4  # only x in {2,3} valid


def test_evali():
    o = order_of("evali", 3, 2, args="mod(i,width); floor(i/width)")
    got = list(zip(o.ys.tolist(), o.xs.tolist()))
    assert got == [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]


def test_evali_nan_goes_to_origin():
    o = order_of("evali", 2, 2, args="sqrt(0-1); 0")
    assert (o.xs == 0).all()


def test_random_seeded_reproducible():
    o1 = order_of("random", 4, 4, args="42")
    o2 = order_of("random", 4, 4, args="42")
    np.testing.assert_array_equal(o1.xs, o2.xs)
    covers_all(o1, 4, 4)


# goldens captured from gcc/glibc on this machine (VERDICT r3 item 7):
# srand(seed); rand() stream, and the reference's init_random
# Fisher-Yates (scan_methods.c:210-228) coordinate list for 8x6 seed 42
_GLIBC_RAND_SEED1 = [1804289383, 846930886, 1681692777, 1714636915,
                     1957747793]
_GLIBC_RAND_SEED99 = [988039572, 1878189524, 2021321749, 1433394613,
                      955675569, 1796974800, 458291713, 1457862107]
_FY_8x6_SEED42 = [
    (5, 6), (4, 5), (1, 2), (0, 5), (1, 6), (5, 7), (5, 2), (3, 4),
    (1, 3), (2, 3), (5, 4), (0, 0), (4, 3), (4, 0), (2, 5), (2, 0),
    (5, 1), (2, 1), (0, 2), (2, 6), (0, 7), (3, 3), (0, 1), (3, 1),
    (1, 0), (4, 6), (4, 7), (2, 7), (5, 0), (4, 1), (1, 4), (0, 4),
    (3, 5), (2, 2), (4, 2), (5, 5), (3, 0), (5, 3), (3, 2), (1, 7),
    (3, 6), (3, 7), (0, 3), (2, 4), (4, 4), (1, 1), (1, 5), (0, 6),
]


def test_glibc_rand_stream_matches_glibc():
    from dspfun_tpu.ops.scan_methods import _glibc_rand_stream

    assert _glibc_rand_stream(1, 5) == _GLIBC_RAND_SEED1
    assert _glibc_rand_stream(99, 8) == _GLIBC_RAND_SEED99


def test_random_scan_matches_reference_bytes():
    """Seeded `random` scans reproduce the reference's coordinate list
    byte-exactly (glibc rand + the i > 1 Fisher-Yates quirk)."""
    o = order_of("random", 8, 6, args="42")
    got = list(zip(o.ys.tolist(), o.xs.tolist()))
    assert got == _FY_8x6_SEED42


def test_file_and_precomputed(tmp_path):
    o = order_of("zigzag", 4, 3)
    p = tmp_path / "scan.txt"
    p.write_text(serialize(o, "coordinate"))
    o2 = order_of("file", 4, 3, args=str(p))
    np.testing.assert_array_equal(o2.xs, o.xs)
    with pytest.raises(ValueError):
        order_of("file", 3, 3, args=str(p))  # exceeds width
    o3 = order_of("precomputed", 4, 3, args="zigzag")
    np.testing.assert_array_equal(o3.xs, o.xs)


def test_prefix_find():
    assert sm.find_method_prefix("diag").name == "diagonal"
    assert sm.find_method_prefix("i").name == "ibox"
    assert sm.find_method_prefix("e").name == "evali"
    assert sm.find_method_prefix("zz") is None


def test_inverted():
    o = order_of("diagonal", 3, 3)
    inv = o.inverted()
    assert inv.limit == o.limit
    y0, x0 = inv.coords(0)
    ylast, xlast = o.coords(o.limit - 1)
    np.testing.assert_array_equal(y0, ylast)
    np.testing.assert_array_equal(x0, xlast)
