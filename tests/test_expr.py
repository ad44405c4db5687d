import math

import numpy as np
import pytest

from dspfun_tpu.core.expr import parse_expr


def ev(src, **vars_):
    e = parse_expr(src, tuple(vars_.keys()))
    return e(vars_)


def test_arithmetic_precedence():
    assert ev("1+2*3") == 7
    assert ev("(1+2)*3") == 9
    assert ev("2^3^2") == 64  # left-assoc, as in ffmpeg eval.c
    assert ev("-2^2") == -4  # unary sign binds looser than '^'
    assert ev("2^-1") == 0.5
    assert ev("7/2") == 3.5


def test_variables_and_consts():
    assert ev("x*y+1", x=2.0, y=3.0) == 7.0
    assert ev("PI") == pytest.approx(math.pi)


def test_functions():
    assert ev("mod(7,3)") == 1.0
    assert ev("if(gt(2,1), 10, 20)") == 10.0
    assert ev("if(gt(1,2), 10, 20)") == 20.0
    assert ev("ifnot(0, 5)") == 5.0
    assert ev("clip(5, 0, 3)") == 3.0
    assert ev("between(2, 1, 3)") == 1.0
    assert ev("bitand(6, 3)") == 2.0
    assert ev("not(0)") == 1.0
    assert ev("max(min(5,3), 1)") == 3.0
    assert ev("hypot(3,4)") == 5.0
    assert ev("sqrt(abs(-16))") == 4.0
    assert ev("sgn(-3)") == -1.0


def test_st_ld():
    assert ev("st(0, 6) + ld(0)") == 12.0


def test_vectorized_over_grids():
    x = np.arange(8, dtype=np.float64)
    y = ev("mod(x, 3) + gt(x, 4)", x=x)
    want = np.mod(x, 3) + (x > 4)
    np.testing.assert_allclose(y, want)


def test_jax_backend():
    import jax.numpy as jnp

    e = parse_expr("c*0.5 + eq(x, 0)", ("c", "x"))
    c = jnp.arange(4, dtype=jnp.float32)
    x = jnp.array([0, 1, 0, 1], dtype=jnp.float32)
    out = np.asarray(e({"c": c, "x": x}, xp=jnp))
    np.testing.assert_allclose(out, np.arange(4) * 0.5 + np.array([1, 0, 1, 0]))


def test_errors():
    with pytest.raises(ValueError):
        parse_expr("bogusfn(1)", ())(dict())
    with pytest.raises(ValueError):
        parse_expr("1 +", ())
    with pytest.raises(ValueError):
        parse_expr("unknownvar", ())


def test_mod_is_floor_based_like_av_expr():
    """ffmpeg eval.c's mod is a - floor(a/b)*b, not C fmod: the results
    differ for negative operands."""
    e = parse_expr("mod(x, 3)", ("x",))
    assert e({"x": -1.0}) == 2.0           # fmod would give -1
    assert e({"x": 7.0}) == 1.0
    import numpy as np

    x = np.array([-5.0, -1.0, 0.0, 4.0])
    np.testing.assert_allclose(e({"x": x}), np.mod(x, 3))


def test_gcd():
    e = parse_expr("gcd(x, 18)", ("x",))
    assert e({"x": 12.0}) == 6.0


def test_semicolon_sequences_with_st_ld():
    """av_expr's ';' separator: expressions evaluate in order, the last
    value is the result (the st()/ld() idiom)."""
    e = parse_expr("st(0, x*2); ld(0) + 1", ("x",))
    assert e({"x": 3.0}) == 7.0
    e2 = parse_expr("st(0,x);st(1,ld(0)*ld(0));ld(1);", ("x",))
    assert e2({"x": 4.0}) == 16.0


def test_round_is_half_away_from_zero():
    """C round() (what av_expr binds) rounds halves away from zero;
    numpy's half-even gave round(0.5)=0 and round(2.5)=2 — different
    scan orders / coefficients than the reference (round-4 review)."""
    e = parse_expr("round(x)", ("x",))
    for v, want in [(0.5, 1.0), (2.5, 3.0), (-0.5, -1.0), (-2.5, -3.0),
                    (1.4, 1.0), (-1.6, -2.0)]:
        assert e({"x": v}) == want, (v, want)
