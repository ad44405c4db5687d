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
    e2 = parse_expr("st(0,x);st(1,ld(0)*ld(0));ld(1)", ("x",))
    assert e2({"x": 4.0}) == 16.0
    # a trailing ';' is a parse error in real av_expr (oracle-pinned),
    # and ';' is legal inside parens/args (eval.c re-enters parse_expr)
    with pytest.raises(ValueError):
        parse_expr("st(0,3);", ())
    assert parse_expr("max((st(0,2); ld(0)), 1)", ())({}) == 2.0


def test_evalue_drop_quirks():
    """eval.c returns from squish/gauss/lerp/taylor/root/print/random/
    randomi WITHOUT applying the e->value multiplier, so a folded sign
    (unary minus, or '-' folded by parse_subexpr into the right term)
    silently drops — oracle-verified in test_expr_oracle.py; pinned
    here so the quirk survives without cv2."""
    assert parse_expr("-lerp(2,10,0.25)", ())({}) == 4.0
    assert parse_expr("1 - lerp(2,10,0.25)", ())({}) == 5.0
    assert parse_expr("1 - 2*lerp(2,10,0.25)", ())({}) == -7.0  # mul multiplies
    assert parse_expr("-sin(0)", ())({}) == 0.0
    assert parse_expr("0 - sqrt(4)", ())({}) == -2.0


def test_single_sign_per_factor():
    # eval.c parse_pow consumes at most one sign; av_strtod absorbs one
    # more only as part of a numeric literal
    assert parse_expr("--5", ())({}) == 5.0
    assert parse_expr("-+5", ())({}) == -5.0
    assert parse_expr("1--5", ())({}) == 6.0
    assert parse_expr("2^--3", ())({}) == 8.0
    with pytest.raises(ValueError):
        parse_expr("---5", ())
    with pytest.raises(ValueError):
        parse_expr("- -lerp(2,10,0.25)", ())


def test_minmax_nan_order():
    # compiled FFMIN/FFMAX: NaN first operand yields the second
    assert parse_expr("min(sqrt(0-1), 4)", ())({}) == 4.0
    assert math.isnan(parse_expr("min(4, sqrt(0-1))", ())({}))
    assert parse_expr("max(sqrt(0-1), 4)", ())({}) == 4.0


def test_clip_double_evaluates_subject():
    e = parse_expr("st(9, clip(st(0, ld(0)+1), 0, 9)); ld(0)", ())
    assert e({}) == 2.0  # subject runs twice when bounds are sane
    e2 = parse_expr("st(9, clip(st(0, ld(0)+1), 2, 1)); ld(0)", ())
    assert e2({}) == 1.0  # bad bounds skip the re-evaluation
    assert math.isnan(parse_expr("clip(1, 2, 1)", ())({}))
    # NaN first subject -> NaN, no re-eval; NaN RE-eval clamps to min
    e3 = parse_expr("st(9, clip(st(0, ld(0)+1)*0 + sqrt(0-1), 0, 9)); ld(0)", ())
    assert e3({}) == 1.0
    assert math.isnan(parse_expr("clip(sqrt(0-1), 0, 9)", ())({}))
    assert parse_expr("clip(sqrt(0-ld(0))*0 + st(0,1)*0 + 5, 0, 9)", ())({}) == 0.0


def test_between_short_circuits_max():
    e = parse_expr("st(9, between(3, 5, st(0,7))); ld(0)", ())
    assert e({}) == 0.0  # max argument skipped when d < min
    e2 = parse_expr("st(9, between(6, 5, st(0,7))); ld(0)", ())
    assert e2({}) == 7.0


def test_div_by_zero_ignores_zero_sign():
    assert parse_expr("(0-2)/(0-0.0)", ())({}) == -math.inf
    assert parse_expr("2/(0-0.0)", ())({}) == math.inf
    assert math.isnan(parse_expr("0/0", ())({}))


def test_rounding_zero_signs_and_gcd_sign():
    assert math.copysign(1, parse_expr("floor(-0.0)", ())({})) == 1
    assert math.copysign(1, parse_expr("trunc(-0.4)", ())({})) == 1
    assert math.copysign(1, parse_expr("round(-0.4)", ())({})) == -1
    assert parse_expr("gcd(0-2, 0)", ())({}) == -2.0
    assert parse_expr("gcd(0-12, 18)", ())({}) == 6.0
    assert parse_expr("sgn(sqrt(0-1))", ())({}) == 0.0
    assert math.isnan(parse_expr("bitand(sqrt(0-1), 3)", ())({}))


def test_inf_nan_literals():
    assert parse_expr("inf", ())({}) == math.inf
    assert parse_expr("isnan(nan)", ())({}) == 1.0
    assert parse_expr("Infinity", ())({}) == math.inf


def test_round_is_half_away_from_zero():
    """C round() (what av_expr binds) rounds halves away from zero;
    numpy's half-even gave round(0.5)=0 and round(2.5)=2 — different
    scan orders / coefficients than the reference (round-4 review)."""
    e = parse_expr("round(x)", ("x",))
    for v, want in [(0.5, 1.0), (2.5, 3.0), (-0.5, -1.0), (-2.5, -3.0),
                    (1.4, 1.0), (-1.6, -2.0),
                    # the half test must be EXACT (libm round): the
                    # nextafter(0.5, 0) value is below one half, but
                    # floor(|x|+0.5) rounds it up through the inexact
                    # sum (round-5 oracle probe)
                    (0.49999999999999994, 0.0),
                    (-0.49999999999999994, -0.0),
                    (0.9999999999999999, 1.0),
                    (4503599627370495.5, 4503599627370496.0),
                    (math.inf, math.inf), (-math.inf, -math.inf)]:
        got = float(e({"x": v}))
        assert got == want and math.copysign(1, got) == math.copysign(1, want), (v, want, got)
    assert math.isnan(e({"x": math.nan}))
    # grid (vectorised) path agrees
    import numpy as np
    grid = np.asarray([0.49999999999999994, 0.5, -2.5, 1.4])
    np.testing.assert_array_equal(e({"x": grid}), [0.0, 1.0, -3.0, 1.0])


def test_sgn_is_the_ffdiffsign_macro():
    """eval.c e_sgn is FFDIFFSIGN(eval_expr(p, param), 0) — a macro
    that expands its argument twice: side effects fire twice, and the
    first evaluation feeds '>' while the second feeds '<' (st-counter
    probed against real libavutil, round 5)."""
    # counter crosses zero between the two evaluations
    assert parse_expr("st(0,-9); sgn(st(0, ld(0)+6))", ())({}) == 0.0
    assert parse_expr("st(0,3); sgn(st(0, ld(0)-6))", ())({}) == -1.0
    # both evaluations happened: the slot advanced twice
    assert parse_expr("st(0,0); sgn(st(0, ld(0)+1)); ld(0)", ())({}) == 2.0
    # pure arguments keep ordinary sign semantics
    for v, want in [(5.0, 1.0), (-5.0, -1.0), (0.0, 0.0), (-0.0, 0.0),
                    (math.inf, 1.0), (-math.inf, -1.0), (math.nan, 0.0)]:
        assert parse_expr("sgn(x)", ("x",))({"x": v}) == want, v


def test_bitops_inf_operands_are_not_nan():
    """eval.c tests isnan on each OPERAND — inf & -inf saturates both
    sides to INT64_MIN (x86 cvttsd2si) rather than returning NaN
    (an isnan(a+b) shortcut fired on inf + (-inf); round-5 probe)."""
    imin = float(-(1 << 63))
    assert parse_expr("bitand(1/0, 0-1/0)", ())({}) == imin
    assert parse_expr("bitor(1/0, 0-1/0)", ())({}) == imin
    assert math.isnan(parse_expr("bitand(sqrt(0-1), 1/0)", ())({}))


def test_bitops_jitted_path_is_64_bit():
    """The vectorised jax path runs without x64, where astype("int64")
    silently truncates to int32 — bitand(2^40, -1) lost its top bits
    and bitor(-8, 0) returned 0 through a rounded low limb.  The limb
    form keeps full 64-bit semantics; results round once to f32
    (1 ulp above 2^24 — the path's inherent width)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    cases = [
        ("bitand(x, 0-1)", 2.0 ** 40, 2.0 ** 40),
        ("bitand(x, 0-1)", -(2.0 ** 40), -(2.0 ** 40)),
        ("bitor(x, 0)", -8.0, -8.0),
        ("bitand(x, 255)", 170.0, 170.0),
        ("bitor(x, 16)", -(2.0 ** 40) + 2.0 ** 20,
         float(np.float32(-(2.0 ** 40) + 2.0 ** 20 + 16))),
        ("bitand(x, 0-1)", 2.0 ** 62, 2.0 ** 62),
        ("bitand(x, 0-1)", 2.0 ** 31, 2.0 ** 31),
        ("bitor(x, 0)", -(2.0 ** 31), -(2.0 ** 31)),
        ("bitand(1/0, 0-1/0)", 0.0, float(np.float32(-(2.0 ** 63)))),
        ("gcd(x, 18)", -12.0, 6.0),
    ]
    for src, x, want in cases:
        e = parse_expr(src, ("x",))
        got = float(jax.jit(lambda v, e=e: e({"x": v}, jnp))(jnp.float32(x)))
        assert got == want, (src, x, got, want)
    # NaN operands still propagate on the jitted path
    e = parse_expr("bitand(x, 3)", ("x",))
    assert math.isnan(float(jax.jit(
        lambda v: e({"x": v}, jnp))(jnp.float32(math.nan))))


# ---- stateful / iterative av_expr forms (round-5: VERDICT item 6) ----
#
# Semantics pinned against ffmpeg eval.c (e_random / e_while / e_root /
# e_taylor) and the ffmpeg-utils documentation; the reference links the
# full av_expr for motion --eval (motion/motion.c:463-469), zoom
# animation (zoom/zoom.c:221-228) and scan evalxy/evali
# (scan/scan_methods.c:333-391).

_U64 = (1 << 64) - 1


def _sfc64_stream(seed: int, n: int):
    """Modern eval.c e_random (FFmpeg >= 6.1): a per-slot sfc64
    generator seeded from the var slot on first use — pinned bit-exactly
    against real libavutil in tests/test_expr_oracle.py."""
    from dspfun_tpu.core.expr import _sfc64_get, _sfc64_init

    s = _sfc64_init(seed)
    return [_sfc64_get(s) * (1.0 / _U64) for _ in range(n)]


def test_random_matches_eval_c_sfc64():
    e = parse_expr("random(0)", ())
    got = [e({}) for _ in range(6)]
    np.testing.assert_array_equal(got, _sfc64_stream(0, 6))
    # first draw is the oracle-verified value (real libavutil 60)
    assert got[0] == 0.22973061583233934


def test_random_seeded_via_st():
    e = parse_expr("st(0, 42); random(0)", ())
    got = e({})
    assert got == _sfc64_stream(42, 1)[0] == 0.5200791385896834
    # slots persist across evaluations of the same parsed Expr, as
    # eval.c keeps them in AVExpr->var — reset restarts the stream
    e2 = parse_expr("random(3)", ())
    s1 = [e2({}) for _ in range(4)]
    e2.reset_state()
    s2 = [e2({}) for _ in range(4)]
    assert s1 == s2 == _sfc64_stream(0, 4)


def test_randomi_range():
    e = parse_expr("randomi(0, -4, 4)", ())
    # min + (max-min) * draw/UINT64_MAX, oracle-verified
    assert e({}) == -2.1621550733412853


def test_random_over_grid_is_raster_order():
    e = parse_expr("x*0 + random(0)", ("x",))
    out = e({"x": np.zeros((2, 3))})
    np.testing.assert_array_equal(out.ravel(), _sfc64_stream(0, 6))


def test_random_rejects_vectorised_jax_path():
    import jax.numpy as jnp

    e = parse_expr("random(0)", ())
    assert e.stateful
    with pytest.raises(ValueError, match="host_eval_in_jit"):
        e({}, xp=jnp)


def test_while_loop_and_never_true():
    # counts ld(0) up to 5; while returns the last body value
    e = parse_expr("st(0,0); while(lt(ld(0),5), st(0, ld(0)+1))", ())
    assert e({}) == 5.0
    # a condition that never holds yields NaN (eval.c: double d = NAN)
    assert math.isnan(parse_expr("while(0, 1)", ())({}))


def test_root_ffmpeg_doc_example():
    # ffmpeg-utils doc: root(sin(ld(0))-6+ld(0), 100) solves sin(x)+x=6
    r = float(parse_expr("root(sin(ld(0))-6+ld(0), 100)", ())({}))
    assert abs(math.sin(r) + r - 6.0) < 1e-9
    # root() scans ld(0); slot 0 is restored afterwards
    e = parse_expr("st(0, 7); root(ld(0)-1, 2) + ld(0)", ())
    assert e({}) == pytest.approx(8.0, abs=1e-9)


def test_taylor_exp():
    # all derivatives 1 => sum x^n/n! = e^x
    assert parse_expr("taylor(1, 1)", ())({}) == pytest.approx(math.e, rel=1e-12)
    assert parse_expr("taylor(1, 0.5)", ())({}) == pytest.approx(
        math.exp(0.5), rel=1e-12)
    # explicit slot id: expr may read the term index from ld(id)
    e = parse_expr("taylor(if(eq(mod(ld(2),4),1),1,if(eq(mod(ld(2),4),3),-1,0)), x, 2)",
                   ("x",))
    assert e({"x": 1.2}) == pytest.approx(math.sin(1.2), rel=1e-9)


def test_print_returns_value_and_writes_stderr(capsys):
    e = parse_expr("print(3+4)", ())
    assert e({}) == 7.0
    assert "7.0" in capsys.readouterr().err


def test_if_is_lazy_on_host_scalar_path():
    # eval.c evaluates only the taken branch: the st() in the untaken
    # branch must not fire (observable through the stateful path)
    e = parse_expr("if(0, st(1, 99), 5) + ld(1) + random(9)*0", ())
    assert e({}) == 5.0


def test_host_eval_in_jit_state_and_order():
    import jax
    import jax.numpy as jnp

    from dspfun_tpu.core.expr import host_eval_in_jit

    e = parse_expr("x*0 + random(0)", ("x",))

    @jax.jit
    def step(x):
        return host_eval_in_jit(e, {"x": x}, x.shape, jnp.float32)

    a = np.asarray(step(jnp.zeros((2, 2), jnp.float32)))
    b = np.asarray(step(jnp.zeros((2, 2), jnp.float32)))
    want = np.asarray(_sfc64_stream(0, 8), np.float32).reshape(2, 2, 2)
    np.testing.assert_array_equal(a, want[0])
    np.testing.assert_array_equal(b, want[1])


def test_fresh_parse_restarts_stream_even_on_jit_cache_hit():
    """A second CLI invocation parses a fresh Expr but hits the jit
    cache (params hash by expr source): the compiled io_callback must
    evaluate through the CURRENT parse, not the first run's object —
    reference semantics are a fresh AVExpr->var per parse (round-5
    review finding: the stream continued across runs)."""
    import jax
    import jax.numpy as jnp

    from dspfun_tpu.core.expr import host_eval_in_jit

    def run():
        e = parse_expr("x*0 + random(0)", ("x",))  # fresh parse per run

        @jax.jit
        def step(x):
            return host_eval_in_jit(e, {"x": x}, x.shape, jnp.float32)

        return np.asarray(step(jnp.zeros((2, 2), jnp.float32)))

    np.testing.assert_array_equal(run(), run())


def test_time_is_read_at_run_time_not_trace_time():
    import time as pytime

    import jax
    import jax.numpy as jnp

    from dspfun_tpu.core.expr import host_eval_in_jit

    e = parse_expr("time(0) + x*0", ("x",))
    assert e.stateful  # time must route through the host callback

    @jax.jit
    def step(x):
        return host_eval_in_jit(e, {"x": x}, x.shape, jnp.float64)

    a = float(np.asarray(step(jnp.zeros((), jnp.float64))))
    pytime.sleep(0.05)
    b = float(np.asarray(step(jnp.zeros((), jnp.float64))))
    assert b > a  # a trace-time constant would repeat exactly


def test_dynamic_st_ld_slot_index():
    # eval.c evaluates the slot index as an expression (av_clip 0..9)
    assert parse_expr("st(1+1, 42); ld(2)", ())({}) == 42.0
    assert parse_expr("st(99, 7); ld(9)", ())({}) == 7.0  # clipped to 9
