"""Cross-validation of core/expr against REAL FFmpeg av_expr.

cv2 bundles a real libavutil (the only real FFmpeg in this
environment); its exported ``av_expr_parse``/``av_expr_eval`` are the
exact evaluator the reference links for motion --eval
(motion/motion.c:463-469), zoom animation (zoom/zoom.c:221-228) and
scan evalxy/evali (scan/scan_methods.c:333-391).  Self-tests cannot
catch a mirrored deviation; this oracle can (same pattern as
tests/test_interop_cv2.py for FFV1/NUT).

The stateful forms (random/randomi sfc64 streams, root's probe
schedule, taylor's accumulation order) are asserted BIT-exactly —
they are pure integer/double arithmetic with no libm slack.
"""

from __future__ import annotations

import ctypes
import glob
import math
import os

import pytest

from dspfun_tpu.core.expr import parse_expr


def _load_avutil():
    try:
        import cv2  # noqa: PLC0415
    except Exception:
        return None
    roots = [os.path.dirname(cv2.__file__),
             os.path.join(os.path.dirname(os.path.dirname(cv2.__file__)),
                          "opencv_python.libs")]
    for root in roots:
        for lib in sorted(glob.glob(os.path.join(root, "libavutil*.so*"))):
            try:
                return ctypes.CDLL(lib)
            except OSError:
                continue
    return None


_AV = _load_avutil()
pytestmark = pytest.mark.skipif(
    _AV is None, reason="no bundled libavutil (cv2) to act as oracle")

if _AV is not None:
    _AV.av_expr_parse.restype = ctypes.c_int
    _AV.av_expr_parse.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p]
    _AV.av_expr_eval.restype = ctypes.c_double
    _AV.av_expr_eval.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_double),
                                 ctypes.c_void_p]
    _AV.av_expr_free.restype = None
    _AV.av_expr_free.argtypes = [ctypes.c_void_p]


class OracleExpr:
    """A parsed real-av_expr with persistent state (AVExpr->var), the
    exact analogue of one parsed ``Expr``."""

    def __init__(self, source: str, var_names: tuple[str, ...] = ()):
        self.var_names = tuple(var_names)
        names = (ctypes.c_char_p * (len(var_names) + 1))(
            *[v.encode() for v in var_names], None)
        self._e = ctypes.c_void_p()
        nullp = ctypes.POINTER(ctypes.c_char_p)()
        rc = _AV.av_expr_parse(ctypes.byref(self._e), source.encode(),
                               names, nullp, None, nullp, None, 0, None)
        if rc < 0:
            raise ValueError(f"oracle parse failed ({rc}): {source!r}")

    def __call__(self, **vals) -> float:
        arr = (ctypes.c_double * max(1, len(self.var_names)))(
            *[float(vals.get(v, 0.0)) for v in self.var_names])
        return float(_AV.av_expr_eval(self._e, arr, None))

    def __del__(self):
        if getattr(self, "_e", None) and _AV is not None:
            _AV.av_expr_free(self._e)


def both(source: str, var_names=(), **vals):
    ours = parse_expr(source, var_names)(dict(vals) or {})
    oracle = OracleExpr(source, var_names)(**vals)
    return float(ours), oracle


# ---- elementwise / arithmetic surface --------------------------------

ELEMENTWISE = [
    "1+2*3-4/8", "-2^2", "2^-2", "-3^-2", "(1+2)^(1+1)",
    "mod(-7,3)", "mod(7,-3)", "mod(7.5,2)",
    "round(0.5)+round(2.5)+round(-0.5)",
    "trunc(-1.7)+ceil(-1.2)+floor(-1.2)",
    "gcd(12,18)", "gcd(-12,18)", "bitand(12,10)", "bitor(12,10)",
    "max(2,3)*min(2,3)", "hypot(3,4)",
    "eq(1,1)+gte(2,2)+gt(2,2)+lte(1,2)+lt(2,1)+not(0)",
    "between(2,1,3)+between(5,1,3)", "clip(7,1,3)",
    "lerp(2,10,0.25)", "squish(1)", "gauss(1)",
    "isnan(sqrt(-1))+isinf(1/0)",
    "if(1,2,3)+if(0,2,3)+ifnot(0,5)",
    "st(0,3); ld(0)*ld(0)",
    "st(1+1, 42); ld(2)",          # dynamic slot index
    "sin(1)+cos(1)+tan(0.5)", "atan2(1,2)", "sinh(1)+cosh(1)+tanh(1)",
    "exp(1)+log(2)", "pow(2,10)", "sqrt(2)", "abs(-3)+sgn(-3)+sgn(0)",
    "PI+E+PHI",
    "taylor(1, 1)", "taylor(1, 0.5)", "taylor(1, -2)",
    "st(0,0); while(lt(ld(0),5), st(0, ld(0)+1))",
    "while(0, 7)",
]


@pytest.mark.parametrize("src", ELEMENTWISE)
def test_elementwise_matches_real_av_expr(src):
    ours, oracle = both(src)
    if math.isnan(oracle):
        assert math.isnan(ours), (src, ours, oracle)
    else:
        assert ours == pytest.approx(oracle, rel=1e-12, abs=0.0), src


SUFFIXES = ["2k", "2K", "2Ki", "1M", "1Mi", "3m", "5u", "1G", "1Gi",
            "1B", "8B", "2kB", "1h", "1c", "1d", "2E", "1y", "1Y",
            "0x10", "0xff", "1e3k", ".5k", "7n", "2T", "4Pi", "1z"]


@pytest.mark.parametrize("src", SUFFIXES)
def test_av_strtod_suffixes_bit_exact(src):
    # number parsing rides av_strtod in the reference: SI prefixes,
    # binary 'i' variants, trailing 'B', hex — including the pow()
    # rounding (5u = 5*pow(10,-6), one ulp off strtod("5e-6"))
    ours, oracle = both(src)
    assert ours == oracle, src


def test_av_strtod_invalid_suffix_is_error_both_sides():
    with pytest.raises(ValueError):
        parse_expr("2i", ())  # 'i' alone is not a suffix
    with pytest.raises(ValueError):
        OracleExpr("2i")


def test_variables_match():
    for x in (-2.5, 0.0, 0.3, 7.0):
        ours, oracle = both("x^2 + 3*x - sin(x)", ("x",), x=x)
        assert ours == pytest.approx(oracle, rel=1e-12)


# ---- random / randomi: sfc64 streams ---------------------------------

def test_random_stream_bit_exact():
    ours = parse_expr("random(0)", ())
    oracle = OracleExpr("random(0)")
    assert [ours({}) for _ in range(32)] == [oracle() for _ in range(32)]


def test_random_seed_casts_bit_exact():
    # double->uint64 seeding edge cases (negative wraps, 1e300 -> 0)
    for seed in ("42", "0-5", "1e300", "sqrt(0-1)", "3.9"):
        src = f"st(4, {seed}); random(4)"
        ours = parse_expr(src, ())
        oracle = OracleExpr(src)
        assert [ours({}) for _ in range(4)] == [oracle() for _ in range(4)], seed


def test_randomi_stream_bit_exact():
    src = "randomi(2, -8, 8)"
    ours = parse_expr(src, ())
    oracle = OracleExpr(src)
    assert [ours({}) for _ in range(16)] == [oracle() for _ in range(16)]


def test_random_slot_stores_raw_draw():
    src = "st(9, random(3)); ld(3)"
    ours, oracle = both(src)
    assert ours == oracle


def test_st_rearms_the_slot_generator():
    # writing a slot re-seeds its generator; the random() store-back
    # does NOT (the stream continues) — both oracle-pinned
    src = "st(9, random(0)); st(0, 42); ld(9)"
    ours = parse_expr(src, ())
    oracle = OracleExpr(src)
    assert [ours({}) for _ in range(4)] == [oracle() for _ in range(4)]


def test_st_on_other_slot_does_not_reset():
    src = "st(9, 1); random(0)"
    ours = parse_expr(src, ())
    oracle = OracleExpr(src)
    assert [ours({}) for _ in range(4)] == [oracle() for _ in range(4)]


def test_division_by_zero_matches():
    ours, oracle = both("mod(7,0)")
    assert math.isnan(ours) and math.isnan(oracle)
    ours, oracle = both("1/0")
    assert ours == oracle == math.inf


# ---- eval.c quirk pins (each reverse-engineered with st-counter or
# ---- sign probes against the real evaluator) --------------------------

QUIRKS = [
    # e->value is IGNORED by squish/gauss/lerp/taylor/root/print/
    # random/randomi: a folded '-' (unary or subtraction) drops
    "(-lerp(2,10,0.25))", "(1 - lerp(2,10,0.25))", "(-squish(1))",
    "(-gauss(1))", "(-taylor(2,1))", "(0 - root(ld(0)-1, 2))",
    "(2 ^ (-squish(1)))", "((-taylor(2,1)) ^ 2)",
    # ...but everything else multiplies it
    "(-sin(1))", "(1 - clip(7,1,3))", "(-(1;7))", "(0 - floor(-0.0))",
    # compiled FFMIN/FFMAX: NaN first operand yields the second,
    # NaN second operand yields NaN
    "min(sqrt(0-1), 4)", "min(4, sqrt(0-1))", "max(sqrt(0-1), 4)",
    "max(4, sqrt(0-1))",
    # clip: subject evaluated BEFORE the bounds and then a SECOND
    # time for the value; NaN/inverted bounds give NaN and skip the
    # re-evaluation
    "st(9, clip(st(0, ld(0)+1), 0, 9)); ld(0)",
    "st(9, clip(st(0, ld(0)+1), 2, 1)); ld(0)",
    "clip(st(0, ld(0)+1), 0, 9)",
    "clip(0, -0.0, 1)", "clip(7, 1, 3)", "clip(7, 3, 1)",
    "clip(1, sqrt(0-1), 3)",
    # a NaN FIRST subject evaluation returns NaN and skips the
    # re-evaluation; a NaN RE-evaluation clamps to min (compiled
    # av_clipd = FFMIN(FFMAX(..)) with minsd/maxsd NaN order)
    "clip(sqrt(0-1), 0, 9)",
    "st(9, clip(st(0, ld(0)+1)*0 + sqrt(0-1), 0, 9)); ld(0)",
    "clip(sqrt(0-ld(0))*0 + st(0,1)*0 + 5, 0, 9)",
    # between: C's && short-circuits the max argument
    "st(9, between(3, 5, st(0,7))); ld(0)",
    "st(9, between(6, 5, st(0,7))); ld(0)",
    # division: a zero divisor of either sign gives d * +INFINITY
    "(0-2)/(0-0.0)", "2/(0-0.0)", "0/0",
    # floor/ceil/trunc normalise -0.0 to +0.0; round keeps the sign
    "sgn(1/floor(-0.0))", "sgn(1/ceil(-0.0))", "sgn(1/trunc(-0.4))",
    "sgn(1/round(-0.4))",
    # gcd is av_gcd: sign kept when one operand is 0
    "gcd(0-2, 0)", "gcd(0, 0-3)", "gcd(0-12, 18)", "gcd(1.9, -0.0)",
    # sgn is comparison-based: sgn(NaN) is 0.  It is also the
    # FFDIFFSIGN macro, which expands eval_expr TWICE: side effects
    # fire twice, the first evaluation feeds '>' and the second '<'
    # (a counter crossing zero between them returns 0 or -1 where
    # single-eval sgn says +1)
    "sgn(sqrt(0-1))",
    "st(0,0); sgn(st(0, ld(0)+1)); ld(0)",
    "st(0,-9); sgn(st(0, ld(0)+6))",
    "st(0,3); sgn(st(0, ld(0)-6))",
    # bitand/bitor: NaN operand -> NaN; casts saturate like x86
    # cvttsd2si (out-of-range -> INT64_MIN).  inf + (-inf) is NOT NaN
    # to eval.c (it tests the operands, so inf&-inf is the saturated
    # INT64_MIN & INT64_MIN — an isnan(a+b) shortcut got this wrong)
    "bitand(sqrt(0-1), 3)", "bitor(1/0, 1)", "bitand(1e300, 0-1)",
    "bitand(1/0, 0-1/0)", "bitor(1/0, 0-1/0)",
    # round is libm round(): the exact half test, not floor(|x|+0.5)
    # (whose inexact +0.5 rounded 0.49999999999999994 up to 1)
    "round(0.49999999999999994)", "round(0-0.49999999999999994)",
    "round(0.9999999999999999)", "round(4503599627370495.5)",
    # strtod literals: inf/nan (any case) and one extra sign
    "inf", "0-inf", "isnan(nan)", "Infinity*2", "--5", "-+5", "1--5",
    "2^--3",
]


@pytest.mark.parametrize("src", QUIRKS)
def test_evaluator_quirks_match_oracle(src):
    ours = parse_expr(src, ())({})
    oracle = OracleExpr(src)()
    if math.isnan(oracle):
        assert math.isnan(ours), (src, ours, oracle)
    else:
        assert float(ours) == oracle, src


# ---- grammar-driven differential fuzz ---------------------------------

UNARY_F = ("sin cos tan sinh cosh tanh exp log sqrt abs sgn floor ceil "
           "trunc round not isnan isinf squish gauss").split()
BINARY_F = ("atan2 pow mod gcd max min hypot eq gte gt lte lt bitand "
            "bitor").split()
TERNARY_F = "between clip lerp".split()


_ATOMS = ["0", "1", "2", "3", "7", "0.5", "-1.5", "2.5",
          "1e2", "0.1", "PI", "E", "100", "1e-3"]
# extreme atoms for the second fuzz round: infinities, NaN, signed
# zero, int64-saturating magnitudes, and the exact-half-test value —
# this pool found the bitand(inf,-inf) and round(nextafter(0.5,0))
# divergences the tame pool could not reach
_ATOMS_EXTREME = _ATOMS + [
    "1/0", "-1/0", "sqrt(-1)", "-0.0", "0.49999999999999994",
    "1e300", "-1e300", "9.3e18", "-9.3e18", "1e18", "0.3"]


def _gen(r, depth: int, atoms=_ATOMS) -> str:
    """A random av_expr program: every draw is a valid parse on both
    sides, covering operator folding, cross-argument st/ld state,
    short-circuits and NaN/inf propagation."""
    if depth <= 0:
        k = r.random()
        if k < 0.35:
            return r.choice(atoms)
        if k < 0.75:
            return "x"
        return f"ld({r.randrange(3)})"
    k = r.random()
    d = depth - 1

    def g(dd=None):
        return _gen(r, d if dd is None else dd, atoms)

    if k < 0.18:
        return f"({g()} {r.choice('+-*/')} {g()})"
    if k < 0.24:
        return f"(-{g()})"
    if k < 0.30:
        return f"({g()} ^ {g()})"
    if k < 0.48:
        return f"{r.choice(UNARY_F)}({g()})"
    if k < 0.66:
        return f"{r.choice(BINARY_F)}({g()}, {g()})"
    if k < 0.74:
        return f"{r.choice(TERNARY_F)}({g()}, {g()}, {g()})"
    if k < 0.80:
        return f"if({g()}, {g()}, {g()})"
    if k < 0.84:
        return f"ifnot({g()}, {g()})"
    if k < 0.90:
        return f"st({r.randrange(3)}, {g()})"
    if k < 0.94:
        return f"(st({r.randrange(3)}, {g()}); {g()})"
    if k < 0.97:
        # the derivative argument re-evaluates up to 1000 times per
        # taylor, and _gen(r, 1) could draw taylor AGAIN (it re-enters
        # depth 1) — a self-nesting chain multiplies cost ~1000x per
        # level and a depth-3 chain is a practical hang (hit in a
        # 6000-program offline run).  Depth 0 keeps the interesting
        # ld()-derivative coverage with O(1) bodies.
        return f"taylor({g(0)}, {g()})"
    # slot 3 is reserved as the loop counter (an inner st(3,..) from
    # the st production cannot reach it — it draws slots 0-2 — and a
    # nested while terminates: its own counter pass leaves ld(3)=4)
    return f"(st(3,0); while(lt(ld(3), 4), st(3, ld(3)+1) + {g(1)}))"


def _close(a: float, b: float) -> bool:
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    if math.isinf(a) or math.isinf(b):
        return a == b
    return a == b or abs(a - b) <= 1e-9 * max(abs(a), abs(b)) or abs(a - b) < 1e-12


def _run_differential_fuzz(seed, n, atoms, xs):
    import random as pyrandom

    r = pyrandom.Random(seed)
    for i in range(n):
        src = _gen(r, r.randrange(2, 5), atoms)
        try:
            ours = parse_expr(src, ("x",))
        except ValueError:
            with pytest.raises(ValueError):
                OracleExpr(src, ("x",))
            continue
        oracle = OracleExpr(src, ("x",))
        chaotic = False
        for k, x in enumerate(xs):
            a = float(ours({"x": x}))
            b = oracle(x=x)
            if not _close(a, b):
                # the engines use different libms (numpy vs glibc);
                # an ill-conditioned point (mod with a tiny divisor,
                # tan near a pole) amplifies 1-ulp input differences
                # arbitrarily.  Replay the prefix on a FRESH oracle
                # with the point perturbed by 1 ulp — if the oracle
                # itself moves by more than the tolerance, the point
                # is chaotic, not a semantic divergence.
                o2 = OracleExpr(src, ("x",))
                for xp_ in xs[:k]:
                    o2(x=xp_)
                pert = x * (1 + 2**-52) + (2**-1022 if x == 0 else 0)
                b2 = o2(x=x if math.isnan(x) else pert)
                if not _close(b, b2):
                    chaotic = True
                    continue
                assert False, (i, src, x, a, b)
        if not ours.stateful and not chaotic:
            # the VECTORISED path (fresh parse, fresh oracle): a grid
            # evaluation must equal per-point sequential oracle calls —
            # exercises the masked clip/between/if machinery
            import numpy as np

            grid = np.asarray(xs).reshape(2, -1)
            got = np.asarray(parse_expr(src, ("x",))({"x": grid}),
                             dtype=np.float64).ravel()
            o2 = OracleExpr(src, ("x",))
            want = [o2(x=x) for x in xs]
            for a, b, x in zip(got.tolist(), want, xs):
                assert _close(a, b), ("grid", i, src, x, a, b)


def test_differential_fuzz_vs_real_av_expr():
    """400 random programs, each evaluated 6 times sequentially on both
    engines (slot/prng state persists across calls on both sides, as in
    the reference's per-coefficient loops).  This fuzz found every
    quirk in QUIRKS above before it went green."""
    _run_differential_fuzz(20260819, 400, _ATOMS,
                           (-2.5, -1.0, 0.0, 0.3, 1.0, 7.25))


def test_differential_fuzz_extreme_atoms():
    """Second fuzz round over the extreme atom pool (inf/NaN/signed
    zero/int64-saturating magnitudes) and extreme evaluation points —
    found the bitand(inf,-inf) false-NaN and the inexact round()
    half test (round-5); a 6000-program offline run of this generator
    is clean."""
    _run_differential_fuzz(555, 250, _ATOMS_EXTREME,
                           (-2.5, 0.0, 7.25, math.inf, -math.inf,
                            math.nan, 1e300, -0.0))


# ---- parser shape: arity, ';' placement ------------------------------

BAD_PARSES = [
    "sin(1,2)",          # 1-arg function given 2
    "pow(2)",            # 2-arg function given 1
    "if(1)",             # if needs 2..3
    "if(1,2,3,4)",
    "clip(1,2)",         # 3-arg exact
    "taylor(1)",         # 2..3
    "print(1,2,3,4)",    # print parses at most 3
    "nosuchfn(1)",
    "st(0,3);",          # trailing ';' is a parse error in eval.c
    "(1;)",
]

GOOD_PARSES = [
    "if(1,2)", "if(1,2,3)", "taylor(1,1,0)", "print(2)", "print(2,16)",
    "print(2,16,0)",
    "max((st(0,2); ld(0)), 1)",   # ';' re-enters parse_expr inside args
    "(st(0,5); ld(0)) * 2",
]


@pytest.mark.parametrize("src", BAD_PARSES)
def test_arity_and_separator_errors_match_oracle(src):
    with pytest.raises(ValueError):
        OracleExpr(src)
    with pytest.raises(ValueError):
        parse_expr(src, ())


@pytest.mark.parametrize("src", GOOD_PARSES)
def test_valid_shapes_evaluate_identically(src):
    ours, oracle = both(src)
    assert ours == oracle, src


# ---- root: eval.c probe schedule, bit-exact --------------------------

ROOTS = [
    ("ld(0)-7.25", 10), ("ld(0)+5", 10), ("ld(0)+10.6", 10),
    ("(ld(0)+3)*(ld(0)+17)", 10), ("(ld(0)-1)*(ld(0)-6)", 10),
    ("sin(ld(0))+2", 10), ("sin(ld(0))-6+ld(0)", 100),
    ("exp(ld(0))-0.001", 10), ("ld(0)*ld(0)+1", 10),
    ("ld(0)*ld(0)-4", 10), ("0-ld(0)-5", 10),
    ("5", 10), ("0", 10), ("sqrt(0-1)", 10),
    ("sin(ld(0)+1)", 10), ("ld(0)-7.25", -10), ("ld(0)+5", -10),
    ("cos(ld(0))", 7), ("ld(0)^3-27", 5),
]


@pytest.mark.parametrize("body,xmax", ROOTS)
def test_root_bit_exact(body, xmax):
    src = f"root({body}, {xmax})"
    ours, oracle = both(src)
    if math.isnan(oracle):
        assert math.isnan(ours), src
    else:
        assert ours == oracle, src


def test_root_restores_slot0():
    ours, oracle = both("st(0, 7); root(ld(0)-1, 2) + ld(0)")
    assert ours == oracle == 8.0


# ---- cross-evaluation st/ld persistence ------------------------------

def test_slot_counter_persists_across_grid_points():
    """eval.c keeps var[] in the AVExpr across calls: st(0, ld(0)+1) is
    a running counter across the reference's per-coefficient loops.
    Our grid evaluation in raster order must match N sequential oracle
    calls exactly."""
    import numpy as np

    src = "x*0 + st(0, ld(0)+1)"
    ours = parse_expr(src, ("x",))
    assert ours.stateful  # reads slot state from previous evaluations
    got = ours({"x": np.zeros((2, 3))})
    oracle = OracleExpr(src, ("x",))
    want = np.asarray([oracle(x=0.0) for _ in range(6)]).reshape(2, 3)
    np.testing.assert_array_equal(got, want)
    assert want.ravel().tolist() == [1, 2, 3, 4, 5, 6]


def test_store_then_load_stays_vectorised():
    # the idiomatic within-evaluation st/ld carries no cross-point
    # state and must keep the vectorised path
    e = parse_expr("st(0, x*2); ld(0)+1", ("x",))
    assert not e.stateful
    e2 = parse_expr("if(gt(x,0), ld(1), st(1, x))", ("x",))
    assert e2.stateful  # conditional store: ld may read persisted state
