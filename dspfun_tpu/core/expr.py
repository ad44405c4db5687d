"""FFmpeg av_expr-compatible expression engine.

The reference uses FFmpeg's expression evaluator as its user-scripting
hook: zoom animation expressions (reference zoom/zoom.c:221-228,
320-345), motion ``--eval`` coefficient formulas (motion/motion.c:
463-469, 670-681), and scan's ``evalxy``/``evali`` methods
(scan/scan_methods.c:333-391).

All of those uses are *elementwise over coordinate grids* (or per-frame
scalars), so this engine parses once into an AST and evaluates with a
pluggable array module: ``numpy`` for host-side uses (scan precompute,
zoom per-frame scalars) and ``jax.numpy`` inside jitted pipelines
(motion --eval) where the whole expression vectorises onto the VPU.

Grammar (the av_expr subset the dspfun docs exercise):
    expr   := term (('+'|'-') term)*
    term   := factor (('*'|'/') factor)*
    factor := primary ('^' primary)*        (right assoc, pow)
    primary:= ('+'|'-')* (number | const | var | func '(' args ')' | '(' expr ')')

Functions: sin cos tan asin acos atan atan2 sinh cosh tanh exp log pow
sqrt abs sgn floor ceil trunc round mod gcd max min hypot eq gte gt lte
lt not if ifnot isnan isinf bitand bitor between clip lerp squish gauss
st ld print time, plus the stateful/iterative av_expr forms random,
while, root, taylor.  Constants: PI, E, PHI.

Stateful forms evaluate on the host: with scalar variables they follow
ffmpeg eval.c exactly (lazy if/while, LCG random with the var-slot
double-rounded state, persistent var slots across evaluations of the
same parsed Expr — eval.c keeps them in ``AVExpr->var``); with grid
variables the expression is evaluated per element in raster order,
matching the reference's per-coefficient evaluation loops
(motion/motion.c:670-681, scan/scan_methods.c:333-391).  Inside jitted
pipelines they cannot vectorise onto the VPU; callers route through
``host_eval_in_jit`` (an ordered io_callback) instead — see
``Expr.stateful``.
"""

from __future__ import annotations

import math
import re
import sys
import time as _time
from typing import Any, Callable, Mapping

__all__ = ["Expr", "parse_expr", "host_eval_in_jit"]

_U64 = (1 << 64) - 1
_VARS = 10  # ffmpeg eval.c VARS: st()/ld()/random() slot count
_STATEFUL = {"random", "while", "root", "taylor"}

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op>[-+*/^(),;])"
    r")"
)

_CONSTS = {"PI": math.pi, "E": math.e, "PHI": (1 + math.sqrt(5)) / 2}


def _tokenize(s: str):
    pos = 0
    out = []
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"bad token in expression at: {s[pos:]!r}")
        pos = m.end()
        if m.group("num") is not None:
            out.append(("num", float(m.group("num"))))
        elif m.group("name") is not None:
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", None))
    return out


class _Parser:
    def __init__(self, tokens, var_names):
        self.toks = tokens
        self.i = 0
        self.var_names = set(var_names)

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_op(self, op):
        t = self.next()
        if t != ("op", op):
            raise ValueError(f"expected {op!r}, got {t}")

    def parse(self):
        # av_expr: ';'-separated expressions evaluate in order and the
        # last one's value is the result (the st()/ld() idiom)
        node = self.expr()
        while self.peek() == ("op", ";"):
            self.next()
            if self.peek() == ("end", None):
                break  # tolerate a trailing separator
            node = ("seq", node, self.expr())
        if self.peek() != ("end", None):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def expr(self):
        node = self.term()
        while self.peek() in (("op", "+"), ("op", "-")):
            op = self.next()[1]
            node = (op, node, self.term())
        return node

    def term(self):
        node = self.factor()
        while self.peek() in (("op", "*"), ("op", "/")):
            op = self.next()[1]
            node = (op, node, self.factor())
        return node

    def _signs(self) -> bool:
        neg = False
        while self.peek() in (("op", "+"), ("op", "-")):
            if self.next()[1] == "-":
                neg = not neg
        return neg

    def factor(self):
        # ffmpeg eval.c parse_factor: unary sign binds looser than '^'
        # (-2^2 == -4) and '^' chains left-associatively, each exponent
        # carrying its own optional sign.
        neg = self._signs()
        node = self.primary()
        while self.peek() == ("op", "^"):
            self.next()
            eneg = self._signs()
            exp = self.primary()
            if eneg:
                exp = ("neg", exp)
            node = ("^", node, exp)
        if neg:
            node = ("neg", node)
        return node

    def primary(self):
        kind, val = self.next()
        if kind == "op" and val == "(":
            node = self.expr()
            self.expect_op(")")
            return node
        if kind == "num":
            return ("num", val)
        if kind == "name":
            if self.peek() == ("op", "("):
                self.next()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.expr())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.expr())
                self.expect_op(")")
                return ("call", val, args)
            if val in _CONSTS:
                return ("num", _CONSTS[val])
            if val in self.var_names:
                return ("var", val)
            raise ValueError(f"unknown identifier {val!r}")
        raise ValueError(f"unexpected token {(kind, val)}")


def _funcs(xp) -> Mapping[str, Callable]:
    def _i64(x):
        return xp.nan_to_num(xp.trunc(x), nan=0.0, posinf=0.0, neginf=0.0).astype("int64")

    return {
        "sin": lambda a: xp.sin(a[0]),
        "cos": lambda a: xp.cos(a[0]),
        "tan": lambda a: xp.tan(a[0]),
        "asin": lambda a: xp.arcsin(a[0]),
        "acos": lambda a: xp.arccos(a[0]),
        "atan": lambda a: xp.arctan(a[0]),
        "atan2": lambda a: xp.arctan2(a[0], a[1]),
        "sinh": lambda a: xp.sinh(a[0]),
        "cosh": lambda a: xp.cosh(a[0]),
        "tanh": lambda a: xp.tanh(a[0]),
        "exp": lambda a: xp.exp(a[0]),
        "log": lambda a: xp.log(a[0]),
        "pow": lambda a: xp.power(a[0], a[1]),
        "sqrt": lambda a: xp.sqrt(a[0]),
        "abs": lambda a: xp.abs(a[0]),
        "sgn": lambda a: xp.sign(a[0]),
        "floor": lambda a: xp.floor(a[0]),
        "ceil": lambda a: xp.ceil(a[0]),
        "trunc": lambda a: xp.trunc(a[0]),
        # C round(): half away from zero (numpy's round is half-even —
        # round(0.5) would be 0 instead of av_expr's 1)
        "round": lambda a: xp.sign(a[0]) * xp.floor(xp.abs(a[0]) + 0.5),
        # ffmpeg eval.c e_mod is floor-based: a - floor(a/b)*b (differs
        # from C fmod for negative operands)
        "mod": lambda a: a[0] - xp.floor(a[0] / a[1]) * a[1],
        "gcd": lambda a: xp.gcd(_i64(a[0]), _i64(a[1])).astype(
            "float64" if xp.__name__ == "numpy" else "float32"),
        "max": lambda a: xp.maximum(a[0], a[1]),
        "min": lambda a: xp.minimum(a[0], a[1]),
        "hypot": lambda a: xp.hypot(a[0], a[1]),
        "eq": lambda a: xp.where(a[0] == a[1], 1.0, 0.0),
        "gte": lambda a: xp.where(a[0] >= a[1], 1.0, 0.0),
        "gt": lambda a: xp.where(a[0] > a[1], 1.0, 0.0),
        "lte": lambda a: xp.where(a[0] <= a[1], 1.0, 0.0),
        "lt": lambda a: xp.where(a[0] < a[1], 1.0, 0.0),
        "not": lambda a: xp.where(a[0] == 0, 1.0, 0.0),
        "isnan": lambda a: xp.where(xp.isnan(a[0]), 1.0, 0.0),
        "isinf": lambda a: xp.where(xp.isinf(a[0]), 1.0, 0.0),
        "bitand": lambda a: (_i64(a[0]) & _i64(a[1])).astype("float64" if xp.__name__ == "numpy" else "float32"),
        "bitor": lambda a: (_i64(a[0]) | _i64(a[1])).astype("float64" if xp.__name__ == "numpy" else "float32"),
        "between": lambda a: xp.where((a[0] >= a[1]) & (a[0] <= a[2]), 1.0, 0.0),
        "clip": lambda a: xp.clip(a[0], a[1], a[2]),
        "lerp": lambda a: a[0] + (a[1] - a[0]) * a[2],
        "squish": lambda a: 1.0 / (1.0 + xp.exp(4.0 * a[0])),
        "gauss": lambda a: xp.exp(-a[0] * a[0] / 2.0) / math.sqrt(2.0 * math.pi),
    }


def _contains_stateful(node) -> bool:
    if not isinstance(node, tuple):
        return False
    if node[0] == "call" and node[1] in _STATEFUL:
        return True
    for sub in node[1:]:
        if isinstance(sub, tuple) and _contains_stateful(sub):
            return True
        if isinstance(sub, list) and any(_contains_stateful(s) for s in sub):
            return True
    return False


def _slot_index(v) -> int:
    """av_clip(value, 0, VARS-1) with the double->int edge cases pinned
    (nan -> 0, +/-inf clamp)."""
    v = float(v)
    if v != v:
        return 0
    return int(min(max(v, 0.0), float(_VARS - 1)))


def _find_root(f: Callable[[float], float], xmax: float) -> float:
    """Root of the continuous function ``f`` on the interval 0..xmax
    (ffmpeg-utils documented semantics for root(expr, max)): coarse
    uniform scan for a sign change, then bisection; with no sign change
    the sample closest to zero is returned (matching eval.c's
    best-low/best-high fallback behaviour)."""
    lo, hi = (0.0, xmax) if xmax >= 0 else (xmax, 0.0)
    n = 1024
    best_x, best_av = float("nan"), float("inf")
    px = pv = None
    blo = bhi = blov = None
    for i in range(n + 1):
        x = lo + (hi - lo) * i / n
        v = f(x)
        if v != v:  # NaN sample: cannot bracket across it
            px = pv = None
            continue
        if v == 0.0:
            return x
        if abs(v) < best_av:
            best_x, best_av = x, abs(v)
        if pv is not None and (v > 0.0) != (pv > 0.0):
            blo, bhi, blov = px, x, pv
            break
        px, pv = x, v
    if blo is None:
        return best_x
    for _ in range(200):
        mid = 0.5 * (blo + bhi)
        if mid == blo or mid == bhi:
            break
        v = f(mid)
        if v == 0.0:
            return mid
        if v != v:
            break
        if (v > 0.0) == (blov > 0.0):
            blo, blov = mid, v
        else:
            bhi = mid
    return 0.5 * (blo + bhi)


class Expr:
    """A parsed expression, evaluable over numpy or jax.numpy arrays.

    ``stateful`` is True when the AST contains an iterative/stateful
    av_expr form (random/while/root/taylor); those evaluate on the host
    — scalars directly, grids per element in raster order (the
    reference's per-coefficient loop, motion/motion.c:670-681) — with
    st()/ld()/random() slots persisting across evaluations of this
    parsed expression, as eval.c keeps them in ``AVExpr->var``.
    """

    def __init__(self, source: str, var_names: tuple[str, ...]):
        self.source = source
        self.var_names = tuple(var_names)
        self.ast = _Parser(_tokenize(source), self.var_names).parse()
        self.stateful = _contains_stateful(self.ast)
        # persistent slots for host/stateful evaluation only; the
        # vectorised paths keep per-call state (a persistent dict
        # would pin jax tracers across traces)
        self._slots: dict[int, float] = {}

    def reset_state(self) -> None:
        self._slots.clear()

    def __call__(self, variables: Mapping[str, Any], xp=None):
        if xp is None:
            import numpy as xp  # noqa: PLC0415
        if not self.stateful:
            return self._eval_tree(variables, xp, {}, scalar=False)
        if xp.__name__ != "numpy":
            raise ValueError(
                f"expression {self.source!r} uses a stateful av_expr form"
                " (random/while/root/taylor): it evaluates on the host —"
                " inside jit, route through"
                " dspfun_tpu.core.expr.host_eval_in_jit()")
        import numpy as np  # noqa: PLC0415

        arrs = {k: np.asarray(v, dtype=np.float64)
                for k, v in variables.items()}
        shape = (np.broadcast_shapes(*(a.shape for a in arrs.values()))
                 if arrs else ())
        with np.errstate(all="ignore"):
            if shape == ():
                return self._eval_tree(arrs, np, self._slots, scalar=True)
            grids = {k: np.broadcast_to(a, shape) for k, a in arrs.items()}
            out = np.empty(shape, np.float64)
            for idx in np.ndindex(shape):
                out[idx] = self._eval_tree(
                    {k: g[idx] for k, g in grids.items()},
                    np, self._slots, scalar=True)
            return out

    def _eval_tree(self, variables: Mapping[str, Any], xp,
                   slots: dict[int, Any], scalar: bool):
        funcs = _funcs(xp)
        # av_expr evaluates if()/ifnot() branches lazily, so an st()
        # inside an untaken branch must not fire.  Vectorised over
        # grids, both branches are computed but stores merge through
        # the active branch-condition masks, element-wise.
        mask_stack: list[Any] = []

        def _store(idx: int, v):
            if mask_stack:
                m = mask_stack[0]
                for mm in mask_stack[1:]:
                    m = xp.logical_and(m, mm)
                v = xp.where(m, v, slots.get(idx, 0.0))
            slots[idx] = v

        def ev(node):
            tag = node[0]
            if tag == "num":
                return node[1]
            if tag == "var":
                return variables[node[1]]
            if tag == "neg":
                return -ev(node[1])
            if tag == "seq":
                ev(node[1])  # evaluated for st() side effects
                return ev(node[2])
            if tag in ("+", "-", "*", "/", "^"):
                a, b = ev(node[1]), ev(node[2])
                if tag == "+":
                    return a + b
                if tag == "-":
                    return a - b
                if tag == "*":
                    return a * b
                if tag == "/":
                    return a / b
                return xp.power(a, b)
            if tag == "call":
                name, args = node[1], node[2]
                if name in ("if", "ifnot"):
                    c = ev(args[0])
                    if scalar:
                        # eval.c is lazy: only the taken branch runs
                        # (an st()/while in the other must not fire)
                        taken = (float(c) != 0.0) == (name == "if")
                        if taken:
                            return ev(args[1])
                        return ev(args[2]) if len(args) > 2 else 0.0
                    taken = xp.asarray(c != 0 if name == "if" else c == 0)
                    mask_stack.append(taken)
                    t = ev(args[1])
                    mask_stack.pop()
                    mask_stack.append(xp.logical_not(taken))
                    e = ev(args[2]) if len(args) > 2 else 0.0
                    mask_stack.pop()
                    return xp.where(taken, t, e)
                if name == "st":
                    idx = args[0]
                    if idx[0] != "num":
                        raise ValueError("st() requires a literal slot index")
                    v = ev(args[1])
                    _store(int(idx[1]), v)
                    return v
                if name == "ld":
                    idx = args[0]
                    if idx[0] != "num":
                        raise ValueError("ld() requires a literal slot index")
                    return slots.get(int(idx[1]), 0.0)
                if name == "print":
                    v = ev(args[0])
                    if len(args) > 1:
                        ev(args[1])  # log level: evaluated, stderr either way
                    if xp.__name__ == "numpy":
                        import numpy as _np  # noqa: PLC0415

                        msg = (f"{float(v):f}" if _np.ndim(v) == 0
                               else _np.array2string(_np.asarray(v)))
                        print(msg, file=sys.stderr)
                    else:
                        import jax  # noqa: PLC0415

                        jax.debug.print("{v}", v=v)
                    return v
                if name == "time":
                    for a in args:
                        ev(a)  # time(0): the argument is evaluated, unused
                    return _time.time()
                if name in _STATEFUL:
                    if not scalar:
                        raise ValueError(
                            f"{name}() is stateful and only evaluates on"
                            " the host scalar path")
                    if name == "random":
                        # eval.c e_random: slot holds the LCG state as a
                        # double (the uint64 round-trips through the
                        # double slot, so the sequence is the rounded
                        # recurrence, reproduced exactly here)
                        i = _slot_index(ev(args[0]))
                        s = float(slots.get(i, 0.0))
                        r = 0 if s != s else (int(s) & _U64)
                        r = (r * 1664525 + 1013904223) & _U64
                        slots[i] = float(r)
                        return float(r) * 2.0 ** -64
                    if name == "while":
                        # returns NaN when the condition never held; a
                        # NaN condition loops, as in C (nan != 0)
                        d = float("nan")
                        while float(ev(args[0])) != 0.0:
                            d = float(ev(args[1]))
                        return d
                    if name == "root":
                        xmax = float(ev(args[1]))
                        saved = slots.get(0, 0.0)

                        def froot(t: float) -> float:
                            slots[0] = t
                            return float(ev(args[0]))

                        try:
                            return _find_root(froot, xmax)
                        finally:
                            slots[0] = saved
                    # taylor(expr, x[, id]): expr is the ld(id)-th
                    # derivative at 0; sum t_n * x^n / n! until the
                    # accumulator stops moving on a nonzero term
                    x = float(ev(args[1]))
                    sid = _slot_index(ev(args[2])) if len(args) > 2 else 0
                    saved = slots.get(sid, 0.0)
                    t, d = 1.0, 0.0
                    try:
                        for i in range(1000):
                            prev = d
                            slots[sid] = float(i)
                            v = float(ev(args[0]))
                            d = d + t * v
                            if d == prev and v != 0.0:
                                break
                            t *= x / (i + 1)
                    finally:
                        slots[sid] = saved
                    return d
                if name in funcs:
                    return funcs[name]([ev(a) for a in args])
                raise ValueError(f"unsupported function {name!r}")
            raise AssertionError(node)

        if xp.__name__ == "numpy":
            # ffmpeg-eval semantics propagate NaN/inf silently (scan
            # methods *rely* on NaN to mark skipped points); keep numpy
            # from warning where jax already stays quiet
            import numpy as _np  # noqa: PLC0415

            with _np.errstate(invalid="ignore", divide="ignore"):
                return ev(self.ast)
        return ev(self.ast)


def parse_expr(source: str, var_names) -> Expr:
    return Expr(source, tuple(var_names))


def host_eval_in_jit(expr: Expr, variables: Mapping[str, Any],
                     shape, dtype):
    """Evaluate a stateful Expr inside a jitted computation via an
    ordered host callback — the TPU mapping of the reference's
    host-side per-coefficient av_expr loop (motion/motion.c:670-681):
    the coefficient grid leaves the accelerator for exactly this stage,
    st()/ld()/random() state persists across calls in program order,
    and everything around it stays fused on device.  Grid evaluation is
    per element in raster order, so it is only worth paying for when
    the expression actually needs the stateful forms."""
    import jax  # noqa: PLC0415
    import numpy as np  # noqa: PLC0415
    from jax.experimental import io_callback  # noqa: PLC0415

    keys = tuple(sorted(variables))

    def host(*vals):
        env = {k: np.asarray(v, np.float64) for k, v in zip(keys, vals)}
        out = np.asarray(expr(env, np), np.float64)
        return np.ascontiguousarray(np.broadcast_to(out, shape)).astype(dtype)

    return io_callback(host, jax.ShapeDtypeStruct(tuple(shape), dtype),
                       *(variables[k] for k in keys), ordered=True)
