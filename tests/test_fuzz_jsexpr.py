"""Fuzzer for the JS→Column transpiler (functions/jsexpr.py): random
sources inside the documented subset — arithmetic with JS semantics
(double division, dividend-sign %), Math.*, string methods with their
JS quirks (substring clamps AND swaps its arguments, charAt returns ''
out of range, replace hits only the FIRST occurrence), ternaries over
comparison/&&/||/! predicates — each paired at generation time with a
Python oracle implementing the same JS semantics (SQL null propagation
for null inputs, per the module's documented divergence from Rhino).

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import math
import os
import random

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.functions.jsexpr import compile_scalar

SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
N_EXPRS = int(os.environ.get("FUZZ_N", "200"))
BATCH = 40

ROWS = [
    (0, "hello world", 2.5),
    (1, "", 0.25),
    (2, "Click", -1.75),
    (3, "purchase", 327.53),
    (4, None, None),
    (5, "a,b,c", 3.14159),
    (6, "zebra", -0.5),
    (7, "MiXeD", 123456.789),
    (8, "42", 0.0),
    (9, "hello", 9.99),
]


@pytest.fixture(scope="module")
def js_frame(spark):
    return spark.createDataFrame(ROWS, "id long, s string, d double")


# The oracles model x as a JS string and y as a JS number, so the
# compile must declare the params that way (seed-13597 find: passing
# one kind for both params tagged the numeric y as a string, turning
# `y + y` into concat — and the concat result reaching a numeric
# comparison exposed the engine's missing ToNumber coercion).
PARAM_KINDS = ["str", "num"]

# Pinned fuzz finds (seed 13597): JS ToNumber — a malformed numeric
# string in a numeric comparison is NaN, never an ANSI cast error; NaN
# compares unequal to everything (==/</<=/>/>= false, != true);
# Boolean(NaN) is false. Each entry: (src, s, d, expected).
PINNED = [
    ("function(x, y) { return ((x + x) != 2) ? 1.0 : 0.0; }",
     "hello", 1.0, 1.0),    # Number('hellohello') = NaN; NaN != 2 → true
    ("function(x, y) { return ((x + x) == 2) ? 1.0 : 0.0; }",
     "zebra", -0.5, 0.0),   # NaN == 2 → false
    ("function(x, y) { return ((x + x) < 99999) ? 1.0 : 0.0; }",
     "zebra", -0.5, 0.0),   # NaN < n → false (Spark would say true)
    ("function(x, y) { return ((x + x) < 99999) ? 1.0 : 0.0; }",
     "42", 0.0, 1.0),       # '4242' parses: 4242 < 99999 → true
    ("function(x, y) { return ((y + y) != -1) ? 1.0 : 0.0; }",
     "zebra", -0.5, 0.0),   # y is a NUMBER: -0.5 + -0.5 adds, not concat
    ("function(x, y) { return (Number(x) != Number(x)) ? 1.0 : 0.0; }",
     "zebra", -0.5, 1.0),   # NaN != NaN → true (Spark says false)
    ("function(x, y) { return (x - 1) ? 'a' : 'b'; }",
     "zebra", -0.5, "b"),   # NaN is falsy (Spark's NaN != 0 is true)
    ("function(x, y) { return parseInt(x) ? 'a' : 'b'; }",
     "zebra", -0.5, "b"),   # parseInt('zebra') = NaN, no cast error
    # r12 advice fixes: ToNumber('') = 0 (not NaN), unsigned hex parses,
    # strict equality never coerces, parseInt prefix-parses and maps
    # Infinity to NaN, parseFloat prefix-parses without ToNumber's rules.
    ("function(x, y) { return (x == 0) ? 1.0 : 0.0; }",
     "", 1.0, 1.0),         # Number('') = 0 → true (was NaN → false)
    ("function(x, y) { return (x < 1) ? 1.0 : 0.0; }",
     "   ", 1.0, 1.0),      # whitespace-only → 0 < 1 → true
    ("function(x, y) { return (x == 16) ? 1.0 : 0.0; }",
     "0x10", 1.0, 1.0),     # Number('0x10') = 16
    ("function(x, y) { return (x == 16) ? 1.0 : 0.0; }",
     "-0x10", 1.0, 0.0),    # SIGNED hex is NaN under ToNumber
    ("function(x, y) { return (x === 5) ? 1.0 : 0.0; }",
     "5", 5.0, 0.0),        # strict equality: '5' === 5 is false
    ("function(x, y) { return (x !== 5) ? 1.0 : 0.0; }",
     "5", 5.0, 1.0),        # '5' !== 5 is true
    ("function(x, y) { return (x == 5) ? 1.0 : 0.0; }",
     "5", 5.0, 1.0),        # loose equality still coerces
    ("function(x, y) { return parseInt(x); }",
     "12abc", 0.0, 12.0),   # parseInt prefix-parses
    ("function(x, y) { return parseInt(x); }",
     "-0x1A", 0.0, -26.0),  # parseInt DOES take signed hex
    ("function(x, y) { return parseInt(parseFloat(x)) ? 'a' : 'b'; }",
     "Infinity", 1.0, "b"), # numeric-input parseInt(Inf) = NaN, not NULL
    ("function(x, y) { return parseInt(x) ? 'a' : 'b'; }",
     "Infinity", 1.0, "b"), # parseInt('Infinity') = NaN too
    ("function(x, y) { return parseFloat(x); }",
     "12.5e1abc", 0.0, 125.0),  # parseFloat prefix-parses
    ("function(x, y) { return parseFloat(x); }",
     "0x10", 0.0, 0.0),     # parseFloat sees the '0' prefix, not hex
    ("function(x, y) { return parseFloat(x) ? 'a' : 'b'; }",
     "", 1.0, "b"),         # parseFloat('') = NaN (NOT ToNumber's 0)
]


def test_pinned_js_tonumber_coercion(spark):
    for src, s, d, want in PINNED:
        col = compile_scalar(src, [F.col("s"), F.col("d")], kind=PARAM_KINDS)
        df = spark.createDataFrame([(s, d)], "s string, d double")
        got = df.select(col.alias("e")).collect()[0]["e"]
        assert got == want, (src, s, d, got, want)


class _Null(Exception):
    pass


def _n(v):
    if v is None:
        raise _Null()
    return v


# generators return (js_source_fragment, py_fn(row_dict) -> value)

def g_num(rng: random.Random, depth: int = 0):
    if depth >= 3:
        k = rng.choice(["lit", "param"])
    else:
        k = rng.choice(["lit", "param", "arith", "mod", "neg", "math1",
                        "math2", "round", "length", "indexof", "ternary"])
    if k == "lit":
        v = rng.choice([2, 7, 0.5, 10, 3.25, 100])
        return str(v), lambda r, v=v: float(v)
    if k == "param":
        return "y", lambda r: float(_n(r["d"]))
    if k == "arith":
        a, b = g_num(rng, depth + 1), g_num(rng, depth + 1)
        op = rng.choice(["+", "-", "*"])
        f = {"+": lambda x, z: x + z, "-": lambda x, z: x - z,
             "*": lambda x, z: x * z}[op]
        return (f"({a[0]} {op} {b[0]})",
                lambda r, a=a, b=b, f=f: f(a[1](r), b[1](r)))
    if k == "mod":
        a = g_num(rng, depth + 1)
        m = rng.choice([3, 7, 2.5])
        # JS % keeps the dividend sign (fmod), unlike Python's %
        return (f"({a[0]} % {m})",
                lambda r, a=a, m=m: math.fmod(a[1](r), m))
    if k == "neg":
        a = g_num(rng, depth + 1)
        return f"(-{a[0]})", lambda r, a=a: -a[1](r)
    if k == "math1":
        a = g_num(rng, depth + 1)
        fn = rng.choice(["abs", "floor", "ceil", "sqrt"])
        if fn == "sqrt":
            return (f"Math.sqrt(Math.abs({a[0]}))",
                    lambda r, a=a: math.sqrt(abs(a[1](r))))
        f = {"abs": abs, "floor": math.floor, "ceil": math.ceil}[fn]
        return (f"Math.{fn}({a[0]})",
                lambda r, a=a, f=f: float(f(a[1](r))))
    if k == "math2":
        a, b = g_num(rng, depth + 1), g_num(rng, depth + 1)
        fn = rng.choice(["min", "max"])
        f = min if fn == "min" else max
        return (f"Math.{fn}({a[0]}, {b[0]})",
                lambda r, a=a, b=b, f=f: f(a[1](r), b[1](r)))
    if k == "round":
        a = g_num(rng, depth + 1)
        # JS Math.round = floor(x + 0.5), including negatives
        return (f"Math.round({a[0]})",
                lambda r, a=a: float(math.floor(a[1](r) + 0.5)))
    if k == "length":
        return "x.length", lambda r: float(len(_n(r["s"])))
    if k == "indexof":
        needle = rng.choice(["l", "lo", "z", ","])
        return (f"x.indexOf('{needle}')",
                lambda r, nd=needle: float(_n(r["s"]).find(nd)))
    c = g_pred(rng, depth + 1)
    a, b = g_num(rng, depth + 1), g_num(rng, depth + 1)
    def _f(r, c=c, a=a, b=b):
        # SQL CASE: a null condition falls to the else branch
        return a[1](r) if c[1](r) else b[1](r)
    return f"({c[0]} ? {a[0]} : {b[0]})", _f


def g_pred(rng: random.Random, depth: int = 0):
    """Predicates return True/False/None under SQL KLEENE logic: a null
    operand makes a comparison None, null OR true is TRUE, null AND
    false is FALSE — the transpiler's documented three-valued
    semantics (an earlier oracle short-circuited null||true to the
    else branch; the ENGINE was right)."""
    k = rng.choice(["cmp", "scmp", "not", "andor"] if depth < 3
                   else ["cmp", "scmp"])
    if k == "cmp":
        a, b = g_num(rng, depth + 1), g_num(rng, depth + 1)
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        import operator as _op
        f = {"<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge,
             "==": _op.eq, "!=": _op.ne}[op]
        def _f(r, a=a, b=b, f=f):
            try:
                return f(a[1](r), b[1](r))
            except _Null:
                return None
        return f"({a[0]} {op} {b[0]})", _f
    if k == "scmp":
        lit = rng.choice(["hello", "Click", ""])
        op = rng.choice(["==", "!="])
        def _f(r, lit=lit, op=op):
            if r["s"] is None:
                return None
            return (r["s"] == lit) if op == "==" else (r["s"] != lit)
        return f"(x {op} '{lit}')", _f
    if k == "not":
        a = g_pred(rng, depth + 1)
        def _f(r, a=a):
            v = a[1](r)
            return None if v is None else (not v)
        return f"(!{a[0]})", _f
    a, b = g_pred(rng, depth + 1), g_pred(rng, depth + 1)
    op = rng.choice(["&&", "||"])
    def _f(r, a=a, b=b, op=op):
        av, bv = a[1](r), b[1](r)
        if op == "&&":
            if av is False or bv is False:
                return False
            if av is None or bv is None:
                return None
            return True
        if av is True or bv is True:
            return True
        if av is None or bv is None:
            return None
        return False
    return f"({a[0]} {op} {b[0]})", _f


def g_str(rng: random.Random, depth: int = 0):
    if depth >= 3:
        k = rng.choice(["lit", "param"])
    else:
        k = rng.choice(["lit", "param", "substring", "substr", "charat",
                        "case", "concat", "replace", "trim", "plus",
                        "ternary"])
    if k == "lit":
        v = rng.choice(["abc", "L", "", "xy"])
        return f"'{v}'", lambda r, v=v: v
    if k == "param":
        return "x", lambda r: _n(r["s"])
    if k == "substring":
        a = g_str(rng, depth + 1)
        i = rng.randint(0, 8)
        if rng.random() < 0.5:
            j = rng.randint(0, 8)  # may be < i: JS SWAPS the arguments
            def _f(r, a=a, i=i, j=j):
                v = a[1](r)
                lo, hi = sorted((min(i, len(v)), min(j, len(v))))
                return v[lo:hi]
            return f"{a[0]}.substring({i}, {j})", _f
        def _f(r, a=a, i=i):
            v = a[1](r)
            return v[min(i, len(v)):]
        return f"{a[0]}.substring({i})", _f
    if k == "substr":
        a = g_str(rng, depth + 1)
        i, ln = rng.randint(0, 6), rng.randint(0, 4)
        def _f(r, a=a, i=i, ln=ln):
            v = a[1](r)
            return v[i:i + ln]
        return f"{a[0]}.substr({i}, {ln})", _f
    if k == "charat":
        a = g_str(rng, depth + 1)
        i = rng.randint(0, 7)
        def _f(r, a=a, i=i):
            v = a[1](r)
            return v[i] if i < len(v) else ""  # JS: '' out of range
        return f"{a[0]}.charAt({i})", _f
    if k == "case":
        a = g_str(rng, depth + 1)
        fn = rng.choice(["toLowerCase", "toUpperCase"])
        f = str.lower if fn == "toLowerCase" else str.upper
        return (f"{a[0]}.{fn}()",
                lambda r, a=a, f=f: f(a[1](r)))
    if k == "concat":
        a, b = g_str(rng, depth + 1), g_str(rng, depth + 1)
        return (f"{a[0]}.concat({b[0]})",
                lambda r, a=a, b=b: a[1](r) + b[1](r))
    if k == "replace":
        a = g_str(rng, depth + 1)
        frm = rng.choice(["l", "e", ","])
        to = rng.choice(["_", "", "XX"])
        # JS replace(string, r): FIRST occurrence only
        return (f"{a[0]}.replace('{frm}', '{to}')",
                lambda r, a=a, frm=frm, to=to: a[1](r).replace(frm, to, 1))
    if k == "trim":
        a = g_str(rng, depth + 1)
        return f"{a[0]}.trim()", lambda r, a=a: a[1](r).strip()
    if k == "plus":
        a, b = g_str(rng, depth + 1), g_str(rng, depth + 1)
        return (f"({a[0]} + {b[0]})",
                lambda r, a=a, b=b: a[1](r) + b[1](r))
    c = g_pred(rng, depth + 1)
    a, b = g_str(rng, depth + 1), g_str(rng, depth + 1)
    def _f(r, c=c, a=a, b=b):
        # SQL CASE: a null condition falls to the else branch
        return a[1](r) if c[1](r) else b[1](r)
    return f"({c[0]} ? {a[0]} : {b[0]})", _f


def _cmp(got, want) -> bool:
    if got is None or want is None:
        return got is None and want is None
    if isinstance(want, float):
        g = float(got)
        if math.isnan(g) or math.isnan(want):
            return math.isnan(g) and math.isnan(want)
        return math.isclose(g, want, rel_tol=1e-9, abs_tol=1e-9)
    return got == want


def test_fuzz_jsexpr(js_frame):
    rng = random.Random(SEED)
    cases = []
    for _ in range(N_EXPRS):
        if rng.random() < 0.5:
            frag, fn = g_num(rng)
            cases.append((frag, fn, "num"))
        else:
            frag, fn = g_str(rng)
            cases.append((frag, fn, "str"))
    rows = [dict(zip(["id", "s", "d"], r)) for r in ROWS]
    failures = []
    for start in range(0, len(cases), BATCH):
        batch = cases[start:start + BATCH]
        cols, metas = [], []
        for j, (frag, fn, kind) in enumerate(batch):
            src = f"function(x, y) {{ return {frag}; }}"
            try:
                col = compile_scalar(src, [F.col("s"), F.col("d")],
                                     kind=PARAM_KINDS)
                cols.append(col.alias(f"e{j}"))
                metas.append((start + j, src, fn))
            except Exception as e:  # noqa: BLE001
                failures.append((start + j, src,
                                 f"compile: {type(e).__name__}: {e}"))
        if not cols:
            continue
        out = js_frame.select("id", *cols).orderBy("id").collect()
        for srow in out:
            r = rows[srow["id"]]
            for j, (idx, src, fn) in enumerate(metas):
                got = srow[f"e{j}"]
                try:
                    want = fn(r)
                    if isinstance(want, bool):
                        want = float(want)
                    elif isinstance(want, (int, float)):
                        want = float(want)
                except _Null:
                    want = None
                if not _cmp(got, want):
                    failures.append(
                        (idx, src,
                         f"row id={r['id']} s={r['s']!r} d={r['d']!r}: "
                         f"spark={got!r} expected={want!r}"))
    if failures:
        seen = {}
        for idx, src, err in failures:
            seen.setdefault(idx, (src, err))
        msg = [f"{len(seen)}/{N_EXPRS} js expressions diverged "
               f"(seed={SEED}); first 5:"]
        for idx, (src, err) in list(seen.items())[:5]:
            msg.append(f"--- #{idx} ---\n js: {src}\n {err}")
        raise AssertionError("\n".join(msg))
