"""Differential fuzzer for the Druid expression front-end
(functions/druidexpr.py) — the module where round-5's review found its
bugs (EPOCH+tz crash, DST ceil, silent extra args).

Typed paired generation: every node generator emits
``(druid_source, duckdb_sql, tag)`` built from the same random draw, so
the DuckDB oracle derives from Druid's documented semantics (integral
long division, ^-as-power, 0-based substring/strpos, null-for-non-match
regexp_extract, 1/0 comparison longs) and never from the engine's
compilation. Expressions evaluate in BATCHES — one Spark select with ~40
expression columns per job over a 10-row table materialized identically
in both engines (nulls, '', negatives, DST-transition timestamps) — so
hundreds of expressions cost a handful of jobs.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import random

import pytest

from coolplaydruid_spark.functions.druidexpr import compile_druid_expr

N_EXPRS = int(os.environ.get("FUZZ_N", "240"))
SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
BATCH = 40

ROWS = [
    (0, 7, 2.5, "hello world", dt.datetime(2024, 3, 15, 13, 47, 21)),
    (1, -3, 0.25, "", dt.datetime(2024, 1, 1, 0, 0, 0)),
    # DST spring-forward day (America/New_York)
    (2, 0, -1.75, "Click", dt.datetime(2024, 3, 10, 6, 30, 0)),
    # DST fall-back day
    (3, 12, 327.53, "purchase", dt.datetime(2024, 11, 3, 5, 30, 0)),
    (4, None, None, None, dt.datetime(2024, 6, 15, 23, 59, 59)),
    (5, 100, 3.14159, "a,b,c", dt.datetime(2024, 1, 31, 12, 0, 0)),
    (6, -14, -0.5, "zebra", dt.datetime(2024, 2, 29, 8, 15, 0)),
    (7, 2, 123456.789, "MiXeD", dt.datetime(2024, 7, 4, 4, 5, 6)),
    (8, 5, 0.0, "x", dt.datetime(2024, 12, 31, 23, 0, 0)),
    (9, 63, 9.99, "hello", dt.datetime(2024, 3, 15, 0, 0, 0)),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        ROWS, "id long, n long, d double, s string, t timestamp"
    )


@pytest.fixture(scope="module")
def duck_tbl(duck):
    rows_sql = ", ".join(
        "({}, {}, {}, {}, TIMESTAMP '{}')".format(
            r[0],
            "NULL" if r[1] is None else r[1],
            "NULL" if r[2] is None else repr(r[2]),
            "NULL" if r[3] is None else "'" + r[3] + "'",
            r[4].strftime("%Y-%m-%d %H:%M:%S"),
        )
        for r in ROWS
    )
    duck.execute(
        "CREATE OR REPLACE TABLE fuzz_expr(id BIGINT, n BIGINT, d DOUBLE, "
        "s VARCHAR, t TIMESTAMP)"
    )
    duck.execute(f"INSERT INTO fuzz_expr VALUES {rows_sql}")
    return "fuzz_expr"


# ---------------------------------------------------------------------------
# typed paired generators: (druid_src, duck_sql)
# ---------------------------------------------------------------------------

def g_long(rng: random.Random, depth: int = 0):
    if depth >= 2:
        k = rng.choice(["lit", "col", "col"])
    else:
        k = rng.choice([
            "lit", "col", "strlen", "cmp", "arith", "intdiv", "mod",
            "cast_trunc", "if", "nvl", "extract", "strpos", "isnull",
            "case_simple", "min",
        ])
    if k == "lit":
        v = rng.randint(-20, 100)
        return str(v), str(v)
    if k == "col":
        return "n", "n"
    if k == "strlen":
        s = g_str(rng, depth + 1)
        return f"strlen({s[0]})", f"CAST(length({s[1]}) AS BIGINT)"
    if k == "cmp":
        if rng.random() < 0.3:
            a, b = g_str(rng, depth + 1), g_str(rng, depth + 1)
        else:
            a, b = g_num(rng, depth + 1), g_num(rng, depth + 1)
        op = rng.choice(["<", "<=", ">", ">=", "==", "!="])
        sop = {"==": "=", "!=": "<>"}.get(op, op)
        return (f"({a[0]} {op} {b[0]})",
                f"CAST(({a[1]} {sop} {b[1]}) AS BIGINT)")
    if k == "arith":
        a, b = g_long(rng, depth + 1), g_long(rng, depth + 1)
        op = rng.choice(["+", "-", "*"])
        return f"({a[0]} {op} {b[0]})", f"({a[1]} {op} {b[1]})"
    if k == "intdiv":
        # Druid long/long is integral division truncating toward zero
        # (Java); DuckDB // floors, so pair against trunc of the float
        # quotient. Non-zero literal denominator by construction.
        a = g_long(rng, depth + 1)
        b = rng.choice([2, 3, 7, -4, 13])
        fn = rng.random() < 0.5
        src = f"div({a[0]}, {b})" if fn else f"({a[0]} / {b})"
        return (src,
                f"CAST(trunc(CAST({a[1]} AS DOUBLE) / {b}) AS BIGINT)")
    if k == "mod":
        a = g_long(rng, depth + 1)
        b = rng.choice([2, 3, 5, 7, 11])
        return f"({a[0]} % {b})", f"({a[1]} % {b})"
    if k == "cast_trunc":
        # Druid cast double->long truncates; DuckDB CAST rounds. The
        # fmod bound keeps huge doubles (exp towers) inside BIGINT range
        # where DuckDB's CAST would error instead of clamping.
        a = g_num(rng, depth + 1)
        return (f"cast(({a[0]} % 1000003.0), 'LONG')",
                f"CAST(trunc({a[1]} % 1000003.0) AS BIGINT)")
    if k == "if":
        c = g_long(rng, depth + 1)
        a, b = g_long(rng, depth + 1), g_long(rng, depth + 1)
        return (f"if({c[0]}, {a[0]}, {b[0]})",
                f"(CASE WHEN ({c[1]}) <> 0 THEN {a[1]} ELSE {b[1]} END)")
    if k == "nvl":
        a = g_long(rng, depth + 1)
        v = rng.randint(-5, 5)
        return f"nvl({a[0]}, {v})", f"coalesce({a[1]}, {v})"
    if k == "extract":
        unit, sql_fn = rng.choice([
            ("SECOND", "second(t)"), ("MINUTE", "minute(t)"),
            ("HOUR", "hour(t)"), ("DAY", "day(t)"),
            ("DOW", "isodow(t)"), ("DOY", "dayofyear(t)"),
            ("MONTH", "month(t)"), ("QUARTER", "quarter(t)"),
            ("YEAR", "year(t)"), ("EPOCH", "epoch(t)"),
            ("MILLIS", "epoch_ms(t)"),
        ])
        if unit in ("EPOCH", "MILLIS") and rng.random() < 0.5:
            # tz must be IGNORED for absolute units (r5 advice fix)
            tz = rng.choice(["America/New_York", "Asia/Tokyo"])
            return (f"timestamp_extract(t, '{unit}', '{tz}')",
                    f"CAST({sql_fn} AS BIGINT)")
        if unit in ("HOUR", "DAY") and rng.random() < 0.4:
            tz = rng.choice(["America/New_York", "Asia/Tokyo",
                             "America/Los_Angeles"])
            fn = sql_fn.split("(")[0]
            return (f"timestamp_extract(t, '{unit}', '{tz}')",
                    f"CAST({fn}(timezone('{tz}', t::TIMESTAMPTZ)) AS BIGINT)")
        return f"timestamp_extract(t, '{unit}')", f"CAST({sql_fn} AS BIGINT)"
    if k == "strpos":
        h = g_str(rng, depth + 1)
        needle = rng.choice(["l", "lo", "e", "z", "b"])
        return (f"strpos({h[0]}, '{needle}')",
                f"CAST(strpos({h[1]}, '{needle}') - 1 AS BIGINT)")
    if k == "isnull":
        s = rng.choice([("s", "s"), ("n", "n"), ("d", "d")])
        fn = rng.choice(["isnull", "notnull"])
        neg = "NOT " if fn == "notnull" else ""
        return (f"{fn}({s[0]})",
                f"CAST(({neg}{s[1]} IS NULL) AS BIGINT)")
    if k == "case_simple":
        a = g_long(rng, depth + 1)
        v1, r1, r2 = rng.randint(0, 9), rng.randint(0, 9), rng.randint(0, 9)
        return (
            f"case_simple({a[0]}, {v1}, {r1}, {r2})",
            f"(CASE {a[1]} WHEN {v1} THEN {r1} ELSE {r2} END)",
        )
    # min/max of two longs
    a, b = g_long(rng, depth + 1), g_long(rng, depth + 1)
    fn = rng.choice(["min", "max"])
    sfn = "least" if fn == "min" else "greatest"
    return f"{fn}({a[0]}, {b[0]})", f"{sfn}({a[1]}, {b[1]})"


def g_num(rng: random.Random, depth: int = 0):
    if depth >= 2:
        k = rng.choice(["lit", "col", "col"])
    else:
        k = rng.choice([
            "lit", "col", "long", "abs", "sqrt", "ln", "exp", "round",
            "arith", "pow", "minmax", "nvl", "floorceil",
        ])
    if k == "lit":
        v = round(rng.uniform(-50, 50), 3)
        return str(v), str(v)
    if k == "col":
        return "d", "d"
    if k == "long":
        return g_long(rng, depth + 1)
    if k == "abs":
        a = g_num(rng, depth + 1)
        return f"abs({a[0]})", f"abs({a[1]})"
    if k == "sqrt":
        a = g_num(rng, depth + 1)
        return f"sqrt(abs({a[0]}))", f"sqrt(abs({a[1]}))"
    if k == "ln":
        a = g_num(rng, depth + 1)
        fn = rng.choice(["ln", "log10"])
        return (f"{fn}(abs({a[0]}) + 1.5)", f"{fn}(abs({a[1]}) + 1.5)")
    if k == "exp":
        a = g_num(rng, depth + 1)
        return f"exp({a[0]} / 200.0)", f"exp({a[1]} / 200.0)"
    if k == "round":
        nd = rng.randint(1, 3)
        a = g_num(rng, depth + 1)
        # the additive nudge keeps inputs off exact round-half ties
        # (0.25, 2.5, -1.75 are in the fixture), where Spark's HALF_UP
        # and DuckDB's rounding may disagree
        return (f"round({a[0]} + 0.0123456, {nd})",
                f"round({a[1]} + 0.0123456, {nd})")
    if k == "arith":
        a, b = g_num(rng, depth + 1), g_num(rng, depth + 1)
        op = rng.choice(["+", "-", "*"])
        return f"({a[0]} {op} {b[0]})", f"({a[1]} {op} {b[1]})"
    if k == "pow":
        a = g_num(rng, depth + 1)
        e = rng.choice([2, 3, 0.5])
        src = (f"(abs({a[0]}) ^ {e})" if rng.random() < 0.5
               else f"pow(abs({a[0]}), {e})")
        return src, f"pow(abs({a[1]}), {e})"
    if k == "minmax":
        a, b = g_num(rng, depth + 1), g_num(rng, depth + 1)
        fn = rng.choice(["min", "max"])
        sfn = "least" if fn == "min" else "greatest"
        return f"{fn}({a[0]}, {b[0]})", f"{sfn}({a[1]}, {b[1]})"
    if k == "nvl":
        a = g_num(rng, depth + 1)
        return f"nvl({a[0]}, 1.5)", f"coalesce({a[1]}, 1.5)"
    a = g_num(rng, depth + 1)
    fn = rng.choice(["floor", "ceil"])
    # Druid floor/ceil return doubles
    return (f"{fn}({a[0]})", f"CAST({fn}({a[1]}) AS DOUBLE)")


def g_str(rng: random.Random, depth: int = 0):
    if depth >= 2:
        k = rng.choice(["lit", "col", "col"])
    else:
        k = rng.choice([
            "lit", "col", "case_fn", "trim", "leftright", "replace",
            "repeat", "substring", "concat", "nvl", "regex", "format",
        ])
    if k == "lit":
        v = rng.choice(["abc", "Hello", "", "xyz", "a,b"])
        return f"'{v}'", f"'{v}'"
    if k == "col":
        return "s", "s"
    if k == "case_fn":
        a = g_str(rng, depth + 1)
        fn = rng.choice(["lower", "upper"])
        return f"{fn}({a[0]})", f"{fn}({a[1]})"
    if k == "trim":
        a = g_str(rng, depth + 1)
        fn = rng.choice(["trim", "ltrim", "rtrim"])
        return f"{fn}({a[0]})", f"{fn}({a[1]})"
    if k == "leftright":
        a = g_str(rng, depth + 1)
        nc = rng.randint(0, 6)
        fn = rng.choice(["left", "right"])
        return f"{fn}({a[0]}, {nc})", f"{fn}({a[1]}, {nc})"
    if k == "replace":
        a = g_str(rng, depth + 1)
        frm = rng.choice(["l", "e", "a"])
        to = rng.choice(["", "_", "XX"])
        return (f"replace({a[0]}, '{frm}', '{to}')",
                f"replace({a[1]}, '{frm}', '{to}')")
    if k == "repeat":
        a = g_str(rng, depth + 1)
        nc = rng.randint(0, 3)
        return f"repeat({a[0]}, {nc})", f"repeat({a[1]}, {nc})"
    if k == "substring":
        a = g_str(rng, depth + 1)
        i = rng.randint(0, 4)
        ln = rng.randint(0, 5)
        # Druid substring is 0-based
        return (f"substring({a[0]}, {i}, {ln})",
                f"substr({a[1]}, {i + 1}, {ln})")
    if k == "concat":
        a, b = g_str(rng, depth + 1), g_str(rng, depth + 1)
        if rng.random() < 0.5:
            return f"concat({a[0]}, {b[0]})", f"({a[1]} || {b[1]})"
        return f"({a[0]} + {b[0]})", f"({a[1]} || {b[1]})"
    if k == "nvl":
        a = g_str(rng, depth + 1)
        return f"nvl({a[0]}, '-')", f"coalesce({a[1]}, '-')"
    if k == "regex":
        # Druid regexp_extract returns NULL (not '') for a non-match;
        # DuckDB returns '' — NULLIF aligns them, and a matched-empty
        # group maps to NULL on both sides
        pat = rng.choice(["(l+)", "([aeiou])", "(z.)"])
        a = g_str(rng, depth + 1)
        return (f"regexp_extract({a[0]}, '{pat}', 1)",
                f"NULLIF(regexp_extract({a[1]}, '{pat}', 1), '')")
    fmt, sfmt = rng.choice([
        ("yyyy-MM-dd", "%Y-%m-%d"),
        ("yyyy-MM-dd HH:mm", "%Y-%m-%d %H:%M"),
        ("HH:mm:ss", "%H:%M:%S"),
    ])
    return (f"timestamp_format(t, '{fmt}')", f"strftime(t, '{sfmt}')")


def g_time(rng: random.Random):
    """Timestamp-valued expressions: floor/ceil/shift with and without
    tz (the r5 DST-advice corner)."""
    k = rng.choice(["floor", "ceil", "floor_tz", "ceil_tz", "shift"])
    if k in ("floor", "ceil"):
        period, sql = rng.choice([
            ("P1D", "date_trunc('day', t)"),
            ("PT1H", "date_trunc('hour', t)"),
            ("P1M", "date_trunc('month', t)"),
            ("PT15M",
             "make_timestamp(CAST(floor(epoch(t) / 900) * 900 AS BIGINT) "
             "* 1000000)"),
        ])
        if k == "floor":
            return f"timestamp_floor(t, '{period}')", f"CAST({sql} AS TIMESTAMP)"
        step = {"P1D": "INTERVAL 1 DAY", "PT1H": "INTERVAL 1 HOUR",
                "P1M": "INTERVAL 1 MONTH", "PT15M": "INTERVAL 15 MINUTE"}[period]
        return (
            f"timestamp_ceil(t, '{period}')",
            f"(CASE WHEN {sql} = t THEN t ELSE {sql} + {step} END)",
        )
    if k in ("floor_tz", "ceil_tz"):
        tz = rng.choice(["America/New_York", "America/Los_Angeles",
                         "Asia/Tokyo"])
        loc = f"timezone('{tz}', t::TIMESTAMPTZ)"
        floor_utc = (f"CAST(timezone('{tz}', date_trunc('day', {loc})) "
                     "AS TIMESTAMP)")
        if k == "floor_tz":
            return f"timestamp_floor(t, 'P1D', null, '{tz}')", floor_utc
        # ceil shifts +1 period in LOCAL wall clock, then back to UTC
        ceil_utc = (
            f"(CASE WHEN {floor_utc} = t THEN t ELSE "
            f"CAST(timezone('{tz}', date_trunc('day', {loc}) "
            f"+ INTERVAL 1 DAY) AS TIMESTAMP) END)"
        )
        return f"timestamp_ceil(t, 'P1D', null, '{tz}')", ceil_utc
    n = rng.choice([-2, -1, 1, 3])
    period, step = rng.choice([
        ("P1D", "DAY"), ("PT1H", "HOUR"), ("P1M", "MONTH"),
        ("PT15M", "MINUTE"),
    ])
    mult = n * 15 if period == "PT15M" else n
    # DuckDB's parser rejects a negative bare INTERVAL literal
    sign, mag = ("-", -mult) if mult < 0 else ("+", mult)
    return (f"timestamp_shift(t, '{period}', {n})",
            f"(t {sign} INTERVAL {mag} {step})")


def gen_expr(rng: random.Random):
    r = rng.random()
    if r < 0.35:
        return g_long(rng)
    if r < 0.60:
        return g_num(rng)
    if r < 0.85:
        return g_str(rng)
    return g_time(rng)


# ---------------------------------------------------------------------------
# harness: batch-evaluate in Spark and DuckDB, compare per cell
# ---------------------------------------------------------------------------

def _cmp(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def test_fuzz_druidexpr(frame, duck, duck_tbl):
    rng = random.Random(SEED)
    exprs = [gen_expr(rng) for _ in range(N_EXPRS)]
    failures = []
    for start in range(0, len(exprs), BATCH):
        batch = exprs[start:start + BATCH]
        cols, metas = [], []
        for j, (src, sql) in enumerate(batch):
            try:
                cols.append(compile_druid_expr(src, frame).alias(f"e{j}"))
                metas.append((start + j, src, sql))
            except Exception as e:  # noqa: BLE001 - compile crash = bug
                failures.append((start + j, src, sql,
                                 f"compile: {type(e).__name__}: {e}"))
        if not cols:
            continue
        sdf = frame.select("id", *cols).orderBy("id")
        srows = sdf.collect()
        dsql = ("SELECT id, "
                + ", ".join(f"{sql} AS e{j}" for j, (_, _, sql)
                            in enumerate(metas))
                + f" FROM {duck_tbl} ORDER BY id")
        try:
            drows = duck.execute(dsql).fetchall()
        except Exception as e:  # noqa: BLE001 - oracle bug, not engine
            failures.append((start, "<batch oracle>", dsql,
                             f"duckdb: {type(e).__name__}: {e}"))
            continue
        for ri, (srow, drow) in enumerate(zip(srows, drows)):
            for j, (idx, src, sql) in enumerate(metas):
                sv, dv = srow[f"e{j}"], drow[j + 1]
                if not _cmp(sv, dv):
                    failures.append(
                        (idx, src, sql,
                         f"row id={srow['id']}: spark={sv!r} duck={dv!r}"))
    if failures:
        seen = {}
        for idx, src, sql, err in failures:
            seen.setdefault(idx, (src, sql, err))
        msg = [f"{len(seen)}/{N_EXPRS} expressions diverged (seed={SEED}); "
               "first 5:"]
        for idx, (src, sql, err) in list(seen.items())[:5]:
            msg.append(f"--- expr #{idx} ---\n druid: {src}\n sql:   {sql}\n"
                       f" {err}")
        raise AssertionError("\n".join(msg))


# Regressions pinned from fuzz-found divergences: (druid_src, duck_sql).
PINNED_EXPRS: list[tuple[str, str]] = [
    # F.ceil/F.floor return LONG and clamped |x| > 2^63 to 9.2e18;
    # Druid's are double-preserving Math.ceil/floor
    ("ceil(exp(d / 200.0))", "CAST(ceil(exp(d / 200.0)) AS DOUBLE)"),
    ("floor(0.0 - exp(d / 200.0))",
     "CAST(floor(0.0 - exp(d / 200.0)) AS DOUBLE)"),
    # right's n<=0 fast path swallowed null strings (seed-42 find)
    ("right(regexp_extract(s, '([aeiou])', 1), 0)",
     "right(NULLIF(regexp_extract(s, '([aeiou])', 1), ''), 0)"),
    # right/left beyond the string length return the whole string
    ("right(s, 40)", "right(s, 40)"),
    ("left(s, 40)", "left(s, 40)"),
]


def test_pinned_expr_regressions(frame, duck, duck_tbl):
    for src, sql in PINNED_EXPRS:
        col = compile_druid_expr(src, frame).alias("e0")
        srows = frame.select("id", col).orderBy("id").collect()
        drows = duck.execute(
            f"SELECT id, {sql} AS e0 FROM {duck_tbl} ORDER BY id"
        ).fetchall()
        for srow, drow in zip(srows, drows):
            assert _cmp(srow["e0"], drow[1]), (src, srow["id"],
                                               srow["e0"], drow[1])
