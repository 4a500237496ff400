"""Property-based differential testing: hypothesis generates random Druid
query specs; an independent spec→SQL translator (below) renders the same
semantics for DuckDB; results must match exactly.

This is the SURVEY §5.2 oracle strategy generalized — instead of a fixed
query list, the spec space itself is sampled: filter trees up to depth 3,
all simple granularities, aggregator combinations, and the three
aggregation query types."""

from __future__ import annotations

import math

import pytest

try:
    from hypothesis import HealthCheck, example, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


# ---- spec → DuckDB SQL (independent re-implementation of the semantics) ----

EVENT_TYPES = ["click", "view", "purchase", "signup", "login", "error"]


def filter_to_sql(spec) -> str:
    t = spec["type"]
    if t == "selector":
        return f"event_type = '{spec['value']}'"
    if t == "in":
        vals = ", ".join(f"'{v}'" for v in spec["values"])
        return f"event_type IN ({vals})" if vals else "FALSE"
    if t == "bound":
        parts = []
        if spec.get("lower") is not None:
            op = ">" if spec.get("lowerStrict") else ">="
            parts.append(f"value {op} {spec['lower']}")
        if spec.get("upper") is not None:
            op = "<" if spec.get("upperStrict") else "<="
            parts.append(f"value {op} {spec['upper']}")
        return " AND ".join(parts) if parts else "TRUE"
    if t == "like":
        return f"event_type LIKE '{spec['pattern']}'"
    if t == "search":
        return f"contains(lower(event_type), '{spec['query']['value'].lower()}')"
    if t == "not":
        return f"NOT ({filter_to_sql(spec['field'])})"
    if t in ("and", "or"):
        op = " AND " if t == "and" else " OR "
        return "(" + op.join(filter_to_sql(f) for f in spec["fields"]) + ")"
    raise ValueError(t)


GRAN_SQL = {
    "hour": "CAST(date_trunc('hour', ts) AS TIMESTAMP)",
    "day": "CAST(date_trunc('day', ts) AS TIMESTAMP)",
    "week": "CAST(date_trunc('week', ts) AS TIMESTAMP)",
    "month": "CAST(date_trunc('month', ts) AS TIMESTAMP)",
}

AGG_SQL = {
    "count": ("count", "CAST(count(*) AS BIGINT)"),
    "longSum": ("ids", "CAST(sum(event_id) AS BIGINT)"),
    "doubleSum": ("total", "round(sum(value), 4)"),
    "doubleMin": ("vmin", "round(min(value), 4)"),
    "doubleMax": ("vmax", "round(max(value), 4)"),
}
AGG_SPEC = {
    "count": {"type": "count"},
    "longSum": {"type": "longSum", "fieldName": "event_id"},
    "doubleSum": {"type": "doubleSum", "fieldName": "value"},
    "doubleMin": {"type": "doubleMin", "fieldName": "value"},
    "doubleMax": {"type": "doubleMax", "fieldName": "value"},
}
# longSum/doubleSum coalesce to 0 on empty (Druid identity); min/max stay null
AGG_EMPTY_SAFE = {"count", "longSum", "doubleSum"}

WHERE_BASE = "ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'"


# ---- strategies -----------------------------------------------------------

leaf_filter = st.one_of(
    st.builds(
        lambda v: {"type": "selector", "dimension": "event_type", "value": v},
        st.sampled_from(EVENT_TYPES),
    ),
    st.builds(
        lambda vs: {"type": "in", "dimension": "event_type", "values": sorted(vs)},
        st.sets(st.sampled_from(EVENT_TYPES), min_size=1, max_size=4),
    ),
    st.builds(
        lambda lo, hi, ls, us: {
            "type": "bound", "dimension": "value", "ordering": "numeric",
            "lower": str(min(lo, hi)), "upper": str(max(lo, hi)),
            "lowerStrict": ls, "upperStrict": us,
        },
        st.integers(0, 100), st.integers(100, 200), st.booleans(), st.booleans(),
    ),
    st.builds(
        lambda p: {"type": "like", "dimension": "event_type", "pattern": p},
        st.sampled_from(["c%", "%e%", "%n", "p_rchase", "z%"]),
    ),
    st.builds(
        lambda v: {"type": "search", "dimension": "event_type",
                   "query": {"type": "insensitive_contains", "value": v}},
        st.sampled_from(["C", "i", "LOG", "x"]),
    ),
)

filters = st.recursive(
    leaf_filter,
    lambda children: st.one_of(
        st.builds(lambda f: {"type": "not", "field": f}, children),
        st.builds(
            lambda fs: {"type": "and", "fields": fs},
            st.lists(children, min_size=2, max_size=3),
        ),
        st.builds(
            lambda fs: {"type": "or", "fields": fs},
            st.lists(children, min_size=2, max_size=3),
        ),
    ),
    max_leaves=5,
)

agg_sets = st.sets(
    st.sampled_from(list(AGG_SQL)), min_size=1, max_size=3
).map(sorted)

granularities = st.sampled_from(list(GRAN_SQL))


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def _compare(df, duck, sql):
    scols = sorted(df.columns)
    srows = sorted(
        (tuple(_norm(r[c]) for c in scols) for r in df.collect()),
        key=lambda t: tuple(map(str, t)),
    )
    res = duck.execute(sql)
    dcols_raw = [d[0] for d in res.description]
    idx = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    drows = sorted(
        (tuple(_norm(r[i]) for i in idx) for r in res.fetchall()),
        key=lambda t: tuple(map(str, t)),
    )
    assert sorted(dcols_raw) == scols, (sorted(dcols_raw), scols)
    assert len(srows) == len(drows), (len(srows), len(drows), srows[:3], drows[:3])
    for a, b in zip(srows, drows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6), (a, b)
            else:
                assert x == y, (a, b)


COMMON = dict(
    deadline=None,
    max_examples=15,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**COMMON)
@given(f=filters, gran=granularities, aggs=agg_sets)
def test_timeseries_differential(engine, duck, f, gran, aggs):
    q = {
        "queryType": "timeseries",
        "dataSource": "events",
        "granularity": gran,
        "filter": f,
        "aggregations": [dict(AGG_SPEC[a], name=AGG_SQL[a][0]) for a in aggs],
        "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
        "context": {"skipEmptyBuckets": True},
    }
    df = engine.plan(q)
    from pyspark.sql import functions as F

    for a in aggs:
        name = AGG_SQL[a][0]
        if a.startswith("double"):
            df = df.withColumn(name, F.round(name, 4))
    select = ", ".join([f"{GRAN_SQL[gran]} AS ts_bucket"]
                       + [f"{AGG_SQL[a][1]} AS {AGG_SQL[a][0]}" for a in aggs])
    sql = (
        f"SELECT {select} FROM events "
        f"WHERE {WHERE_BASE} AND ({filter_to_sql(f)}) GROUP BY 1"
    )
    _compare(df, duck, sql)


@settings(**COMMON)
@given(f=filters, gran=granularities, aggs=agg_sets, with_dim=st.booleans())
def test_groupby_differential(engine, duck, f, gran, aggs, with_dim):
    dims = ["event_type"] if with_dim else []
    q = {
        "queryType": "groupBy",
        "dataSource": "events",
        "granularity": gran,
        "dimensions": dims,
        "filter": f,
        "aggregations": [dict(AGG_SPEC[a], name=AGG_SQL[a][0]) for a in aggs],
        "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
    }
    df = engine.plan(q)
    from pyspark.sql import functions as F

    for a in aggs:
        name = AGG_SQL[a][0]
        if a.startswith("double"):
            df = df.withColumn(name, F.round(name, 4))
    cols = [f"{GRAN_SQL[gran]} AS ts_bucket"] + dims + [
        f"{AGG_SQL[a][1]} AS {AGG_SQL[a][0]}" for a in aggs
    ]
    group = "1, 2" if dims else "1"
    sql = (
        f"SELECT {', '.join(cols)} FROM events "
        f"WHERE {WHERE_BASE} AND ({filter_to_sql(f)}) GROUP BY {group}"
    )
    _compare(df, duck, sql)


@settings(**COMMON)
@given(f=filters, n=st.integers(1, 6))
def test_topn_differential(engine, duck, f, n):
    q = {
        "queryType": "topN",
        "dataSource": "events",
        "granularity": "all",
        "dimension": "event_type",
        "metric": "total",
        "threshold": n,
        "filter": f,
        "aggregations": [{"type": "doubleSum", "name": "total", "fieldName": "value"}],
        "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
    }
    from pyspark.sql import functions as F

    df = engine.plan(q).drop("ts_bucket").withColumn("total", F.round("total", 4))
    sql = f"""
    WITH agg AS (
      SELECT event_type, round(sum(value), 4) AS total FROM events
      WHERE {WHERE_BASE} AND ({filter_to_sql(f)}) GROUP BY 1
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY total DESC, event_type ASC) AS rn FROM agg
    )
    SELECT event_type, total FROM ranked WHERE rn <= {n}
    """
    _compare(df, duck, sql)


@given(
    n_tokens=st.integers(min_value=0, max_value=400),
    window=st.integers(min_value=1, max_value=120),
    stride_frac=st.integers(min_value=1, max_value=100),
)
@settings(max_examples=30, deadline=None)
def test_chunking_covers_every_token_once_per_overlap(spark, n_tokens, window,
                                                      stride_frac):
    """Invariants for any (n, window, stride): every token appears in at
    least one chunk; stride==window partitions the doc exactly; chunk
    count is ceil-ish bounded; no chunk is empty."""
    from coolplaydruid_spark.operators import chunking

    stride = max(1, min(window, stride_frac * window // 100))
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunking.chunk_documents(df, window=window, stride=stride).collect()
    if n_tokens == 0:
        assert rows == []
        return
    seen = []
    for r in sorted(rows, key=lambda r: r["chunk_index"]):
        toks = r["chunk_text"].split(" ")
        assert 1 <= len(toks) <= window and len(toks) == r["n_tokens"]
        seen.extend(toks)
    assert set(seen) == {f"t{i}" for i in range(n_tokens)}
    if stride == window:
        assert len(seen) == n_tokens  # exact partition, no overlap


@given(
    epoch_day=st.integers(min_value=0, max_value=25000),
    seconds=st.integers(min_value=0, max_value=86399),
    n_months=st.integers(min_value=2, max_value=18),
)
@settings(max_examples=50, deadline=None)
def test_months_bucket_invariants(epoch_day, seconds, n_months):
    """bucket(ts) <= ts < next(bucket(ts)); buckets idempotent; month
    index of every bucket start is a multiple of n_months."""
    from datetime import datetime, timedelta

    from coolplaydruid_spark.functions.granularity import Granularity

    g = Granularity(kind="months", n_months=n_months)
    ts = datetime(1970, 1, 1) + timedelta(days=epoch_day, seconds=seconds)
    b = g.bucket_py(ts)
    assert b <= ts < g.next_bucket_py(b)
    assert g.bucket_py(b) == b
    assert ((b.year - 1970) * 12 + b.month - 1) % n_months == 0
    assert (b.day, b.hour, b.minute, b.second) == (1, 0, 0, 0)


# ---- sessionize vs a pure-Python reference --------------------------------


def _ref_sessionize(rows, gap_seconds):
    """Independent O(n log n) reference: per user, sort by time, split on
    gap > threshold; returns {(user, idx) -> session_seq}."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for i, (u, ts_us) in enumerate(rows):
        by_user[u].append((ts_us, i))
    out = {}
    for u, evts in by_user.items():
        evts.sort()
        seq = 0
        prev = None
        for ts_us, i in evts:
            if prev is None or ts_us - prev > gap_seconds * 1_000_000:
                seq += 1
            out[i] = seq
            prev = ts_us
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # user id (forces collisions)
            st.integers(min_value=0, max_value=7200 * 1_000_000),  # µs offset
        ),
        min_size=1,
        max_size=60,
    ),
    gap=st.sampled_from([1, 60, 1800]),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_sessionize_matches_reference(spark, rows, gap):
    import datetime as dt

    from coolplaydruid_spark.operators import sessions as S

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (idx, u, t0 + dt.timedelta(microseconds=us))
            for idx, (u, us) in enumerate(rows)
        ],
        "idx long, user_id long, ts timestamp_ntz",
    )
    got = {
        r.idx: r.session_seq
        for r in S.sessionize(df, gap_seconds=gap).collect()
    }
    expect = _ref_sessionize(rows, gap)
    # ties at identical (user, ts) may order either way, but session_seq
    # is order-invariant across the tie (gap 0 never splits) — exact match
    assert got == expect


@given(
    texts=st.lists(
        st.text(alphabet="abc 0!é", min_size=0, max_size=30), min_size=1,
        max_size=8,
    )
)
@settings(max_examples=25, deadline=None)
def test_char_entropy_matches_python_reference(spark, texts):
    """char_entropy over arbitrary small texts == a pure-Python Shannon
    computation over the same fixed alphabet (out-of-alphabet chars
    ignored, empty → 0)."""
    import math

    from coolplaydruid_spark.operators import text as text_ops

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r.doc_id: r.char_entropy
           for r in text_ops.char_entropy(df).collect()}
    for i, t in enumerate(texts):
        counts = {}
        for ch in t.lower():
            if ch in text_ops.ENTROPY_ALPHABET:
                counts[ch] = counts.get(ch, 0) + 1
        total = sum(counts.values())
        expect = 0.0
        if total:
            expect = -sum(
                (c / total) * math.log2(c / total) for c in counts.values()
            )
        assert abs(got[i] - round(expect, 6)) < 2e-6, (t, got[i], expect)


@given(
    n_rows=st.integers(min_value=1, max_value=60),
    n_groups=st.integers(min_value=1, max_value=5),
    cap=st.integers(min_value=0, max_value=10),
)
@settings(max_examples=20, deadline=None)
def test_cap_per_group_matches_python_reference(spark, n_rows, n_groups, cap):
    """cap_per_group == a pure-Python md5-rank selection."""
    import hashlib

    from coolplaydruid_spark.operators import sampling

    rows = [(i, f"g{i % n_groups}") for i in range(n_rows)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        r.doc_id for r in sampling.cap_per_group(df, "source", cap).collect()
    )

    def bucket(i):
        h = hashlib.md5(f"|{i}".encode()).hexdigest()
        return int(h[:6], 16)

    expect = []
    for g in {s for _, s in rows}:
        members = sorted(
            (i for i, s in rows if s == g), key=lambda i: (bucket(i), i)
        )
        expect.extend(members[:cap])
    assert got == sorted(expect)


# ---- Druid expression parser vs a pure-Python evaluator ------------------
#
# hypothesis generates random expression TREES (rendered to Druid source
# text); a pure-Python evaluator applies Druid's semantics (long/long
# integral division toward zero, ^-as-power, 1/0 booleans, string +
# concat); the compiled Column must agree on a row of known values.

VARS = {"a": 7, "b": -3, "x": 2.5}


def _expr_leaf():
    return st.one_of(
        st.sampled_from(list(VARS)),
        st.integers(0, 100).map(str),
        st.sampled_from(["1.5", "0.25", "2.0"]),
    )


def _expr_tree(depth=3):
    leaf = _expr_leaf()
    if depth == 0:
        return leaf
    sub = _expr_tree(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["+", "-", "*", "/", "%"]), sub, sub),
        st.tuples(st.sampled_from(["<", "<=", ">", ">=", "==", "!="]), sub, sub),
        st.tuples(st.just("if"), sub, sub, sub),
        st.tuples(st.sampled_from(["min2", "max2", "abs1"]), sub, sub),
    )


def _render(node) -> str:
    if isinstance(node, str):
        return node
    op = node[0]
    if op == "if":
        return f"if({_render(node[1])}, {_render(node[2])}, {_render(node[3])})"
    if op == "min2":
        return f"min({_render(node[1])}, {_render(node[2])})"
    if op == "max2":
        return f"max({_render(node[1])}, {_render(node[2])})"
    if op == "abs1":
        return f"abs({_render(node[1])})"
    return f"({_render(node[1])} {op} {_render(node[2])})"


def _is_long(v) -> bool:
    return isinstance(v, int) and not isinstance(v, bool)


def _eval(node):
    """Pure-Python Druid-semantics evaluator. Returns int (long), float
    (double), or raises ZeroDivisionError (skipped examples)."""
    if isinstance(node, str):
        if node in VARS:
            return VARS[node]
        return int(node) if "." not in node else float(node)
    op = node[0]
    if op == "if":
        return _eval(node[2]) if _truthy_py(_eval(node[1])) else _eval(node[3])
    if op in ("min2", "max2"):
        # Druid's BivariateMathFunction (Math.max/min): the result is long
        # only when BOTH operands are long, else double. Python's max(7, 2.5)
        # returns the *int* 7, which would wrongly steer downstream `/` and
        # `%` onto the long path — coerce to float when either side is.
        u, v = _eval(node[1]), _eval(node[2])
        r = min(u, v) if op == "min2" else max(u, v)
        return float(r) if not (_is_long(u) and _is_long(v)) else r
    if op == "abs1":
        return abs(_eval(node[1]))
    a, b = _eval(node[1]), _eval(node[2])
    if op in ("<", "<=", ">", ">=", "==", "!="):
        import operator

        f = {"<": operator.lt, "<=": operator.le, ">": operator.gt,
             ">=": operator.ge, "==": operator.eq, "!=": operator.ne}[op]
        return 1 if f(a, b) else 0
    both_long = _is_long(a) and _is_long(b)
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    if op == "/":
        if b == 0:
            raise ZeroDivisionError
        if both_long:
            q = abs(a) // abs(b)  # truncation toward zero, Java-style
            return q if (a >= 0) == (b >= 0) else -q
        return a / b
    if op == "%":
        if b == 0:
            raise ZeroDivisionError
        if both_long:
            r = abs(a) % abs(b)  # sign of the dividend, Java-style
            return r if a >= 0 else -r
        return math.fmod(a, b)
    raise ValueError(op)


def _truthy_py(v) -> bool:
    return bool(v)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=_expr_tree())
# r10 falsifier: max(7L, 2.5d) is DOUBLE 7.0 per Druid's
# BivariateMathFunction, so b/max(a,x) double-divides (-1.2) — the old
# oracle long-divided because Python max(7, 2.5) returns int 7.
@example(tree=("/", "b", ("max2", "a", "x")))
@example(tree=("%", "a", ("min2", "x", "b")))
def test_druid_expr_matches_python_semantics(spark, tree):
    from coolplaydruid_spark.functions.druidexpr import compile_druid_expr

    try:
        expected = _eval(tree)
    except ZeroDivisionError:
        return  # Spark yields NULL where Java Druid throws; skip
    src = _render(tree)
    df = spark.createDataFrame(
        [(VARS["a"], VARS["b"], VARS["x"])], "a long, b long, x double"
    )
    got = df.select(compile_druid_expr(src, df).alias("v")).collect()[0]["v"]
    if isinstance(expected, float) or isinstance(got, float):
        assert got == pytest.approx(expected, rel=1e-9, abs=1e-9), src
    else:
        assert got == expected, src


# ---- granularity: Column bucketing must agree with bucket_py ------------
#
# The zero-fill spine is built driver-side from bucket_py while the data
# buckets via the Column path — any disagreement silently drops or
# duplicates result rows, so their exact agreement is a correctness
# invariant, property-checked across granularity kinds here.

GRAN_SPECS = [
    "second", "minute", "hour", "day", "week", "month", "quarter", "year",
    {"type": "duration", "duration": 15 * 60 * 1000},
    {"type": "duration", "duration": 90 * 1000,
     "origin": "2024-01-01T00:00:30"},
    {"type": "period", "period": "PT6H"},
    {"type": "period", "period": "PT1H", "origin": "2024-01-01T00:30:00"},
    {"type": "period", "period": "P2M"},
    {"type": "period", "period": "P1D", "timeZone": "America/New_York"},
    {"type": "period", "period": "P1D", "timeZone": "Asia/Tokyo"},
]


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    epoch_s=st.integers(1_500_000_000, 1_800_000_000),  # 2017..2027
    micros=st.integers(0, 999_999),
    spec=st.sampled_from(GRAN_SPECS),
)
def test_bucket_column_agrees_with_bucket_py(spark, epoch_s, micros, spec):
    import datetime as dt

    from pyspark.sql import functions as F

    from coolplaydruid_spark.functions.granularity import parse_granularity

    g = parse_granularity(spec)
    t = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=epoch_s, microseconds=micros)
    df = spark.createDataFrame([(t,)], "t timestamp")
    got = df.select(g.bucket(F.col("t")).alias("b")).collect()[0]["b"]
    exp = g.bucket_py(t)
    assert got == exp, (spec, t, got, exp)
    # the bucket is a fixed point, and t never precedes its bucket
    assert g.bucket_py(exp) == exp
    assert exp <= t


# ---- span dedup vs a pure-Python reference ------------------------------

def _py_span_stats(docs, window, min_docs=2, within_doc=False):
    """Pure-Python reference for operators/spans.duplicate_span_stats."""
    toks = {i: [t for t in (s or "").lower().split() if t] for i, s in docs}
    wins = {}
    for i, ts in toks.items():
        for p in range(max(len(ts) - window + 1, 0)):
            key = " ".join(ts[p:p + window])
            wins.setdefault(key, []).append((i, p))
    from collections import Counter

    dup_keys = set()
    for k, occ in wins.items():
        nd = len({d for d, _ in occ})
        max_in_doc = max(Counter(d for d, _ in occ).values())
        if nd >= min_docs or (within_doc and max_in_doc >= 2):
            dup_keys.add(k)
    out = {}
    for i, ts in toks.items():
        starts = [p for k in dup_keys for d, p in wins.get(k, []) if d == i]
        covered = {q for p in starts for q in range(p, p + window)}
        out[i] = (len(ts), len(starts), len(covered), len(ts) - len(covered))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=20)
        .map(lambda ws: " ".join(ws)),
        min_size=2, max_size=8,
    ),
    window=st.integers(2, 4),
    within=st.booleans(),
)
def test_span_stats_match_python_reference(spark, docs, window, within):
    from coolplaydruid_spark.operators import spans

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_windows"],
                      r["covered_tokens"], r["retained_tokens"])
        for r in spans.duplicate_span_stats(
            df, window=window, within_doc=within).collect()
    }
    assert got == _py_span_stats(rows, window, within_doc=within), (docs, window, within)


@given(
    texts=st.lists(
        st.text(alphabet="ab c#…théé 12 ", min_size=0, max_size=40),
        min_size=1, max_size=6,
    ),
    n=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=25, deadline=None)
def test_dup_ngram_stats_matches_python_reference(spark, texts, n):
    """The sorted-array run-length fold == a pure-Python character
    accounting over the same ASCII-whitespace tokenization (arbitrary
    texts: unicode letters, repeats, empty, whitespace runs)."""
    import re as _re

    from coolplaydruid_spark.operators import text as text_ops

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r[f"n_{n}grams"], r[f"dup_{n}gram_char_frac"])
        for r in text_ops.dup_ngram_stats(df, ns=(n,)).collect()
    }
    for i, t in enumerate(texts):
        # Spark tokenization: Java \s+ is ASCII; empties filtered
        toks = [x for x in _re.split(r"\s+", t.lower(), flags=_re.ASCII) if x]
        grams = (
            [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
            if len(toks) >= n else []
        )
        counts: dict[str, int] = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        total = sum(c * len(g) for g, c in counts.items())
        dup = sum(c * len(g) for g, c in counts.items() if c >= 2)
        frac = round(dup / total, 6) if total else 0.0
        assert got[i] == (len(grams), frac), (t, n, got[i], (len(grams), frac))


@given(
    texts=st.lists(
        st.text(alphabet="the and with xx# …0 ", min_size=0, max_size=50),
        min_size=1, max_size=6,
    ),
    min_words=st.integers(min_value=0, max_value=8),
    min_stop=st.integers(min_value=0, max_value=3),
)
@settings(max_examples=25, deadline=None)
def test_gopher_filter_matches_python_reference(spark, texts, min_words, min_stop):
    """Gopher rules over arbitrary texts == a pure-Python evaluation of
    the same rounded signals and fixed-order fail reasons."""
    import re as _re

    from coolplaydruid_spark.operators import text as text_ops

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    params = dict(min_words=min_words, max_words=12, min_mean_word_len=1.5,
                  max_mean_word_len=4.0, max_symbol_word_ratio=0.1,
                  min_alpha_word_frac=0.5, min_stop_hits=min_stop)
    got = {
        r["doc_id"]: (r["n_words"], r["mean_word_len"], r["symbol_word_ratio"],
                      r["alpha_word_frac"], r["stop_hits"], r["fail_reasons"],
                      r["passes"])
        for r in text_ops.gopher_quality_filter(df, **params).collect()
    }
    stopset = set(text_ops.LANG_STOPWORDS["en"])
    for i, t in enumerate(texts):
        toks = [x for x in _re.split(r"\s+", t.lower(), flags=_re.ASCII) if x]
        nw = len(toks)
        mean = round(sum(len(x) for x in toks) / nw, 6) if nw else 0.0
        sym = round(sum(t.count(ch) for ch in "#…") / nw, 6) if nw else 0.0
        alpha = (
            round(sum(1 for x in toks if _re.search(r"[a-z]", x)) / nw, 6)
            if nw else 0.0
        )
        stop = len(set(toks) & stopset)
        fails = []
        if nw < min_words:
            fails.append("too_few_words")
        if nw > 12:
            fails.append("too_many_words")
        if mean < 1.5 or mean > 4.0:
            fails.append("mean_word_len")
        if sym > 0.1:
            fails.append("symbol_ratio")
        if alpha < 0.5:
            fails.append("alpha_frac")
        if stop < min_stop:
            fails.append("stopwords")
        expect = (nw, mean, sym, alpha, stop, ",".join(fails), not fails)
        assert got[i] == expect, (t, got[i], expect)


@given(
    texts=st.lists(
        st.text(alphabet="ab bb c é# ", min_size=0, max_size=30),
        min_size=1, max_size=8,
    ),
    min_count=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=20, deadline=None)
def test_pmi_matches_python_reference(spark, texts, min_count):
    """PMI collocations over arbitrary texts == a pure-Python
    reference: exact pair counts and membership, PMI within FP
    tolerance, ordering consistent with the recomputed scores."""
    import math
    import re as _re

    from coolplaydruid_spark.operators import corpus as corpus_ops

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = corpus_ops.pmi_top_pairs(df, k=1000, min_count=min_count).collect()

    pair_counts: dict[str, int] = {}
    tok_counts: dict[str, int] = {}
    for t in texts:
        toks = [x for x in _re.split(r"\s+", t.lower(), flags=_re.ASCII) if x]
        for x in toks:
            tok_counts[x] = tok_counts.get(x, 0) + 1
        for j in range(len(toks) - 1):
            g = toks[j] + " " + toks[j + 1]
            pair_counts[g] = pair_counts.get(g, 0) + 1
    P = sum(pair_counts.values())
    T = sum(tok_counts.values())
    expect = {g: c for g, c in pair_counts.items() if c >= min_count}
    assert {r["pair"] for r in rows} == set(expect)
    for r in rows:
        g = r["pair"]
        assert r["n_pair"] == expect[g]
        w1, w2 = g.split(" ")
        ref = math.log2(
            (expect[g] / P) / ((tok_counts[w1] / T) * (tok_counts[w2] / T))
        )
        assert abs(r["pmi"] - round(ref, 6)) < 2e-6, (g, r["pmi"], ref)
    # returned order is (pmi DESC, pair ASC)
    keys = [(-r["pmi"], r["pair"]) for r in rows]
    assert keys == sorted(keys)
