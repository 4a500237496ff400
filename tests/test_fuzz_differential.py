"""Differential query fuzzer (round-5 verdict's top ask).

A seeded generator composes random NATIVE query specs — filter trees
(F1-F14 subset) × granularities × aggregators (A1-A8) × post-aggs
(P1-P5) × dimensionSpecs/extractionFns × limitSpec/having ×
virtualColumns in both dialects — and derives the DuckDB oracle SQL
from the SAME random draw, at generation time, fully independent of the
engine's compilation path. Each spec then runs through
``engine.plan(spec)`` and the oracle through DuckDB, and the results
compare order-insensitively (the driver's own comparison shape).

The generators are PAIRED: every fragment generator returns
``(druid_fragment, sql_fragment)`` built together, which guarantees the
oracle is derivable and keeps it honest (the SQL comes from Druid's
documented semantics — null≡"", two-valued NOT, /→0 — as mirrored by
the hand-written contract oracles, not from the engine).

Reproduce a failure:  FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>
— the report prints the failing spec index, the spec JSON, and the
oracle SQL. Bugs found by fuzzing get pinned in PINNED below.
"""

from __future__ import annotations

import json
import math
import os
import random

from conftest import assert_df_matches_duck

N_SPECS = int(os.environ.get("FUZZ_N", "220"))
SEED = int(os.environ.get("FUZZ_SEED", "20260814"))

# Fixture facts (events at any sf): event_type in {click, purchase,
# error, signup, view} (no nulls), value double 0..~330, user_id long
# 0..14, ts spans January 2024 with sub-second precision.
ET = ["click", "purchase", "error", "signup", "view", "nope", "c"]


def _iso(day: int, hour: int = 0) -> str:
    return f"2024-01-{day:02d}T{hour:02d}:00:00"


def _sqlts(day: int, hour: int = 0) -> str:
    return f"TIMESTAMP '2024-01-{day:02d} {hour:02d}:00:00'"


# ---------------------------------------------------------------------------
# filters: (druid_spec, sql) pairs
# ---------------------------------------------------------------------------

def gen_filter(rng: random.Random, depth: int = 0):
    kinds = [
        "selector", "selector", "in", "bound_num", "bound_lex",
        "bound_lex_num_dim", "like", "regex", "search", "interval",
        "expression", "sel_extract", "bound_extract", "sel_timefmt",
    ]
    if depth < 2:
        kinds += ["and", "or", "not", "and", "or"]
    k = rng.choice(kinds)
    if k == "and" or k == "or":
        n = rng.randint(2, 3)
        subs = [gen_filter(rng, depth + 1) for _ in range(n)]
        glue = " AND " if k == "and" else " OR "
        return (
            {"type": k, "fields": [s[0] for s in subs]},
            "(" + glue.join(s[1] for s in subs) + ")",
        )
    if k == "not":
        sub = gen_filter(rng, depth + 1)
        # fixture dims are non-null, so SQL three-valued NOT == Druid
        # two-valued NOT here
        return {"type": "not", "field": sub[0]}, f"(NOT {sub[1]})"
    if k == "selector":
        v = rng.choice(ET)
        return (
            {"type": "selector", "dimension": "event_type", "value": v},
            f"event_type = '{v}'",
        )
    if k == "in":
        vals = rng.sample(ET, rng.randint(1, 3))
        return (
            {"type": "in", "dimension": "event_type", "values": vals},
            "event_type IN (" + ", ".join(f"'{v}'" for v in vals) + ")",
        )
    if k == "bound_num":
        col = rng.choice(["value", "user_id"])
        spec = {"type": "bound", "dimension": col, "ordering": "numeric"}
        conds = []
        lo = rng.choice([None, rng.randint(0, 150)])
        hi = rng.choice([None, rng.randint(50, 400)])
        if lo is None and hi is None:
            lo = 10
        if lo is not None:
            strict = rng.random() < 0.5
            spec["lower"] = str(lo)
            if strict:
                spec["lowerStrict"] = True
            conds.append(f"{col} {'>' if strict else '>='} {lo}")
        if hi is not None:
            strict = rng.random() < 0.5
            spec["upper"] = str(hi)
            if strict:
                spec["upperStrict"] = True
            conds.append(f"{col} {'<' if strict else '<='} {hi}")
        return spec, "(" + " AND ".join(conds) + ")"
    if k == "bound_lex":
        lo, hi = sorted(rng.sample(["a", "click", "m", "purchase", "z"], 2))
        return (
            {"type": "bound", "dimension": "event_type",
             "lower": lo, "upper": hi, "upperStrict": True},
            f"(event_type >= '{lo}' AND event_type < '{hi}')",
        )
    if k == "bound_lex_num_dim":
        # lexicographic bound over a NUMERIC column: Druid string-coerces
        lo = str(rng.randint(0, 14))
        return (
            {"type": "bound", "dimension": "user_id", "lower": lo},
            f"CAST(user_id AS VARCHAR) >= '{lo}'",
        )
    if k == "like":
        pat = rng.choice(["c%", "%e%", "%w", "%u_c%", "s%p"])
        return (
            {"type": "like", "dimension": "event_type", "pattern": pat},
            f"event_type LIKE '{pat}'",
        )
    if k == "regex":
        pat = rng.choice(["^(c|p)", "e$", "ie|ur", "^s.g"])
        return (
            {"type": "regex", "dimension": "event_type", "pattern": pat},
            f"regexp_matches(event_type, '{pat}')",
        )
    if k == "search":
        v = rng.choice(["ic", "ur", "vi", "err", "LICK"])
        if rng.random() < 0.5:
            q = {"type": "contains", "value": v, "caseSensitive": True}
            sql = f"contains(event_type, '{v}')"
        else:
            q = {"type": "insensitive_contains", "value": v}
            sql = f"contains(lower(event_type), '{v.lower()}')"
        return {"type": "search", "dimension": "event_type", "query": q}, sql
    if k == "interval":
        d1 = rng.randint(2, 20)
        d2 = rng.randint(d1 + 1, 28)
        return (
            {"type": "interval", "dimension": "__time",
             "intervals": [f"{_iso(d1)}/{_iso(d2)}"]},
            f"(ts >= {_sqlts(d1)} AND ts < {_sqlts(d2)})",
        )
    if k == "sel_extract":
        # F13: selector + substring extractionFn (all event_type values
        # are >= 4 chars, so index-0 substrings never go out of range)
        ln = rng.randint(1, 3)
        v = rng.choice(["c", "cl", "vi", "pu", "err", "si", "zz"])[:ln]
        return (
            {"type": "selector", "dimension": "event_type", "value": v,
             "extractionFn": {"type": "substring", "index": 0,
                              "length": ln}},
            f"substr(event_type, 1, {ln}) = '{v}'",
        )
    if k == "bound_extract":
        # lexicographic bound over an upper-cased dimension
        lo = rng.choice(["C", "E", "P", "S"])
        return (
            {"type": "bound", "dimension": "event_type", "lower": lo,
             "extractionFn": {"type": "upper"}},
            f"upper(event_type) >= '{lo}'",
        )
    if k == "sel_timefmt":
        d_ = rng.randint(1, 28)
        return (
            {"type": "selector", "dimension": "__time",
             "value": f"2024-01-{d_:02d}",
             "extractionFn": {"type": "timeFormat",
                              "format": "yyyy-MM-dd"}},
            f"strftime(ts, '%Y-%m-%d') = '2024-01-{d_:02d}'",
        )
    # expression filter: druid dialect, truthy-row semantics
    choice = rng.choice([
        ("value > 120.0", "value > 120.0"),
        ("user_id % 7 == 1", "user_id % 7 = 1"),
        ("strlen(event_type) == 5", "length(event_type) = 5"),
        ("value * 2.0 < user_id * 30", "value * 2.0 < user_id * 30"),
    ])
    return {"type": "expression", "expression": choice[0]}, choice[1]


# ---------------------------------------------------------------------------
# aggregators: (druid_spec, inner_sql, fill_sql_or_None) triples
# fill is the zero-fill identity used for empty spine buckets
# ---------------------------------------------------------------------------

def gen_agg(rng: random.Random, name: str, allow_filtered: bool = True,
            zero_fill_only: bool = False):
    kinds = ["count", "longSum", "doubleSum", "cardinality"]
    if not zero_fill_only:
        kinds += ["longMin", "longMax", "doubleMin", "doubleMax", "percentile"]
    k = rng.choice(kinds)
    guard = None
    if allow_filtered and rng.random() < 0.25:
        guard = gen_filter(rng, depth=2)

    def gx(x):
        return f"CASE WHEN {guard[1]} THEN {x} END" if guard else x

    def wrap(spec):
        if guard:
            return {"type": "filtered", "name": name, "filter": guard[0],
                    "aggregator": spec}
        return spec

    if k == "count":
        spec = {"type": "count", "name": name}
        if guard:
            sql = (f"CAST(coalesce(sum(CASE WHEN {guard[1]} THEN 1 ELSE 0 "
                   f"END), 0) AS BIGINT)")
        else:
            sql = "CAST(count(*) AS BIGINT)"
        return wrap(spec), sql, "0", True
    if k == "longSum":
        f = rng.choice(["user_id", "event_id"])
        spec = {"type": "longSum", "name": name, "fieldName": f}
        return (wrap(spec),
                f"CAST(coalesce(sum({gx(f)}), 0) AS BIGINT)", "0", True)
    if k == "doubleSum":
        spec = {"type": "doubleSum", "name": name, "fieldName": "value"}
        return wrap(spec), f"coalesce(sum({gx('value')}), 0.0)", "0.0", True
    if k == "cardinality":
        f = rng.choice(["event_type", "user_id"])
        spec = {"type": "cardinality", "name": name, "fields": [f]}
        return (wrap(spec),
                f"CAST(count(DISTINCT {gx(f)}) AS BIGINT)", "0", True)
    if k in ("longMin", "longMax"):
        fn = "min" if k == "longMin" else "max"
        spec = {"type": k, "name": name, "fieldName": "user_id"}
        return (wrap(spec),
                f"CAST({fn}({gx('user_id')}) AS BIGINT)", None, False)
    if k in ("doubleMin", "doubleMax"):
        fn = "min" if k == "doubleMin" else "max"
        spec = {"type": k, "name": name, "fieldName": "value"}
        return wrap(spec), f"{fn}({gx('value')})", None, False
    # percentile (exact; DuckDB quantile_cont is the same linear
    # interpolation as Spark's percentile)
    p = rng.choice([0.25, 0.5, 0.9])
    spec = {"type": "percentile", "name": name, "fieldName": "value",
            "probability": p}
    return wrap(spec), f"quantile_cont({gx('value')}, {p})", None, False


# ---------------------------------------------------------------------------
# post-aggs over agg output names (only zero-fill-safe aggs are eligible
# as fields so spine-filled rows stay comparable)
# ---------------------------------------------------------------------------

def gen_postagg(rng: random.Random, name: str, fields: list[str]):
    a = rng.choice(fields)
    b = rng.choice(fields)
    k = rng.choice(["+", "-", "*", "/", "greatest", "least", "const"])
    fa = {"type": "fieldAccess", "fieldName": a}
    fb = {"type": "fieldAccess", "fieldName": b}
    if k == "const":
        c = rng.randint(1, 9)
        spec = {"type": "arithmetic", "name": name, "fn": "*",
                "fields": [fa, {"type": "constant", "value": c}]}
        return spec, f"({a} * {c})"
    if k == "greatest":
        spec = {"type": "doubleGreatest", "name": name, "fields": [fa, fb]}
        return spec, f"greatest({a}, {b})"
    if k == "least":
        spec = {"type": "doubleLeast", "name": name, "fields": [fa, fb]}
        return spec, f"least({a}, {b})"
    spec = {"type": "arithmetic", "name": name, "fn": k, "fields": [fa, fb]}
    if k == "/":
        # Druid arithmetic '/': divide-by-zero yields 0
        return spec, f"(CASE WHEN {b} = 0 THEN 0.0 ELSE {a} / {b} END)"
    return spec, f"({a} {k} {b})"


# ---------------------------------------------------------------------------
# dimensionSpecs: (druid_spec, sql_expr) — output name supplied by caller
# ---------------------------------------------------------------------------

def gen_dim(rng: random.Random, out: str):
    k = rng.choice(["default", "substring", "upper", "lower", "timeFormat"])
    if k == "default":
        return (
            {"type": "default", "dimension": "event_type", "outputName": out},
            "event_type",
        )
    if k == "substring":
        ln = rng.randint(1, 4)
        return (
            {"type": "extraction", "dimension": "event_type",
             "outputName": out,
             "extractionFn": {"type": "substring", "index": 0, "length": ln}},
            f"substr(event_type, 1, {ln})",
        )
    if k in ("upper", "lower"):
        return (
            {"type": "extraction", "dimension": "event_type",
             "outputName": out, "extractionFn": {"type": k}},
            f"{k}(event_type)",
        )
    return (
        {"type": "extraction", "dimension": "__time", "outputName": out,
         "extractionFn": {"type": "timeFormat", "format": "yyyy-MM-dd"}},
        "strftime(ts, '%Y-%m-%d')",
    )


# ---------------------------------------------------------------------------
# granularities: (druid_gran, bucket_sql, step_seconds)
# ---------------------------------------------------------------------------

GRANS = [
    ("day", "CAST(date_trunc('day', ts) AS TIMESTAMP)", 86400),
    ("hour", "CAST(date_trunc('hour', ts) AS TIMESTAMP)", 3600),
    ({"type": "duration", "duration": 21600000},
     "make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) * 1000000)",
     21600),
    ({"type": "duration", "duration": 900000},
     "make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000)",
     900),
]


def gen_virtual(rng: random.Random):
    """(virtualColumn spec, agg spec over it, inner sql, fill, zf_ok)."""
    choice = rng.randrange(4)
    if choice == 0:
        vc = {"type": "expression", "name": "v0",
              "expression": "value * 2 + 1"}
        agg = {"type": "doubleSum", "name": "vagg", "fieldName": "v0"}
        return vc, agg, "coalesce(sum(value * 2 + 1), 0.0)", "0.0", True
    if choice == 1:
        vc = {"type": "expression", "name": "v0",
              "expression": "user_id * 10"}
        agg = {"type": "longSum", "name": "vagg", "fieldName": "v0"}
        return (vc, agg,
                "CAST(coalesce(sum(user_id * 10), 0) AS BIGINT)", "0", True)
    if choice == 2:
        vc = {"type": "expression", "name": "v0",
              "expression": "timestamp_extract(__time, 'HOUR')"}
        agg = {"type": "longMax", "name": "vagg", "fieldName": "v0"}
        return vc, agg, "CAST(max(hour(ts)) AS BIGINT)", None, False
    vc = {"type": "expression", "name": "v0", "dialect": "sql",
          "expression": "abs(value - 100.0)"}
    agg = {"type": "doubleSum", "name": "vagg", "fieldName": "v0"}
    return vc, agg, "coalesce(sum(abs(value - 100.0)), 0.0)", "0.0", True


# ---------------------------------------------------------------------------
# whole-spec generation
# ---------------------------------------------------------------------------

def make_spec(rng: random.Random):
    """Returns (druid_spec, oracle_sql, result_cols)."""
    qtype = rng.choices(
        ["timeseries", "groupBy", "topN"], weights=[45, 45, 10]
    )[0]

    # interval: day-aligned random sub-interval of January; 20% of
    # specs use TWO disjoint intervals (multi-interval semantics —
    # filters AND the zero-fill spine must cover both)
    d1 = rng.choice([1, 1, 1, rng.randint(1, 10)])
    d2 = rng.randint(d1 + 3, min(d1 + 12, 28))
    spans = [(d1, d2)]
    if rng.random() < 0.2 and d2 + 2 < 30:
        d3 = d2 + rng.randint(1, 2)
        d4 = rng.randint(d3 + 1, 31)
        spans.append((d3, d4))
    interval = [f"{_iso(a)}/{_iso(b)}" for a, b in spans]
    time_where = "(" + " OR ".join(
        f"(ts >= {_sqlts(a)} AND ts < {_sqlts(b)})" for a, b in spans
    ) + ")"

    filt = gen_filter(rng) if rng.random() < 0.85 else None
    where = time_where + (f" AND ({filt[1]})" if filt else "")

    # virtual column (25%)
    virtual = gen_virtual(rng) if rng.random() < 0.25 else None

    n_aggs = rng.randint(1, 3)
    aggs, agg_sqls, fills, zf_fields = [], [], {}, []
    for i in range(n_aggs):
        nm = f"a{i}"
        spec_a, sql_a, fill, zf_ok = gen_agg(rng, nm)
        aggs.append(spec_a)
        agg_sqls.append(f"{sql_a} AS {nm}")
        fills[nm] = fill
        if zf_ok:
            zf_fields.append(nm)
    if virtual:
        vc, vagg, vsql, vfill, v_zf = virtual
        aggs.append(vagg)
        agg_sqls.append(f"{vsql} AS vagg")
        fills["vagg"] = vfill
        if v_zf:
            zf_fields.append("vagg")
    agg_names = [a["name"] for a in aggs]

    postaggs, post_sqls = [], []
    if zf_fields and rng.random() < 0.5:
        for j in range(rng.randint(1, 2)):
            nm = f"p{j}"
            spec_p, sql_p = gen_postagg(rng, nm, zf_fields)
            postaggs.append(spec_p)
            post_sqls.append((nm, sql_p))

    base = {
        "queryType": qtype,
        "dataSource": "events",
        "intervals": interval,
        "aggregations": aggs,
        "context": {"useExactCountDistinct": True},
    }
    if filt:
        base["filter"] = filt[0]
    if virtual:
        base["virtualColumns"] = [virtual[0]]
    if postaggs:
        base["postAggregations"] = postaggs

    if qtype == "timeseries":
        gran_all = rng.random() < 0.2
        if gran_all:
            base["granularity"] = "all"
            base["context"]["skipEmptyBuckets"] = True
            cols = agg_names + [p["name"] for p in postaggs]
            sql = (
                "WITH agg AS (SELECT " + ", ".join(agg_sqls)
                + f" FROM events WHERE {where})"
                + " SELECT " + ", ".join(
                    agg_names + [f"{s} AS {n}" for n, s in post_sqls])
                + " FROM agg"
            )
            return base, sql, cols
        gran, bucket_sql, step = rng.choice(GRANS)
        base["granularity"] = gran
        skip_empty = rng.random() < 0.5
        cols = ["ts_bucket"] + agg_names + [p["name"] for p in postaggs]
        inner = (
            f"SELECT {bucket_sql} AS ts_bucket, " + ", ".join(agg_sqls)
            + f" FROM events WHERE {where} GROUP BY 1"
        )
        if skip_empty:
            base["context"]["skipEmptyBuckets"] = True
            sql = (
                f"WITH agg AS ({inner}) SELECT ts_bucket, "
                + ", ".join(agg_names + [f"{s} AS {n}" for n, s in post_sqls])
                + " FROM agg"
            )
            return base, sql, cols
        # zero-filled: full-interval spine; sums/counts fill with their
        # identities, min/max/percentile stay NULL; post-aggs evaluate
        # on the FILLED values (only zero-fill-safe fields are eligible)
        filled = []
        for nm in agg_names:
            f = fills[nm]
            filled.append(
                f"coalesce({nm}, {f}) AS {nm}" if f is not None else nm)
        post_on_filled = []
        for n, s in post_sqls:
            s2 = s
            for nm in zf_fields:
                if fills[nm] is not None:
                    s2 = s2.replace(nm, f"coalesce({nm}, {fills[nm]})")
            post_on_filled.append(f"{s2} AS {n}")
        spine_sql = " UNION ALL ".join(
            f"SELECT unnest(generate_series({_sqlts(a)}, "
            f"{_sqlts(b)} - INTERVAL {step} SECOND, "
            f"INTERVAL {step} SECOND)) AS ts_bucket"
            for a, b in spans
        )
        sql = (
            f"WITH spine AS ({spine_sql}), "
            f"agg AS ({inner}) "
            "SELECT spine.ts_bucket, "
            + ", ".join(filled + post_on_filled)
            + " FROM spine LEFT JOIN agg USING (ts_bucket)"
        )
        return base, sql, cols

    if qtype == "groupBy":
        n_dims = rng.randint(1, 2)
        dims, dim_sqls = [], []
        for i in range(n_dims):
            d, s = gen_dim(rng, f"d{i}")
            dims.append(d)
            dim_sqls.append(f"{s} AS d{i}")
        dim_names = [f"d{i}" for i in range(n_dims)]
        base["dimensions"] = dims
        gran_all = rng.random() < 0.6
        if gran_all:
            base["granularity"] = "all"
            group_cols, group_sqls = dim_names, dim_sqls
        else:
            base["granularity"] = "day"
            group_cols = ["ts_bucket"] + dim_names
            group_sqls = (
                ["CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket"]
                + dim_sqls
            )
        cols = group_cols + agg_names + [p["name"] for p in postaggs]
        inner = (
            "SELECT " + ", ".join(group_sqls + agg_sqls)
            + f" FROM events WHERE {where} GROUP BY "
            + ", ".join(str(i + 1) for i in range(len(group_cols)))
        )
        sql = (
            f"WITH agg AS ({inner}) SELECT "
            + ", ".join(group_cols + agg_names
                        + [f"{s} AS {n}" for n, s in post_sqls])
            + " FROM agg"
        )
        # having on a numeric agg (30%)
        having = None
        num_aggs = [n for n in zf_fields if n in agg_names]
        if num_aggs and rng.random() < 0.3:
            hn = rng.choice(num_aggs)
            hv = rng.choice([0, 5, 50])
            having = (hn, hv)
            base["having"] = {"type": "greaterThan", "aggregation": hn,
                             "value": hv}
            sql += f" WHERE {hn} > {hv}"
        # limitSpec (gran-all only; dims appended as tiebreakers so the
        # selected SET is deterministic)
        if gran_all and num_aggs and rng.random() < 0.35:
            mn = rng.choice(num_aggs)
            direction = rng.choice(["ascending", "descending"])
            limit = rng.randint(2, 6)
            cols_spec = [{"dimension": mn, "direction": direction,
                          "dimensionOrder": "numeric"}]
            for dn in dim_names:
                cols_spec.append({"dimension": dn, "direction": "ascending",
                                  "dimensionOrder": "lexicographic"})
            base["limitSpec"] = {"type": "default", "limit": limit,
                                 "columns": cols_spec}
            sql += (
                f" ORDER BY {mn} {'ASC' if direction == 'ascending' else 'DESC'}, "
                + ", ".join(f"{dn} ASC" for dn in dim_names)
                + f" LIMIT {limit}"
            )
        return base, sql, cols

    # topN: engine tie-breaks by dimension ascending (contract-pinned),
    # so the selected set is deterministic
    d, dsql = gen_dim(rng, "d0")
    base["granularity"] = "all"
    base["dimension"] = d
    num_aggs = [n for n in zf_fields if n in agg_names]
    metric = rng.choice(num_aggs) if num_aggs else agg_names[0]
    base["metric"] = metric
    threshold = rng.randint(2, 8)
    base["threshold"] = threshold
    cols = ["d0"] + agg_names + [p["name"] for p in postaggs]
    inner = (
        f"SELECT {dsql} AS d0, " + ", ".join(agg_sqls)
        + f" FROM events WHERE {where} GROUP BY 1"
    )
    sql = (
        f"WITH agg AS ({inner}), ranked AS ("
        "SELECT *, row_number() OVER ("
        f"ORDER BY {metric} DESC, d0 ASC) AS rn FROM agg) "
        "SELECT "
        + ", ".join(["d0"] + agg_names
                    + [f"{s} AS {n}" for n, s in post_sqls])
        + f" FROM ranked WHERE rn <= {threshold}"
    )
    return base, sql, cols


# ---------------------------------------------------------------------------
# null≡"" fuzz surface: filter trees over a null-bearing table
# ---------------------------------------------------------------------------
# Built from events with IDENTICAL SQL in Spark and DuckDB, so both
# engines see byte-identical data: d is a nullable/''-bearing string
# dim, tag a second one (for columnComparison).
NULLIFY = """
SELECT event_id, ts, user_id, value,
  CASE WHEN user_id % 5 = 0 THEN NULL
       WHEN user_id % 7 = 0 THEN '' ELSE event_type END AS d,
  CASE WHEN event_id % 3 = 0 THEN NULL
       WHEN event_id % 3 = 1 THEN '' ELSE substr(event_type, 1, 2) END AS tag
FROM events
"""


def gen_nfilter(rng: random.Random, depth: int = 0):
    """Null-aware (druid_filter, sql) pairs. Every leaf's SQL encodes
    Druid 0.12 two-valued null≡"" semantics explicitly (COALESCE to ''
    on dims, COALESCE(pred, FALSE) overall), so NOT over null dims and
    extraction-over-null compositions are oracle-checked mechanically —
    the interaction class test_filter_null_multivalue.py samples by
    hand."""
    kinds = [
        "selector", "selector_empty", "in", "in_with_empty", "bound_lex",
        "like", "regex", "search", "colcmp", "sel_extract", "bound_num",
    ]
    if depth < 2:
        kinds += ["and", "or", "not", "not"]
    k = rng.choice(kinds)
    dim = rng.choice(["d", "tag"])
    if k in ("and", "or"):
        subs = [gen_nfilter(rng, depth + 1) for _ in range(rng.randint(2, 3))]
        glue = " AND " if k == "and" else " OR "
        return (
            {"type": k, "fields": [s[0] for s in subs]},
            "(" + glue.join(s[1] for s in subs) + ")",
        )
    if k == "not":
        sub = gen_nfilter(rng, depth + 1)
        return {"type": "not", "field": sub[0]}, f"(NOT {sub[1]})"
    if k == "selector":
        v = rng.choice(["click", "cl", "er", "view", "zz"])
        return (
            {"type": "selector", "dimension": dim, "value": v},
            f"COALESCE((COALESCE({dim}, '') = '{v}'), FALSE)",
        )
    if k == "selector_empty":
        v = rng.choice(["", None])
        return (
            {"type": "selector", "dimension": dim, "value": v},
            f"COALESCE((COALESCE({dim}, '') = ''), FALSE)",
        )
    if k == "in":
        vals = rng.sample(["click", "cl", "pu", "view", "si", "zz"],
                          rng.randint(1, 3))
        return (
            {"type": "in", "dimension": dim, "values": vals},
            f"COALESCE((COALESCE({dim}, '') IN ("
            + ", ".join(f"'{v}'" for v in vals) + ")), FALSE)",
        )
    if k == "in_with_empty":
        vals = ["cl", ""]
        return (
            {"type": "in", "dimension": dim, "values": vals},
            f"COALESCE((COALESCE({dim}, '') IN ('cl', '')), FALSE)",
        )
    if k == "bound_lex":
        lo, hi = sorted(rng.sample(["", "a", "cl", "m", "z"], 2))
        return (
            {"type": "bound", "dimension": dim, "lower": lo, "upper": hi},
            f"COALESCE((COALESCE({dim}, '') >= '{lo}' "
            f"AND COALESCE({dim}, '') <= '{hi}'), FALSE)",
        )
    if k == "bound_num":
        lo = rng.randint(0, 200)
        return (
            {"type": "bound", "dimension": "value", "lower": str(lo),
             "ordering": "numeric"},
            f"COALESCE((value >= {lo}), FALSE)",
        )
    if k == "like":
        pat = rng.choice(["c%", "%l%", "%", "e_"])
        return (
            {"type": "like", "dimension": dim, "pattern": pat},
            f"COALESCE((COALESCE({dim}, '') LIKE '{pat}'), FALSE)",
        )
    if k == "regex":
        pat = rng.choice(["^c", "l", "^$", "^(e|v)"])
        return (
            {"type": "regex", "dimension": dim, "pattern": pat},
            f"COALESCE(regexp_matches(COALESCE({dim}, ''), '{pat}'), FALSE)",
        )
    if k == "search":
        v = rng.choice(["c", "l", "VI"])
        return (
            {"type": "search", "dimension": dim,
             "query": {"type": "insensitive_contains", "value": v}},
            f"COALESCE(contains(lower(COALESCE({dim}, '')), '{v.lower()}'), "
            "FALSE)",
        )
    if k == "colcmp":
        return (
            {"type": "columnComparison", "dimensions": ["d", "tag"]},
            "COALESCE((COALESCE(d, '') = COALESCE(tag, '')), FALSE)",
        )
    # selector + substring extractionFn over a possibly-null dim:
    # extraction(null) is null, selector '' matches it
    ln = rng.randint(1, 3)
    v = rng.choice(["c", "cl", "e", ""])
    if v == "":
        sql = f"COALESCE((COALESCE(substr({dim}, 1, {ln}), '') = ''), FALSE)"
    else:
        sql = f"COALESCE((substr({dim}, 1, {ln}) = '{v}'), FALSE)"
    return (
        {"type": "selector", "dimension": dim, "value": v,
         "extractionFn": {"type": "substring", "index": 0, "length": ln}},
        sql,
    )


def test_fuzz_null_semantics(spark, engine, duck):
    """Random two-valued filter trees over null/''-bearing dims, counted
    and grouped, vs null-aware oracle SQL."""
    from coolplaydruid_spark.catalog import TIME_COLUMN  # noqa: F401

    engine.catalog.register(
        "events_nulls", df=spark.sql(NULLIFY), time_column="ts",
        as_view=False,
    )
    try:
        duck.execute("CREATE VIEW events_nulls AS " + NULLIFY)
    except Exception:
        pass  # already registered by a prior (xdist/rerun) pass
    rng = random.Random(SEED + 1)
    failures = []
    n = max(60, N_SPECS // 3)
    for idx in range(n):
        filt, fsql = gen_nfilter(rng)
        group = rng.random() < 0.4
        spec = {
            "queryType": "groupBy" if group else "timeseries",
            "dataSource": "events_nulls",
            "granularity": "all",
            "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
            "filter": filt,
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "longSum", "name": "us", "fieldName": "user_id"},
            ],
            "context": {"skipEmptyBuckets": True},
        }
        where = ("(ts >= TIMESTAMP '2024-01-01' AND "
                 "ts < TIMESTAMP '2024-02-01') AND " + fsql)
        if group:
            # raw grouping: both engines keep null and '' as distinct
            # groups, so the comparison is engine-consistent
            spec["dimensions"] = [
                {"type": "default", "dimension": "d", "outputName": "d0"}]
            sql = ("SELECT d AS d0, CAST(count(*) AS BIGINT) AS rows, "
                   "CAST(coalesce(sum(user_id), 0) AS BIGINT) AS us "
                   f"FROM events_nulls WHERE {where} GROUP BY 1")
            cols = ["d0", "rows", "us"]
        else:
            sql = ("SELECT CAST(count(*) AS BIGINT) AS rows, "
                   "CAST(coalesce(sum(user_id), 0) AS BIGINT) AS us "
                   f"FROM events_nulls WHERE {where}")
            cols = ["rows", "us"]
        try:
            _run_one(engine, duck, spec, sql, cols)
        except AssertionError as e:
            failures.append((idx, spec, sql, str(e)))
        except Exception as e:
            failures.append((idx, spec, sql, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{n} null-semantics specs failed "
               f"(seed={SEED + 1}); first 3:"]
        for idx, spec, sql, err in failures[:3]:
            msg.append(
                f"--- spec #{idx} ---\n{json.dumps(spec, indent=1)}\n"
                f"--- oracle ---\n{sql}\n--- error ---\n{err[:2000]}"
            )
        raise AssertionError("\n".join(msg))


# ---------------------------------------------------------------------------
# multi-value dimension fuzz surface (Druid 0.12 MV semantics)
# ---------------------------------------------------------------------------
# docs_mv: documents with tags = split(text) — an ArrayType dimension.
# Druid leaf filters match when ANY element matches; groupBy on an MV
# dim explodes one group per element of every MATCHING ROW (including
# elements the filter didn't match — the documented Druid gotcha).
MV_WORDS = ["spark", "join", "scan", "window", "the", "batch", "dup",
            "merge", "zzz"]


def gen_mv_filter(rng: random.Random, depth: int = 0):
    kinds = ["selector", "in", "bound", "like", "regex", "search",
             "scalar_selector"]
    if depth < 2:
        kinds += ["and", "or", "not"]
    k = rng.choice(kinds)
    if k in ("and", "or"):
        subs = [gen_mv_filter(rng, depth + 1)
                for _ in range(rng.randint(2, 3))]
        glue = " AND " if k == "and" else " OR "
        return ({"type": k, "fields": [s[0] for s in subs]},
                "(" + glue.join(s[1] for s in subs) + ")")
    if k == "not":
        sub = gen_mv_filter(rng, depth + 1)
        return ({"type": "not", "field": sub[0]},
                f"(NOT COALESCE({sub[1]}, FALSE))")
    if k == "selector":
        v = rng.choice(MV_WORDS)
        return ({"type": "selector", "dimension": "tags", "value": v},
                f"COALESCE(list_contains(tags, '{v}'), FALSE)")
    if k == "in":
        vals = rng.sample(MV_WORDS, rng.randint(1, 3))
        arr = ", ".join(f"'{v}'" for v in vals)
        return ({"type": "in", "dimension": "tags", "values": vals},
                f"COALESCE(list_has_any(tags, [{arr}]), FALSE)")
    if k == "bound":
        lo, hi = sorted(rng.sample(["a", "h", "p", "t", "x"], 2))
        return (
            {"type": "bound", "dimension": "tags", "lower": lo,
             "upper": hi, "upperStrict": True},
            f"COALESCE(len(list_filter(tags, x -> x >= '{lo}' AND "
            f"x < '{hi}')) > 0, FALSE)",
        )
    if k == "like":
        pat = rng.choice(["s%", "%a%", "%up"])
        return (
            {"type": "like", "dimension": "tags", "pattern": pat},
            f"COALESCE(len(list_filter(tags, x -> x LIKE '{pat}')) > 0, "
            "FALSE)",
        )
    if k == "regex":
        pat = rng.choice(["^s", "an$", "a.c"])
        return (
            {"type": "regex", "dimension": "tags", "pattern": pat},
            f"COALESCE(len(list_filter(tags, x -> regexp_matches(x, "
            f"'{pat}'))) > 0, FALSE)",
        )
    if k == "search":
        v = rng.choice(["ar", "oi", "at"])
        return (
            {"type": "search", "dimension": "tags",
             "query": {"type": "insensitive_contains", "value": v}},
            f"COALESCE(len(list_filter(tags, x -> contains(lower(x), "
            f"'{v}'))) > 0, FALSE)",
        )
    v = rng.choice(["en", "es", "de", "fr"])
    return ({"type": "selector", "dimension": "lang", "value": v},
            f"COALESCE(lang = '{v}', FALSE)")


def test_fuzz_multivalue(spark, engine, duck):
    if "docs_mv" not in engine.catalog.names():
        from pyspark.sql import functions as F

        engine.catalog.register(
            "docs_mv",
            df=engine.catalog.table("documents").withColumn(
                "tags", F.split("text", " ")),
            as_view=False,
        )
    try:
        duck.execute(
            "CREATE VIEW docs_mv AS SELECT *, string_split(text, ' ') "
            "AS tags FROM documents"
        )
    except Exception:
        pass
    rng = random.Random(SEED + 2)
    failures = []
    n = max(50, N_SPECS // 4)
    for idx in range(n):
        filt, fsql = gen_mv_filter(rng)
        explode = rng.random() < 0.5
        spec = {
            "queryType": "groupBy" if explode else "timeseries",
            "dataSource": "docs_mv",
            "granularity": "all",
            "filter": filt,
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "longSum", "name": "chars",
                 "fieldName": "n_chars"},
            ],
            "context": {"skipEmptyBuckets": True},
        }
        if explode:
            # MV groupBy: filter selects ROWS, then every element of a
            # matching row becomes a group
            spec["dimensions"] = [
                {"type": "default", "dimension": "tags",
                 "outputName": "tag"}]
            sql = (
                "WITH m AS (SELECT * FROM docs_mv WHERE " + fsql + "), "
                "x AS (SELECT unnest(tags) AS tag, n_chars FROM m) "
                "SELECT tag, CAST(count(*) AS BIGINT) AS rows, "
                "CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars "
                "FROM x GROUP BY 1"
            )
            cols = ["tag", "rows", "chars"]
            df = engine.plan(spec).select(*cols)
        else:
            sql = ("SELECT CAST(count(*) AS BIGINT) AS rows, "
                   "CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars "
                   "FROM docs_mv WHERE " + fsql)
            cols = ["rows", "chars"]
            df = engine.plan(spec).select(*cols)
        try:
            assert_df_matches_duck(df, duck, sql)
        except AssertionError as e:
            failures.append((idx, spec, sql, str(e)))
        except Exception as e:
            failures.append((idx, spec, sql, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{n} multi-value specs failed "
               f"(seed={SEED + 2}); first 3:"]
        for idx, spec, sql, err in failures[:3]:
            msg.append(
                f"--- spec #{idx} ---\n{json.dumps(spec, indent=1)}\n"
                f"--- oracle ---\n{sql}\n--- error ---\n{err[:2000]}"
            )
        raise AssertionError("\n".join(msg))


def test_fuzz_subtotals(engine, duck):
    """groupBy subtotalsSpec (grouping sets): random dimension sets x
    random subset lists (incl. the grand-total empty set), vs DuckDB
    GROUP BY GROUPING SETS — non-included dimensions must come back
    NULL, bucket column present in every set."""
    rng = random.Random(SEED + 3)
    DIMS = [
        ("d0", {"type": "default", "dimension": "event_type",
                "outputName": "d0"}, "event_type"),
        ("d1", {"type": "extraction", "dimension": "event_type",
                "outputName": "d1",
                "extractionFn": {"type": "substring", "index": 0,
                                 "length": 2}},
         "substr(event_type, 1, 2)"),
        ("d2", {"type": "extraction", "dimension": "__time",
                "outputName": "d2",
                "extractionFn": {"type": "timeFormat",
                                 "format": "yyyy-MM-dd"}},
         "strftime(ts, '%Y-%m-%d')"),
    ]
    failures = []
    n = max(30, N_SPECS // 6)
    for idx in range(n):
        nd = rng.randint(2, 3)
        dims = rng.sample(DIMS, nd)
        names = [d[0] for d in dims]
        # 1-3 distinct subsets, maybe incl. the grand total ()
        all_subsets = []
        for _ in range(rng.randint(1, 3)):
            sz = rng.randint(0, nd)
            sub = tuple(sorted(rng.sample(names, sz)))
            if sub not in all_subsets:
                all_subsets.append(sub)
        d1_, d2_ = 1, rng.randint(5, 28)
        spec = {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": rng.choice(["all", "day"]),
            "dimensions": [d[1] for d in dims],
            "subtotalsSpec": [list(s) for s in all_subsets],
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total",
                 "fieldName": "value"},
            ],
            "intervals": [f"{_iso(d1_)}/{_iso(d2_)}"],
        }
        gran_all = spec["granularity"] == "all"
        sets = ", ".join(
            "(" + ", ".join((["ts_bucket"] if not gran_all else [])
                            + list(s)) + ")"
            for s in all_subsets
        )
        used = {nm for s in all_subsets for nm in s}
        # a dim in NO subtotal set is NULL in every output row — and
        # must not appear bare in the SELECT (binder error)
        sel_dims = ", ".join(
            f"{nm}" if nm in used else f"NULL AS {nm}" for nm in names)
        cte = (
            "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS "
            "ts_bucket, "
            + ", ".join(f"{d[2]} AS {d[0]}" for d in dims)
            + ", value FROM events WHERE "
            + f"(ts >= {_sqlts(d1_)} AND ts < {_sqlts(d2_)})"
        )
        sql = (
            f"WITH b AS ({cte}) SELECT "
            + ("" if gran_all else "ts_bucket, ")
            + sel_dims
            + ", CAST(count(*) AS BIGINT) AS rows, sum(value) AS total "
            + f"FROM b GROUP BY GROUPING SETS ({sets})"
        )
        cols = ([] if gran_all else ["ts_bucket"]) + names + [
            "rows", "total"]
        try:
            _run_one(engine, duck, spec, sql, cols)
        except AssertionError as e:
            failures.append((idx, spec, sql, str(e)))
        except Exception as e:
            failures.append((idx, spec, sql, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{n} subtotals specs failed "
               f"(seed={SEED + 3}); first 3:"]
        for idx, spec, sql, err in failures[:3]:
            msg.append(
                f"--- spec #{idx} ---\n{json.dumps(spec, indent=1)}\n"
                f"--- oracle ---\n{sql}\n--- error ---\n{err[:2000]}"
            )
        raise AssertionError("\n".join(msg))


# Regression specs pinned from fuzz-found bugs: (spec, sql, cols).
PINNED: list = []


def _run_one(engine, duck, spec, sql, cols):
    df = engine.plan(json.loads(json.dumps(spec))).select(*cols)
    assert_df_matches_duck(df, duck, sql)


def test_fuzz_differential(engine, duck):
    rng = random.Random(SEED)
    failures = []
    for idx in range(N_SPECS):
        spec, sql, cols = make_spec(rng)
        try:
            _run_one(engine, duck, spec, sql, cols)
        except AssertionError as e:
            failures.append((idx, spec, sql, str(e)))
        except Exception as e:  # engine crash on a valid spec is a bug too
            failures.append((idx, spec, sql, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{N_SPECS} fuzz specs failed "
               f"(seed={SEED}); first 3:"]
        for idx, spec, sql, err in failures[:3]:
            msg.append(
                f"--- spec #{idx} ---\n{json.dumps(spec, indent=1)}\n"
                f"--- oracle ---\n{sql}\n--- error ---\n{err[:2000]}"
            )
        raise AssertionError("\n".join(msg))


def test_pinned_regressions(engine, duck):
    for spec, sql, cols in PINNED:
        _run_one(engine, duck, spec, sql, cols)
