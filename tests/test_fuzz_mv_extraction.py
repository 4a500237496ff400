"""Differential fuzzer for multi-value dimensions × extractionFns ×
filter leaves (r7 verdict #2 — filters.py's extraction-over-null MV
branch is the newest least-tested engine path; every first fuzzer on a
surface here has found a real bug).

A seeded generator draws (extractionFn, leaf filter) pairs — lookup
(plain/retain/replace), regex (with/without replaceMissingValue),
substring, strlen, stringFormat, lower/upper, two-step cascades ×
selector/in/bound leaves — over an ArrayType dimension that covers
every degenerate shape: NULL arrays, empty arrays, arrays containing
NULL elements, arrays containing '' elements. The DuckDB oracle is
built from the SAME draw as ONE uniform rule (independent of the
implementation's branch structure in functions/filters.py):

    Druid 0.12 semantics: a NULL/empty array is ONE null value; a leaf
    with an extractionFn matches a row iff ANY element e satisfies
    leaf(ext(e)), where a null extracted value is equivalent to ''
    (null ≡ "" everywhere).

so in SQL, with elems = (tags NULL/empty → [NULL] else tags):

    len(list_filter(elems, x ->
        COALESCE(leaf(ext(x)), FALSE)
        OR (ext(x) IS NULL AND COALESCE(leaf(''), FALSE)))) > 0

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import json
import os
import random

import pytest

from conftest import assert_df_matches_duck

N_SPECS = int(os.environ.get("FUZZ_N", "120"))
SEED = int(os.environ.get("FUZZ_SEED", "20260814"))

WORDS = ["alpha", "brown", "spark", "he", "a", "zz9", "x", "mid", "scan"]
# leaf comparison values: extraction outputs land here often enough to
# exercise both match and miss paths (lookup outputs, printf wraps,
# strlen digits, fragments, '' and None for the null≡"" rule)
LEAF_VALUES = ["a", "b", "al", "X", "Y", "z9", "RM", "miss", "2", "5",
               "[a]", "he!", "null", "", None]
BOUNDS = ["", "a", "b", "e", "m", "s", "x", "3"]


def _q(v) -> str:
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


def gen_extraction(rng: random.Random):
    """One draw → (extraction spec | None, sql_fn) where sql_fn(x) is
    the DuckDB expression computing the extraction over element x."""
    kind = rng.choice(["none", "substring", "regex", "lookup", "strlen",
                       "stringFormat", "case", "cascade"])
    if kind == "none":
        return None, lambda x: x
    if kind == "substring":
        index = rng.randint(0, 3)
        length = rng.choice([None, 1, 2])
        spec = {"type": "substring", "index": index}
        if length is not None:
            spec["length"] = length
        sql_len = 1000000 if length is None else length
        return spec, lambda x: (
            f"(CASE WHEN length({x}) > {index} "
            f"THEN substr({x}, {index + 1}, {sql_len}) ELSE NULL END)"
        )
    if kind == "regex":
        pat = rng.choice(["^(.)", "([a-z]+)", "([0-9]+)", "(a.)", "(z*)"])
        spec = {"type": "regex", "expr": pat}
        missing = "NULL"
        if rng.random() < 0.5:
            spec["replaceMissingValue"] = True
            w = rng.choice([None, "miss", ""])
            if w is not None:
                spec["replaceMissingValueWith"] = w
            missing = _q(w)
        m = missing

        def sql(x, pat=pat, m=m):
            e = f"regexp_extract({x}, {_q(pat)}, 1)"
            return f"(CASE WHEN {e} = '' THEN {m} ELSE {e} END)"

        return spec, sql
    if kind == "lookup":
        keys = rng.sample(WORDS, rng.randint(1, 3))
        if rng.random() < 0.2:
            keys.append("")
        mapping = {k: rng.choice(["X", "Y", "z9", ""]) for k in keys}
        spec = {"type": "lookup", "lookup": {"type": "map", "map": mapping}}
        mode = rng.choice(["plain", "retain", "replace"])
        if mode == "retain":
            spec["retainMissingValue"] = True
        rm = None
        if mode == "replace":
            rm = rng.choice(["RM", ""])
            spec["replaceMissingValueWith"] = rm

        def sql(x, mapping=mapping, mode=mode, rm=rm):
            whens = " ".join(
                f"WHEN {x} = {_q(k)} THEN {_q(v)}" for k, v in mapping.items()
            )
            e = f"(CASE {whens} ELSE NULL END)"
            if mode == "retain":
                return f"COALESCE({e}, {x})"
            if mode == "replace":
                return f"COALESCE({e}, {_q(rm)})"
            return e

        return spec, sql
    if kind == "strlen":
        return ({"type": "strlen"},
                lambda x: f"CAST(length({x}) AS VARCHAR)")
    if kind == "stringFormat":
        fmt = rng.choice(["[%s]", "%s!", "p-%s"])
        handling = rng.choice(["NULLSTRING", "EMPTYSTRING", "RETURNNULL"])
        spec = {"type": "stringFormat", "format": fmt}
        if handling != "NULLSTRING":
            spec["nullHandling"] = handling

        def sql(x, fmt=fmt, handling=handling):
            if handling == "RETURNNULL":
                return (f"(CASE WHEN {x} IS NULL THEN NULL "
                        f"ELSE printf({_q(fmt)}, {x}) END)")
            sub = "null" if handling == "NULLSTRING" else ""
            return f"printf({_q(fmt)}, COALESCE({x}, {_q(sub)}))"

        return spec, sql
    if kind == "case":
        lower = rng.random() < 0.5
        return ({"type": "lower" if lower else "upper"},
                (lambda x: f"lower({x})") if lower else
                (lambda x: f"upper({x})"))
    # cascade: two simple steps composed left-to-right
    s1, f1 = gen_extraction(rng)
    s2, f2 = gen_extraction(rng)
    while s1 is None or s1.get("type") == "cascade":
        s1, f1 = gen_extraction(rng)
    while s2 is None or s2.get("type") == "cascade":
        s2, f2 = gen_extraction(rng)
    return ({"type": "cascade", "extractionFns": [s1, s2]},
            lambda x: f2(f1(x)))


def gen_leaf(rng: random.Random):
    """One draw → (partial leaf spec, leaf_sql_fn) where leaf_sql_fn(e)
    is the DuckDB predicate over one extracted value e, WITHOUT the
    null≡'' rule (the composer adds it uniformly)."""
    kind = rng.choice(["selector", "in", "bound"])
    if kind == "selector":
        v = rng.choice(LEAF_VALUES)
        spec = {"type": "selector", "value": v}
        if v is None or v == "":
            return spec, lambda e: f"({e} IS NULL OR {e} = '')"
        return spec, lambda e: f"({e} = {_q(v)})"
    if kind == "in":
        vals = rng.sample(LEAF_VALUES, rng.randint(1, 4))
        spec = {"type": "in", "values": vals}
        non_null = [v for v in vals if v is not None and v != ""]

        def sql(e, non_null=non_null, vals=vals):
            parts = []
            if non_null:
                parts.append(
                    f"{e} IN (" + ", ".join(_q(v) for v in non_null) + ")")
            if len(non_null) != len(vals):
                parts.append(f"{e} IS NULL OR {e} = ''")
            return "(" + " OR ".join(parts) + ")" if parts else "FALSE"

        return spec, sql
    lo, hi = sorted(rng.sample(BOUNDS, 2))
    spec = {"type": "bound"}
    parts = []
    if rng.random() < 0.8:
        spec["lower"] = lo
        op = ">" if rng.random() < 0.5 else ">="
        spec["lowerStrict"] = op == ">"
        parts.append(lambda e, lo=lo, op=op: f"{e} {op} {_q(lo)}")
    if rng.random() < 0.8:
        spec["upper"] = hi
        op = "<" if rng.random() < 0.5 else "<="
        spec["upperStrict"] = op == "<"
        parts.append(lambda e, hi=hi, op=op: f"{e} {op} {_q(hi)}")

    def sql(e, parts=parts):
        if not parts:
            return "TRUE"
        return "(" + " AND ".join(p(e) for p in parts) + ")"

    return spec, sql


ELEMS = ("(CASE WHEN tags IS NULL OR len(tags) = 0 "
         "THEN [CAST(NULL AS VARCHAR)] ELSE tags END)")


def gen_mv_extraction_filter(rng: random.Random, depth: int = 0):
    """→ (druid filter spec over 'tags', DuckDB row predicate)."""
    if depth < 1 and rng.random() < 0.3:
        k = rng.choice(["and", "or", "not"])
        if k == "not":
            sub, sql = gen_mv_extraction_filter(rng, depth + 1)
            return ({"type": "not", "field": sub},
                    f"(NOT COALESCE({sql}, FALSE))")
        subs = [gen_mv_extraction_filter(rng, depth + 1) for _ in range(2)]
        glue = " AND " if k == "and" else " OR "
        return ({"type": k, "fields": [s[0] for s in subs]},
                "(" + glue.join(s[1] for s in subs) + ")")
    ext, ext_sql = gen_extraction(rng)
    leaf, leaf_sql = gen_leaf(rng)
    leaf = dict(leaf, dimension="tags")
    if ext is not None:
        leaf["extractionFn"] = ext
    ex = ext_sql("x")
    me = f"COALESCE({leaf_sql(chr(39) + chr(39))}, FALSE)"
    per_el = (f"COALESCE({leaf_sql(ex)}, FALSE) "
              f"OR (({ex}) IS NULL AND {me})")
    return leaf, f"(len(list_filter({ELEMS}, x -> {per_el})) > 0)"


@pytest.fixture(scope="module")
def mvx(spark, engine, duck):
    """docs_mvx: documents + a tags array covering every degenerate
    shape — NULL array, empty array, NULL element, '' element."""
    if "docs_mvx" not in engine.catalog.names():
        from pyspark.sql import functions as F

        base = F.split(F.col("text"), " ")
        m = F.col("doc_id") % 11
        tags = (
            F.when(m == 0, F.lit(None).cast("array<string>"))
            .when(m == 1, F.array().cast("array<string>"))
            .when(m == 2, F.concat(
                F.slice(base, 1, 3),
                F.array(F.lit(None).cast("string"))))
            .when(m == 3, F.concat(F.slice(base, 1, 2), F.array(F.lit(""))))
            .otherwise(F.slice(base, 1, 5))
        )
        engine.catalog.register(
            "docs_mvx",
            df=engine.catalog.table("documents").withColumn("tags", tags),
            as_view=False,
        )
    duck.execute(
            "CREATE OR REPLACE VIEW docs_mvx AS "
            "SELECT * EXCLUDE (base), CASE "
            "WHEN doc_id % 11 = 0 THEN NULL "
            "WHEN doc_id % 11 = 1 THEN CAST([] AS VARCHAR[]) "
            "WHEN doc_id % 11 = 2 THEN "
            "  list_concat(base[1:3], [CAST(NULL AS VARCHAR)]) "
            "WHEN doc_id % 11 = 3 THEN list_concat(base[1:2], ['']) "
            "ELSE base[1:5] END AS tags "
            "FROM (SELECT *, string_split(text, ' ') AS base FROM documents)"
    )
    return engine


def test_fuzz_mv_extraction(mvx, duck):
    rng = random.Random(SEED + 31)
    failures = []
    for idx in range(N_SPECS):
        filt, fsql = gen_mv_extraction_filter(rng)
        spec = {
            "queryType": "timeseries",
            "dataSource": "docs_mvx",
            "granularity": "all",
            "filter": filt,
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "longSum", "name": "chars", "fieldName": "n_chars"},
            ],
            "context": {"skipEmptyBuckets": True},
        }
        sql = ("SELECT CAST(count(*) AS BIGINT) AS rows, "
               "CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars "
               "FROM docs_mvx WHERE " + fsql)
        try:
            df = mvx.plan(spec).select("rows", "chars")
            assert_df_matches_duck(df, duck, sql)
        except AssertionError as e:
            failures.append((idx, filt, sql, str(e)))
        except Exception as e:
            failures.append((idx, filt, sql, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{N_SPECS} MV×extraction specs failed "
               f"(seed={SEED + 31}); first 3:"]
        for idx, filt, sql, err in failures[:3]:
            msg.append(
                f"--- filter #{idx} ---\n{json.dumps(filt, indent=1)}\n"
                f"--- oracle ---\n{sql}\n--- error ---\n{err[:2000]}"
            )
        raise AssertionError("\n".join(msg))


def test_fuzz_mv_extraction_groupby_dimension(mvx, duck):
    """The orthogonal surface: an extraction DIMENSION over an MV
    column in groupBy (explode → per-element extraction → group),
    combined with an independent MV×extraction filter. Druid semantics:
    the filter selects ROWS; every element of a matching row (a
    null/empty array being one null element) becomes a group keyed by
    its extracted value. '' and null extracted values group separately
    (the engine's established contract, same as the driver oracles)."""
    rng = random.Random(SEED + 32)
    failures = []
    n = max(30, N_SPECS // 3)
    for idx in range(n):
        ext, ext_sql = gen_extraction(rng)
        filt, fsql = gen_mv_extraction_filter(rng)
        dimspec = {"type": "extraction", "dimension": "tags",
                   "outputName": "tag"}
        if ext is not None:
            dimspec["extractionFn"] = ext
        else:
            dimspec["type"] = "default"
        spec = {
            "queryType": "groupBy",
            "dataSource": "docs_mvx",
            "granularity": "all",
            "filter": filt,
            "dimensions": [dimspec],
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "longSum", "name": "chars", "fieldName": "n_chars"},
            ],
            "context": {"skipEmptyBuckets": True},
        }
        sql = (
            "WITH m AS (SELECT * FROM docs_mvx WHERE " + fsql + "), "
            "x AS (SELECT unnest(" + ELEMS + ") AS el, n_chars FROM m) "
            "SELECT " + ext_sql("el") + " AS tag, "
            "CAST(count(*) AS BIGINT) AS rows, "
            "CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars "
            "FROM x GROUP BY 1"
        )
        try:
            df = mvx.plan(spec).select("tag", "rows", "chars")
            assert_df_matches_duck(df, duck, sql)
        except AssertionError as e:
            failures.append((idx, dimspec, filt, sql, str(e)))
        except Exception as e:
            failures.append((idx, dimspec, filt, sql,
                             f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{n} MV extraction-dimension specs "
               f"failed (seed={SEED + 32}); first 3:"]
        for idx, dimspec, filt, sql, err in failures[:3]:
            msg.append(
                f"--- dim #{idx} ---\n{json.dumps(dimspec, indent=1)}\n"
                f"--- filter ---\n{json.dumps(filt, indent=1)}\n"
                f"--- oracle ---\n{sql}\n--- error ---\n{err[:2000]}"
            )
        raise AssertionError("\n".join(msg))


# regressions found by this fuzzer, pinned as explicit (filter, oracle
# predicate) pairs — see test_pinned_mv_extraction
PINNED: list[tuple[dict, str]] = [
    # null ELEMENT ≡ '': arrays containing NULL must match an `in`
    # whose values include null/'' (arrays_overlap/array_contains skip
    # null elements — found by this fuzzer, r8)
    (
        {"type": "in", "dimension": "tags", "values": [None, "", "b"]},
        "(len(list_filter(" + ELEMS + ", x -> x IS NULL OR x = '' "
        "OR x = 'b')) > 0)",
    ),
    # same rule for the selector('') fast path
    (
        {"type": "selector", "dimension": "tags", "value": ""},
        "(len(list_filter(" + ELEMS + ", x -> x IS NULL OR x = '')) > 0)",
    ),
    # same rule through per_element with NO extractionFn: a bound whose
    # range admits '' must match a null element (the `ex is not None`
    # guard dropped r8)
    (
        {"type": "bound", "dimension": "tags", "upper": "m",
         "upperStrict": True},
        "(len(list_filter(" + ELEMS + ", x -> x < 'm' OR x IS NULL "
        "OR x = '')) > 0)",
    ),
]


def test_pinned_mv_extraction(mvx, duck):
    for filt, fsql in PINNED:
        spec = {
            "queryType": "timeseries", "dataSource": "docs_mvx",
            "granularity": "all", "filter": filt,
            "aggregations": [{"type": "count", "name": "rows"}],
            "context": {"skipEmptyBuckets": True},
        }
        sql = ("SELECT CAST(count(*) AS BIGINT) AS rows "
               "FROM docs_mvx WHERE " + fsql)
        assert_df_matches_duck(mvx.plan(spec).select("rows"), duck, sql)
