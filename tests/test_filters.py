"""Filter tree (F1-F14, SURVEY §2.2) — each filter type compiled and
checked against DuckDB over the events fixture."""

import pytest

from tests.conftest import assert_df_matches_duck

BASE = {
    "queryType": "timeseries",
    "dataSource": "events",
    "granularity": "all",
    "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
    "aggregations": [{"type": "count", "name": "rows"}],
}

CASES = [
    (
        {"type": "selector", "dimension": "event_type", "value": "click"},
        "event_type = 'click'",
    ),
    (
        {"type": "not", "field": {"type": "selector", "dimension": "event_type", "value": "click"}},
        "NOT (event_type = 'click')",
    ),
    (
        {"type": "in", "dimension": "event_type", "values": ["click", "view", "signup"]},
        "event_type IN ('click','view','signup')",
    ),
    (
        {"type": "bound", "dimension": "value", "lower": "50", "upper": "150",
         "ordering": "numeric"},
        "value >= 50 AND value <= 150",
    ),
    (
        {"type": "bound", "dimension": "event_type", "lower": "c", "upper": "p",
         "lowerStrict": False, "upperStrict": True},
        "event_type >= 'c' AND event_type < 'p'",
    ),
    (
        # strlen ordering: shorter-first, lexicographic tiebreak —
        # ('view' len 4) within ['buy'(3), 'signup'(6)]; 'purchase'(8) out
        {"type": "bound", "dimension": "event_type", "lower": "buy",
         "upper": "signup", "ordering": "strlen"},
        "(length(event_type) > 3 OR (length(event_type) = 3 AND event_type >= 'buy')) "
        "AND (length(event_type) < 6 OR (length(event_type) = 6 AND event_type <= 'signup'))",
    ),
    (
        # deprecated pre-0.13 "extraction" filter = selector + extractionFn
        {"type": "extraction", "dimension": "event_type", "value": "c",
         "extractionFn": {"type": "substring", "index": 0, "length": 1}},
        "substring(event_type, 1, 1) = 'c'",
    ),
    (
        {"type": "like", "dimension": "event_type", "pattern": "c%"},
        "event_type LIKE 'c%'",
    ),
    (
        {"type": "regex", "dimension": "props", "pattern": '"k": 1\\d'},
        "regexp_matches(props, '\"k\": 1\\d')",
    ),
    (
        {"type": "search", "dimension": "event_type",
         "query": {"type": "insensitive_contains", "value": "CLI"}},
        "contains(lower(event_type), 'cli')",
    ),
    (
        {"type": "interval", "dimension": "__time",
         "intervals": ["2024-01-05T00:00:00/2024-01-06T00:00:00"]},
        "ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'",
    ),
    (
        {"type": "columnComparison", "dimensions": ["event_id", "user_id"]},
        "event_id = user_id",
    ),
    (
        {
            "type": "and",
            "fields": [
                {"type": "selector", "dimension": "event_type", "value": "click"},
                {"type": "not", "field": {"type": "bound", "dimension": "value",
                                          "upper": "100", "ordering": "numeric"}},
            ],
        },
        "event_type = 'click' AND NOT (value <= 100)",
    ),
]


@pytest.mark.parametrize("dfilter,sql_pred", CASES, ids=[c[0]["type"] for c in CASES])
def test_filter_oracle(engine, duck, dfilter, sql_pred):
    df = engine.plan(dict(BASE, filter=dfilter)).select("rows")
    sql = f"""
    SELECT CAST(count(*) AS BIGINT) AS rows FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
      AND ({sql_pred})
    """
    assert_df_matches_duck(df, duck, sql)


def test_filter_counts_nonzero(engine):
    # sanity: the parametrized predicates actually select rows
    df = engine.plan(dict(BASE, filter=CASES[0][0]))
    assert df.collect()[0]["rows"] > 0


def test_extraction_fn_substring_and_lookup(engine, duck):
    q = dict(
        BASE,
        filter={
            "type": "selector",
            "dimension": "event_type",
            "value": "cl",
            "extractionFn": {"type": "substring", "index": 0, "length": 2},
        },
    )
    df = engine.plan(q).select("rows")
    sql = """
    SELECT CAST(count(*) AS BIGINT) AS rows FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
      AND substr(event_type, 1, 2) = 'cl'
    """
    assert_df_matches_duck(df, duck, sql)


def test_python_callable_filter(engine):
    q = dict(
        BASE,
        filter={"type": "javascript", "dimension": "event_type",
                "function": lambda v: v is not None and v.startswith("c")},
    )
    rows = engine.execute(q)
    assert rows[0]["result"]["rows"] > 0


def test_expression_filter(engine):
    """Druid expression filter: row matches when the expression is
    truthy; Druid dialect (== compare, % on longs) compiles natively."""
    df = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "all",
            "intervals": ["2024-01-01T00:00:00/2024-01-08T00:00:00"],
            "filter": {"type": "expression",
                       "expression": "user_id % 2 == 0 && value > 10"},
            "aggregations": [{"type": "count", "name": "n"}],
        }
    )
    n = df.collect()[0]["n"]
    base = engine.catalog.table("events")
    from pyspark.sql import functions as F
    exp = base.where(
        (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08")
        & (F.col("user_id") % 2 == 0) & (F.col("value") > 10)
    ).count()
    assert n == exp > 0


def test_expression_filter_string_comparison(engine):
    """Review-driven regression: string-column comparisons inside an
    expression filter must compare lexically (the filter compiler
    threads the frame's schema through), not cast the string side to
    double and silently match nothing."""
    df = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "all",
            "intervals": ["2024-01-01T00:00:00/2024-01-08T00:00:00"],
            "filter": {"type": "expression", "expression": "event_type == 'click'"},
            "aggregations": [{"type": "count", "name": "n"}],
        }
    )
    n = df.collect()[0]["n"]
    base = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "all",
            "intervals": ["2024-01-01T00:00:00/2024-01-08T00:00:00"],
            "filter": {"type": "selector", "dimension": "event_type",
                       "value": "click"},
            "aggregations": [{"type": "count", "name": "n"}],
        }
    )
    assert n == base.collect()[0]["n"] > 0
