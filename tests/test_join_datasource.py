"""Join/lookup/inline dataSources (public post-0.12 Druid dataSource
types, extension surface): right-prefix column exposure, Druid-expression
equi-conditions, INNER/LEFT semantics, broadcast hint on lookup/inline
right sides, and composition with groupBy/timeseries planners."""

import pytest
from pyspark.sql import functions as F

IV = ["2024-01-01T00:00:00/2024-01-08T00:00:00"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_with_lookup_datasource(engine):
    engine.catalog.register_lookup(
        "type_group", {"click": "engagement", "view": "engagement",
                       "purchase": "revenue"}
    )
    q = {
        "queryType": "groupBy",
        "dataSource": {
            "type": "join",
            "left": "events",
            "right": {"type": "lookup", "lookup": "type_group"},
            "rightPrefix": "r.",
            "condition": 'event_type == "r.k"',
            "joinType": "LEFT",
        },
        "granularity": "all",
        "dimensions": ["r.v"],
        "intervals": IV,
        "aggregations": [{"type": "count", "name": "n"}],
    }
    df = engine.plan(q)
    assert "BroadcastHashJoin" in _plan(df)
    rows = {r["r.v"]: r["n"] for r in df.collect()}
    assert set(rows) == {"engagement", "revenue", None}
    assert rows["engagement"] > rows["revenue"] > 0

    # INNER drops unmatched event types
    inner = engine.plan(
        {**q, "dataSource": {**q["dataSource"], "joinType": "INNER"}}
    )
    inner_rows = {r["r.v"]: r["n"] for r in inner.collect()}
    assert set(inner_rows) == {"engagement", "revenue"}
    assert inner_rows == {k: v for k, v in rows.items() if k is not None}


def test_join_with_inline_datasource(engine, duck):
    """Inline right side + timeseries over the joined frame; oracle via
    DuckDB join."""
    q = {
        "queryType": "timeseries",
        "dataSource": {
            "type": "join",
            "left": "events",
            "right": {
                "type": "inline",
                "columnNames": ["etype", "weight"],
                "rows": [["click", "2"], ["purchase", "10"]],
            },
            "rightPrefix": "w_",
            "condition": 'event_type == "w_etype"',
            "joinType": "INNER",
        },
        "granularity": "day",
        "intervals": ["2024-01-01T00:00:00/2024-01-04T00:00:00"],
        "aggregations": [{"type": "count", "name": "n"}],
        "virtualColumns": [
            {"type": "expression", "name": "wv",
             "expression": "cast(w_weight, 'DOUBLE') * value"},
        ],
        "context": {"skipEmptyBuckets": True},
    }
    got = {r["ts_bucket"].day: r["n"] for r in engine.plan(q).collect()}
    exp = dict(duck.execute("""
        SELECT day(ts), count(*) FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
          AND event_type IN ('click', 'purchase')
        GROUP BY 1
    """).fetchall())
    assert got == exp


def test_join_table_right_side_and_errors(engine):
    # table right side: allowed, AQE decides the strategy
    q = {
        "queryType": "groupBy",
        "dataSource": {
            "type": "join",
            "left": "orders",
            "right": "customer",
            "rightPrefix": "c_",
            "condition": 'o_custkey == "c_c_custkey"',
            "joinType": "INNER",
        },
        "granularity": "all",
        "dimensions": ["c_c_mktsegment"],
        "aggregations": [{"type": "count", "name": "n"}],
    }
    rows = engine.plan(q).collect()
    assert len(rows) == 5  # TPC-H market segments
    assert sum(r["n"] for r in rows) > 0

    with pytest.raises(ValueError, match="joinType"):
        engine.plan({**q, "dataSource": {**q["dataSource"], "joinType": "FULL"}})
    with pytest.raises(Exception, match="right column"):
        engine.plan({**q, "dataSource": {**q["dataSource"],
                                         "condition": 'o_custkey == "c_nope"'}})


def test_join_with_query_right_side(engine):
    """Right side = a nested QUERY dataSource (aggregated frame):
    per-type totals joined back onto raw events."""
    q = {
        "queryType": "groupBy",
        "dataSource": {
            "type": "join",
            "left": "events",
            "right": {
                "type": "query",
                "query": {
                    "queryType": "groupBy",
                    "dataSource": "events",
                    "granularity": "all",
                    "dimensions": ["event_type"],
                    "intervals": IV,
                    "aggregations": [
                        {"type": "doubleSum", "name": "type_total",
                         "fieldName": "value"}],
                },
            },
            "rightPrefix": "t_",
            "condition": 'event_type == "t_event_type"',
            "joinType": "INNER",
        },
        "granularity": "all",
        "dimensions": ["event_type"],
        "intervals": IV,
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "doubleSum", "name": "share_sum", "fieldName": "share"},
        ],
        "virtualColumns": [
            {"type": "expression", "name": "share",
             "expression": "value / t_type_total"},
        ],
    }
    rows = engine.plan(q).collect()
    assert len(rows) == 5
    # each row's value/type_total shares must sum to exactly 1 per type —
    # proves the joined t_type_total is the RIGHT type's total
    for r in rows:
        assert r["share_sum"] == pytest.approx(1.0), r
