"""thetaSketch set-operation aggregations (functions/theta.py): semantics
against hand-computed expectations and DuckDB, mixed with ordinary
aggregators, plus plan-shape checks (pure JVM, no Python stages)."""

import pytest
from pyspark.sql import functions as F

IV = ["2024-01-01T00:00:00/2024-01-04T00:00:00"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _theta(agg_name, filter_value=None):
    inner = {"type": "thetaSketch", "name": agg_name, "fieldName": "user_id"}
    if filter_value is None:
        return inner
    return {
        "type": "filtered", "name": agg_name,
        "filter": {"type": "selector", "dimension": "event_type", "value": filter_value},
        "aggregator": inner,
    }


def test_theta_mixed_with_ordinary_aggregators(engine, duck):
    """thetaSketch + count + doubleSum in ONE query: the theta pair joins
    back onto the single-pass frame without disturbing it."""
    df = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "intervals": IV,
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
                _theta("click_users", "click"),
                _theta("view_users", "view"),
            ],
            "postAggregations": [
                {
                    "type": "thetaSketchEstimate", "name": "both",
                    "field": {
                        "type": "thetaSketchSetOp", "func": "INTERSECT",
                        "fields": [
                            {"type": "fieldAccess", "fieldName": "click_users"},
                            {"type": "fieldAccess", "fieldName": "view_users"},
                        ],
                    },
                },
            ],
        }
    )
    got = {r["ts_bucket"].isoformat(): r.asDict() for r in df.collect()}
    exp = duck.execute(
        """
        WITH flags AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id,
                 bool_or(event_type='click') AS a, bool_or(event_type='view') AS b
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
          GROUP BY 1, 2
        ), base AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
                 count(*) AS n, sum(value) AS total
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
          GROUP BY 1
        )
        SELECT base.d, n, total,
               sum(CASE WHEN a THEN 1 ELSE 0 END) AS click_users,
               sum(CASE WHEN b THEN 1 ELSE 0 END) AS view_users,
               sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS both
        FROM base JOIN flags ON base.d = flags.d
        GROUP BY 1, 2, 3
        """
    ).fetchall()
    assert len(got) == len(exp) == 3
    for d, n, total, clicks, views, both in exp:
        row = got[d.isoformat()]
        assert row["n"] == n
        assert row["total"] == pytest.approx(float(total))
        assert row["click_users"] == clicks
        assert row["view_users"] == views
        assert row["both"] == both


def test_theta_union_and_not(engine):
    """UNION/NOT identities: |A∪B| = |A|+|B|-|A∩B|; |A\\B| = |A|-|A∩B|."""
    df = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "all",
            "intervals": IV,
            "aggregations": [_theta("a", "click"), _theta("b", "purchase")],
            "postAggregations": [
                {"type": "thetaSketchEstimate", "name": "u",
                 "field": {"type": "thetaSketchSetOp", "func": "UNION",
                           "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                      {"type": "fieldAccess", "fieldName": "b"}]}},
                {"type": "thetaSketchEstimate", "name": "i",
                 "field": {"type": "thetaSketchSetOp", "func": "INTERSECT",
                           "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                      {"type": "fieldAccess", "fieldName": "b"}]}},
                {"type": "thetaSketchEstimate", "name": "d",
                 "field": {"type": "thetaSketchSetOp", "func": "NOT",
                           "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                      {"type": "fieldAccess", "fieldName": "b"}]}},
            ],
        }
    )
    row = df.collect()[0]
    assert row["u"] == row["a"] + row["b"] - row["i"]
    assert row["d"] == row["a"] - row["i"]
    assert row["a"] > 0 and row["b"] > 0


def test_theta_zero_fill_and_groupby_dims(engine):
    """Empty buckets zero-fill theta estimates; groupBy dims key the join."""
    ts = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            # extends past the data's end → trailing empty buckets
            "intervals": ["2024-01-30T00:00:00/2024-02-03T00:00:00"],
            "aggregations": [_theta("users")],
        }
    )
    rows = {r["ts_bucket"].day: r["users"] for r in ts.collect()}
    assert len(rows) == 4
    assert rows[1] == 0 and rows[2] == 0  # Feb buckets past the data
    assert rows[30] > 0

    gb = engine.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "intervals": IV,
            "aggregations": [{"type": "count", "name": "n"}, _theta("users")],
        }
    )
    out = gb.collect()
    assert len(out) == 5
    assert all(0 < r["users"] <= r["n"] for r in out)


def test_theta_plan_is_jvm_only_two_level(engine):
    df = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "intervals": IV,
            "aggregations": [_theta("a", "click"), _theta("b", "view")],
        }
    )
    plan = _plan(df)
    assert "Python" not in plan and "Arrow" not in plan.replace("ArrowEvalPython", "Python")
    # two aggregation levels, each with partial/final split
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_theta_cross_field_setop_rejected(engine):
    with pytest.raises(ValueError, match="different fieldNames"):
        engine.plan(
            {
                "queryType": "timeseries",
                "dataSource": "events",
                "granularity": "all",
                "intervals": IV,
                "aggregations": [
                    {"type": "thetaSketch", "name": "a", "fieldName": "user_id"},
                    {"type": "thetaSketch", "name": "b", "fieldName": "event_type"},
                ],
                "postAggregations": [
                    {"type": "thetaSketchEstimate", "name": "x",
                     "field": {"type": "thetaSketchSetOp", "func": "UNION",
                               "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                          {"type": "fieldAccess", "fieldName": "b"}]}},
                ],
            }
        ).collect()


# ---- property-based differential: random data + random set-op trees ----

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:
    TYPES = ["click", "view", "purchase"]

    rows_st = st.lists(
        st.tuples(st.integers(0, 12), st.sampled_from(TYPES)),
        min_size=1, max_size=40,
    )

    def tree_st(depth=2):
        leaf = st.sampled_from(TYPES)
        if depth == 0:
            return leaf
        sub = tree_st(depth - 1)
        return st.one_of(
            leaf,
            st.tuples(st.sampled_from(["UNION", "INTERSECT", "NOT"]),
                      st.lists(sub, min_size=2, max_size=3)),
        )

    def to_post(node):
        if isinstance(node, str):
            return {"type": "fieldAccess", "fieldName": f"s_{node}"}
        func, kids = node
        return {"type": "thetaSketchSetOp", "func": func,
                "fields": [to_post(k) for k in kids]}

    def eval_py(node, sets):
        if isinstance(node, str):
            return sets[node]
        func, kids = node
        parts = [eval_py(k, sets) for k in kids]
        out = parts[0]
        for p in parts[1:]:
            if func == "UNION":
                out = out | p
            elif func == "INTERSECT":
                out = out & p
            else:
                out = out - p
        return out

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=rows_st, tree=tree_st())
    def test_theta_matches_python_set_algebra(spark, rows, tree):
        from coolplaydruid_spark.catalog import Catalog
        from coolplaydruid_spark.engine import DruidEngine

        df = spark.createDataFrame(
            [(u, t, "2024-01-01T00:00:00") for u, t in rows],
            "user_id long, event_type string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        cat = Catalog(spark)
        cat.register("ev", df=df, time_column="ts")
        eng = DruidEngine(spark, cat)
        out = eng.plan(
            {
                "queryType": "timeseries",
                "dataSource": "ev",
                "granularity": "all",
                "aggregations": [
                    {"type": "filtered", "name": f"s_{t}",
                     "filter": {"type": "selector", "dimension": "event_type",
                                "value": t},
                     "aggregator": {"type": "thetaSketch", "name": f"s_{t}",
                                    "fieldName": "user_id"}}
                    for t in TYPES
                ],
                "postAggregations": [
                    {"type": "thetaSketchEstimate", "name": "est",
                     "field": to_post(tree)},
                ],
            }
        )
        row = out.collect()[0]
        sets = {t: {u for u, et in rows if et == t} for t in TYPES}
        assert row["est"] == len(eval_py(tree, sets))
        for t in TYPES:
            assert row[f"s_{t}"] == len(sets[t])


def test_theta_in_topn(engine, duck):
    """A topN ranked by a thetaSketch estimate (legal in Druid): the
    two-level theta plan joins onto the per-dimension frame and the
    estimate serves as the ranking metric."""
    df = engine.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "dimension": "event_type",
            "threshold": 3,
            "metric": "users",
            "granularity": "all",
            "intervals": IV,
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "thetaSketch", "name": "users", "fieldName": "user_id"},
            ],
        }
    )
    got = [(r["event_type"], r["users"], r["n"]) for r in df.collect()]
    exp = duck.execute(
        """
        SELECT event_type, count(DISTINCT user_id) AS users, count(*) AS n
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04'
        GROUP BY 1 ORDER BY users DESC, event_type ASC LIMIT 3
        """
    ).fetchall()
    assert got == [(t, u, n) for t, u, n in exp]


def test_theta_nested_in_arithmetic_postagg(engine):
    """A thetaSketchEstimate nested inside an arithmetic post-agg's
    fields (legal in Druid — e.g. overlap RATIO) is hoisted to its own
    synthetic estimate and referenced by fieldAccess; the synthetic
    column does not leak into the result."""
    df = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "all",
            "intervals": IV,
            "aggregations": [_theta("a", "click"), _theta("b", "view")],
            "postAggregations": [
                {
                    "type": "arithmetic", "name": "overlap_ratio", "fn": "quotient",
                    "fields": [
                        {"type": "thetaSketchEstimate",
                         "field": {"type": "thetaSketchSetOp", "func": "INTERSECT",
                                   "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                              {"type": "fieldAccess", "fieldName": "b"}]}},
                        {"type": "thetaSketchEstimate",
                         "field": {"type": "thetaSketchSetOp", "func": "UNION",
                                   "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                              {"type": "fieldAccess", "fieldName": "b"}]}},
                    ],
                },
            ],
        }
    )
    row = df.collect()[0]
    assert not any(c.startswith("__theta_h") for c in df.columns)
    assert 0.0 < row["overlap_ratio"] < 1.0
    # Jaccard identity recomputed from the named estimates via a second
    # query with explicit top-level set ops.
    df2 = engine.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "all",
            "intervals": IV,
            "aggregations": [_theta("a", "click"), _theta("b", "view")],
            "postAggregations": [
                {"type": "thetaSketchEstimate", "name": "i",
                 "field": {"type": "thetaSketchSetOp", "func": "INTERSECT",
                           "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                      {"type": "fieldAccess", "fieldName": "b"}]}},
                {"type": "thetaSketchEstimate", "name": "u",
                 "field": {"type": "thetaSketchSetOp", "func": "UNION",
                           "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                      {"type": "fieldAccess", "fieldName": "b"}]}},
            ],
        }
    )
    r2 = df2.collect()[0]
    assert row["overlap_ratio"] == pytest.approx(r2["i"] / r2["u"])


def test_approx_theta_within_tolerance(engine):
    """context.useApproxTheta: the fixed-size HLL-sketch plan — level-1
    shuffle carries one ~2^lgK-byte sketch per (group, sketch) instead
    of |distinct (group, value)| rows. Estimates must land inside the
    sketch error band of the exact answers; the exact path is
    unchanged."""
    base = {
        "queryType": "timeseries",
        "dataSource": "events",
        "granularity": "day",
        "intervals": IV,
        "aggregations": [_theta("click_users", "click"), _theta("view_users", "view")],
        "postAggregations": [
            {"type": "thetaSketchEstimate", "name": "both",
             "field": {"type": "thetaSketchSetOp", "func": "INTERSECT",
                       "fields": [{"type": "fieldAccess", "fieldName": "click_users"},
                                  {"type": "fieldAccess", "fieldName": "view_users"}]}},
            {"type": "thetaSketchEstimate", "name": "either",
             "field": {"type": "thetaSketchSetOp", "func": "UNION",
                       "fields": [{"type": "fieldAccess", "fieldName": "click_users"},
                                  {"type": "fieldAccess", "fieldName": "view_users"}]}},
            {"type": "thetaSketchEstimate", "name": "only_click",
             "field": {"type": "thetaSketchSetOp", "func": "NOT",
                       "fields": [{"type": "fieldAccess", "fieldName": "click_users"},
                                  {"type": "fieldAccess", "fieldName": "view_users"}]}},
        ],
    }
    exact = {r["ts_bucket"]: r.asDict() for r in engine.plan(base).collect()}
    approx_df = engine.plan(dict(base, context={"useApproxTheta": True}))
    approx = {r["ts_bucket"]: r.asDict() for r in approx_df.collect()}
    assert set(exact) == set(approx)
    # lgK=12 relative error ~1.6%; the fixture's per-day cardinalities
    # are small so HLL is near-exact — 5% + 2 absolute is generous
    for b, e in exact.items():
        a = approx[b]
        for k in ("click_users", "view_users", "both", "either", "only_click"):
            tol = max(2, 0.05 * max(e[k], 1))
            assert abs(a[k] - e[k]) <= tol, (b, k, e[k], a[k])
    # plan check: HLL sketch aggregation present, and no per-value
    # second aggregation level
    plan = _plan(approx_df)
    assert "hll_sketch_agg" in plan.lower()


def test_approx_theta_nested_intersection_rejected(engine):
    with pytest.raises(ValueError, match="exact mode"):
        engine.plan(
            {
                "queryType": "timeseries",
                "dataSource": "events",
                "granularity": "all",
                "intervals": IV,
                "context": {"useApproxTheta": True},
                "aggregations": [_theta("a", "click"), _theta("b", "view"),
                                 _theta("c", "purchase")],
                "postAggregations": [
                    {"type": "thetaSketchEstimate", "name": "x",
                     "field": {"type": "thetaSketchSetOp", "func": "NOT",
                               "fields": [
                                   {"type": "thetaSketchSetOp", "func": "INTERSECT",
                                    "fields": [{"type": "fieldAccess", "fieldName": "a"},
                                               {"type": "fieldAccess", "fieldName": "b"}]},
                                   {"type": "fieldAccess", "fieldName": "c"}]}},
                ],
            }
        ).collect()
