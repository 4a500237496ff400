"""Hot-key skew robustness (r6 verdict #7): the span join already has a
skew test (test_spans.py); these cover the other two corpus-scaled
pairing paths — the exact-theta level-1 aggregation (groupBy over
(keys, value)) and topN over a heavily-skewed dimension.

The mechanism that bounds task-time spread for BOTH is map-side partial
aggregation: a 90%-one-key input is absorbed into per-partition partial
states before the exchange, so the shuffle carries |distinct groups|
(theta level 1: |distinct (group, value)| pairs) instead of |rows|, and
no single reducer inherits 90% of the data. The tests assert the
results stay exact AND the plan shape that guarantees the absorption —
a partial HashAggregate strictly below the shuffle exchange."""

from datetime import datetime, timedelta

import pytest

from coolplaydruid_spark.catalog import Catalog
from coolplaydruid_spark.engine import DruidEngine

IV = ["2024-01-01T00:00:00/2024-02-01T00:00:00"]
N_HOT = 18_000  # 90% of rows carry one dimension value
N_COLD = 2_000


@pytest.fixture(scope="module")
def skew_engine(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, t0 + timedelta(seconds=i % 86_400), "hot", i % 50, float(i % 7))
        for i in range(N_HOT)
    ] + [
        (N_HOT + i, t0 + timedelta(seconds=i % 86_400),
         f"cold{i % 4}", 1_000 + (i // 4) % 20, float(i % 5))
        for i in range(N_COLD)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, "
              "user_id long, value double",
    )
    catalog = Catalog(spark)
    catalog.register("skewed", df=df, time_column="ts", as_view=False)
    return DruidEngine(spark, catalog)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_partial_agg_below_exchange(plan: str) -> None:
    """The absorption guarantee: at least one HashAggregate appears
    BELOW the first shuffle exchange in the printed tree (map side),
    i.e. raw skewed rows never cross the wire un-combined."""
    ex = plan.find("Exchange hashpartitioning")
    assert ex != -1, plan
    below = plan[ex:]
    assert "HashAggregate" in below, plan


def test_theta_level1_absorbs_hot_key(skew_engine):
    """90% of rows share event_type='hot': the exact-theta level-1
    groupBy(keys, user_id) must partial-aggregate map-side — the
    exchange then carries at most |distinct (type, user)| = 130 pairs,
    not 20k rows — and the distinct counts stay exact."""
    df = skew_engine.plan({
        "queryType": "groupBy", "dataSource": "skewed",
        "granularity": "all", "dimensions": ["event_type"],
        "intervals": IV,
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "thetaSketch", "name": "users", "fieldName": "user_id"},
        ],
    })
    got = {r["event_type"]: (r["n"], r["users"]) for r in df.collect()}
    assert got["hot"] == (N_HOT, 50)
    for i in range(4):
        assert got[f"cold{i}"] == (N_COLD / 4, 20)
    _assert_partial_agg_below_exchange(_plan(df))


def test_topn_absorbs_hot_key(skew_engine):
    """topN over the skewed dimension: partial_sum/partial_count run
    before the exchange (5 aggregate rows shuffle, not 20k), and the
    ranking stays exact."""
    df = skew_engine.plan({
        "queryType": "topN", "dataSource": "skewed",
        "granularity": "all", "dimension": "event_type",
        "metric": "total", "threshold": 3, "intervals": IV,
        "aggregations": [
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
            {"type": "count", "name": "n"},
        ],
    })
    rows = df.collect()
    assert [r["event_type"] for r in rows][0] == "hot"
    assert rows[0]["n"] == N_HOT
    # hot: sum of i%7 over 18000 rows
    assert rows[0]["total"] == pytest.approx(
        sum(float(i % 7) for i in range(N_HOT)))
    plan = _plan(df)
    _assert_partial_agg_below_exchange(plan)
    assert "partial" in plan.lower(), plan


def test_groupby_high_cardinality_with_hot_group(skew_engine):
    """groupBy (event_type, user_id) — the hot group contributes 50
    distinct (type, user) pairs to the exchange regardless of its 18k
    row share; totals per pair stay exact."""
    df = skew_engine.plan({
        "queryType": "groupBy", "dataSource": "skewed",
        "granularity": "all", "dimensions": ["event_type", "user_id"],
        "intervals": IV,
        "aggregations": [{"type": "count", "name": "n"}],
    })
    rows = df.collect()
    hot = [r for r in rows if r["event_type"] == "hot"]
    assert len(hot) == 50 and all(r["n"] == N_HOT / 50 for r in hot)
    assert len(rows) == 50 + 4 * 20
    _assert_partial_agg_below_exchange(_plan(df))
