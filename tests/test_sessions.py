"""Edge-case tests for event-sequence operators (operators/sessions.py):
session-gap boundaries, as-of inclusive ties and no-prior-match nulls,
funnel ordering strictness. The contract gate covers the differential
(DuckDB) path at corpus scale; these pin the semantics on hand-built
micro-fixtures where every boundary is explicit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from coolplaydruid_spark.operators import sessions

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds, micros=0):
    return T0 + dt.timedelta(seconds=seconds, microseconds=micros)


def test_sessionize_gap_boundary_is_exclusive(spark):
    # Gap of exactly 1800s does NOT start a new session; 1800s + 1µs does.
    df = spark.createDataFrame(
        [
            (1, _ts(0)),
            (1, _ts(1800)),           # exactly the gap → same session
            (1, _ts(3600, 1)),        # 1800.000001s later → new session
            (2, _ts(0)),              # other user independent
        ],
        "user_id long, ts timestamp_ntz",
    )
    out = sessions.sessionize(df, gap_seconds=1800).orderBy("user_id", "ts")
    rows = [(r.user_id, r.session_seq) for r in out.collect()]
    assert rows == [(1, 1), (1, 1), (1, 2), (2, 1)]


def test_session_stats_duration_microsecond_exact(spark):
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10, 500000))],
        "user_id long, ts timestamp_ntz",
    )
    row = sessions.session_stats(df, gap_seconds=1800).collect()[0]
    assert row.n_events == 2
    assert row.duration_secs == 10.5


def test_asof_join_inclusive_tie_and_null(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(5)), (101, 1, _ts(20)), (102, 2, _ts(5))],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 7.0), (1, _ts(10), 9.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    out = sessions.asof_join(left, right, key_col="user_id", ts_col="ts",
                             value_cols=["value"]).orderBy("event_id")
    got = [(r.event_id, r.value_asof) for r in out.collect()]
    # event 100: tie at ts=5 → inclusive bound picks 7.0
    # event 101: most recent prior is ts=10 → 9.0
    # event 102: user 2 has no right rows → null
    assert got == [(100, 7.0), (101, 9.0), (102, None)]


def test_asof_join_dedupes_right_on_key_ts(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10))], "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 3.0), (1, _ts(5), 8.0)],
        "user_id long, ts timestamp_ntz, value double",
    )
    out = sessions.asof_join(left, right, key_col="user_id", ts_col="ts",
                             value_cols=["value"])
    assert out.collect()[0].value_asof == 8.0  # max wins deterministically


def test_funnel_requires_strict_order(spark):
    # user 1 completes view→click; user 2 clicked BEFORE viewing (no credit);
    # user 3 only views.
    df = spark.createDataFrame(
        [
            (1, "view", _ts(0)), (1, "click", _ts(10)),
            (2, "click", _ts(0)), (2, "view", _ts(10)),
            (3, "view", _ts(0)),
        ],
        "user_id long, event_type string, ts timestamp_ntz",
    )
    out = sessions.funnel_conversion(df, ["view", "click"]).orderBy("step_index")
    assert [(r.step, r.n_users) for r in out.collect()] == [("view", 3), ("click", 1)]


def test_cohort_retention_offsets(spark):
    # user 1 first seen week of Jan 1 (Mon), active again 2 weeks later;
    # user 2 first seen week 2.
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 2)), (1, dt.datetime(2024, 1, 16)),
            (2, dt.datetime(2024, 1, 9)),
        ],
        "user_id long, ts timestamp_ntz",
    )
    out = sessions.cohort_retention(df)
    got = {(r.cohort_week.date().isoformat(), r.week_offset): r.n_users
           for r in out.collect()}
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_sessionize_plan_single_exchange(spark):
    """The sessionize windows must share ONE user-keyed exchange — a
    second sort/exchange would double the dominant cost at scale."""
    df = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10))], "user_id long, ts timestamp_ntz"
    )
    plan = sessions.sessionize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_asof_join_null_value_in_recent_row_stays_null(spark):
    """A genuine NULL in the most recent right row must come through as
    NULL — not be skipped in favor of an older non-null value (and with
    multiple value columns, all values must come from the SAME row)."""
    left = spark.createDataFrame(
        [(1, 1, _ts(30))], "event_id long, user_id long, ts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 7.0, "a"), (1, _ts(10), None, "b")],
        "user_id long, ts timestamp_ntz, value double, tag string",
    )
    out = sessions.asof_join(left, right, key_col="user_id", ts_col="ts",
                             value_cols=["value", "tag"]).collect()[0]
    assert out.value_asof is None  # most recent row's null, not 7.0
    assert out.tag_asof == "b"     # same row as the null value


def test_funnel_conversion_window(spark):
    """within_seconds bounds the whole funnel from each user's FIRST
    step: user 1 converts inside the window, user 2's click lands
    outside it."""
    df = spark.createDataFrame(
        [
            (1, "view", _ts(0)), (1, "click", _ts(50)),
            (2, "view", _ts(0)), (2, "click", _ts(500)),
        ],
        "user_id long, event_type string, ts timestamp_ntz",
    )
    out = sessions.funnel_conversion(
        df, ["view", "click"], within_seconds=60
    ).orderBy("step_index")
    assert [(r.step, r.n_users) for r in out.collect()] == [("view", 2), ("click", 1)]
