"""The driver-facing query inventory: every operator from SURVEY §2 as a
(spark, sf_dir) -> DataFrame callable, paired with an exact DuckDB oracle
SQL string. Column names/aliases are identical on both sides (the driver
sorts columns by name and hash-compares values).

Conventions for engine-equivalence:
 - doubles that accumulate (sums/ratios/cosines) are rounded to 4-6
   decimals ON BOTH SIDES so FP accumulation order cannot flip the hash;
 - DuckDB sum(BIGINT) → HUGEINT, date_trunc('day') → DATE: both CAST back;
 - md5 is the cross-engine deterministic hash (UTF-8 on both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coolplaydruid_spark.catalog import Catalog, register_fixtures
from coolplaydruid_spark.engine import DruidEngine
from coolplaydruid_spark.operators import (
    chunking,
    classifier,
    corpus,
    dedup,
    embeddings,
    graph,
    importance,
    multimodal,
    retrieval,
    sampling,
    sessions,
    similarity,
    spans,
    text,
)
from coolplaydruid_spark.operators.corpus import EMAIL_RE, IPV4_RE, LONGNUM_RE

_ENGINES: dict[tuple[int, str], DruidEngine] = {}


def engine_for(spark: SparkSession, sf_dir: str) -> DruidEngine:
    key = (id(spark), sf_dir)
    if key not in _ENGINES:
        # Defensive runtime confs: the driver may own the session and not
        # have gone through session.get_spark. All are runtime-settable.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        _ENGINES[key] = DruidEngine(spark, register_fixtures(spark, sf_dir))
    return _ENGINES[key]


QUERIES: dict = {}
ORACLES: dict[str, str] = {}

# Python validators for the queries whose semantics are not
# SQL-expressible (iterative k-means, order-dependent bin packing).
# Each is (spark, sf_dir, rows) -> (ok, detail); tools/check_contract.py
# runs them for rows-only queries and records `invariants_pass` in the
# CONTRACT artifact, so those entries carry a real correctness verdict
# instead of a bare row count.
VALIDATORS: dict = {}


def q(name: str, oracle: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return wrap


def validator(name: str):
    def wrap(fn):
        VALIDATORS[name] = fn
        return fn

    return wrap


def _r4(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 4))
    return df


EVENTS_INTERVAL = ["2024-01-01T00:00:00/2024-02-01T00:00:00"]
EVENTS_WHERE = "ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'"

# ---------------------------------------------------------------------------
# Q1 timeseries — the reference's fully-spec'd query (query-timeseries.md)
# ---------------------------------------------------------------------------


@q(
    "timeseries_day",
    """
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-31', INTERVAL 1 DAY)) AS ts_bucket
    ), agg AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
             CAST(sum(event_id) AS BIGINT) AS ids,
             sum(value) AS total
      FROM events
      WHERE {w} AND (event_type = 'click' OR event_type = 'purchase')
      GROUP BY 1
    )
    SELECT spine.ts_bucket,
           COALESCE(ids, 0) AS ids,
           round(COALESCE(total, 0.0), 4) AS total,
           round(CASE WHEN COALESCE(total, 0.0) = 0 THEN 0.0
                      ELSE COALESCE(ids, 0) / total END, 4) AS ratio
    FROM spine LEFT JOIN agg USING (ts_bucket)
    """.format(w=EVENTS_WHERE),
)
def timeseries_day(spark, sf_dir):
    """Flagship: zero-filled day-granularity timeseries with or-filter,
    longSum/doubleSum, arithmetic post-agg (query-timeseries.md:8-95)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "filter": {
                "type": "or",
                "fields": [
                    {"type": "selector", "dimension": "event_type", "value": "click"},
                    {"type": "selector", "dimension": "event_type", "value": "purchase"},
                ],
            },
            "aggregations": [
                {"type": "longSum", "name": "ids", "fieldName": "event_id"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "postAggregations": [
                {
                    "type": "arithmetic",
                    "name": "ratio",
                    "fn": "/",
                    "fields": [
                        {"type": "fieldAccess", "fieldName": "ids"},
                        {"type": "fieldAccess", "fieldName": "total"},
                    ],
                }
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df, "total", "ratio")


@q(
    "timeseries_hour_skipempty",
    f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows,
           round(sum(value), 4) AS total
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      AND event_type = 'click'
    GROUP BY 1
    """,
)
def timeseries_hour_skipempty(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "hour",
            "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "intervals": ["2024-01-01T00:00:00/2024-01-08T00:00:00"],
            "context": {"skipEmptyBuckets": True},
        }
    )
    return _r4(df, "total")


@q(
    "timeseries_15min_duration",
    """
    SELECT make_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) * 1000000)
             AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
    GROUP BY 1
    """,
)
def timeseries_15min_duration(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": {"type": "duration", "duration": 900000},
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": ["2024-01-01T00:00:00/2024-01-02T00:00:00"],
            "context": {"skipEmptyBuckets": True},
        }
    )


@q(
    "timeseries_period_tz",
    f"""
    SELECT CAST(timezone('America/Los_Angeles',
                date_trunc('day', timezone('America/Los_Angeles',
                                           ts::TIMESTAMPTZ))) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows
    FROM events
    WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def timeseries_period_tz(spark, sf_dir):
    """P1D period granularity in a non-UTC zone (DST-aware bucketing)."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": {
                "type": "period",
                "period": "P1D",
                "timeZone": "America/Los_Angeles",
            },
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": EVENTS_INTERVAL,
            "context": {"skipEmptyBuckets": True},
        }
    )


@q(
    "timeseries_period_tz_zerofill",
    """
    WITH days AS (
      SELECT unnest(generate_series(DATE '2024-01-15', DATE '2024-03-14',
                                    INTERVAL 1 DAY)) AS d
    ), spine AS (
      SELECT CAST(timezone('America/Los_Angeles',
                           CAST(d AS TIMESTAMP)) AS TIMESTAMP) AS ts_bucket
      FROM days
    ), agg AS (
      SELECT CAST(timezone('America/Los_Angeles',
                  date_trunc('day', timezone('America/Los_Angeles',
                                             ts::TIMESTAMPTZ))) AS TIMESTAMP) AS ts_bucket,
             CAST(count(*) AS BIGINT) AS rows,
             CAST(sum(event_id) AS BIGINT) AS ids
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-15 08:00:00'
        AND ts < TIMESTAMP '2024-03-15 07:00:00'
      GROUP BY 1
    )
    SELECT spine.ts_bucket,
           COALESCE(rows, 0) AS rows,
           COALESCE(ids, 0) AS ids
    FROM spine LEFT JOIN agg USING (ts_bucket)
    """,
)
def timeseries_period_tz_zerofill(spark, sf_dir):
    """P1D + America/Los_Angeles WITHOUT skipEmptyBuckets: the zero-fill
    spine must step in LA wall-clock across the 2024-03-10 spring-forward
    (a 23-UTC-hour day), emitting empty buckets for February/March where
    the fixture has no events. Interval endpoints are exact LA midnights
    (08:00Z under PST, 07:00Z under PDT). Pins the DST-aware spine of
    granularity.py:129-160 under the driver's oracle gate, which
    timeseries_period_tz (skipEmptyBuckets: true) masks."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": {
                "type": "period",
                "period": "P1D",
                "timeZone": "America/Los_Angeles",
            },
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "longSum", "name": "ids", "fieldName": "event_id"},
            ],
            "intervals": ["2024-01-15T08:00:00/2024-03-15T07:00:00"],
        }
    )


@q(
    "timeseries_gran_none",
    """
    SELECT ts AS ts_bucket, CAST(count(*) AS BIGINT) AS rows
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-02'
    GROUP BY 1
    """,
)
def timeseries_gran_none(spark, sf_dir):
    """Granularity 'none': buckets are the raw event timestamps."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "none",
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": ["2024-01-01T00:00:00/2024-01-02T00:00:00"],
        }
    )


@q(
    "scan_descending_limit",
    """
    SELECT event_id, ts FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      AND event_type = 'purchase'
    ORDER BY ts DESC, event_id DESC LIMIT 15
    """,
)
def scan_descending_limit(spark, sf_dir):
    """Scan with descending time order + limit → TakeOrderedAndProject
    (per-partition top-K, no global sort)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "scan",
            "dataSource": "events",
            "columns": ["event_id"],
            "order": "descending",
            "limit": 15,
            "filter": {"type": "selector", "dimension": "event_type",
                       "value": "purchase"},
            "intervals": ["2024-01-01T00:00:00/2024-01-08T00:00:00"],
        }
    )
    return df.withColumnRenamed("__time", "ts")


# ---------------------------------------------------------------------------
# Q2 topN / Q3 groupBy
# ---------------------------------------------------------------------------


@q(
    "topn_event_type",
    f"""
    WITH agg AS (
      SELECT event_type, round(sum(value), 4) AS total,
             CAST(count(*) AS BIGINT) AS rows
      FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY total DESC, event_type ASC) AS rn FROM agg
    )
    SELECT event_type, total, rows FROM ranked WHERE rn <= 3
    """,
)
def topn_event_type(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "granularity": "all",
            "dimension": "event_type",
            "metric": "total",
            "threshold": 3,
            "aggregations": [
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
                {"type": "count", "name": "rows"},
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df.drop("ts_bucket"), "total")


@q(
    "topn_weekly_buckets",
    f"""
    WITH agg AS (
      SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS ts_bucket, event_type,
             CAST(count(*) AS BIGINT) AS rows
      FROM events WHERE {EVENTS_WHERE} GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY ts_bucket
                 ORDER BY rows DESC, event_type ASC) AS rn
      FROM agg
    )
    SELECT ts_bucket, event_type, rows FROM ranked WHERE rn <= 2
    """,
)
def topn_weekly_buckets(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "granularity": "week",
            "dimension": "event_type",
            "metric": "rows",
            "threshold": 2,
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": EVENTS_INTERVAL,
        }
    )


@q(
    "topn_inverted_bottom2",
    f"""
    WITH agg AS (
      SELECT event_type, round(sum(value), 4) AS total
      FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY total ASC, event_type ASC) AS rn FROM agg
    )
    SELECT event_type, total FROM ranked WHERE rn <= 2
    """,
)
def topn_inverted_bottom2(spark, sf_dir):
    """Inverted TopNMetricSpec — bottom-N by metric (public 0.12
    surface)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "granularity": "all",
            "dimension": "event_type",
            "metric": {"type": "inverted", "metric": {"type": "numeric", "metric": "total"}},
            "threshold": 2,
            "aggregations": [
                {"type": "doubleSum", "name": "total", "fieldName": "value"}
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df.drop("ts_bucket"), "total")


@q(
    "groupby_day_type_having",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket, event_type,
           CAST(count(*) AS BIGINT) AS rows, round(sum(value), 4) AS total
    FROM events WHERE {EVENTS_WHERE}
    GROUP BY 1, 2 HAVING sum(value) > 100.0
    """,
)
def groupby_day_type_having(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "day",
            "dimensions": ["event_type"],
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "having": {"type": "greaterThan", "aggregation": "total", "value": 100.0},
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df, "total")


@q(
    "groupby_nested_max_daily",
    f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, event_type,
             sum(value) AS daily
      FROM events WHERE {EVENTS_WHERE} GROUP BY 1, 2
    )
    SELECT event_type, round(max(daily), 4) AS max_daily FROM daily GROUP BY 1
    """,
)
def groupby_nested_max_daily(spark, sf_dir):
    """Nested query dataSource: groupBy over a groupBy
    (query-module-overview.md:40)."""
    eng = engine_for(spark, sf_dir)
    inner = {
        "queryType": "groupBy",
        "dataSource": "events",
        "granularity": "day",
        "dimensions": ["event_type"],
        "aggregations": [{"type": "doubleSum", "name": "daily", "fieldName": "value"}],
        "intervals": EVENTS_INTERVAL,
    }
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": {"type": "query", "query": inner},
            "granularity": "all",
            "dimensions": ["event_type"],
            "aggregations": [
                {"type": "doubleMax", "name": "max_daily", "fieldName": "daily"}
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df.drop("ts_bucket"), "max_daily")


@q(
    "groupby_agg_suite",
    f"""
    SELECT event_type,
           round(min(value), 4) AS vmin, round(max(value), 4) AS vmax,
           round(arg_min(value, ts), 4) AS vfirst, round(arg_max(value, ts), 4) AS vlast,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users,
           CAST(sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS big_rows
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def groupby_agg_suite(spark, sf_dir):
    """min/max/first/last/cardinality(exact)/filtered aggregators."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "aggregations": [
                {"type": "doubleMin", "name": "vmin", "fieldName": "value"},
                {"type": "doubleMax", "name": "vmax", "fieldName": "value"},
                {"type": "doubleFirst", "name": "vfirst", "fieldName": "value"},
                {"type": "doubleLast", "name": "vlast", "fieldName": "value"},
                {"type": "cardinality", "name": "users", "fields": ["user_id"]},
                {
                    "type": "filtered",
                    "name": "big_rows",
                    "filter": {
                        "type": "bound",
                        "dimension": "value",
                        "lower": "100",
                        "ordering": "numeric",
                    },
                    "aggregator": {"type": "count", "name": "big_rows"},
                },
            ],
            "intervals": EVENTS_INTERVAL,
            "context": {"useExactCountDistinct": True},
        }
    )
    return _r4(df.drop("ts_bucket"), "vmin", "vmax", "vfirst", "vlast")


@q(
    "filters_kitchen_sink",
    f"""
    SELECT CAST(count(*) AS BIGINT) AS rows FROM events
    WHERE {EVENTS_WHERE}
      AND event_type IN ('click', 'view', 'purchase')
      AND value >= 10 AND value < 180
      AND NOT (event_type LIKE 'v%')
      AND regexp_matches(props, '"k": \\d')
      AND contains(lower(event_type), 'c')
    """,
)
def filters_kitchen_sink(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "all",
            "filter": {
                "type": "and",
                "fields": [
                    {"type": "in", "dimension": "event_type",
                     "values": ["click", "view", "purchase"]},
                    {"type": "bound", "dimension": "value", "lower": "10",
                     "upper": "180", "upperStrict": True, "ordering": "numeric"},
                    {"type": "not",
                     "field": {"type": "like", "dimension": "event_type",
                               "pattern": "v%"}},
                    {"type": "regex", "dimension": "props", "pattern": '"k": \\d'},
                    {"type": "search", "dimension": "event_type",
                     "query": {"type": "insensitive_contains", "value": "c"}},
                ],
            },
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": EVENTS_INTERVAL,
        }
    ).select("rows")


@q(
    "union_datasource_count",
    f"""
    SELECT CAST(count(*) + (SELECT count(*) FROM lineitem
                            WHERE l_shipdate >= TIMESTAMP '2024-01-01') AS BIGINT) AS rows
    FROM events WHERE {EVENTS_WHERE}
    """,
)
def union_datasource_count(spark, sf_dir):
    """Union dataSource over two heterogenous tables (unionByName with
    missing columns)."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": {"type": "union", "dataSources": ["events", "lineitem"]},
            "granularity": "all",
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": ["2024-01-01T00:00:00/2262-01-01T00:00:00"],
        }
    ).select("rows")


# ---------------------------------------------------------------------------
# Q4-Q9 scan/select/search/metadata
# ---------------------------------------------------------------------------


@q(
    "scan_clicks",
    """
    SELECT event_id, event_type, round(value, 4) AS value FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
      AND event_type = 'click'
    """,
)
def scan_clicks(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "scan",
            "dataSource": "events",
            "columns": ["event_id", "event_type", "value"],
            "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
            "intervals": ["2024-01-01T00:00:00/2024-01-03T00:00:00"],
        }
    )
    return _r4(df.drop("__time"), "value")


@q(
    "scan_virtual_columns",
    """
    SELECT event_id,
           CAST(hour(ts) AS BIGINT) AS hod,
           upper(event_type) AS etype_uc
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'
      AND hour(ts) >= 12
    """,
)
def scan_virtual_columns(spark, sf_dir):
    """Scan with Druid-dialect virtualColumns in the projection AND the
    filter: computed columns appear alongside source columns in raw-row
    retrieval, with source filters still pushed to the scan."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "scan",
            "dataSource": "events",
            "columns": ["event_id", "hod", "etype_uc"],
            "virtualColumns": [
                {"type": "expression", "name": "hod",
                 "expression": "timestamp_extract(__time, 'HOUR')"},
                {"type": "expression", "name": "etype_uc",
                 "expression": "upper(event_type)"},
            ],
            "filter": {"type": "bound", "dimension": "hod", "lower": "12",
                       "ordering": "numeric"},
            "intervals": ["2024-01-02T00:00:00/2024-01-03T00:00:00"],
        }
    )
    return df.drop("__time")


@q(
    "select_page2",
    """
    WITH ordered AS (
      SELECT event_id, ts, row_number() OVER (ORDER BY ts, event_id) AS rn
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-05'
    )
    SELECT event_id FROM ordered WHERE rn > 20 AND rn <= 40
    """,
)
def select_page2(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "select",
            "dataSource": "events",
            "dimensions": ["event_id"],
            "metrics": [],
            "pagingSpec": {"threshold": 20, "offset": 20},
            "intervals": ["2024-01-01T00:00:00/2024-01-05T00:00:00"],
        }
    )
    return df.select("event_id")


@q(
    "search_dim_values",
    f"""
    SELECT 'event_type' AS dimension, event_type AS value,
           CAST(count(*) AS BIGINT) AS count
    FROM events
    WHERE {EVENTS_WHERE} AND contains(lower(event_type), 'i')
    GROUP BY 2
    """,
)
def search_dim_values(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "search",
            "dataSource": "events",
            "searchDimensions": ["event_type"],
            "query": {"type": "insensitive_contains", "value": "i"},
            "intervals": EVENTS_INTERVAL,
        }
    )


@q("time_boundary", "SELECT min(ts) AS minTime, max(ts) AS maxTime FROM events")
def time_boundary(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return eng.plan({"queryType": "timeBoundary", "dataSource": "events"})


@q(
    "datasource_metadata",
    "SELECT max(ts) AS maxIngestedEventTime FROM events",
)
def datasource_metadata(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return eng.plan({"queryType": "dataSourceMetadata", "dataSource": "events"})


@q(
    "segment_metadata",
    """
    SELECT 'event_id' AS column, CAST(count(DISTINCT event_id) AS BIGINT) AS cardinality,
           CAST(count(*) AS BIGINT) AS numRows FROM events
    UNION ALL SELECT 'ts', count(DISTINCT ts), count(*) FROM events
    UNION ALL SELECT 'user_id', count(DISTINCT user_id), count(*) FROM events
    UNION ALL SELECT 'event_type', count(DISTINCT event_type), count(*) FROM events
    UNION ALL SELECT 'value', count(DISTINCT value), count(*) FROM events
    UNION ALL SELECT 'props', count(DISTINCT props), count(*) FROM events
    """,
)
def segment_metadata(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "segmentMetadata",
            "dataSource": "events",
            "context": {"useExactCountDistinct": True},
        }
    )
    return df.select("column", "cardinality", "numRows")


# ---------------------------------------------------------------------------
# Q10 SQL front-end + joins (north-star) on the TPC-H star schema
# ---------------------------------------------------------------------------


@q(
    "sql_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-06-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_tpch_q1(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-06-01'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@q(
    "sql_join_top_customers",
    """
    SELECT c_custkey, c_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY 1, 2
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def sql_join_top_customers(spark, sf_dir):
    """3-way join + agg + top-k (joins are the Spark-native extension —
    Druid 0.12 has none, SURVEY §2.4).

    r14 (guide §3.1): FROM starts at the FACT table so the planner's
    left-deep tree streams lineitem and broadcasts the dimensions.
    Written dimensions-first, Catalyst broadcast the largest input
    (lineitem fit under the size estimate at bench scale) — backwards at
    cluster scale, where the fact side must never be the build side.
    Inner joins commute; the declared oracle SQL is unchanged."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT c_custkey, c_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN customer ON c_custkey = o_custkey
        WHERE o_orderstatus = 'O'
        GROUP BY 1, 2
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 10
        """
    )


@q(
    "sql_join_region_revenue",
    """
    SELECT r_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM region JOIN nation ON r_regionkey = n_regionkey
                JOIN customer ON n_nationkey = c_nationkey
                JOIN orders ON c_custkey = o_custkey
                JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    """,
)
def sql_join_region_revenue(spark, sf_dir):
    """5-way star join: small dims broadcast, one fact shuffle.

    r14 (guide §3.1): FROM starts at the FACT table (see
    sql_join_top_customers) — the region-first spelling made the 5-row
    region table the streamed side and BROADCAST lineitem. Inner joins
    commute; the declared oracle SQL is unchanged."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT r_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                      JOIN customer ON c_custkey = o_custkey
                      JOIN nation ON n_nationkey = c_nationkey
                      JOIN region ON r_regionkey = n_regionkey
        GROUP BY 1
        """
    )


@q(
    "timeseries_lineitem_monthly",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ts_bucket,
           round(sum(l_quantity), 4) AS qty,
           round(sum(l_extendedprice), 4) AS gross
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY 1
    """,
)
def timeseries_lineitem_monthly(spark, sf_dir):
    """lineitem doubles as a Druid dataSource (time column l_shipdate)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "lineitem",
            "granularity": "month",
            "aggregations": [
                {"type": "doubleSum", "name": "qty", "fieldName": "l_quantity"},
                {"type": "doubleSum", "name": "gross", "fieldName": "l_extendedprice"},
            ],
            "intervals": ["1995-01-01T00:00:00/1996-01-01T00:00:00"],
            "context": {"skipEmptyBuckets": True},
        }
    )
    return _r4(df, "qty", "gross")


@q(
    "timeseries_lineitem_p2m",
    """
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
                                    TIMESTAMP '1995-12-01',
                                    INTERVAL 2 MONTH)) AS ts_bucket
    ), agg AS (
      SELECT CAST(date_trunc('month', l_shipdate)
             - INTERVAL 1 MONTH
               * ((year(l_shipdate) * 12 + month(l_shipdate) - 1) % 2)
             AS TIMESTAMP) AS ts_bucket,
             round(sum(l_quantity), 4) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY 1
    )
    SELECT spine.ts_bucket, COALESCE(qty, 0) AS qty
    FROM spine LEFT JOIN agg USING (ts_bucket)
    """,
)
def timeseries_lineitem_p2m(spark, sf_dir):
    """Multi-unit calendar period P2M: epoch-anchored month-index
    flooring to multiples of 2 (so buckets land on Jan/Mar/May...), with
    the zero-fill spine stepping two calendar months at a time."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "lineitem",
            "granularity": {"type": "period", "period": "P2M"},
            "aggregations": [
                {"type": "doubleSum", "name": "qty", "fieldName": "l_quantity"},
            ],
            "intervals": ["1995-01-01T00:00:00/1996-01-01T00:00:00"],
        }
    )
    return _r4(df, "qty")


@q(
    "timeseries_subsecond_duration",
    """
    SELECT make_timestamp(CAST(FLOOR(epoch_ms(ts) / 250) * 250 * 1000 AS BIGINT))
             AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
    GROUP BY 1
    """,
)
def timeseries_subsecond_duration(spark, sf_dir):
    """Sub-second duration granularity (250 ms): bucketing is integral
    epoch-millis arithmetic on both sides, so microsecond-resolution
    fixture timestamps land in exact 250 ms cells."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": {"type": "duration", "duration": 250},
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": ["2024-01-01T00:00:00/2024-01-03T00:00:00"],
            "context": {"skipEmptyBuckets": True},
        }
    )


@q(
    "topn_orders_priority_quarterly",
    """
    WITH agg AS (
      SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS ts_bucket,
             o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS volume
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '2002-01-01'
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY ts_bucket
                 ORDER BY volume DESC, o_orderpriority ASC) AS rn
      FROM agg
    )
    SELECT ts_bucket, o_orderpriority, n, volume FROM ranked WHERE rn <= 2
    """,
)
def topn_orders_priority_quarterly(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "topN",
            "dataSource": "orders",
            "granularity": "quarter",
            "dimension": "o_orderpriority",
            "metric": "volume",
            "threshold": 2,
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "volume", "fieldName": "o_totalprice"},
            ],
            "intervals": ["1995-01-01T00:00:00/2002-01-01T00:00:00"],
        }
    )
    return df.withColumn("volume", F.round("volume", 2))


@q(
    "sql_tpch_q6",
    """
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25
    """,
)
def sql_tpch_q6(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT CAST(sum(CAST(round(l_extendedprice * l_discount, 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25
        """
    )


@q(
    "sql_anti_join_idle_customers",
    """
    SELECT CAST(count(*) AS BIGINT) AS idle FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def sql_anti_join_idle_customers(spark, sf_dir):
    """NOT EXISTS → broadcast left-anti join."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT count(*) AS idle FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """
    )


@q(
    "sql_window_top_customer_per_nation",
    """
    WITH rev AS (
      SELECT n_name, c_custkey,
             CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM nation JOIN customer ON n_nationkey = c_nationkey
                  JOIN orders ON c_custkey = o_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY n_name
                     ORDER BY total DESC, c_custkey ASC) AS INT) AS rn
      FROM rev
    )
    SELECT n_name, c_custkey, total FROM ranked WHERE rn = 1
    """,
)
def sql_window_top_customer_per_nation(spark, sf_dir):
    """Window functions over a star join (pure-Spark bonus surface)."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        WITH rev AS (
          SELECT n_name, c_custkey, CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total
          FROM nation JOIN customer ON n_nationkey = c_nationkey
                      JOIN orders ON c_custkey = o_custkey
          GROUP BY 1, 2
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY n_name
                     ORDER BY total DESC, c_custkey ASC) AS rn
          FROM rev
        )
        SELECT n_name, c_custkey, total FROM ranked WHERE rn = 1
        """
    )


@q(
    "sql_tpch_q3_building",
    """
    SELECT o_orderkey, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01' AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
    """,
)
def sql_tpch_q3_building(spark, sf_dir):
    """TPC-H Q3 (shipping priority), adapted to the fixture schema (no
    o_shippriority column)."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT o_orderkey, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               o_orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > TIMESTAMP '1997-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
        """
    )


@q(
    "sql_tpch_q5_region",
    """
    SELECT n_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM region JOIN nation ON r_regionkey = n_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
                JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def sql_tpch_q5_region(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): 6-table star join. region/nation/
    supplier broadcast; the orders↔lineitem shuffle join carries the
    volume."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT n_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM region JOIN nation ON r_regionkey = n_regionkey
                    JOIN customer ON c_nationkey = n_nationkey
                    JOIN orders ON o_custkey = c_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        """
    )


@q(
    "sql_tpch_q14_promo",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def sql_tpch_q14_promo(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional aggregation over a
    broadcast dim join."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                       THEN l_extendedprice * (1 - l_discount)
                                       ELSE 0 END)
                     / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
        """
    )


@q(
    "timeseries_unique_ratio",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uniq,
           round(count(*) / count(DISTINCT user_id), 4) AS events_per_user
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def timeseries_unique_ratio(spark, sf_dir):
    """hyperUnique aggregator + hyperUniqueCardinality post-aggregator
    (P5) inside arithmetic — exact-count mode for the oracle."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "hyperUnique", "name": "uniq", "fieldName": "user_id"},
            ],
            "postAggregations": [
                {
                    "type": "arithmetic",
                    "name": "events_per_user",
                    "fn": "/",
                    "fields": [
                        {"type": "fieldAccess", "fieldName": "n"},
                        {"type": "hyperUniqueCardinality", "fieldName": "uniq"},
                    ],
                }
            ],
            "intervals": EVENTS_INTERVAL,
            "context": {"skipEmptyBuckets": True, "useExactCountDistinct": True},
        }
    )
    return _r4(df, "events_per_user")


@q(
    "groupby_postagg_greatest",
    f"""
    SELECT event_type,
           round(greatest(max(value), -min(value)), 4) AS peak,
           round(least(avg(value), 100.0), 4) AS capped_avg
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def groupby_postagg_greatest(spark, sf_dir):
    """doubleGreatest/doubleLeast post-aggregators (P4) over aggregate +
    expression operands."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "aggregations": [
                {"type": "doubleMax", "name": "vmax", "fieldName": "value"},
                {"type": "doubleMin", "name": "vmin", "fieldName": "value"},
                {"type": "doubleSum", "name": "vsum", "fieldName": "value"},
                {"type": "count", "name": "n"},
            ],
            "postAggregations": [
                {
                    "type": "doubleGreatest",
                    "name": "peak",
                    "fields": [
                        {"type": "fieldAccess", "fieldName": "vmax"},
                        {
                            "type": "arithmetic",
                            "fn": "*",
                            "fields": [
                                {"type": "constant", "value": -1},
                                {"type": "fieldAccess", "fieldName": "vmin"},
                            ],
                        },
                    ],
                },
                {
                    "type": "doubleLeast",
                    "name": "capped_avg",
                    "fields": [
                        {
                            "type": "arithmetic",
                            "fn": "/",
                            "fields": [
                                {"type": "fieldAccess", "fieldName": "vsum"},
                                {"type": "fieldAccess", "fieldName": "n"},
                            ],
                        },
                        {"type": "constant", "value": 100.0},
                    ],
                },
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(
        df.drop("ts_bucket", "vmax", "vmin", "vsum", "n"), "peak", "capped_avg"
    )


@q(
    "groupby_python_udaf",
    f"""
    SELECT event_type, round(sum(value * value), 4) AS sum_sq
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def groupby_python_udaf(spark, sf_dir):
    """A9 javascript-slot aggregator as a Python callable (Arrow
    GROUPED_AGG pandas UDF) — the one aggregator that leaves the JVM,
    under the same DuckDB oracle gate as everything else."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "aggregations": [
                {
                    "type": "javascript",
                    "name": "sum_sq",
                    "fieldName": "value",
                    "fn": lambda s: float((s * s).sum()),
                }
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df.drop("ts_bucket"), "sum_sq")


@q(
    "groupby_percentiles",
    f"""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def groupby_percentiles(spark, sf_dir):
    """Percentile aggregator (Druid approximate-histogram extension
    surface, computed exactly — divergence documented in the compiler;
    context.useApproxQuantile switches to the sketch-based scale path)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "aggregations": [
                {"type": "percentile", "name": "p50", "fieldName": "value",
                 "probability": 0.5},
                {"type": "percentile", "name": "p95", "fieldName": "value",
                 "probability": 0.95},
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df.drop("ts_bucket"), "p50", "p95")


@q(
    "sql_json_props_avg",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
                 / count(*), 4) AS avg_k
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def sql_json_props_avg(spark, sf_dir):
    """JSON scalar functions via the SQL front-end (§2.8: the scalar
    library arrives wholesale with Q10): parse the props payload, cast,
    aggregate. Integer sum is exact; one division keeps the hash
    order-independent."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        f"""
        SELECT event_type, count(*) AS n,
               round(CAST(sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS DOUBLE)
                     / count(*), 4) AS avg_k
        FROM events WHERE {EVENTS_WHERE} GROUP BY 1
        """
    )


@q(
    "sql_tpch_q10_returns",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def sql_tpch_q10_returns(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting)."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT c_custkey, c_name, n_name,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC LIMIT 20
        """
    )


@q(
    "sql_tpch_q18_big_orders",
    """
    SELECT c_custkey, o_orderkey,
           CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    )
    GROUP BY c_custkey, o_orderkey
    """,
)
def sql_tpch_q18_big_orders(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): IN-subquery → left-semi join
    on an aggregated subquery."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT c_custkey, o_orderkey,
               CAST(sum(CAST(round(l_quantity, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 300
        )
        GROUP BY c_custkey, o_orderkey
        """
    )


# The fixture carries no partsupp table and no commit/receipt dates or
# ship modes, so Q2/Q11/Q12/Q16/Q20/Q21/Q22 are out of reach; the eight
# below adapt the remaining TPC-H shapes onto the available columns.
# Revenue sums round per-row then accumulate as DECIMAL so FP order can
# never flip the hash (file-header conventions).

_REV = "CAST(sum(CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4))) AS DOUBLE)"


@q(
    "sql_tpch_q4_exists",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    """,
)
def sql_tpch_q4_exists(spark, sf_dir):
    """TPC-H Q4 shape (correlated EXISTS → left-semi join); late-shipment
    predicate adapted to l_shipdate (fixture has no commitdate)."""
    return engine_for(spark, sf_dir).sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY o_orderpriority
        """
    )


_Q7 = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {rev} AS revenue
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                  JOIN orders ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation n1 ON s_nationkey = n1.n_nationkey
                  JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
"""


@q("sql_tpch_q7_volume", _Q7.format(rev=_REV))
def sql_tpch_q7_volume(spark, sf_dir):
    """TPC-H Q7 (bilateral trade volume): 5-way star join with nation
    aliased twice — both nation joins must broadcast."""
    return engine_for(spark, sf_dir).sql(_Q7.format(rev=_REV))


_Q8 = """
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(round(l_extendedprice * (1 - l_discount), 4) AS DECIMAL(18,4)) AS v,
             n_name AS nation
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                    JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_2' THEN v ELSE CAST(0 AS DECIMAL(18,4)) END)
                      / sum(v) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
"""


@q("sql_tpch_q8_market_share", _Q8)
def sql_tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 (market share): ratio of conditional to total volume per
    year — DECIMAL accumulation keeps the ratio hash-stable."""
    return engine_for(spark, sf_dir).sql(_Q8)


_Q9 = """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           {rev} AS profit
    FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN nation ON s_nationkey = n_nationkey
    WHERE p_type = 'PROMO'
    GROUP BY 1, 2
"""


@q("sql_tpch_q9_profit", _Q9.format(rev=_REV))
def sql_tpch_q9_profit(spark, sf_dir):
    """TPC-H Q9 shape (profit by supplier nation and year; supplycost
    term dropped — no partsupp in the fixture)."""
    return engine_for(spark, sf_dir).sql(_Q9.format(rev=_REV))


@q(
    "sql_tpch_q13_custdist",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def sql_tpch_q13_custdist(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): outer join + double
    aggregation."""
    return engine_for(spark, sf_dir).sql(
        """
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
        """
    )


_Q15 = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {rev} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@q("sql_tpch_q15_top_supplier", _Q15.format(rev=_REV))
def sql_tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): CTE reused for both the join and a
    scalar max subquery."""
    return engine_for(spark, sf_dir).sql(_Q15.format(rev=_REV))


_Q17 = """
    SELECT round(CAST(sum(CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)))
                 AS DOUBLE) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@q("sql_tpch_q17_small_qty", _Q17)
def sql_tpch_q17_small_qty(spark, sf_dir):
    """TPC-H Q17 (small-quantity orders): correlated scalar aggregate
    subquery per part."""
    return engine_for(spark, sf_dir).sql(_Q17)


_Q19 = """
    SELECT {rev} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
"""


@q("sql_tpch_q19_range", _Q19.format(rev=_REV))
def sql_tpch_q19_range(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive brand/size/quantity ranges — the
    classic OR-of-ANDs predicate pushdown case)."""
    return engine_for(spark, sf_dir).sql(_Q19.format(rev=_REV))


# The seven remaining TPC-H shapes (Q2/Q11/Q12/Q16/Q20/Q21/Q22), adapted:
# partsupp-based predicates become lineitem aggregates, shipmode/commitdate
# become returnflag/shipdate-vs-orderdate, and c_phone country codes become
# c_nationkey. The SHAPES (correlated min subquery, HAVING-vs-scalar
# threshold, CASE-pivot, NOT IN, nested IN + grouped HAVING, double
# correlated EXISTS/NOT EXISTS, scalar-avg + anti-join) are intact, which is
# what matters for the SQL front-end and Catalyst's decorrelation.

_Q2 = """
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM part JOIN lineitem ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 10 AND p_type = 'PROMO' AND r_name = 'EUROPE'
      AND l_extendedprice = (
        SELECT min(l2.l_extendedprice)
        FROM lineitem l2 JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
                         JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                         JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


@q("sql_tpch_q2_min_cost", _Q2)
def sql_tpch_q2_min_cost(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): correlated scalar-min
    subquery over the same 4-way join as the outer block. Min sale price
    from lineitem stands in for ps_supplycost (no partsupp in fixture)."""
    return engine_for(spark, sf_dir).sql(_Q2)


_Q11 = """
    WITH natval AS (
      SELECT l_partkey,
             CAST(round(l_extendedprice, 2) AS DECIMAL(18,2)) AS v
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_2', 'NATION_7')
    )
    SELECT l_partkey, CAST(sum(v) AS DOUBLE) AS value
    FROM natval
    GROUP BY l_partkey
    HAVING sum(v) > (SELECT sum(v) * 0.001 FROM natval)
"""


@q("sql_tpch_q11_important_stock", _Q11)
def sql_tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock): HAVING compared against a
    scalar subquery over the SAME aggregate input — the CTE is read twice.
    DECIMAL accumulation keeps the threshold comparison exact on both
    engines. Lineitem value stands in for ps_supplycost*ps_availqty."""
    return engine_for(spark, sf_dir).sql(_Q11)


_Q12 = """
    SELECT l_returnflag AS ship_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
"""


@q("sql_tpch_q12_late_priority", _Q12)
def sql_tpch_q12_late_priority(spark, sf_dir):
    """TPC-H Q12 shape (shipping priority pivot): conditional CASE-sum
    pivot on order priority. returnflag stands in for l_shipmode and
    shipdate-vs-orderdate lateness for the receipt/commit comparison."""
    return engine_for(spark, sf_dir).sql(_Q12)


_Q16 = """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""


@q("sql_tpch_q16_supplier_cnt", _Q16)
def sql_tpch_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 (parts/supplier relationship): COUNT DISTINCT per part
    attribute triple with a NOT IN anti-join (negative-balance suppliers
    stand in for the complaints LIKE predicate)."""
    return engine_for(spark, sf_dir).sql(_Q16)


_Q20 = """
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_13')
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 30)
"""


@q("sql_tpch_q20_promo_suppliers", _Q20)
def sql_tpch_q20_promo_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (part-promotion suppliers): IN over a grouped
    HAVING subquery that itself contains an IN-style join on a LIKE-
    filtered part list. Shipped-quantity threshold stands in for the
    correlated availqty comparison (no partsupp)."""
    return engine_for(spark, sf_dir).sql(_Q20)


_Q21 = """
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
                  JOIN orders ON o_orderkey = l1.l_orderkey
                  JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      AND l1.l_shipdate > o_orderdate + INTERVAL 45 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 45 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100
"""


@q("sql_tpch_q21_waiting", _Q21)
def sql_tpch_q21_waiting(spark, sf_dir):
    """TPC-H Q21 (suppliers who kept orders waiting): the double
    correlated EXISTS / NOT EXISTS — the only supplier late on a
    multi-supplier order. Shipdate-vs-orderdate lateness stands in for
    receiptdate > commitdate."""
    return engine_for(spark, sf_dir).sql(_Q21)


_Q22 = """
    SELECT CAST(c_nationkey AS INT) AS cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7, 11, 13, 17)
      AND c_acctbal > (
        SELECT CAST(sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) AS DOUBLE)
               / count(*)
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 11, 13, 17))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c_nationkey
"""


@q("sql_tpch_q22_idle_balance", _Q22)
def sql_tpch_q22_idle_balance(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): scalar-average threshold
    subquery plus NOT EXISTS anti-join on recent orders. c_nationkey
    stands in for the c_phone country-code substring; the average is
    computed as exact-DECIMAL sum / count so the threshold comparison
    cannot diverge between engines."""
    return engine_for(spark, sf_dir).sql(_Q22)


# ---------------------------------------------------------------------------
# Dimension extraction + limitSpec + search specs (SURVEY §2.2 F13, §2.3, Q7)
# ---------------------------------------------------------------------------


@q(
    "groupby_extraction_cascade",
    f"""
    SELECT upper(substr(event_type, 1, 2)) AS etype2,
           CAST(count(*) AS BIGINT) AS rows, round(sum(value), 4) AS total
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def groupby_extraction_cascade(spark, sf_dir):
    """Cascade extractionFn (substring → upper) as a groupBy dimension
    (DimensionSpecs, query-module-overview.md:45)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": [
                {
                    "type": "extraction",
                    "dimension": "event_type",
                    "outputName": "etype2",
                    "extractionFn": {
                        "type": "cascade",
                        "extractionFns": [
                            {"type": "substring", "index": 0, "length": 2},
                            {"type": "upper"},
                        ],
                    },
                }
            ],
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df.drop("ts_bucket"), "total")


@q(
    "groupby_extraction_partial_format",
    f"""
    SELECT '<' || coalesce(CASE WHEN regexp_matches(event_type, 'c')
                                THEN event_type END, 'null') || '>' AS tagged,
           CAST(count(*) AS BIGINT) AS rows
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def groupby_extraction_partial_format(spark, sf_dir):
    """partial (regex-find keep-or-null) → stringFormat (printf with
    NULLSTRING handling, so nulled-out values group as '<null>') as a
    cascade dimension — the two remaining 0.12 extractionFns."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": [
                {
                    "type": "extraction",
                    "dimension": "event_type",
                    "outputName": "tagged",
                    "extractionFn": {
                        "type": "cascade",
                        "extractionFns": [
                            {"type": "partial", "expr": "c"},
                            {"type": "stringFormat", "format": "<%s>"},
                        ],
                    },
                }
            ],
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return df.drop("ts_bucket")


@q(
    "groupby_lookup_category",
    f"""
    SELECT CASE WHEN event_type = 'click' THEN 'engagement'
                WHEN event_type = 'view' THEN 'engagement'
                WHEN event_type = 'purchase' THEN 'conversion'
                WHEN event_type = 'signup' THEN 'conversion'
                ELSE 'other' END AS category,
           CAST(count(*) AS BIGINT) AS rows
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def groupby_lookup_category(spark, sf_dir):
    """Lookup extractionFn (registered-map dimension rewrite)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": [
                {
                    "type": "extraction",
                    "dimension": "event_type",
                    "outputName": "category",
                    "extractionFn": {
                        "type": "lookup",
                        "lookup": {
                            "type": "map",
                            "map": {
                                "click": "engagement",
                                "view": "engagement",
                                "purchase": "conversion",
                                "signup": "conversion",
                            },
                        },
                        "replaceMissingValueWith": "other",
                    },
                }
            ],
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return df.drop("ts_bucket")


@q(
    "groupby_lookup_registered",
    """
    SELECT coalesce(n.n_name, 'UNKNOWN') AS nation,
           CAST(count(*) AS BIGINT) AS rows
    FROM customer c
    LEFT JOIN nation n ON CAST(c.c_nationkey AS VARCHAR) = CAST(n.n_nationkey AS VARCHAR)
    GROUP BY 1
    """,
)
def groupby_lookup_registered(spark, sf_dir):
    """Registered lookup dataSource (DimensionSpecs,
    query/query-module-overview.md:45): the lookup lives in the catalog as
    a key/value DataFrame and resolves via broadcast left join at plan
    time (plans/lookups.py) — not an inline create_map literal."""
    eng = engine_for(spark, sf_dir)
    nation = eng.catalog.table("nation")
    eng.catalog.register_lookup(
        "nation_names", df=nation, key_col="n_nationkey", value_col="n_name"
    )
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "customer",
            "granularity": "all",
            "dimensions": [
                {
                    "type": "extraction",
                    "dimension": "c_nationkey",
                    "outputName": "nation",
                    "extractionFn": {
                        "type": "registeredLookup",
                        "lookup": "nation_names",
                        "replaceMissingValueWith": "UNKNOWN",
                    },
                }
            ],
            "aggregations": [{"type": "count", "name": "rows"}],
        }
    )
    return df.drop("ts_bucket")


@q(
    "groupby_limitspec_top3",
    f"""
    SELECT event_type, round(sum(value), 4) AS total
    FROM events WHERE {EVENTS_WHERE}
    GROUP BY 1 ORDER BY sum(value) DESC, event_type ASC LIMIT 3
    """,
)
def groupby_limitspec_top3(spark, sf_dir):
    """DefaultLimitSpec: order grouped rows by aggregate, truncate —
    compiles to TakeOrderedAndProject (per-partition top-K), no global
    sort."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "aggregations": [
                {"type": "doubleSum", "name": "total", "fieldName": "value"}
            ],
            "limitSpec": {
                "type": "default",
                "columns": [
                    {"dimension": "total", "direction": "descending"},
                    {"dimension": "event_type", "direction": "ascending"},
                ],
                "limit": 3,
            },
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df.drop("ts_bucket"), "total")


@q(
    "groupby_multivalue_words",
    """
    SELECT word, CAST(count(*) AS BIGINT) AS n_parts,
           round(CASE WHEN count(*) = 0 THEN 0.0
                      ELSE sum(p_retailprice) / count(*) END, 4) AS avg_price
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word, p_retailprice FROM part)
    GROUP BY 1
    """,
)
def groupby_multivalue_words(spark, sf_dir):
    """Multi-value dimension semantics (public Druid 0.12): an array-
    valued dim groups once per element. The `words` dim is derived by
    splitting p_name; avg price comes from the arithmetic post-agg
    (sum / count) with Druid's divide-by-zero → 0 rule."""
    eng = engine_for(spark, sf_dir)
    if "part_tags" not in eng.catalog.names():
        eng.catalog.register(
            "part_tags",
            df=eng.catalog.table("part").withColumn("words", F.split("p_name", " ")),
        )
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "part_tags",
            "granularity": "all",
            "dimensions": [
                {"type": "default", "dimension": "words", "outputName": "word"}
            ],
            "aggregations": [
                {"type": "count", "name": "n_parts"},
                {"type": "doubleSum", "name": "price_sum", "fieldName": "p_retailprice"},
            ],
            "postAggregations": [
                {
                    "type": "arithmetic",
                    "name": "avg_price",
                    "fn": "/",
                    "fields": [
                        {"type": "fieldAccess", "fieldName": "price_sum"},
                        {"type": "fieldAccess", "fieldName": "n_parts"},
                    ],
                }
            ],
        }
    )
    return _r4(df.drop("ts_bucket", "price_sum"), "avg_price")


@q(
    "search_fragment",
    f"""
    SELECT 'event_type' AS dimension, event_type AS value,
           CAST(count(*) AS BIGINT) AS count
    FROM events
    WHERE {EVENTS_WHERE} AND contains(lower(event_type), 'ur')
      AND contains(lower(event_type), 'ase')
    GROUP BY 2
    """,
)
def search_fragment(spark, sf_dir):
    """Search query with a fragment SearchQuerySpec (all fragments must
    match)."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "search",
            "dataSource": "events",
            "searchDimensions": ["event_type"],
            "query": {"type": "fragment", "values": ["ur", "ase"]},
            "intervals": EVENTS_INTERVAL,
        }
    )


@q(
    "topn_dimension_metric",
    f"""
    WITH agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE {EVENTS_WHERE}
      GROUP BY 1
    )
    SELECT event_type, n FROM agg ORDER BY event_type ASC LIMIT 3
    """,
)
def topn_dimension_metric(spark, sf_dir):
    """TopNMetricSpec {'type':'dimension'}: rank by the dimension VALUE
    (lexicographic), not by a metric — first 3 event types alphabetically."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "granularity": "all",
            "dimension": "event_type",
            "metric": {"type": "dimension", "ordering": "lexicographic"},
            "threshold": 3,
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return df.drop("ts_bucket")


@q(
    "groupby_bucket_extraction",
    f"""
    SELECT CAST(CAST(floor(value / 100) * 100 AS BIGINT) AS VARCHAR)
             AS value_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def groupby_bucket_extraction(spark, sf_dir):
    """BucketExtractionFn as a groupBy dimension: numeric values bucketed
    to their lower bound (size 100), rendered as Druid's string dims."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": [
                {
                    "type": "extraction",
                    "dimension": "value",
                    "outputName": "value_bucket",
                    "extractionFn": {"type": "bucket", "size": 100},
                }
            ],
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": EVENTS_INTERVAL,
        }
    ).drop("ts_bucket")


@q(
    "groupby_weekday_extraction",
    f"""
    SELECT strftime(ts, '%A') AS weekday,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total
    FROM events WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def groupby_weekday_extraction(spark, sf_dir):
    """The classic Druid idiom: groupBy on a timeFormat extraction of
    __time itself (day-of-week name) — time is just another dimension
    to the extraction machinery."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": [
                {
                    "type": "extraction",
                    "dimension": "__time",
                    "outputName": "weekday",
                    "extractionFn": {"type": "timeFormat", "format": "EEEE"},
                }
            ],
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "intervals": EVENTS_INTERVAL,
        }
    ).drop("ts_bucket")


@q(
    "topn_postagg_metric",
    f"""
    WITH agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(value) AS total
      FROM events WHERE {EVENTS_WHERE}
      GROUP BY 1
    )
    SELECT event_type, n, round(total, 4) AS total,
           round(total / n, 4) AS avg_value
    FROM agg ORDER BY (total / n) DESC, event_type ASC LIMIT 3
    """,
)
def topn_postagg_metric(spark, sf_dir):
    """TopN ranked by a POST-AGGREGATION (avg = total/n arithmetic) —
    Druid allows the metric spec to name a post-agg; ranking happens on
    aggregated rows so the post-agg column exists before the sort."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "granularity": "all",
            "dimension": "event_type",
            "metric": "avg_value",
            "threshold": 3,
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "postAggregations": [
                {
                    "type": "arithmetic",
                    "name": "avg_value",
                    "fn": "/",
                    "fields": [
                        {"type": "fieldAccess", "fieldName": "total"},
                        {"type": "fieldAccess", "fieldName": "n"},
                    ],
                }
            ],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df.drop("ts_bucket"), "total", "avg_value")


@q(
    "topn_lexicographic_page2",
    f"""
    WITH agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE {EVENTS_WHERE} AND event_type > 'error'
      GROUP BY 1
    )
    SELECT event_type, n FROM agg ORDER BY event_type ASC LIMIT 2
    """,
)
def topn_lexicographic_page2(spark, sf_dir):
    """TopN paging: lexicographic metric spec with previousStop —
    resume the alphabetic scan AFTER 'error' (Druid's topN paging
    contract), next 2 values."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "granularity": "all",
            "dimension": "event_type",
            "metric": {"type": "dimension", "ordering": "lexicographic",
                       "previousStop": "error"},
            "threshold": 2,
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return df.drop("ts_bucket")


@q(
    "topn_strlen_page2",
    f"""
    WITH agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE {EVENTS_WHERE}
      GROUP BY 1
    )
    SELECT event_type, n FROM agg
    WHERE length(event_type) > length('click')
       OR (length(event_type) = length('click') AND event_type > 'click')
    ORDER BY length(event_type), event_type LIMIT 2
    """,
)
def topn_strlen_page2(spark, sf_dir):
    """TopN strlen ordering (Druid's strlen StringComparator: shorter
    first, lexicographic ties) with previousStop paging — resume after
    'click' in strlen order (r8 addition, plans/topn.py)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "granularity": "all",
            "dimension": "event_type",
            "metric": {"type": "dimension", "ordering": "strlen",
                       "previousStop": "click"},
            "threshold": 2,
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return df.drop("ts_bucket")


@q(
    "topn_lexicographic_numeric_dim",
    f"""
    WITH agg AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n
      FROM events WHERE {EVENTS_WHERE}
      GROUP BY 1
    )
    SELECT user_id, n FROM agg
    ORDER BY CAST(user_id AS VARCHAR) ASC LIMIT 4
    """,
)
def topn_lexicographic_numeric_dim(spark, sf_dir):
    """Lexicographic topN over a NUMERIC dimension compares the STRING
    form — '10' sorts before '2' (Druid dimension values are strings;
    paging-fuzzer find, fixed r8 in plans/topn.py)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "topN",
            "dataSource": "events",
            "granularity": "all",
            "dimension": "user_id",
            "metric": {"type": "dimension", "ordering": "lexicographic"},
            "threshold": 4,
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return df.drop("ts_bucket")


@q(
    "timeseries_two_intervals",
    """
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-03', INTERVAL 1 DAY)) AS ts_bucket
      UNION ALL
      SELECT unnest(generate_series(TIMESTAMP '2024-01-10',
                                    TIMESTAMP '2024-01-12', INTERVAL 1 DAY))
    ), agg AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
             CAST(count(*) AS BIGINT) AS rows
      FROM events
      WHERE (ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-04')
         OR (ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-13')
      GROUP BY 1
    )
    SELECT spine.ts_bucket, coalesce(agg.rows, 0) AS rows
    FROM spine LEFT JOIN agg USING (ts_bucket)
    """,
)
def timeseries_two_intervals(spark, sf_dir):
    """Multiple disjoint intervals in one query: the OR'd range predicate
    still pushes, and the zero-fill spine covers only the queried
    intervals (no buckets for the gap)."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": [
                "2024-01-01T00:00:00/2024-01-04T00:00:00",
                "2024-01-10T00:00:00/2024-01-13T00:00:00",
            ],
        }
    )


@q(
    "search_strlen_limit",
    f"""
    WITH matches AS (
      SELECT 'event_type' AS dimension, event_type AS value,
             CAST(count(*) AS BIGINT) AS count
      FROM events
      WHERE {EVENTS_WHERE} AND contains(lower(event_type), 'i')
      GROUP BY 2
    )
    SELECT dimension, value, count FROM matches
    ORDER BY length(value), value LIMIT 2
    """,
)
def search_strlen_limit(spark, sf_dir):
    """SearchSortSpec strlen + limit: the sort picks WHICH values survive
    the limit, so the oracle observes it through the surviving set."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "search",
            "dataSource": "events",
            "searchDimensions": ["event_type"],
            "query": {"type": "insensitive_contains", "value": "i"},
            "sort": {"type": "strlen"},
            "limit": 2,
            "intervals": EVENTS_INTERVAL,
        }
    )


@q(
    "timeseries_orders_yearly",
    """
    SELECT CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 4) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '2001-01-01'
    GROUP BY 1
    """,
)
def timeseries_orders_yearly(spark, sf_dir):
    """Year granularity over the orders dataSource (six full years)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "orders",
            "granularity": "year",
            "aggregations": [
                {"type": "count", "name": "n_orders"},
                {"type": "doubleSum", "name": "revenue", "fieldName": "o_totalprice"},
            ],
            "intervals": ["1995-01-01T00:00:00/2001-01-01T00:00:00"],
            "context": {"skipEmptyBuckets": True},
        }
    )
    return _r4(df, "revenue")


# ---------------------------------------------------------------------------
# North-star: text analysis
# ---------------------------------------------------------------------------

DUCK_TOKS = (
    "list_filter(string_split_regex(lower(trim(coalesce(text, ''))), '\\s+'), "
    "x -> x <> '')"
)


@q(
    "text_token_count",
    f"""
    SELECT doc_id,
           CAST(len({DUCK_TOKS}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(coalesce(text, ''),
                '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return text.token_count(eng.catalog.table("documents"))


@q(
    "text_quality",
    f"""
    WITH t AS (
      SELECT doc_id, coalesce(text, '') AS txt, {DUCK_TOKS} AS toks FROM documents
    ), m AS (
      SELECT doc_id, length(txt) AS n_chars, len(toks) AS n_tokens,
             length(txt) - length(regexp_replace(txt, '[!-/:-@\\[-`{{-~]', '', 'g')) AS punct,
             length(txt) - length(regexp_replace(txt, '[0-9]', '', 'g')) AS digits,
             len(list_filter(toks, x -> list_contains(
                 ['the','and','of','to','is','in','that','with'], x))) AS stop,
             CASE WHEN len(toks) > 0
                  THEN list_sum(list_transform(toks, x -> length(x))) ELSE 0 END AS tok_chars
      FROM t
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0 END, 6) AS punct_ratio,
           round(CASE WHEN n_chars > 0 THEN digits / n_chars ELSE 0 END, 6) AS digit_ratio,
           round(CASE WHEN n_tokens > 0 THEN stop / n_tokens ELSE 0 END, 6) AS stopword_ratio,
           round(CASE WHEN n_tokens > 0 THEN tok_chars / n_tokens ELSE 0 END, 6) AS mean_token_len,
           round(0.25 * least(n_chars / 500.0, 1.0)
               + 0.25 * (1 - CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0 END)
               + 0.25 * (1 - CASE WHEN n_chars > 0 THEN digits / n_chars ELSE 0 END)
               + 0.25 * CASE WHEN n_tokens > 0 THEN stop / n_tokens ELSE 0 END, 6)
             AS quality_score
    FROM m
    """,
)
def text_quality(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return text.quality_score(eng.catalog.table("documents"))


_LANG_LISTS = {
    "en": "['the','and','of','to','is','in','that','with']",
    "de": "['der','die','das','und','ist','nicht','mit','ein']",
    "fr": "['le','la','les','et','est','une','dans','que']",
    "es": "['el','los','las','es','una','con','por','para']",
}
_LANG_SCORES = ", ".join(
    f"len(list_filter(toks, x -> list_contains({v}, x))) AS s_{k}"
    for k, v in _LANG_LISTS.items()
)


@q(
    "text_lang_id",
    f"""
    WITH t AS (
      SELECT doc_id, coalesce(text,'') AS txt, {DUCK_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, txt, {_LANG_SCORES} FROM t
    )
    SELECT doc_id,
      CASE
        WHEN regexp_matches(txt, '[\\x{{4E00}}-\\x{{9FFF}}]') THEN 'zh'
        WHEN regexp_matches(txt, '[\\x{{3040}}-\\x{{30FF}}]') THEN 'ja'
        WHEN regexp_matches(txt, '[\\x{{AC00}}-\\x{{D7AF}}]') THEN 'ko'
        WHEN regexp_matches(txt, '[\\x{{0E00}}-\\x{{0E7F}}]') THEN 'th'
        WHEN regexp_matches(txt, '[\\x{{0400}}-\\x{{04FF}}]') THEN 'ru'
        WHEN regexp_matches(txt, '[\\x{{0600}}-\\x{{06FF}}]') THEN 'ar'
        WHEN regexp_matches(txt, '[\\x{{0900}}-\\x{{097F}}]') THEN 'hi'
        WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
        WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
        WHEN s_es > 0 THEN 'es'
        ELSE 'und'
      END AS lang_guess
    FROM s
    """,
)
def text_lang_id(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return text.lang_id(eng.catalog.table("documents"))


@q(
    "text_fingerprint",
    f"""
    SELECT doc_id, md5(coalesce(text,'')) AS exact_md5,
           md5(array_to_string(list_sort(list_distinct({DUCK_TOKS})), ' ')) AS shuffle_md5
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return text.fingerprint(eng.catalog.table("documents"))


# ---------------------------------------------------------------------------
# North-star: dedup
# ---------------------------------------------------------------------------

DUCK_SHINGLES = f"""
    WITH toks AS (
      SELECT doc_id, {DUCK_TOKS} AS t FROM documents
    ), sh0 AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                                      i -> array_to_string(list_slice(t, i, i + 2), ' '))
                  ELSE [array_to_string(t, ' ')] END AS arr
      FROM toks
    ), shd AS (
      SELECT DISTINCT doc_id, unnest(arr) AS shingle FROM sh0
    ), shf AS (
      SELECT doc_id, shingle FROM shd WHERE shingle <> ''
    )
"""


@q(
    "dedup_exact",
    """
    SELECT md5(coalesce(text,'')) AS digest,
           CAST(min(doc_id) AS BIGINT) AS survivor_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return dedup.exact_dedup(eng.catalog.table("documents"))


@q(
    "text_contamination_check",
    DUCK_SHINGLES
    + """
    , probe AS (SELECT DISTINCT shingle FROM shf WHERE doc_id < 20)
    , corpus AS (SELECT doc_id, shingle FROM shf WHERE doc_id >= 20)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
    FROM corpus JOIN probe USING (shingle)
    GROUP BY doc_id
    """,
)
def text_contamination_check(spark, sf_dir):
    """Decontamination: corpus docs sharing any shingle with a probe
    (benchmark) set — probe shingles broadcast, corpus never shuffles."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    return text.contamination_check(
        docs.where(F.col("doc_id") >= 20), docs.where(F.col("doc_id") < 20)
    )


@q(
    "text_contamination_fraction",
    DUCK_SHINGLES
    + """
    , probe AS (SELECT DISTINCT shingle FROM shf WHERE doc_id < 20)
    , corpus AS (SELECT doc_id, shingle FROM shf WHERE doc_id >= 20)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           round(sum(CASE WHEN probe.shingle IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS contaminated_frac
    FROM corpus LEFT JOIN probe USING (shingle)
    GROUP BY doc_id
    """,
)
def text_contamination_fraction(spark, sf_dir):
    """Contamination ratio (the thresholdable form): fraction of each
    doc's distinct shingles overlapping the probe set; single
    conditional-aggregation pass, broadcast probe."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    return text.contamination_fraction(
        docs.where(F.col("doc_id") >= 20), docs.where(F.col("doc_id") < 20)
    )


_SAMPLE_DENOM = 1 << 24
_DUCK_BUCKET_ID = (
    "CAST(('0x' || substring(md5('|' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)"
)


@q(
    "sampling_hash_10pct",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_DUCK_BUCKET_ID} < {int(0.1 * _SAMPLE_DENOM)}
    """,
)
def sampling_hash_10pct(spark, sf_dir):
    """Deterministic hash sampling (retry-safe, engine-stable): keep iff
    md5-bucket(id) < rate — the oracle runs the identical arithmetic."""
    eng = engine_for(spark, sf_dir)
    return sampling.hash_sample(
        eng.catalog.table("documents").select("doc_id", "lang"), 0.1
    )


@q(
    "sampling_stratified_mix",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_DUCK_BUCKET_ID} <
          CASE lang WHEN 'en' THEN {int(0.5 * _SAMPLE_DENOM)}
                    WHEN 'de' THEN {int(0.25 * _SAMPLE_DENOM)}
                    ELSE 0 END
    """,
)
def sampling_stratified_mix(spark, sf_dir):
    """Per-stratum mixture ratios (50% en, 25% de, drop the rest) —
    map-only CASE over the fractions dict, no join or shuffle."""
    eng = engine_for(spark, sf_dir)
    return sampling.stratified_sample(
        eng.catalog.table("documents").select("doc_id", "lang"),
        "lang",
        {"en": 0.5, "de": 0.25},
    )


@q(
    "sampling_cap_per_source",
    f"""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY {_DUCK_BUCKET_ID}, doc_id) AS rn
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM ranked WHERE rn <= 10 GROUP BY source
    """,
)
def sampling_cap_per_source(spark, sf_dir):
    """Per-source document cap (anti-domination): at most 10 docs per
    source, selected by deterministic md5-hash order. id_sum pins WHICH
    rows survived, not just how many."""
    eng = engine_for(spark, sf_dir)
    capped = sampling.cap_per_group(eng.catalog.table("documents"), "source", 10)
    return capped.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


@q(
    "sampling_to_mixture",
    f"""
    WITH tgt(lang, w) AS (VALUES ('en', 2.0), ('zh', 1.0), ('es', 1.0)),
    counts AS (
      SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY 1
    ),
    j AS (SELECT c.lang, n, w FROM counts c JOIN tgt USING (lang)),
    lvl AS (SELECT min(n / w) AS t FROM j),
    rates AS (
      SELECT lang, CAST(ROUND(w * t / n * 16777216, 0) AS BIGINT) AS gate
      FROM j, lvl
    )
    SELECT d.doc_id, d.lang FROM documents d JOIN rates USING (lang)
    WHERE {_DUCK_BUCKET_ID} < gate
    """,
)
def sampling_to_mixture(spark, sf_dir):
    """Downsample-only mixture resampling to 2:1:1 en:zh:es — the
    water-level T = min(n/w) keeps the scarcest-per-weight category
    whole; deterministic md5 gates make the kept set exactly
    reproducible, so the oracle mirrors the full computation including
    the FP association of the gate arithmetic."""
    eng = engine_for(spark, sf_dir)
    return sampling.sample_to_mixture(
        eng.catalog.table("documents").select("doc_id", "lang"),
        "lang",
        {"en": 2.0, "zh": 1.0, "es": 1.0},
    )


def _duck_shingle_cte(src: str, name: str) -> str:
    """Shingle CTE over an arbitrary (doc_id, txt, toks) source CTE."""
    return f"""
    , {name}0 AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1),
                                      i -> array_to_string(list_slice(toks, i, i + 2), ' '))
                  ELSE [array_to_string(toks, ' ')] END AS arr
      FROM {src}
    ), {name} AS (
      SELECT DISTINCT doc_id, unnest(arr) AS shingle FROM {name}0
      WHERE len(arr) > 0
    )"""


_PIPELINE_SQL = f"""
    WITH surv AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(coalesce(text,''))
    ), t AS (
      SELECT d.doc_id, coalesce(d.text,'') AS txt, {{toks}} AS toks
      FROM documents d JOIN surv USING (doc_id)
    ), m AS (
      SELECT doc_id, toks, length(txt) AS n_chars, len(toks) AS n_tokens,
             length(txt) - length(regexp_replace(txt, '[!-/:-@\\[-`{{{{-~]', '', 'g')) AS punct,
             length(txt) - length(regexp_replace(txt, '[0-9]', '', 'g')) AS digits,
             len(list_filter(toks, x -> list_contains(
                 ['the','and','of','to','is','in','that','with'], x))) AS stop
      FROM t
    ), keep AS (
      SELECT doc_id, toks FROM m
      WHERE round(0.25 * least(n_chars / 500.0, 1.0)
              + 0.25 * (1 - CASE WHEN n_chars > 0 THEN punct / n_chars ELSE 0 END)
              + 0.25 * (1 - CASE WHEN n_chars > 0 THEN digits / n_chars ELSE 0 END)
              + 0.25 * CASE WHEN n_tokens > 0 THEN stop / n_tokens ELSE 0 END, 6) >= 0.5
    ), probe_t AS (
      SELECT doc_id, coalesce(text,'') AS txt, {{toks}} AS toks
      FROM documents WHERE doc_id < 20
    ){{sh_keep}}{{sh_probe}}
    , flagged AS (
      SELECT DISTINCT k.doc_id
      FROM sh_keep k JOIN (SELECT DISTINCT shingle FROM sh_probe WHERE shingle <> '') p
        USING (shingle)
      WHERE k.shingle <> ''
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(toks)) AS BIGINT) AS total_tokens
    FROM keep WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
"""


@q(
    "pipeline_clean_corpus",
    _PIPELINE_SQL.format(
        toks=DUCK_TOKS,
        sh_keep=_duck_shingle_cte("keep", "sh_keep"),
        sh_probe=_duck_shingle_cte("probe_t", "sh_probe"),
    ),
)
def pipeline_clean_corpus(spark, sf_dir):
    """End-to-end training-data cleaning pipeline composed from the
    operator library: exact dedup (keep-first) → quality-score filter →
    benchmark decontamination → corpus stats. Every stage is the
    operators' own scale path (digest-keyed dedup, map-only scoring,
    broadcast probe shingles)."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    survivors = docs.join(
        dedup.exact_dedup(docs).select(F.col("survivor_id").alias("doc_id")),
        on="doc_id",
        how="inner",
    )
    # r14: pin the doc-scaled score table before filtering on its
    # computed column — the interpreted predicate re-evaluates the
    # tokenize-heavy score expression with no subexpression elimination
    # under lambdas (_spark_quality_pipeline's r14 note)
    from coolplaydruid_spark.operators.dedup import _pin_cache

    good = survivors.join(
        _pin_cache(text.quality_score(survivors)
                   .select("doc_id", "quality_score"))
        .where(F.col("quality_score") >= 0.5)
        .select("doc_id"),
        on="doc_id",
        how="inner",
    )
    flagged = text.contamination_check(
        good, docs.where(F.col("doc_id") < 20)
    ).select("doc_id")
    clean = good.join(F.broadcast(flagged), on="doc_id", how="left_anti")
    return text.token_count(clean).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws_tokens").cast("long").alias("total_tokens"),
    )


def _duck_minhash_exprs(num_hashes: int) -> str:
    """DuckDB replica of dedup.minhash_signatures: same md5-derived
    60-bit base hash, same affine coefficients, same prime."""
    p = dedup.MINHASH_PRIME
    base = f"(CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % {p})"
    return ", ".join(
        f"min(({base} * {a} + {b}) % {p}) AS mh{i}"
        for i, (a, b) in enumerate(dedup.minhash_coeffs(num_hashes))
    )


def _duck_band_selects(num_hashes: int, bands: int, src: str = "sig") -> str:
    rows = num_hashes // bands
    return " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({concat}) AS bh FROM {src}".format(
            b=b,
            src=src,
            concat=" || '|' || ".join(
                f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )


def _duck_minhash_pair_ctes(threshold: float, num_hashes: int = 12,
                            bands: int = 4, shf: str = "shf",
                            max_band_bucket: int | None = None,
                            materialized: bool = False) -> str:
    """THE single copy of the minhash-LSH candidate/verify SQL (review
    find: the composed pipeline oracle had hand-copied it, the exact
    drift mode the src-parameter pattern exists to prevent): a CTE
    block (no leading WITH, no leading comma) defining sig / banded
    [/ hot / bandc] / cand / co / sizes and finally ``mh_pairs``
    (doc_a, doc_b, jaccard ≥ threshold), all reading the (doc_id,
    shingle) source CTE named ``shf``. ``materialized`` marks each CTE
    MATERIALIZED for long composed chains where DuckDB's default
    inlining multiplies the upstream scans."""
    mat = "MATERIALIZED " if materialized else ""
    mh = _duck_minhash_exprs(num_hashes)
    band_selects = _duck_band_selects(num_hashes, bands)
    if max_band_bucket is None:
        capped = ""
        band_src = "banded"
    else:
        # mirror of operators/dedup._drop_hot_keys: buckets holding more
        # than the cap are excluded from candidate generation entirely.
        # Formulated as a window count rather than a hot-set NOT EXISTS
        # (value-identical, asserted in tests): the two-CTE NOT EXISTS
        # form crashes DuckDB outright ("corrupted double-linked list" /
        # physical-operator-cast InternalException) when MATERIALIZED
        # inside the composed pipeline's WITH RECURSIVE chain (r14 find,
        # duckdb 1.x) — the window form plans cleanly in both contexts.
        capped = f""",
    bandc AS {mat}(SELECT doc_id, band, bh FROM (
        SELECT b.*, count(*) OVER (PARTITION BY band, bh) AS __n
        FROM banded b) WHERE __n <= {int(max_band_bucket)})"""
        band_src = "bandc"
    return f"""
    sig AS {mat}(SELECT doc_id, {mh} FROM {shf} GROUP BY doc_id),
    banded AS {mat}({band_selects}){capped},
    cand AS {mat}(
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM {band_src} l JOIN {band_src} r
        ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
    ),
    co AS {mat}(
      SELECT doc_a, doc_b, count(*) AS n_common
      FROM cand JOIN {shf} a ON cand.doc_a = a.doc_id
                JOIN {shf} b ON cand.doc_b = b.doc_id AND a.shingle = b.shingle
      GROUP BY 1, 2
    ),
    sizes AS {mat}(SELECT doc_id, count(*) AS n FROM {shf} GROUP BY 1),
    mh_pairs AS {mat}(
      SELECT doc_a, doc_b,
             round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
      FROM co JOIN sizes sa ON co.doc_a = sa.doc_id
              JOIN sizes sb ON co.doc_b = sb.doc_id
      WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= {threshold}
    )"""


def _duck_minhash_lsh(threshold: float, num_hashes: int = 12, bands: int = 4,
                      max_band_bucket: int | None = None) -> str:
    return (
        DUCK_SHINGLES
        + ", "
        + _duck_minhash_pair_ctes(threshold, num_hashes, bands, "shf",
                                  max_band_bucket)
        + """
    SELECT doc_a, doc_b, jaccard FROM mh_pairs
    """
    )


@q("dedup_minhash_lsh", _duck_minhash_lsh(0.5))
def dedup_minhash_lsh(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return dedup.minhash_lsh_dedup(eng.catalog.table("documents"), threshold=0.5,
                                   cache=True)


@q("dedup_minhash_capped", _duck_minhash_lsh(0.5, max_band_bucket=2))
def dedup_minhash_capped(spark, sf_dir):
    """minhash_lsh_dedup with the r8 max_band_bucket hot-bucket cap: LSH
    buckets holding more than 2 docs are dropped before the candidate
    join (bounding a pathological corpus at bands × cap² pairs per
    bucket). cap=2 genuinely prunes at sf0.01 (three 3-doc buckets →
    23 pairs vs 25 uncapped), so the oracle verifies the exclusion
    semantics, not just the plumbing."""
    eng = engine_for(spark, sf_dir)
    return dedup.minhash_lsh_dedup(eng.catalog.table("documents"), threshold=0.5,
                                   cache=True, max_band_bucket=2)


@q(
    "dedup_ngram_jaccard",
    DUCK_SHINGLES
    + """
    , co AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1)
    SELECT doc_a, doc_b, round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM co JOIN sizes sa ON co.doc_a = sa.doc_id
            JOIN sizes sb ON co.doc_b = sb.doc_id
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(
        eng.catalog.table("documents"), threshold=0.5, cache=True)


def _duck_minhash_incremental(threshold: float, num_hashes: int = 12,
                              bands: int = 4) -> str:
    """Oracle for the incremental (new batch × existing corpus) dedup:
    the same signature/band formulas, restricted to cross-side pairs."""
    mh = _duck_minhash_exprs(num_hashes)
    return (
        DUCK_SHINGLES
        + f"""
    , shf_c AS (SELECT * FROM shf WHERE doc_id % 5 <> 0)
    , shf_n AS (SELECT * FROM shf WHERE doc_id % 5 = 0)
    , sig_c AS (SELECT doc_id, {mh} FROM shf_c GROUP BY doc_id)
    , sig_n AS (SELECT doc_id, {mh} FROM shf_n GROUP BY doc_id)
    , banded_c AS ({_duck_band_selects(num_hashes, bands, src="sig_c")})
    , banded_n AS ({_duck_band_selects(num_hashes, bands, src="sig_n")})
    , cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM banded_c l JOIN banded_n r ON l.band = r.band AND l.bh = r.bh
    ), co AS (
      SELECT doc_a, doc_b, count(*) AS n_common
      FROM cand JOIN shf_c a ON cand.doc_a = a.doc_id
                JOIN shf_n b ON cand.doc_b = b.doc_id AND a.shingle = b.shingle
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1)
    SELECT doc_a, doc_b, round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM co JOIN sizes sa ON co.doc_a = sa.doc_id
            JOIN sizes sb ON co.doc_b = sb.doc_id
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= {threshold}
    """
    )


@q("dedup_minhash_incremental", _duck_minhash_incremental(0.5))
def dedup_minhash_incremental(spark, sf_dir):
    """Incremental fuzzy dedup: every 5th document plays the incoming
    batch, the rest the accepted corpus — pairs cross sides only (the
    corpus never self-joins, the daily-ingest cost shape)."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    return dedup.minhash_lsh_dedup_incremental(
        docs.where(F.col("doc_id") % 5 == 0),
        docs.where(F.col("doc_id") % 5 != 0),
        threshold=0.5,
        cache=True,
    )


_STORE_CLEANUPS: set = set()


def _proc_store_root(sf_dir):
    """Per-(sf_dir, pid) temp root for contract entries that materialize
    stores — keyed by a hash of the RESOLVED sf_dir (review find:
    basename-only keying collided /root/testdata/sf1 with the
    bench-synthesized .benchdata/sf1) plus the pid so concurrent gate
    processes never race each other's overwrites; removed at
    interpreter exit so repeated runs cannot fill /tmp."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile
    from pathlib import Path as _P

    key = hashlib.md5(str(_P(sf_dir).resolve()).encode()).hexdigest()[:12]
    proc_root = _P(tempfile.gettempdir()) / "coolplaydruid_sigstore" \
        / f"{key}-{os.getpid()}"
    if proc_root not in _STORE_CLEANUPS:
        _STORE_CLEANUPS.add(proc_root)
        atexit.register(shutil.rmtree, str(proc_root), ignore_errors=True)
    return proc_root


def _ingest_store(spark, sf_dir, corpus_df, sig_specs: list[dict],
                  name: str) -> str:
    """Materialize a corpus frame through an index task with ingest-time
    signature specs, into a deterministic overwrite-mode path — the
    accept-time write half the from-store contract entries read back
    (r9 verdict #1). Idempotent per (sf_dir, name) WITHIN a process; the
    path is keyed by a hash of the RESOLVED sf_dir (review find:
    basename-only keying collided /root/testdata/sf1 with the
    bench-synthesized .benchdata/sf1) plus the pid, so concurrent gate
    processes never race each other's overwrites, and the pid directory
    is removed at interpreter exit so repeated gate runs cannot fill
    /tmp with corpus copies (review find)."""
    from coolplaydruid_spark.sources import batch as _batch

    dest = str(_proc_store_root(sf_dir) / name)
    _batch.index_task(
        spark,
        {"format": "dataframe",
         "df": corpus_df.withColumn("ts", F.lit("2024-01-01").cast("timestamp"))},
        dest, time_column="ts", signatures=sig_specs,
    )
    return dest


def _corpus_store(spark, sf_dir, sig_specs: list[dict], name: str) -> str:
    """_ingest_store over the standing document corpus (doc_id % 5 != 0)."""
    eng = engine_for(spark, sf_dir)
    return _ingest_store(
        spark, sf_dir,
        eng.catalog.table("documents").where(F.col("doc_id") % 5 != 0),
        sig_specs, name)


@q("dedup_minhash_incremental_from_store", _duck_minhash_incremental(0.5))
def dedup_minhash_incremental_from_store(spark, sf_dir):
    """The text-family ingest→dedup loop: the index task materializes the
    corpus's (doc_id, shingle-hash) table at accept time
    (signatures=[{"type": "minhash_shingles"}]); the incremental LSH
    operator reads the STORE as corpus_shingles= — the corpus text is
    shingled exactly once, at ingest, and the per-batch cost is priced by
    the batch. Oracle identical to dedup_minhash_incremental, so
    store-read ≡ inline shingling is value-hash-checked."""
    from coolplaydruid_spark.sources import batch as _batch

    dest = _corpus_store(
        spark, sf_dir,
        [{"type": "minhash_shingles", "text_col": "text", "id_col": "doc_id"}],
        "docs_minhash")
    corpus_sh = _batch.read_signatures(
        spark, dest, "minhash_shingles").select("doc_id", "shingle")
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    return dedup.minhash_lsh_dedup_incremental(
        docs.where(F.col("doc_id") % 5 == 0),
        corpus_shingles=corpus_sh,
        threshold=0.5,
    )


@q(
    "dedup_cluster_sizes",
    # the reach CTE is recursive, and RECURSIVE must be declared on the
    # (shared) leading WITH
    DUCK_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , co AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
    p AS (
      SELECT doc_a, doc_b
      FROM co JOIN sizes sa ON co.doc_a = sa.doc_id
              JOIN sizes sb ON co.doc_b = sb.doc_id
      WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
              UNION SELECT doc_b, doc_a FROM p),
    reach AS (
      SELECT src AS vertex, src AS r FROM edges
      UNION
      SELECT e.dst AS vertex, rr.r FROM reach rr JOIN edges e ON e.src = rr.vertex
    ),
    comp AS (SELECT vertex, min(r) AS component FROM reach GROUP BY vertex)
    SELECT component AS cluster_id, CAST(count(*) AS BIGINT) AS n_members
    FROM comp GROUP BY component HAVING count(*) >= 2 ORDER BY cluster_id
    """,
)
def dedup_cluster_sizes(spark, sf_dir):
    """Transitive near-dup clusters: n-gram Jaccard pairs closed under
    reachability (operators/graph.connected_components — iterative
    min-label propagation, a genuinely iterative algorithm the oracle
    mirrors with a recursive CTE). Returns the multi-member clusters
    with their sizes; the corpus-wide assignment join's strategy is
    AQE-decided (tests/test_graph.py pins the absence of a forced
    hint)."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, cache=True)
    clustered = graph.dedup_clusters(docs, pairs)
    return (
        clustered.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .where(F.col("n_members") >= 2)
        .orderBy("cluster_id")
    )


@q(
    "dedup_keep_best",
    DUCK_SHINGLES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """
    , co AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1),
    p AS (
      SELECT doc_a, doc_b
      FROM co JOIN sizes sa ON co.doc_a = sa.doc_id
              JOIN sizes sb ON co.doc_b = sb.doc_id
      WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
              UNION SELECT doc_b, doc_a FROM p),
    reach AS (
      SELECT src AS vertex, src AS r FROM edges
      UNION
      SELECT e.dst AS vertex, rr.r FROM reach rr JOIN edges e ON e.src = rr.vertex
    ),
    comp AS (SELECT vertex, min(r) AS component FROM reach GROUP BY vertex),
    ranked AS (
      SELECT c.vertex AS doc_id,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY length(coalesce(d.text, '')) DESC,
                                         c.vertex ASC) AS rk
      FROM comp c JOIN documents d ON d.doc_id = c.vertex
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)
    """,
)
def dedup_keep_best(spark, sf_dir):
    """Quality-aware retention: one survivor per transitive near-dup
    cluster — the LONGEST member (ties → smallest id) — instead of
    keep-smallest-id. Ranking touches only cluster members (semi-join on
    pair endpoints), never the corpus; the oracle mirrors the clustering
    with a recursive CTE and the retention with a window."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, cache=True)
    scored = docs.withColumn(
        "__q", F.length(F.coalesce(F.col("text"), F.lit("")))
    )
    return (
        graph.dedup_keep_best(scored, pairs, quality_col="__q")
        .select("doc_id")
    )


# Chunk CTE mirroring chunking.chunk_documents(window=40, stride=20):
# window starts every 20 tokens, the tail-emission rule (keep a start when
# it is the first or the previous window did not reach the end), 1-based
# inclusive list slicing.
_DUCK_CHUNK_CTE = """
    WITH m AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n,
             unnest(range(0, CAST(len(toks) AS BIGINT), 20)) AS st
      FROM m WHERE len(toks) > 0
    ), keepers AS (
      SELECT doc_id, toks, n, st FROM s WHERE st = 0 OR st - 20 + 40 < n
    ), idx AS (
      SELECT doc_id,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY st) - 1
                  AS INT) AS chunk_index,
             toks[CAST(st + 1 AS INT):CAST(st + 40 AS INT)] AS chunk
      FROM keepers
    )
"""


@q(
    "text_chunk_windows",
    _DUCK_CHUNK_CTE
    + """
    SELECT doc_id, chunk_index, array_to_string(chunk, ' ') AS chunk_text,
           CAST(len(chunk) AS BIGINT) AS n_tokens
    FROM idx
    """,
)
def text_chunk_windows(spark, sf_dir):
    """Overlapping token windows (40 tokens, stride 20) — the
    context-window chunking step upstream of sequence packing. Map-only
    JVM expressions; the oracle mirrors window starts, the
    tail-emission rule, and 1-based inclusive list slicing."""
    eng = engine_for(spark, sf_dir)
    return chunking.chunk_documents(
        eng.catalog.table("documents"), window=40, stride=20
    )


@q(
    "text_dup_chunk_ratio",
    _DUCK_CHUNK_CTE
    + """
    , ch AS (
      SELECT doc_id, md5(array_to_string(chunk, ' ')) AS dg FROM idx
    ), cnt AS (SELECT dg, count(*) AS n_occ FROM ch GROUP BY 1)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           round(avg(CASE WHEN n_occ > 1 THEN 1.0 ELSE 0.0 END), 6) AS dup_ratio
    FROM ch JOIN cnt USING (dg)
    GROUP BY doc_id
    """,
)
def text_dup_chunk_ratio(spark, sf_dir):
    """Sub-document duplication signal: per-doc fraction of token chunks
    occurring more than once corpus-wide — chunks travel as md5 digests
    through both shuffles, never as text."""
    eng = engine_for(spark, sf_dir)
    return chunking.duplicate_chunk_ratio(
        eng.catalog.table("documents"), window=40, stride=20, cache=True
    )


@q(
    "embedding_l2_normalize",
    """
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT vec_id, round(nrm, 6) AS norm,
           CASE WHEN nrm > 0
                THEN list_transform(embedding,
                     x -> round(CAST(x AS DOUBLE) / nrm, 6))
                ELSE list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6))
           END AS unit
    FROM n
    """,
)
def embedding_l2_normalize(spark, sf_dir):
    """L2 normalization of the embedding column — pure array
    expressions (transform/aggregate), map-only; float64 math with
    6-decimal rounding on both sides."""
    eng = engine_for(spark, sf_dir)
    return embeddings.l2_normalize(eng.catalog.table("embeddings")).select(
        "vec_id", "norm", "unit"
    )


@q(
    "embedding_quantize_int8",
    """
    WITH a AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) AS amax
      FROM embeddings
    )
    SELECT vec_id,
           round(CASE WHEN amax > 0 THEN amax / 127.0 ELSE 0.0 END, 6) AS scale,
           CASE WHEN amax > 0
                THEN list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / amax) + 0.5)
                          AS INT))
                ELSE list_transform(embedding, x -> 0)
           END AS q8
    FROM a
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 quantization with round-half-up (floor(x*s+0.5) —
    engine-independent, unlike banker's round()); scale dequantizes."""
    eng = engine_for(spark, sf_dir)
    return embeddings.quantize_int8(eng.catalog.table("embeddings")).select(
        "vec_id", "scale", "q8"
    )


def _duck_random_projection(in_dim: int, out_dim: int) -> str:
    inv = 1.0 / (out_dim ** 0.5)
    signs = embeddings.rademacher_signs(in_dim, out_dim)
    cols = []
    for j in range(out_dim):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {s}.0"
            for i, s in enumerate(signs[j])
        )
        cols.append(f"round(({terms}) * {inv!r}, 6) AS p{j}")
    return f"SELECT vec_id, {', '.join(cols)} FROM embeddings"


@q("embedding_random_projection", _duck_random_projection(64, 4))
def embedding_random_projection(spark, sf_dir):
    """Johnson-Lindenstrauss Rademacher projection 64→4 dims: the ±1
    matrix is a pure function of the seed, folded into the plan as
    literals — map-only, identical in both engines."""
    eng = engine_for(spark, sf_dir)
    proj = embeddings.random_projection(
        eng.catalog.table("embeddings"), in_dim=64, out_dim=4
    )
    return proj.select(
        "vec_id",
        *[F.element_at("proj", j + 1).alias(f"p{j}") for j in range(4)],
    )


def _duck_simhash_bits() -> str:
    bits = []
    for i in range(32):
        bits.append(
            "CASE WHEN list_sum(list_transform(dt, x -> CASE WHEN "
            f"substr(md5(x), {i + 1}, 1) IN ('8','9','a','b','c','d','e','f') "
            "THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


@q(
    "dedup_simhash_signatures",
    f"""
    WITH t AS (
      SELECT doc_id, list_distinct({DUCK_TOKS}) AS dt FROM documents
    )
    SELECT doc_id, {_duck_simhash_bits()} AS simhash FROM t
    """,
)
def dedup_simhash_signatures(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return dedup.simhash_signatures(eng.catalog.table("documents"))


def _duck_simhash_pairs(max_hamming: int) -> str:
    bits = " || ".join(
        "CASE WHEN list_sum(list_transform(dt, x -> CASE WHEN "
        f"substr(md5(x), {i + 1}, 1) IN ('8','9','a','b','c','d','e','f') "
        "THEN 1 ELSE -1 END)) > 0 THEN '1' ELSE '0' END"
        for i in range(32)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, list_distinct(list_filter(
        string_split_regex(trim(lower(coalesce(text,''))), '\\s+'),
        x -> x <> '')) AS dt
      FROM documents
    ), s AS (SELECT doc_id, {bits} AS sh FROM t)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(list_sum(list_transform(range(1,33), i ->
             CASE WHEN substr(a.sh, CAST(i AS INT), 1) <> substr(b.sh, CAST(i AS INT), 1)
                  THEN 1 ELSE 0 END)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE list_sum(list_transform(range(1,33), i ->
      CASE WHEN substr(a.sh, CAST(i AS INT), 1) <> substr(b.sh, CAST(i AS INT), 1)
           THEN 1 ELSE 0 END)) <= {max_hamming}
    """


@q("dedup_simhash_pairs", _duck_simhash_pairs(3))
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs. The oracle does the exact O(n²) join; the
    Spark side uses 4-band blocking, which pigeonhole guarantees is
    lossless for hamming ≤ 3 — so both must match exactly."""
    eng = engine_for(spark, sf_dir)
    return dedup.simhash_dedup(eng.catalog.table("documents"), max_hamming=3)


@q(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
             AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
          >= 0.4
    """,
)
def dedup_embedding_cosine(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    return dedup.embedding_neardup(eng.catalog.table("embeddings"), threshold=0.4)


def _duck_dedup_filtered(threshold: float, num_hashes: int = 12, bands: int = 4) -> str:
    mh = _duck_minhash_exprs(num_hashes)
    band_selects = _duck_band_selects(num_hashes, bands)
    return (
        DUCK_SHINGLES
        + f"""
    , sig AS (SELECT doc_id, {mh} FROM shf GROUP BY doc_id)
    , banded AS ({band_selects})
    , cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
    ), co AS (
      SELECT doc_a, doc_b, count(*) AS n_common
      FROM cand JOIN shf a ON cand.doc_a = a.doc_id
                JOIN shf b ON cand.doc_b = b.doc_id AND a.shingle = b.shingle
      GROUP BY 1, 2
    ), sizes AS (SELECT doc_id, count(*) AS n FROM shf GROUP BY 1)
    , drops AS (
      SELECT DISTINCT doc_b FROM co
        JOIN sizes sa ON co.doc_a = sa.doc_id
        JOIN sizes sb ON co.doc_b = sb.doc_id
      WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= {threshold}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM drops)
    """
    )


@q("dedup_filtered_corpus", _duck_dedup_filtered(0.5))
def dedup_filtered_corpus(spark, sf_dir):
    """End-to-end dedup pipeline: minhash-LSH pairs → keep-first filter →
    surviving corpus size."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    pairs = dedup.minhash_lsh_dedup(docs, threshold=0.5, cache=True)
    survivors = dedup.apply_dedup_filter(docs, pairs)
    return survivors.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


# ---------------------------------------------------------------------------
# North-star: similarity search
# ---------------------------------------------------------------------------

_DUCK_COSINE = (
    "round(list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6)"
)


@q(
    "similarity_topk_brute",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, v AS cv FROM e WHERE vec_id >= 5),
    scored AS (
      SELECT query_id, neighbor_id, {_DUCK_COSINE} AS cosine FROM c CROSS JOIN q
    ), ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
    """,
)
def similarity_topk_brute(spark, sf_dir):
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.brute_force_topk(emb.where(F.col("vec_id") >= 5), queries, k=10)


def _duck_bucket(col: str) -> str:
    return " || ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8)
    )


@q(
    "similarity_topk_lsh",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_duck_bucket('embedding')} AS bucket FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, v AS cv, bucket FROM e WHERE vec_id >= 5),
    scored AS (
      SELECT query_id, neighbor_id, {_DUCK_COSINE} AS cosine
      FROM c JOIN q USING (bucket)
    ), ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 10
    """,
)
def similarity_topk_lsh(spark, sf_dir):
    """Sign-bit LSH-bucketed ANN: probes only the query's bucket."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.lsh_topk(emb.where(F.col("vec_id") >= 5), queries, k=10, bits=8)


@q(
    "dedup_embedding_cosine_blocked",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                      {_duck_bucket('embedding')} AS bucket FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
             AS cosine
    FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) /
                (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
          >= 0.2
    """,
)
def dedup_embedding_cosine_blocked(spark, sf_dir):
    """The 100 TB path of embedding_neardup: sign-LSH bucket as block_col
    turns the O(n²) self-join into a per-bucket join (the oracle mirrors
    the bucket expression exactly, so both sides see the same pairs)."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings").withColumn(
        "bucket", similarity.sign_lsh_bucket("embedding", bits=8)
    )
    return dedup.embedding_neardup(emb, threshold=0.2, block_col="bucket")


@q(
    "dedup_embedding_semantic",
    """
    WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    scored AS (
      SELECT e.vec_id, cid,
             round(list_dot_product(v, cv) /
                   (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6)
               AS cosine
      FROM e CROSS JOIN cent
    ),
    asg AS (
      SELECT vec_id, cid AS cell, cosine AS cell_cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC NULLS LAST, cid) AS rn
      FROM scored
    ),
    a AS (SELECT vec_id, cell, cell_cos FROM asg WHERE rn = 1),
    j AS (SELECT e.vec_id, e.v, a.cell FROM e JOIN a USING (vec_id)),
    p AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM j x JOIN j y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE round(list_dot_product(x.v, y.v) /
            (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))), 6)
            >= 0.4
    ),
    edges AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT src AS vertex, src AS r FROM edges
      UNION
      SELECT g.dst AS vertex, rr.r FROM reach rr JOIN edges g ON g.src = rr.vertex
    ),
    comp AS (SELECT vertex, min(r) AS component FROM reach GROUP BY vertex),
    ranked AS (
      SELECT c.vertex AS vec_id,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY a.cell_cos ASC NULLS LAST,
                                         c.vertex ASC) AS rk
      FROM comp c JOIN a ON a.vec_id = c.vertex
    )
    SELECT e.vec_id FROM e
    WHERE e.vec_id NOT IN (SELECT vec_id FROM ranked WHERE rk > 1)
    """,
)
def dedup_embedding_semantic(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means cells → within-cell exact
    cosine pairs ≥ 0.4 → connected components → keep the member FARTHEST
    from its cell centroid (lowest assignment cosine, ties → smallest
    id). The semantic answer to dedup_embedding_cosine_blocked's random
    sign-LSH blocks: cells follow cluster structure, so near-dups
    co-block by construction. Centroids here are the first 8 corpus
    vectors by id — collected on the driver and folded into the plan as
    literals (the same mechanism the production fit_centroids path
    uses), deterministic so the oracle can name them; the assignment is
    a map-only codegen projection, the within-cell self-join the only
    pairing shuffle, and ranking touches cluster members only."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return dedup.semantic_dedup(emb, centroids=cent, threshold=0.4).select(
        "vec_id"
    )


def _semantic_fit_cells(n: int) -> int:
    """SemDeDup cell count for a corpus of n vectors: cells scale WITH
    the corpus (the paper's 50k cells for LAION-440M) so mean cell
    population — and with it the per-cell O(m²) pairing — stays bounded;
    a FIXED cell count makes within-cell pair volume quadratic in the
    corpus (measured: 105× pairs on 10× input with 8 fixed cells).
    Shared by the contract entry and its replay validator — one
    definition, or they silently diverge."""
    return max(8, n // 250)


@q("dedup_embedding_semantic_fit")  # no SQL oracle: k-means is
# iterative — EXACT Python replay validator below (same sample, same
# fit, same tie rules) rather than a rows-only check
def dedup_embedding_semantic_fit(spark, sf_dir):
    """The production SemDeDup path: driver-fit k-means
    (similarity.fit_centroids — bounded md5-ordered sample, centroid
    literals folded into the plan) with n_clusters scaled to the corpus
    (_semantic_fit_cells), within-cell exact-cosine pairing ≥ 0.4,
    connected components, keep-farthest-from-centroid. The companion
    dedup_embedding_semantic pins the relational half (assignment,
    pairing, components, retention) to an exact SQL oracle with
    deterministic centroids; this entry exercises the fit half and the
    corpus-scaled cell count — the shape whose sf1 scaling class is
    gate-asserted (tests/test_scale_records.py)."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    n = emb.count()
    return dedup.semantic_dedup(
        emb, threshold=0.4, n_clusters=_semantic_fit_cells(n),
        # pinned to the exactly-replayable driver fit — same rationale
        # as _fitted_cents (r12 advice): "auto" flips to
        # nondeterministic ml past DRIVER_FIT_MAX_CELLS
        fit_impl="driver",
        # r14: gemm-per-cell pairing with exact per-survivor recompute
        # — this entry is gated by the numpy replay validator, which
        # computes cosines with the very same ops (see
        # dedup._pairs_arrow_self); the SQL-oracled siblings keep "jvm"
        pair_impl="arrow",
    ).select("vec_id")


@validator("dedup_embedding_semantic_fit")
def _validate_semantic_fit(spark, sf_dir, rows):
    """EXACT deterministic replay, not just invariants: rebuild the
    md5-ordered training sample, run the SAME _kmeans_fit (fixed seed),
    mirror the rounded-cosine assignment (ties → lowest cell id), the
    within-cell pairing (rounded cosine ≥ 0.4), union-find components,
    and the keep-farthest-from-centroid retention (lowest cell cosine,
    ties → smallest id) — the survivor set must match exactly."""
    import hashlib

    import numpy as np

    from coolplaydruid_spark.operators.similarity import (
        TRAIN_SAMPLE_DEFAULT,
        _kmeans_fit,
    )

    eng = engine_for(spark, sf_dir)
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in eng.catalog.table("embeddings").collect()
    }
    ids = sorted(emb)
    # fit replay: the train-sample smallest-md5(id) rows, same
    # seed/max_iter — the truncation mirrors fit_centroids'
    # train_sample bound (one imported constant, not a second copy) so
    # the replay stays exact past the bound (r12 advice)
    order = sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    C = _kmeans_fit(np.stack([emb[i] for i in order[:TRAIN_SAMPLE_DEFAULT]]),
                    _semantic_fit_cells(len(ids)), 10, 42)

    def cos(a, b):
        return round(float(a @ b) /
                     (float(np.linalg.norm(a)) * float(np.linalg.norm(b))), 6)

    cell, cell_cos = {}, {}
    for i in ids:
        best = min((-cos(emb[i], c), j) for j, c in enumerate(C))
        cell[i], cell_cos[i] = best[1], -best[0]

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    members = set()
    for ii, a in enumerate(ids):
        for b in ids[ii + 1:]:
            if cell[a] == cell[b] and cos(emb[a], emb[b]) >= 0.4:
                members |= {a, b}
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps: dict = {}
    for i in sorted(members):
        comps.setdefault(find(i), []).append(i)
    losers = set()
    for mem in comps.values():
        keep = min(mem, key=lambda i: (cell_cos[i], i))
        losers |= set(mem) - {keep}
    want = set(ids) - losers
    got = {r["vec_id"] for r in rows}
    if len(rows) != len(got):
        return False, f"{len(rows) - len(got)} duplicate survivor rows"
    if got != want:
        return False, (
            f"survivors differ: extra={sorted(got - want)[:5]} "
            f"missing={sorted(want - got)[:5]} "
            f"(got {len(got)}, want {len(want)})")
    if not losers:
        return False, "replay found no duplicates — the check is vacuous"
    return True, (
        f"exact replay: {len(want)} survivors, {len(losers)} dropped "
        f"across {len(comps)} components, {len(C)} cells")


def _duck_semantic_pairs(n_cent: int, tau: float,
                         mod: int | None = None,
                         rem: int | None = None,
                         max_cell: int | None = None,
                         member_pred: str | None = None) -> str:
    """SemDeDup pairing oracle: centroids = the first n_cent vectors by
    id, argmax-cosine cell assignment (rounded, ties → lowest cid),
    within-cell exact-cosine pairs ≥ tau. Default = the id_a < id_b
    self form; with mod/rem the pairs are corpus (id % mod != rem) ×
    batch (id % mod = rem) — the incremental shape. ``max_cell``
    mirrors the engine's hot-cell cap: cells whose population exceeds
    it emit no pairs (self form counts the whole cell; incremental
    counts the CORPUS side only, the engine's symmetric-drop rule).
    ``member_pred`` restricts which vectors PARTICIPATE (the composed
    pipeline passes its survivor set) while the pinned centroids stay
    the first n_cent of the FULL table — the Spark side pins centroids
    before filtering, and assignment is per-vector, so restricting
    participants never changes a participant's cell. Shared with the
    fuzz surface so the gate and the fuzzer can never drift apart."""
    cross = (f"c.vec_id % {mod} != {rem} AND b.vec_id % {mod} = {rem}"
             if mod is not None else "c.vec_id < b.vec_id")
    cap_cte, src = "", "j"
    if max_cell is not None:
        count_side = (f"WHERE vec_id % {mod} != {rem}"
                      if mod is not None else "")
        cap_cte = f""",
    hot AS (SELECT cell FROM j {count_side}
            GROUP BY cell HAVING count(*) > {max_cell}),
    jk AS (SELECT * FROM j WHERE cell NOT IN (SELECT cell FROM hot))"""
        src = "jk"
    member = f"WHERE {member_pred}" if member_pred else ""
    return f"""
    WITH eall AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    e AS (SELECT * FROM eall {member}),
    cent AS (SELECT vec_id AS cid, v AS cv FROM eall WHERE vec_id < {n_cent}),
    scored AS (
      SELECT e.vec_id, cid,
             round(list_dot_product(v, cv) /
                   (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6)
               AS cosine
      FROM e CROSS JOIN cent
    ),
    asg AS (
      SELECT vec_id, cid AS cell,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cosine DESC NULLS LAST, cid) AS rn
      FROM scored
    ),
    j AS (SELECT e.vec_id, e.v, asg.cell
          FROM e JOIN asg ON e.vec_id = asg.vec_id AND asg.rn = 1){cap_cte}
    SELECT c.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(c.v, b.v) /
                 (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
             AS cosine
    FROM {src} c JOIN {src} b ON c.cell = b.cell AND {cross}
    WHERE round(list_dot_product(c.v, b.v) /
          (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
          >= {tau}
    """


@q("dedup_embedding_semantic_capped", _duck_semantic_pairs(8, 0.4, max_cell=65))
def dedup_embedding_semantic_capped(spark, sf_dir):
    """semantic_dedup_pairs with the hot-cell cap (r11 verdict #2 —
    the semantic family's analogue of dedup_minhash_capped): cells
    holding more than 65 vectors emit no pairs, bounding the
    within-cell self-join at cap² pairs per cell against skewed
    clusters k-means cannot split (mass boilerplate embeddings). The
    cap genuinely prunes at sf0.01 (5 of 8 cells over the cap → 5
    pairs vs 20 uncapped), so the oracle verifies the exclusion
    semantics, not just the plumbing; dropped-cell members are all
    KEPT — the conservative recall trade, same argument as minhash's
    max_band_bucket."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    return dedup.semantic_dedup_pairs(emb, cent, threshold=0.4,
                                      max_cell_size=65)


_DUCK_SEMANTIC_INCR = _duck_semantic_pairs(8, 0.4, 5, 0)


@q("dedup_embedding_semantic_incremental", _DUCK_SEMANTIC_INCR)
def dedup_embedding_semantic_incremental(spark, sf_dir):
    """Daily-ingest SemDeDup: incoming vector batch (every 5th id) ×
    standing corpus, both assigned with the SAME pinned centroids —
    the corpus never self-pairs, and the co-cell equi-join is the only
    exchange (AQE broadcasts the batch side in the daily-shard case).
    Completes the incremental batch×corpus form every other dedup
    family already has (operators/dedup.semantic_dedup_pairs_incremental)."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    return dedup.semantic_dedup_pairs_incremental(
        emb.where(F.col("vec_id") % 5 == 0), cent,
        corpus_df=emb.where(F.col("vec_id") % 5 != 0), threshold=0.4,
        check_disjoint=True, impl="arrow")


@q("dedup_embedding_semantic_from_store", _DUCK_SEMANTIC_INCR)
def dedup_embedding_semantic_from_store(spark, sf_dir):
    """The ingest→semantic-dedup loop: an index task materializes the
    corpus's cell assignments at accept time (signatures=[{"type":
    "semantic_cells", "centroids": ...}] → <dest>.sig/semantic_cells,
    __dt-partitioned, write-sorted by cell) and the incremental operator
    reads the STORE back as corpus_cells — the store pins the centroid
    version the corpus was accepted under, so every later batch pairs
    against a STABLE clustering. Oracle = the same SQL as
    dedup_embedding_semantic_incremental, so store-read ≡ inline
    assignment is value-hash-checked every round."""
    from coolplaydruid_spark.sources import batch as _batch

    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    cent_rows = [(r["vec_id"], list(r["embedding"])) for r in
                 emb.where(F.col("vec_id") < 8).collect()]
    dest = _ingest_store(
        spark, sf_dir, emb.where(F.col("vec_id") % 5 != 0),
        [{"type": "semantic_cells", "centroids": cent_rows}], "semvec")
    corpus_cells = _batch.read_signatures(
        spark, dest, "semantic_cells").select("vec_id", "embedding", "__cell")
    return dedup.semantic_dedup_pairs_incremental(
        emb.where(F.col("vec_id") % 5 == 0), cent_rows,
        corpus_cells=corpus_cells, threshold=0.4, impl="arrow")


def _fitted_cents(spark, frame, id_col: str = "vec_id"):
    """Deterministic production-shaped centroids for the scale-evidence
    entries: driver k-means (fixed seed) at the corpus-scaled cell count
    (_semantic_fit_cells) — the SemDeDup setting where mean cell
    population stays ~250 regardless of corpus size, so the co-cell
    pairing is batch-priced instead of quadratic (the 8-pinned-cell
    oracle entries deliberately keep cells FIXED for SQL determinism,
    which makes them quadratic by construction at sf1 — wrong shape for
    scale rows)."""
    from coolplaydruid_spark.operators import similarity as _sim

    n = frame.count()
    # impl pinned to the driver recipe (r12 advice): "auto" switches to
    # nondeterministic pyspark.ml past DRIVER_FIT_MAX_CELLS, so at a
    # larger sf the gate and its numpy replay validator would silently
    # diverge for harness reasons, not engine bugs. The ml path's scale
    # evidence lives in the operator tests; THIS helper exists to be
    # exactly replayable.
    C = _sim.fit_centroids(frame, n_clusters=_semantic_fit_cells(n),
                           impl="driver")
    return [(i, [float(x) for x in c]) for i, c in enumerate(C)]


def _np_semantic_state(spark, sf_dir, fit_ids_pred=None):
    """Shared numpy replay base for the scaled-entry validators: load
    all vectors, refit the SAME driver k-means on the fit subset
    (md5-ordered, fixed seed — fit_centroids' exact recipe), and assign
    every vector (rounded cosine, ties → lowest cell id). Returns
    (emb: id→vec, cell: id→cid, cos fn)."""
    import hashlib

    import numpy as np

    from coolplaydruid_spark.operators.similarity import (
        TRAIN_SAMPLE_DEFAULT,
        _kmeans_fit,
    )

    eng = engine_for(spark, sf_dir)
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in eng.catalog.table("embeddings").collect()
    }
    fit_ids = [i for i in sorted(emb)
               if fit_ids_pred is None or fit_ids_pred(i)]
    order = sorted(fit_ids,
                   key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    # Mirror fit_centroids' train_sample bound (r12 advice): the driver
    # recipe fits on the train-sample smallest-md5 rows, so past the
    # bound the replay must truncate identically or it silently
    # diverges — one imported constant, not a second copy.
    C = _kmeans_fit(np.stack([emb[i] for i in order[:TRAIN_SAMPLE_DEFAULT]]),
                    _semantic_fit_cells(len(fit_ids)), 10, 42)

    def cos(a, b):
        return round(float(a @ b) /
                     (float(np.linalg.norm(a)) * float(np.linalg.norm(b))), 6)

    cell = {}
    for i in sorted(emb):
        cell[i] = min((-cos(emb[i], c), j) for j, c in enumerate(C))[1]
    return emb, cell, cos


@q("dedup_embedding_semantic_incremental_scaled")  # no SQL oracle:
# k-means is iterative — exact numpy replay validator below
def dedup_embedding_semantic_incremental_scaled(spark, sf_dir):
    """The incremental SemDeDup form at its PRODUCTION shape (r11
    verdict #4): centroids fitted on the standing corpus at the
    corpus-scaled cell count, so mean cell population stays ~250 and
    the batch×corpus co-cell join is batch-priced (candidates ≈ batch ×
    cell size, flat in corpus) — the 100 TB claim the sf1 PLANMETRICS
    row records. The 8-pinned-cell sibling keeps the exact SQL oracle
    at sf0.01; this entry carries the scale shape with an exact numpy
    replay validator instead."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    cent = _fitted_cents(spark, corpus)
    return dedup.semantic_dedup_pairs_incremental(
        emb.where(F.col("vec_id") % 5 == 0), cent,
        # r14: arrow pairing — replay-validated entry, same rationale
        # as dedup_embedding_semantic_fit's pair_impl
        corpus_df=corpus, threshold=0.4, impl="arrow")


@validator("dedup_embedding_semantic_incremental_scaled")
def _validate_semantic_incr_scaled(spark, sf_dir, rows):
    """Exact numpy replay: refit (same md5-ordered sample, same seed),
    assign all vectors, enumerate EVERY co-cell corpus×batch pair with
    rounded cosine ≥ 0.4 — the returned set must match exactly (both
    directions: no missing pair, no extra pair, cosines equal)."""
    emb, cell, cos = _np_semantic_state(
        spark, sf_dir, fit_ids_pred=lambda i: i % 5 != 0)
    want = {
        (a, b, cos(emb[a], emb[b]))
        for a in emb if a % 5 != 0
        for b in emb if b % 5 == 0
        if cell[a] == cell[b] and cos(emb[a], emb[b]) >= 0.4
    }
    got = {(r["id_a"], r["id_b"], r["cosine"]) for r in rows}
    if got != want:
        return False, (f"pair-set mismatch: {len(got - want)} extra, "
                       f"{len(want - got)} missing of {len(want)}")
    if not want:
        return False, "no qualifying pair — the check is vacuous"
    return True, f"exact replay: {len(want)} cross pairs across " \
                 f"{len(set(cell.values()))} cells"


@q("dedup_embedding_semantic_from_store_scaled")  # no SQL oracle:
# same numpy replay as the inline scaled form — store-read ≡ inline
def dedup_embedding_semantic_from_store_scaled(spark, sf_dir):
    """The from-store incremental form at production shape: the index
    task materializes corpus cell assignments under the FITTED
    corpus-scaled centroids (store build is linear ingest + map-only
    assignment), and the batch pairs against the store WITHOUT
    re-assigning the corpus — per-batch cost prices by the batch, near
    flat in corpus, which is what the sf1 row must show (r11 verdict
    #4). Validated by the same exact numpy replay as the inline scaled
    entry, so store-read ≡ exact is checked every round."""
    from coolplaydruid_spark.sources import batch as _batch

    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    corpus = emb.where(F.col("vec_id") % 5 != 0)
    cent = _fitted_cents(spark, corpus)
    dest = _ingest_store(
        spark, sf_dir, corpus,
        [{"type": "semantic_cells", "centroids": cent}], "semvec_scaled")
    corpus_cells = _batch.read_signatures(
        spark, dest, "semantic_cells").select("vec_id", "embedding", "__cell")
    return dedup.semantic_dedup_pairs_incremental(
        emb.where(F.col("vec_id") % 5 == 0), cent,
        # r14: arrow pairing — replay-validated entry, same rationale
        # as dedup_embedding_semantic_fit's pair_impl
        corpus_cells=corpus_cells, threshold=0.4, impl="arrow")


VALIDATORS["dedup_embedding_semantic_from_store_scaled"] = \
    _validate_semantic_incr_scaled


@q("streaming_semantic_replay")  # no SQL oracle: the accept loop is
# ordered across micro-batches — exact numpy replay validator below
def streaming_semantic_replay(spark, sf_dir):
    """The streaming semantic accept loop replayed as ordered batches —
    the streaming surface's scale-evidence entry (r11 verdict #4):
    three micro-batches (vec_id % 3) run process_semantic_batch against
    the growing accepted store under production-shaped (corpus-scaled,
    fitted) centroids; returns the accepted corpus (vec_id, __cell).
    Per-batch cost = in-batch within-cell self-join + batch×accepted
    co-cell join — batch-priced by construction, which is exactly what
    the sf1 PLANMETRICS row must show (the accepted store is read back
    per batch, but only co-cell candidates shuffle)."""
    from coolplaydruid_spark.sources import batch as _batch
    from coolplaydruid_spark.streaming import semantic_dedup as _ssem

    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    cent = _fitted_cents(spark, emb)
    acc = str(_proc_store_root(sf_dir) / "sem_stream_acc")
    for b in range(3):
        _ssem.process_semantic_batch(
            emb.where(F.col("vec_id") % 3 == b), b, acc, cent,
            threshold=0.4)
    return _batch.read_signatures(spark, acc).select("vec_id", "__cell")


@validator("streaming_semantic_replay")
def _validate_streaming_semantic_replay(spark, sf_dir, rows):
    """Exact numpy replay of the ordered accept loop: assign all
    vectors under the refitted centroids, then per batch (vec_id % 3,
    in order) (1) drop any member with a smaller-id co-cell neighbor at
    rounded cosine ≥ 0.4 INSIDE the batch (keep-first — the drop set is
    every id_b of the within-batch pairing, matching
    process_semantic_batch), (2) drop survivors with ANY co-cell
    accepted neighbor ≥ 0.4, (3) accept the rest. The accepted
    (id, cell) set must match exactly."""
    emb, cell, cos = _np_semantic_state(spark, sf_dir)
    accepted: list[int] = []
    for b in range(3):
        batch = sorted(i for i in emb if i % 3 == b)
        drops = {
            j for bi, i in enumerate(batch) for j in batch[bi + 1:]
            if cell[i] == cell[j] and cos(emb[i], emb[j]) >= 0.4
        }
        for i in batch:
            if i in drops:
                continue
            if any(cell[a] == cell[i] and cos(emb[a], emb[i]) >= 0.4
                   for a in accepted):
                continue
            accepted.append(i)
    want = {(i, cell[i]) for i in accepted}
    got = {(r["vec_id"], r["__cell"]) for r in rows}
    if got != want:
        return False, (f"accepted-set mismatch: {len(got - want)} extra, "
                       f"{len(want - got)} missing of {len(want)}")
    if len(want) == len(emb):
        return False, "nothing dropped across 3 batches — check is vacuous"
    return True, (f"exact ordered replay: {len(want)} accepted, "
                  f"{len(emb) - len(want)} dropped across 3 batches")


@q("pack_training_sequences")  # no SQL oracle: bin assignment is
# order-dependent (rows-only check; invariants asserted in
# tests/test_operators.py::test_pack_sequences_invariants)
def pack_training_sequences(spark, sf_dir):
    """Token-budget sequence packing (per-partition first-fit-decreasing):
    documents → training sequences of ≤128 whitespace tokens."""
    from coolplaydruid_spark.operators import packing

    eng = engine_for(spark, sf_dir)
    docs = text.token_count(eng.catalog.table("documents")).select(
        "doc_id", "ws_tokens"
    )
    return packing.pack_sequences(docs, budget=128)


@q("similarity_topk_ivf")  # no SQL oracle: k-means is iterative (rows-only check)
def similarity_topk_ivf(spark, sf_dir):
    """IVF (k-means inverted file) ANN — the scale path: each query
    scores only its n_probe nearest cells (~n_probe/n_clusters of the
    corpus). n_probe=4 of 8 cells (r9 verdict #4: the defensible
    production point — measured recall@10 0.68–0.72 here vs 0.34 at
    n_probe=2, and tests/test_plans.py asserts the full monotone sweep
    plus n_probe=nlist ≡ brute force row-for-row)."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.ivf_topk(
        emb.where(F.col("vec_id") >= 5), queries, k=10, n_clusters=8, n_probe=4
    )


def _duck_ivf_pinned(n_cent: int, n_probe: int, k: int) -> str:
    """Full IVF oracle for an EXPLICIT (pinned) centroid set: with
    centroids fixed, every IVF stage is relational — argmin-L2 cell
    assignment (ties → lowest centroid id, the engine's
    first-minimum/array_position rule), per-query n_probe nearest
    cells (same ordering), cosine scoring inside probed cells, rounded
    top-k. The squared distance mirrors the engine's _sqdist
    element-fold exactly (same op order — list_sum over the squared
    element diffs), so the argmin sees the same float64 values."""

    def sq(a: str, b: str) -> str:
        return (f"list_sum(list_transform(range(1, len({a}) + 1), "
                f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))")

    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {n_cent}),
    corpus AS (SELECT vec_id, v FROM e WHERE vec_id >= {n_cent}),
    qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
    cells AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT corpus.vec_id, cid,
               row_number() OVER (PARTITION BY corpus.vec_id
                                  ORDER BY {sq('corpus.v', 'cv')} ASC,
                                           cid ASC) AS rn
        FROM corpus CROSS JOIN cent
      ) WHERE rn = 1
    ),
    pq AS (
      SELECT query_id, cid AS cell FROM (
        SELECT query_id, cid,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {sq('qv', 'cv')} ASC,
                                           cid ASC) AS rn
        FROM qs CROSS JOIN cent
      ) WHERE rn <= {n_probe}
    ),
    scored AS (
      SELECT pq.query_id, corpus.vec_id AS neighbor_id,
             round(list_dot_product(qs.qv, corpus.v) /
                   (sqrt(list_dot_product(qs.qv, qs.qv))
                    * sqrt(list_dot_product(corpus.v, corpus.v))), 6)
               AS cosine
      FROM pq JOIN cells ON pq.cell = cells.cell
              JOIN corpus ON corpus.vec_id = cells.vec_id
              JOIN qs ON qs.query_id = pq.query_id
    ),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
    """


@q("similarity_topk_ivf_pinned", _duck_ivf_pinned(8, 4, 10))
def similarity_topk_ivf_pinned(spark, sf_dir):
    """IVF with an EXPLICIT pinned centroid set (the r13 registry path):
    with centroids fixed, the whole IVF chain — assignment, probe
    selection, cell-join scoring, top-k — is relational, so this entry
    carries a full value-hash SQL oracle where the fitted sibling
    (similarity_topk_ivf) is recall-gated by nature (k-means is
    iterative). Centroids = first 8 vectors; 8×64 = 512 centroid-floats
    keeps the exact JVM literal path."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    cents = [(r["vec_id"], list(r["embedding"]))
             for r in emb.where(F.col("vec_id") < 8).collect()]
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return similarity.ivf_topk(
        emb.where(F.col("vec_id") >= 8), queries, k=10, n_probe=4,
        centroids=cents)


@q("similarity_topk_ivf_from_store", _duck_ivf_pinned(8, 4, 10))
def similarity_topk_ivf_from_store(spark, sf_dir):
    """The ivf_cells store loop end-to-end: register the pinned set in
    a centroid registry, materialize the corpus's version-stamped cell
    assignment, PERSIST it and read it back, then probe via
    corpus_cells — the store-read path must be value-identical to
    inline assignment, checked by the same SQL oracle as
    similarity_topk_ivf_pinned. Completes the registry round-trip the
    semantic-dedup from-store entries already have (r12 verdict #3)."""
    from coolplaydruid_spark import centroids as _cent

    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    cents = [(r["vec_id"], list(r["embedding"]))
             for r in emb.where(F.col("vec_id") < 8).collect()]
    reg = str(_proc_store_root(sf_dir) / "ivfreg")
    _cent.register_centroids(spark, reg, "gate", cents)
    ref = {"registry": reg, "name": "gate"}
    corpus = emb.where(F.col("vec_id") >= 8)
    cells_path = str(_proc_store_root(sf_dir) / "ivfcells.parquet")
    similarity.ivf_cells(corpus, ref).write.mode("overwrite").parquet(
        cells_path)
    store = spark.read.parquet(cells_path)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return similarity.ivf_topk(
        corpus, queries, k=10, n_probe=4, centroids=ref,
        corpus_cells=store)


def _ffd_replay_check(rows, tokens: dict, budget: int):
    """EXACT deterministic packing oracle (not just invariants),
    shared by pack_training_sequences and pipeline_llm_corpus_packed:
    per-partition FFD is a pure function of each partition's doc
    multiset, and the output bins recover that multiset — `seq_id //
    2^40` is the partition namespace (min doc id of the partition).
    Replaying pure-Python FFD over each namespace's docs must reproduce
    the bins bit-for-bit; exact cover against the full input guarantees
    no doc was dropped from / duplicated across namespaces. Returns
    (ok, msg)."""
    from coolplaydruid_spark.operators.packing import _SEQ_STRIDE

    placed = [d for r in rows for d in r["doc_ids"]]
    if sorted(placed) != sorted(tokens):
        return False, "doc cover mismatch (missing/duplicated doc ids)"
    for r in rows:
        tot = sum(tokens[d] for d in r["doc_ids"])
        if tot != r["total_tokens"] or r["n_docs"] != len(r["doc_ids"]):
            return False, f"bin bookkeeping wrong at seq {r['seq_id']}"
        if tot > budget and r["n_docs"] > 1:
            return False, f"multi-doc bin over budget at seq {r['seq_id']}"
    by_ns: dict[int, list] = {}
    for r in rows:
        by_ns.setdefault(r["seq_id"] // _SEQ_STRIDE, []).append(r)
    for ns, bins_out in by_ns.items():
        part = sorted(
            ((d, tokens[d]) for r in bins_out for d in r["doc_ids"]),
            key=lambda t: (-t[1], t[0]),
        )
        if ns != min(d for d, _ in part):
            return False, f"namespace {ns} is not the partition's min doc id"
        bins: list[list[int]] = []
        space: list[int] = []
        for doc, tok in part:
            for i in range(len(bins)):
                if space[i] >= tok:
                    bins[i].append(doc)
                    space[i] -= tok
                    break
            else:
                bins.append([doc])
                space.append(max(budget - tok, 0))
        expect = sorted(tuple(sorted(b)) for b in bins)
        got = sorted(tuple(sorted(r["doc_ids"])) for r in bins_out)
        if expect != got:
            return False, f"FFD replay mismatch in namespace {ns}"
        ids = sorted(r["seq_id"] for r in bins_out)
        if ids != [ns * _SEQ_STRIDE + i for i in range(len(bins_out))]:
            return False, f"seq_id numbering wrong in namespace {ns}"
    return True, (
        f"FFD replay exact: {len(rows)} bins across {len(by_ns)} "
        f"partitions, cover+budget+numbering verified"
    )


@validator("pack_training_sequences")
def _validate_packing(spark, sf_dir, rows):
    """pack_training_sequences' exact replay: inputs = every document's
    whitespace token count (see _ffd_replay_check for the rules)."""
    eng = engine_for(spark, sf_dir)
    docs = (
        text.token_count(eng.catalog.table("documents"))
        .select("doc_id", "ws_tokens")
        .collect()
    )
    tokens = {r["doc_id"]: r["ws_tokens"] for r in docs}
    return _ffd_replay_check(rows, tokens, 128)


@validator("similarity_topk_ivf")
def _validate_ivf(spark, sf_dir, rows):
    """IVF verdict without a SQL oracle: every returned cosine is
    recomputed exactly (numpy double, same 6-dp rounding), rank order is
    verified to be (cosine desc, neighbor asc) — i.e. the result IS the
    true top-k of its probed candidate superset — neighbors are
    contained in the corpus, and recall@10 against the exact brute-force
    top-10 must clear the floor for n_probe=4 of 8 cells."""
    import numpy as np

    eng = engine_for(spark, sf_dir)
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in eng.catalog.table("embeddings").collect()
    }
    corpus = {i: v for i, v in emb.items() if i >= 5}
    qids = sorted(i for i in emb if i < 5)

    def cos(a, b):
        return round(
            float(a @ b) / float(np.linalg.norm(a) * np.linalg.norm(b)), 6
        )

    if len(rows) != 10 * len(qids):
        return False, f"expected {10 * len(qids)} rows, got {len(rows)}"
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    if sorted(by_q) != qids:
        return False, f"query ids {sorted(by_q)} != {qids}"
    recalls = []
    for qid, rs in by_q.items():
        for r in rs:
            if r["neighbor_id"] not in corpus:
                return False, f"neighbor {r['neighbor_id']} not in corpus"
            exact = cos(emb[qid], corpus[r["neighbor_id"]])
            if abs(exact - r["cosine"]) > 2e-6:
                return False, (
                    f"cosine mismatch q{qid} n{r['neighbor_id']}: "
                    f"{r['cosine']} vs exact {exact}"
                )
        ordered = sorted(rs, key=lambda r: r["rank"])
        keys = [(-r["cosine"], r["neighbor_id"]) for r in ordered]
        if keys != sorted(keys) or [r["rank"] for r in ordered] != list(
            range(1, len(rs) + 1)
        ):
            return False, f"rank order inconsistent for query {qid}"
        exact_top = set(
            sorted(corpus, key=lambda n: (-cos(emb[qid], corpus[n]), n))[:10]
        )
        recalls.append(
            len({r["neighbor_id"] for r in rs} & exact_top) / 10.0
        )
    mean_recall = sum(recalls) / len(recalls)

    # n_probe sweep (r13 verdict #5): the pinned/from-store entries
    # carry exact SQL oracles for the relational chain, so the FITTED
    # path's only gate is this recall check — make it evidence-backed:
    # re-run ivf_topk at n_probe ∈ {1,2,4,8} under the identical
    # deterministic fit (same seed/sample) and record the whole
    # recall/n_probe curve in the detail. Anchors: the curve must be
    # non-decreasing (probing more cells only ADDS candidates — the
    # plan-level containment is asserted in tests/test_plans.py; this
    # checks the recall consequence), its n_probe=nlist endpoint must
    # be exact brute force (recall 1.0), and its n_probe=4 point must
    # reproduce the gated result's recall (same fit ⇒ same cells).
    eng2 = engine_for(spark, sf_dir)
    emb_t = eng2.catalog.table("embeddings")
    queries_df = emb_t.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus_df = emb_t.where(F.col("vec_id") >= 5)

    def _mean_recall(res_rows) -> float:
        got: dict[int, set] = {}
        for r in res_rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        rs = []
        for qid in qids:
            exact_top = set(sorted(
                corpus, key=lambda n: (-cos(emb[qid], corpus[n]), n))[:10])
            rs.append(len(got.get(qid, set()) & exact_top) / 10.0)
        return sum(rs) / len(rs)

    curve = {}
    for p in (1, 2, 4, 8):
        res = similarity.ivf_topk(
            corpus_df, queries_df, k=10, n_clusters=8, n_probe=p).collect()
        curve[p] = round(_mean_recall(res), 4)
    probes = sorted(curve)
    if any(curve[probes[i]] > curve[probes[i + 1]]
           for i in range(len(probes) - 1)):
        return False, f"recall curve not non-decreasing: {curve}"
    if curve[8] < 0.999:
        return False, (
            f"n_probe=nlist recall {curve[8]} != 1.0 — probing every "
            "cell must be exact brute force")
    if abs(curve[4] - mean_recall) > 1e-6:
        return False, (
            f"sweep recall@n_probe=4 {curve[4]} != gated result's "
            f"{mean_recall:.4f} — the fit is not deterministic")
    # floor raised 0.6 → 0.65 (r13 verdict #5): measured 0.68–0.72 at
    # this fixture across rounds; the curve in the detail shows what
    # the floor rests on (and that n_probe=4/8 sits on the knee).
    if mean_recall < 0.65:
        return False, f"recall@10 {mean_recall:.2f} < 0.65 floor"
    return True, (
        f"cosines exact, ranks = true top-k of probed cells, "
        f"recall@10={mean_recall:.2f} (floor 0.65, n_probe=4/8); "
        f"recall/n_probe curve {curve} — endpoint exact, non-decreasing"
    )


# ---------------------------------------------------------------------------
# North-star: multimodal plumbing (mapInPandas — Python stage is the point)
# ---------------------------------------------------------------------------


@q(
    "multimodal_features",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(coalesce(text,''))) AS BIGINT) AS n_bytes,
           md5(coalesce(text,'')) AS digest
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """Binary media column → Arrow-batched mapInPandas feature extraction
    (decode stubbed; byte-count + digest are oracle-checked)."""
    eng = engine_for(spark, sf_dir)
    media = eng.catalog.table("documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("media"),
    )
    return multimodal.extract_features(media).select("media_id", "n_bytes", "digest")


@q(
    "multimodal_frame_sample",
    """
    WITH m AS (
      SELECT doc_id AS media_id, coalesce(text,'') AS raw,
             CASE WHEN length(coalesce(text,'')) > 0
                  THEN length(coalesce(text,'')) ELSE 1 END AS dur
      FROM documents
    ), f AS (
      SELECT media_id, raw, dur,
             unnest(range(0, dur, 500)) AS frame_ts_ms
      FROM m
    )
    SELECT media_id, CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
           md5(substring(raw,
                CAST(FLOOR((frame_ts_ms * 1.0 / dur) *
                     greatest(length(raw) - 16, 0)) AS INT) + 1, 16)) AS frame_md5
    FROM f
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame-sampling plumbing (one row per sampled timestamp via
    mapInPandas): duration := text length ms, frame := 16-byte slice at
    the proportional position — ASCII fixture text makes the byte slice
    equal the VARCHAR slice, so the md5 has an exact oracle."""
    eng = engine_for(spark, sf_dir)
    frames = multimodal.frame_sample_stub(_docs_as_video(eng), every_ms=500)
    return frames.select(
        "media_id", "frame_ts_ms", F.md5(F.col("frame")).alias("frame_md5")
    )


def _docs_as_media(eng, kind: str) -> DataFrame:
    """documents.text → real media bytes: an 8×8 RGB PNG whose pixels are
    the UTF-8 text bytes cycled (zeros when empty), or an 8-bit mono WAV
    whose samples are the text bytes. Both are pure functions of the text
    so DuckDB can recompute decoded-pixel/sample statistics from char
    codes directly (fixture text is ASCII: 1 char = 1 byte). Encodes
    behind spread() so a few-file documents scan cannot serialize the
    per-row Python work onto a couple of tasks."""
    import pandas as pd  # noqa: PLC0415

    from coolplaydruid_spark.operators.util import spread

    docs = spread(
        eng.catalog.table("documents"), by="doc_id"
    ).select("doc_id", "text")

    def to_media(it):
        for pdf in it:
            ids, medias = [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                data = (txt or "").encode("utf-8")
                if kind == "png":
                    n = 8 * 8 * 3
                    buf = bytes(data[i % len(data)] if data else 0 for i in range(n))
                    medias.append(multimodal.png_encode(buf, 8, 8, 3))
                else:
                    medias.append(multimodal.wav_encode(data))
                ids.append(did)
            yield pd.DataFrame({"media_id": ids, "media": medias})

    return docs.mapInPandas(to_media, "media_id long, media binary")


@q(
    "multimodal_image_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id, coalesce(text, '') AS t FROM documents
    ), px AS (
      SELECT media_id,
             CASE WHEN length(t) = 0 THEN 0
                  ELSE ascii(substring(t, CAST(i % length(t) AS INT) + 1, 1))
             END AS b
      FROM (SELECT media_id, t, unnest(range(0, 192)) AS i FROM m)
    )
    SELECT media_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           round(avg(b), 4) AS mean_px
    FROM px GROUP BY media_id
    """,
)
def multimodal_image_stats(spark, sf_dir):
    """REAL PNG decode under the oracle gate: text bytes → png_encode →
    decode_image (Pillow, or the stdlib inflate+unfilter codec) →
    mean over all decoded samples. The oracle recomputes the mean from
    char codes, so any defect in the decode path shifts mean_px and
    fails the value hash."""
    eng = engine_for(spark, sf_dir)
    stats = multimodal.image_stats(_docs_as_media(eng, "png"))
    return stats.withColumn("mean_px", F.round("mean_px", 4))


@q(
    "multimodal_audio_stats",
    """
    WITH m AS (
      SELECT doc_id AS media_id, coalesce(text, '') AS t FROM documents
    ), s AS (
      SELECT media_id,
             ascii(substring(t, CAST(i AS INT) + 1, 1)) - 128 AS v
      FROM (SELECT media_id, t, unnest(range(0, length(t))) AS i FROM m)
    ), agg AS (
      SELECT media_id, count(*) AS n, round(sqrt(avg(CAST(v*v AS DOUBLE))), 4) AS rms
      FROM s GROUP BY media_id
    )
    SELECT m.media_id, CAST(1 AS INT) AS n_channels,
           CAST(8000 AS INT) AS sample_rate,
           CAST(FLOOR(coalesce(agg.n, 0) * 1000.0 / 8000) AS BIGINT) AS duration_ms,
           coalesce(agg.rms, 0.0) AS rms
    FROM m LEFT JOIN agg USING (media_id)
    """,
)
def multimodal_audio_stats(spark, sf_dir):
    """REAL WAV decode under the oracle gate: text bytes as 8-bit PCM →
    wav_encode → stdlib wave decode → RMS of centered samples; the
    oracle recomputes RMS from char codes − 128."""
    eng = engine_for(spark, sf_dir)
    stats = multimodal.audio_stats(_docs_as_media(eng, "wav"))
    return stats.withColumn("rms", F.round("rms", 4))


@q(
    "multimodal_resize_roundtrip",
    """
    WITH m AS (
      SELECT doc_id AS media_id, coalesce(text, '') AS t FROM documents
    ), px AS (
      SELECT media_id,
             CASE WHEN length(t) = 0 THEN 0
                  ELSE ascii(substring(t,
                       CAST(((i // 12) * 2 * 24 + (i % 12 // 3) * 2 * 3 + i % 3)
                            % length(t) AS INT) + 1, 1))
             END AS b
      FROM (SELECT media_id, t, unnest(range(0, 48)) AS i FROM m)
    )
    SELECT media_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           round(avg(b), 4) AS mean_px
    FROM px GROUP BY media_id
    """,
)
def multimodal_resize_roundtrip(spark, sf_dir):
    """REAL resize: 8×8 PNG → nearest-neighbor 4×4 → re-encode → decode →
    stats. With a 2:1 ratio, output pixel (x,y) is source pixel (2x,2y),
    so the oracle indexes the cycled text bytes at
    (2y*24 + 2x*3 + c) % len — decode, resample, re-encode, and re-decode
    all sit under one exact value hash."""
    eng = engine_for(spark, sf_dir)
    resized = multimodal.resize_images(_docs_as_media(eng, "png"), 4, 4)
    stats = multimodal.image_stats(resized)
    return stats.withColumn("mean_px", F.round("mean_px", 4))


def _duck_phash_cte() -> str:
    """Shared oracle CTEs rebuilding the 64-bit dHash halves from char
    codes for the 8×8 PNG fixture (_docs_as_media 'png'): pixel byte at
    linear index j is the cycled text byte j % len; grayscale =
    (b0+b1+b2)//3; the 9×8 sample grid indexes source pixel
    (y, x*8//9); bit = gray(x) > gray(x+1), packed MSB-first into two
    32-bit halves (rows 0-3 → hi, rows 4-7 → lo) — bit-identical to
    multimodal.phash_signatures over the decoded pixels."""
    px = (
        "CASE WHEN length(t)=0 THEN 0 ELSE ascii(substring(t, "
        "CAST(((y*8 + (x*8)//9)*3 + {c}) % length(t) AS INT) + 1, 1)) END"
    )
    gray = "((" + px.format(c=0) + ") + (" + px.format(c=1) + ") + (" \
        + px.format(c=2) + ")) // 3"
    return f"""
    WITH m AS (SELECT doc_id AS media_id, coalesce(text, '') AS t FROM documents),
    g AS (
      SELECT media_id, y, x, {gray} AS gray
      FROM (SELECT media_id, t, CAST(i // 9 AS INT) AS y,
                   CAST(i % 9 AS INT) AS x
            FROM (SELECT media_id, t, unnest(range(0, 72)) AS i FROM m))
    ),
    bits AS (
      SELECT a.media_id, a.y, a.x,
             CASE WHEN a.gray > b.gray THEN 1 ELSE 0 END AS bit
      FROM g a JOIN g b ON a.media_id = b.media_id AND a.y = b.y
                       AND b.x = a.x + 1
      WHERE a.x < 8
    ),
    h AS (
      SELECT media_id,
             CAST(sum(CASE WHEN y < 4
                  THEN bit * (CAST(1 AS BIGINT) << (31 - (y*8+x)))
                  ELSE 0 END) AS BIGINT) AS phash_hi,
             CAST(sum(CASE WHEN y >= 4
                  THEN bit * (CAST(1 AS BIGINT) << (31 - ((y-4)*8+x)))
                  ELSE 0 END) AS BIGINT) AS phash_lo
      FROM bits GROUP BY media_id
    )
    """


def _duck_phash_signatures() -> str:
    return _duck_phash_cte() + \
        "SELECT media_id, phash_hi, phash_lo FROM h"


def _duck_phash_pairs(max_hamming: int) -> str:
    """All-pairs Hamming oracle — exactly the blocked result for
    max_hamming ≤ 7 (the 8-band pigeonhole guarantee the engine
    enforces)."""
    return _duck_phash_cte() + f"""
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           CAST(bit_count(xor(a.phash_hi, b.phash_hi))
              + bit_count(xor(a.phash_lo, b.phash_lo)) AS INT) AS hamming
    FROM h a JOIN h b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.phash_hi, b.phash_hi))
        + bit_count(xor(a.phash_lo, b.phash_lo)) <= {int(max_hamming)}
    """


def _duck_phash_pairs_capped(max_hamming: int, cap: int) -> str:
    """Banded-Hamming oracle WITH the hot-bucket cap: mirrors the
    engine's banding exactly (8 bands of 8 bits, b<4 from the hi half
    MSB-first, b≥4 from lo), drops (band, bits) buckets holding more
    than ``cap`` images via a window count (the same formulation as the
    minhash capped oracle — see _duck_minhash_pair_ctes on why not
    NOT EXISTS), pairs only within surviving buckets, then applies the
    exact Hamming threshold. Unlike the uncapped all-pairs oracle this
    one must spell out the banding, because with a cap the blocked join
    is no longer pigeonhole-equivalent to all pairs — that exclusion is
    precisely what the entry verifies."""
    return _duck_phash_cte() + f"""
    , bands AS (
      SELECT media_id, CAST(range AS INT) AS band,
             CASE WHEN range < 4
                  THEN (phash_hi >> CAST((3 - range) * 8 AS INT)) & 255
                  ELSE (phash_lo >> CAST((7 - range) * 8 AS INT)) & 255
             END AS bits
      FROM h, range(8)
    ),
    bandc AS (
      SELECT media_id, band, bits FROM (
        SELECT bands.*, count(*) OVER (PARTITION BY band, bits) AS __n
        FROM bands) WHERE __n <= {int(cap)}
    ),
    cand AS (
      SELECT DISTINCT l.media_id AS ma, r.media_id AS mb
      FROM bandc l JOIN bandc r
        ON l.band = r.band AND l.bits = r.bits AND l.media_id < r.media_id
    )
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           CAST(bit_count(xor(a.phash_hi, b.phash_hi))
              + bit_count(xor(a.phash_lo, b.phash_lo)) AS INT) AS hamming
    FROM cand JOIN h a ON cand.ma = a.media_id
              JOIN h b ON cand.mb = b.media_id
    WHERE bit_count(xor(a.phash_hi, b.phash_hi))
        + bit_count(xor(a.phash_lo, b.phash_lo)) <= {int(max_hamming)}
    """


@q("dedup_image_phash_capped", _duck_phash_pairs_capped(6, 20))
def dedup_image_phash_capped(spark, sf_dir):
    """phash_neardup with the r14 max_band_bucket hot-bucket cap: the
    uncapped banded join is pigeonhole-EXACT but its candidate volume
    is bounded only by real band collisions, which a boilerplate-heavy
    corpus concentrates (the sf1 media fixture measured 670M candidate
    pairs from 400k banded rows, verified down to 21k — all real work,
    but work a production corpus would cap). cap=20 genuinely binds at
    gate scale (hot 8-bit buckets exist at sf0.01), so the oracle
    verifies the exclusion semantics — pairs whose every agreeing band
    is hot are conservatively NOT emitted (their members all survive
    dedup) — not just the plumbing."""
    eng = engine_for(spark, sf_dir)
    return multimodal.phash_neardup(
        _docs_as_media(eng, "png"), max_hamming=6, max_band_bucket=20)


@q("multimodal_phash_signatures", _duck_phash_signatures())
def multimodal_phash_signatures(spark, sf_dir):
    """64-bit dHash halves over the REAL PNG decode: the oracle rebuilds
    every gradient bit from char codes, so any defect in decode,
    grayscale, 9×8 sampling, or bit packing flips an integer and fails
    the value hash (operators/multimodal.phash_signatures)."""
    eng = engine_for(spark, sf_dir)
    return multimodal.phash_signatures(_docs_as_media(eng, "png"))


def _duck_phash_pairs_incremental(max_hamming: int, mod: int, rem: int) -> str:
    """Batch × corpus image pairs: corpus side (a) is media_id % mod !=
    rem, batch side (b) the rest — all cross pairs within the Hamming
    threshold, which the engine's banded cross join reproduces exactly."""
    return _duck_phash_cte() + f"""
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           CAST(bit_count(xor(a.phash_hi, b.phash_hi))
              + bit_count(xor(a.phash_lo, b.phash_lo)) AS INT) AS hamming
    FROM h a JOIN h b
      ON a.media_id % {mod} != {rem} AND b.media_id % {mod} = {rem}
    WHERE bit_count(xor(a.phash_hi, b.phash_hi))
        + bit_count(xor(a.phash_lo, b.phash_lo)) <= {int(max_hamming)}
    """


@q("dedup_image_phash_incremental", _duck_phash_pairs_incremental(6, 5, 0))
def dedup_image_phash_incremental(spark, sf_dir):
    """Daily-ingest image dedup: an incoming media batch (every 5th
    document's image) against the standing corpus, via pre-materialized
    corpus signatures — the corpus is never re-paired or re-decoded
    (operators/multimodal.phash_neardup_incremental)."""
    eng = engine_for(spark, sf_dir)
    media = _docs_as_media(eng, "png")
    batch = media.where(F.col("media_id") % 5 == 0)
    corpus_sig = multimodal.phash_signatures(
        media.where(F.col("media_id") % 5 != 0))
    return multimodal.phash_neardup_incremental(
        batch, corpus_signatures=corpus_sig, max_hamming=6)


@q("dedup_image_phash_from_store", _duck_phash_pairs_incremental(6, 5, 0))
def dedup_image_phash_from_store(spark, sf_dir):
    """The END-TO-END ingest→dedup loop (r9 verdict #1): an index task
    materializes the corpus's dHash signatures at accept time
    (sources/batch.index_task signatures=[{"type": "phash"}] →
    <dest>.sig/phash, __dt-partitioned), and the incremental near-dup
    operator reads the STORE back — the corpus media is decoded exactly
    once, at ingest; the pairing plan is decode-free on the corpus side
    (plan-asserted in tests/test_ingest.py). Oracle = the same all-cross-
    pairs SQL as dedup_image_phash_incremental, so store-read ≡ inline
    signatures is value-hash-checked every round."""
    from coolplaydruid_spark.sources import batch as _batch

    eng = engine_for(spark, sf_dir)
    media = _docs_as_media(eng, "png")
    dest = _ingest_store(
        spark, sf_dir, media.where(F.col("media_id") % 5 != 0),
        [{"type": "phash"}], "media")
    corpus_sig = _batch.read_signatures(spark, dest, "phash").select(
        "media_id", "phash_hi", "phash_lo")
    return multimodal.phash_neardup_incremental(
        media.where(F.col("media_id") % 5 == 0),
        corpus_signatures=corpus_sig, max_hamming=6)


@q("dedup_image_phash", _duck_phash_pairs(6))
def dedup_image_phash(spark, sf_dir):
    """Perceptual image near-dup pairs (dHash Hamming ≤ 6) with banded
    blocking — the image-modality dedup the text side has had since r5;
    the oracle computes ALL pairs, which the 8-band pigeonhole makes
    identical to the blocked join at this threshold
    (operators/multimodal.phash_neardup)."""
    eng = engine_for(spark, sf_dir)
    return multimodal.phash_neardup(_docs_as_media(eng, "png"), max_hamming=6)


def _duck_media_pipeline(max_hamming: int) -> str:
    """End-to-end media dedup oracle: all-pairs dHash Hamming graph →
    recursive-CTE connected components → keep the longest-source-text
    member per cluster (ties → smallest id). Shared with the pipeline
    fuzzer, which sweeps max_hamming."""
    return (
        _duck_phash_cte().replace("WITH m AS", "WITH RECURSIVE m AS", 1)
        + f"""
    , p AS (
      SELECT a.media_id AS ma, b.media_id AS mb
      FROM h a JOIN h b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.phash_hi, b.phash_hi))
          + bit_count(xor(a.phash_lo, b.phash_lo)) <= {int(max_hamming)}
    ),
    edges AS (SELECT ma AS src, mb AS dst FROM p
              UNION SELECT mb, ma FROM p),
    reach AS (
      SELECT src AS vertex, src AS r FROM edges
      UNION
      SELECT e.dst AS vertex, rr.r FROM reach rr JOIN edges e ON e.src = rr.vertex
    ),
    comp AS (SELECT vertex, min(r) AS component FROM reach GROUP BY vertex),
    ranked AS (
      SELECT c.vertex AS media_id,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY length(coalesce(d.text, '')) DESC,
                                         c.vertex ASC) AS rk
      FROM comp c JOIN documents d ON d.doc_id = c.vertex
    )
    SELECT m.media_id, CAST(length(coalesce(d.text, '')) AS BIGINT) AS q
    FROM m JOIN documents d ON d.doc_id = m.media_id
    WHERE m.media_id NOT IN (SELECT media_id FROM ranked WHERE rk > 1)
    """
    )


def _spark_media_pipeline(eng, max_hamming: int) -> DataFrame:
    """Engine half of the composed media pipeline, shared with the
    fuzzer: decode → signatures → banded pairs → components →
    keep-best (quality = source text length)."""
    docs = eng.catalog.table("documents")
    media = _docs_as_media(eng, "png")
    pairs = multimodal.phash_neardup(media, max_hamming=max_hamming)
    # media ids ARE doc ids (_docs_as_media is 1:1), so quality projects
    # straight off documents — no second decode pass, no join (review
    # find: joining through the mapInPandas frame re-encoded every PNG
    # just to recover ids the documents table already has).
    scored = docs.select(
        F.col("doc_id").alias("media_id"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("q"),
    )
    return graph.dedup_keep_best(
        scored, pairs, quality_col="q", id_col="media_id",
        src_col="media_id_a", dst_col="media_id_b",
    )


@q("pipeline_media_dedup", _duck_media_pipeline(6))
def pipeline_media_dedup(spark, sf_dir):
    """The media counterpart of pipeline_quality_corpus (r9 verdict #2):
    decode → dHash signatures → banded near-dup pairs (ham ≤ 6) →
    connected components → quality-aware retention (keep the
    highest-quality member per transitive cluster, quality = source
    text length, ties → smallest id), composed END-TO-END under one
    recursive-CTE oracle — proof the media family composes through
    graph.connected_components/dedup_keep_best exactly the way the text
    family provably does. Ranking touches only cluster members; the
    binary media column never enters the window path."""
    return _spark_media_pipeline(engine_for(spark, sf_dir), 6)


def _duck_afp_cte() -> str:
    """Shared oracle CTEs rebuilding the 32-bit audio fingerprint from
    char codes for the WAV fixture (_docs_as_media 'wav': sample i is
    text byte i − 128): |centered sample| sums per window i·33 // n,
    bit = integer cross-multiplied mean comparison, packed MSB-first —
    bit-identical to multimodal.audio_fingerprint over the decoded
    frames. Windows of clips shorter than 33 samples stay (0, 0) via
    the spine left-join, matching the engine's zero-filled arrays."""
    return """
    WITH m AS (SELECT doc_id AS media_id, coalesce(text, '') AS t FROM documents),
    s AS (
      SELECT media_id, CAST(i AS INT) AS i,
             abs(ascii(substring(t, CAST(i AS INT) + 1, 1)) - 128) AS a,
             length(t) AS n
      FROM (SELECT media_id, t, unnest(range(0, length(t))) AS i FROM m)
    ),
    agg AS (SELECT media_id, (i*33)//n AS w, sum(a) AS e,
                   CAST(count(*) AS BIGINT) AS l
            FROM s GROUP BY 1, 2),
    spine AS (SELECT media_id, range AS w FROM m, range(33)),
    win AS (SELECT spine.media_id, spine.w,
                   coalesce(e, 0) AS e, coalesce(l, 0) AS l
            FROM spine LEFT JOIN agg
              ON spine.media_id = agg.media_id AND spine.w = agg.w),
    bits AS (
      SELECT a.media_id, a.w,
             CASE WHEN a.e * b.l > b.e * a.l THEN 1 ELSE 0 END AS bit
      FROM win a JOIN win b ON a.media_id = b.media_id AND b.w = a.w + 1
      WHERE a.w < 32
    ),
    h AS (
      SELECT media_id,
             CAST(sum(bit * (CAST(1 AS BIGINT) << (31 - CAST(w AS INT))))
                  AS BIGINT) AS afp
      FROM bits GROUP BY 1
    )
    """


def _duck_afp_pairs(max_hamming: int) -> str:
    return _duck_afp_cte() + f"""
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
    FROM h a JOIN h b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.afp, b.afp)) <= {int(max_hamming)}
    """


@q("multimodal_audio_fingerprint", _duck_afp_cte() +
   "SELECT media_id, afp FROM h")
def multimodal_audio_fingerprint(spark, sf_dir):
    """32-bit energy-gradient audio fingerprint over the REAL WAV
    decode — every window sum and cross-multiplied comparison is
    integer math, so the oracle rebuilds the exact fingerprint from
    char codes (operators/multimodal.audio_fingerprint)."""
    eng = engine_for(spark, sf_dir)
    return multimodal.audio_fingerprint(_docs_as_media(eng, "wav"))


def _duck_afp_pairs_incremental(max_hamming: int, mod: int, rem: int) -> str:
    return _duck_afp_cte() + f"""
    SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
    FROM h a JOIN h b
      ON a.media_id % {mod} != {rem} AND b.media_id % {mod} = {rem}
    WHERE bit_count(xor(a.afp, b.afp)) <= {int(max_hamming)}
    """


@q("dedup_audio_fingerprint_incremental", _duck_afp_pairs_incremental(3, 5, 0))
def dedup_audio_fingerprint_incremental(spark, sf_dir):
    """Daily-ingest audio dedup: incoming batch × standing corpus via
    pre-materialized fingerprints
    (operators/multimodal.audio_neardup_incremental)."""
    eng = engine_for(spark, sf_dir)
    media = _docs_as_media(eng, "wav")
    batch = media.where(F.col("media_id") % 5 == 0)
    corpus_sig = multimodal.audio_fingerprint(
        media.where(F.col("media_id") % 5 != 0))
    return multimodal.audio_neardup_incremental(
        batch, corpus_signatures=corpus_sig, max_hamming=3)


@q("dedup_audio_fingerprint", _duck_afp_pairs(3))
def dedup_audio_fingerprint(spark, sf_dir):
    """Audio near-dup pairs (fingerprint Hamming ≤ 3) with 4-band
    pigeonhole blocking — blocked ≡ all-pairs at this threshold, which
    is what the oracle computes (operators/multimodal.audio_neardup)."""
    eng = engine_for(spark, sf_dir)
    return multimodal.audio_neardup(_docs_as_media(eng, "wav"), max_hamming=3)


def _docs_as_video(eng) -> DataFrame:
    """documents.text → opaque 'video' bytes with duration_ms := text
    length (the multimodal_frame_sample convention) — a pure SQL
    projection, so the only Python stage in the video pipeline is the
    frame-sampling stub itself."""
    return eng.catalog.table("documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("media"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
        .alias("duration_ms"),
    )


def _duck_video_cte(every_ms: int) -> str:
    """Shared oracle CTEs rebuilding the per-frame 60-bit hash from the
    text fixture: frame at ts is the 16-byte slice at the proportional
    position (multimodal_frame_sample's byte math — ASCII text makes the
    byte slice equal the VARCHAR slice), hash = first 15 md5 hex chars
    as an integer (the repo-wide md5 idiom). fh = DISTINCT per-video
    frame-hash sets."""
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id, coalesce(text, '') AS raw,
             CASE WHEN length(coalesce(text, '')) > 0
                  THEN length(coalesce(text, '')) ELSE 1 END AS dur
      FROM documents
    ), f AS (
      SELECT media_id, raw, dur,
             unnest(range(0, dur, {int(every_ms)})) AS ts
      FROM m
    ), fr AS (
      SELECT media_id, CAST(ts AS BIGINT) AS frame_ts_ms,
             CAST(('0x' || substring(md5(substring(raw,
                  CAST(FLOOR((ts * 1.0 / dur) *
                       greatest(length(raw) - 16, 0)) AS INT) + 1, 16)), 1, 15))
                  AS BIGINT) AS frame_hash
      FROM f
    ), fh AS (SELECT DISTINCT media_id, frame_hash FROM fr)
    """


def _duck_video_pairs(threshold: float, every_ms: int,
                      cross_mod: int | None = None,
                      cross_rem: int | None = None) -> str:
    """Frame-hash Jaccard pair oracle; with cross_mod/cross_rem the
    pairs are batch (id % mod = rem) × corpus (the rest) instead of the
    a < b self-join — shared with the fuzzer."""
    if cross_mod is None:
        join = "fh a JOIN fh b ON a.frame_hash = b.frame_hash " \
               "AND a.media_id < b.media_id"
    else:
        join = (f"fh a JOIN fh b ON a.frame_hash = b.frame_hash "
                f"AND a.media_id % {cross_mod} != {cross_rem} "
                f"AND b.media_id % {cross_mod} = {cross_rem}")
    return _duck_video_cte(every_ms) + f"""
    , co AS (
      SELECT a.media_id AS ma, b.media_id AS mb, count(*) AS n_common
      FROM {join}
      GROUP BY 1, 2
    ), sizes AS (SELECT media_id, count(*) AS n FROM fh GROUP BY 1)
    SELECT ma AS media_id_a, mb AS media_id_b,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM co JOIN sizes sa ON co.ma = sa.media_id
            JOIN sizes sb ON co.mb = sb.media_id
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= {threshold}
    """


@q("multimodal_video_frame_signatures",
   _duck_video_cte(100)
   + "SELECT media_id, frame_ts_ms, frame_hash FROM fr")
def multimodal_video_frame_signatures(spark, sf_dir):
    """Per-frame 60-bit hashes over the sampled frame stream — the
    video modality's dedup signature (codec-independent: the hash is
    over frame bytes, here the honest byte-slice stub; a real decoder
    changes nothing downstream). The oracle rebuilds every hash from
    text char positions (operators/multimodal.video_frame_signatures)."""
    eng = engine_for(spark, sf_dir)
    return multimodal.video_frame_signatures(
        _docs_as_video(eng), every_ms=100)


@q("dedup_video_framehash", _duck_video_pairs(0.5, 100))
def dedup_video_framehash(spark, sf_dir):
    """Video near-dup pairs by frame-hash voting: Jaccard ≥ 0.5 over
    each video's distinct sampled-frame-hash set — the video modality's
    counterpart of n-gram Jaccard, with the co-frame join as the
    blocking (operators/multimodal.video_neardup)."""
    eng = engine_for(spark, sf_dir)
    return multimodal.video_neardup(
        _docs_as_video(eng), threshold=0.5, every_ms=100)


@q("dedup_video_framehash_incremental", _duck_video_pairs(0.5, 100, 5, 0))
def dedup_video_framehash_incremental(spark, sf_dir):
    """Daily-ingest video dedup: incoming batch (every 5th video) ×
    standing corpus via pre-materialized frame signatures — corpus
    never re-samples or self-pairs
    (operators/multimodal.video_neardup_incremental)."""
    eng = engine_for(spark, sf_dir)
    media = _docs_as_video(eng)
    corpus_sig = multimodal.video_frame_signatures(
        media.where(F.col("media_id") % 5 != 0), every_ms=100)
    return multimodal.video_neardup_incremental(
        media.where(F.col("media_id") % 5 == 0),
        corpus_signatures=corpus_sig, threshold=0.5, every_ms=100)


_DUCK_PIPELINE_TAIL = """
    edges AS (SELECT ma AS src, mb AS dst FROM p
              UNION SELECT mb, ma FROM p),
    reach AS (
      SELECT src AS vertex, src AS r FROM edges
      UNION
      SELECT e.dst AS vertex, rr.r FROM reach rr JOIN edges e ON e.src = rr.vertex
    ),
    comp AS (SELECT vertex, min(r) AS component FROM reach GROUP BY vertex),
    ranked AS (
      SELECT c.vertex AS media_id,
             row_number() OVER (PARTITION BY c.component
                                ORDER BY length(coalesce(d.text, '')) DESC,
                                         c.vertex ASC) AS rk
      FROM comp c JOIN documents d ON d.doc_id = c.vertex
    )
    SELECT d.doc_id AS media_id,
           CAST(length(coalesce(d.text, '')) AS BIGINT) AS q
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT media_id FROM ranked WHERE rk > 1)
    """


def _spark_modal_pipeline(eng, pairs: DataFrame) -> DataFrame:
    """Shared retention tail of the composed per-modality pipelines:
    quality (source text length) projects straight off documents —
    media ids ARE doc ids in the fixtures — so the binary column never
    enters the component/window path and nothing is decoded twice."""
    scored = eng.catalog.table("documents").select(
        F.col("doc_id").alias("media_id"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias("q"),
    )
    return graph.dedup_keep_best(
        scored, pairs, quality_col="q", id_col="media_id",
        src_col="media_id_a", dst_col="media_id_b",
    )


@q(
    "pipeline_audio_dedup",
    _duck_afp_cte().replace("WITH m AS", "WITH RECURSIVE m AS", 1)
    + """
    , p AS (
      SELECT a.media_id AS ma, b.media_id AS mb
      FROM h a JOIN h b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.afp, b.afp)) <= 3
    ),
    """
    + _DUCK_PIPELINE_TAIL,
)
def pipeline_audio_dedup(spark, sf_dir):
    """The audio modality composed end-to-end (r10 verdict: the
    composed pipeline existed for images only): decode → 32-bit audio
    fingerprints → banded Hamming pairs (≤ 3) → connected components →
    keep the highest-quality member per transitive cluster, all under
    one recursive-CTE oracle."""
    eng = engine_for(spark, sf_dir)
    pairs = multimodal.audio_neardup(
        _docs_as_media(eng, "wav"), max_hamming=3, media_col="media")
    return _spark_modal_pipeline(eng, pairs)


@q(
    "pipeline_video_dedup",
    _duck_video_cte(100).replace("WITH m AS", "WITH RECURSIVE m AS", 1)
    + """
    , co AS (
      SELECT a.media_id AS ma, b.media_id AS mb, count(*) AS n_common
      FROM fh a JOIN fh b ON a.frame_hash = b.frame_hash
                         AND a.media_id < b.media_id
      GROUP BY 1, 2
    ), sizes AS (SELECT media_id, count(*) AS n FROM fh GROUP BY 1),
    p AS (
      SELECT ma, mb
      FROM co JOIN sizes sa ON co.ma = sa.media_id
              JOIN sizes sb ON co.mb = sb.media_id
      WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
    ),
    """
    + _DUCK_PIPELINE_TAIL,
)
def pipeline_video_dedup(spark, sf_dir):
    """The video modality composed end-to-end: sampled frame-hash sets
    → set-Jaccard pairs (≥ 0.5, co-frame join as the blocking) →
    connected components → quality-aware retention, under one
    recursive-CTE oracle — with this every media modality (image,
    audio, video) has the full signatures → pairs → components →
    keep-best composition oracle-gated, same as the text family."""
    eng = engine_for(spark, sf_dir)
    pairs = multimodal.video_neardup(
        _docs_as_video(eng), threshold=0.5, every_ms=100).drop("jaccard")
    return _spark_modal_pipeline(eng, pairs)


# ---------------------------------------------------------------------------
# Corpus statistics & cleaning (operators/corpus.py)
# ---------------------------------------------------------------------------


@q(
    "corpus_bigram_top50",
    f"""
    WITH toks AS (
      SELECT {DUCK_TOKS} AS t FROM documents
    ), g AS (
      SELECT unnest(CASE WHEN len(t) >= 2
                         THEN list_transform(range(1, len(t)),
                              i -> array_to_string(list_slice(t, i, i + 1), ' '))
                         ELSE CAST([] AS VARCHAR[]) END) AS ngram
      FROM toks
    )
    SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
    FROM g GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 50
    """,
)
def corpus_bigram_top50(spark, sf_dir):
    """Corpus bigram frequency top-50 (every occurrence counted, unlike
    per-doc-distinct shingles): partial-agg → one gram shuffle →
    TakeOrdered with the (cnt DESC, gram ASC) total order."""
    eng = engine_for(spark, sf_dir)
    return corpus.ngram_top_k(eng.catalog.table("documents"), n=2, k=50)


@q(
    "text_repetition_signals",
    f"""
    WITH toks AS (
      SELECT doc_id, {DUCK_TOKS} AS t FROM documents
    ), tok AS (
      SELECT doc_id, unnest(t) AS w FROM toks
    ), tc AS (
      SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2
    ), ts AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS distinct_token_ratio,
             round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_token_frac
      FROM tc GROUP BY 1
    ), g AS (
      SELECT doc_id, unnest(CASE WHEN len(t) >= 2
                       THEN list_transform(range(1, len(t)),
                            i -> array_to_string(list_slice(t, i, i + 1), ' '))
                       ELSE CAST([] AS VARCHAR[]) END) AS gm
      FROM toks
    ), gc AS (
      SELECT doc_id, gm, count(*) AS c FROM g GROUP BY 1, 2
    ), gs AS (
      SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_bigram_frac
      FROM gc GROUP BY 1
    )
    SELECT d.doc_id, coalesce(ts.n_tokens, 0) AS n_tokens,
           coalesce(ts.distinct_token_ratio, 0.0) AS distinct_token_ratio,
           coalesce(ts.top_token_frac, 0.0) AS top_token_frac,
           coalesce(gs.top_bigram_frac, 0.0) AS top_bigram_frac
    FROM documents d
    LEFT JOIN ts ON d.doc_id = ts.doc_id
    LEFT JOIN gs ON d.doc_id = gs.doc_id
    """,
)
def text_repetition_signals(spark, sf_dir):
    """Gopher-style repetition filters (type-token ratio, top token /
    bigram share): map-only in Spark — most-frequent counts are folds
    over the sorted token array (operators/text.repetition_signals),
    zero shuffles — while the oracle computes the same numbers
    relationally (unnest + GROUP BY)."""
    eng = engine_for(spark, sf_dir)
    return text.repetition_signals(eng.catalog.table("documents"))


# Deterministic synthetic PII appended per doc so the redactor provably
# rewrites (the fixture corpus itself contains no emails/IPs): an email
# whose local part embeds the doc_id, an IPv4 from doc_id arithmetic,
# and a 10-digit account number.
_PII_SUFFIX_SPARK = (
    "concat(text, ' contact u', CAST(doc_id AS STRING), '@example.com ip 10.0.',"
    " CAST(doc_id % 256 AS STRING), '.7 acct ', CAST(7770000000 + doc_id AS STRING))"
)
_PII_SUFFIX_DUCK = (
    "text || ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.7 acct ' || CAST(7770000000 + doc_id AS VARCHAR)"
)


@q(
    "corpus_pii_redact",
    f"""
    WITH seeded AS (
      SELECT doc_id, {_PII_SUFFIX_DUCK} AS text FROM documents
    ), s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM seeded
    ), s2 AS (
      SELECT doc_id, n_emails,
             len(regexp_extract_all(t1, '{IPV4_RE}')) AS n_ips,
             regexp_replace(t1, '{IPV4_RE}', '<IP>', 'g') AS t2
      FROM s1
    )
    SELECT doc_id,
           md5(regexp_replace(t2, '{LONGNUM_RE}', '<NUM>', 'g')) AS redacted_md5,
           CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_ips AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(t2, '{LONGNUM_RE}')) AS BIGINT) AS n_long_numbers
    FROM s2
    """,
)
def corpus_pii_redact(spark, sf_dir):
    """PII scrubbing (emails → IPs → long numbers, counted as removed)
    over docs seeded with deterministic synthetic PII; result is the
    md5 of the redacted text plus per-category counts. Map-only."""
    eng = engine_for(spark, sf_dir)
    seeded = eng.catalog.table("documents").select(
        "doc_id", F.expr(_PII_SUFFIX_SPARK).alias("text")
    )
    out = corpus.pii_redact(seeded)
    return out.select(
        "doc_id",
        F.md5(F.col("redacted")).alias("redacted_md5"),
        "n_emails",
        "n_ips",
        "n_long_numbers",
    )


@q(
    "corpus_mixture_report",
    f"""
    WITH per AS (
      SELECT lang, source, len({DUCK_TOKS}) AS tok FROM documents
    ), grp AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS total_tokens
      FROM per GROUP BY lang, source
    ), grand AS (
      SELECT CAST(count(*) AS BIGINT) AS all_docs,
             CAST(sum(tok) AS BIGINT) AS all_tokens FROM per
    )
    SELECT lang, source, n_docs, total_tokens,
           round(n_docs / all_docs, 6) AS doc_share,
           round(total_tokens / all_tokens, 6) AS token_share
    FROM grp, grand
    """,
)
def corpus_mixture_report(spark, sf_dir):
    """Language × source mixture composition (docs, tokens, shares) in
    ONE corpus pass: a single agg shuffle collapses the corpus to the
    group rows; grand totals are a constant-partition window over that
    tiny set."""
    eng = engine_for(spark, sf_dir)
    return corpus.mixture_report(eng.catalog.table("documents"))


@q(
    "corpus_tfidf_sources",
    f"""
    WITH toks AS (
      SELECT source AS grp, unnest({DUCK_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT grp, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS dfq FROM tf GROUP BY 1
    ), g AS (
      SELECT CAST(count(DISTINCT grp) AS DOUBLE) AS G FROM tf
    ), scored AS (
      SELECT grp, term, tf,
             round(CAST(tf AS DOUBLE) * ln(G / dfq), 6) AS tfidf,
             row_number() OVER (
               PARTITION BY grp
               ORDER BY round(CAST(tf AS DOUBLE) * ln(G / dfq), 6) DESC,
                        term ASC
             ) AS rn
      FROM tf JOIN dfreq USING (term) CROSS JOIN g
    )
    SELECT grp AS source, term, tf, tfidf FROM scored WHERE rn <= 5
    """,
)
def corpus_tfidf_sources(spark, sf_dir):
    """Per-source distinctive terms by tf-idf (each source = one
    aggregate document). The corpus crosses the wire once as (source,
    term) partial counts; everything after runs at vocabulary×sources
    scale with a top-k window."""
    eng = engine_for(spark, sf_dir)
    return corpus.tfidf_top_terms(
        eng.catalog.table("documents"), group_col="source", k=5
    )


# ---------------------------------------------------------------------------
# JavaScript-source compatibility (functions/jsexpr.py — transpiled, JVM-side)
# ---------------------------------------------------------------------------


@q(
    "groupby_js_extraction",
    f"""
    SELECT upper(substr(event_type, 1, 1)) || ':'
             || CAST(length(event_type) AS VARCHAR) AS jskey,
           CAST(count(*) AS BIGINT) AS rows
    FROM events WHERE {EVENTS_WHERE} GROUP BY 1
    """,
)
def groupby_js_extraction(spark, sf_dir):
    """JS-SOURCE extractionFn as a groupBy dimension: the source string
    is transpiled to a native Column (no script engine, no UDF —
    functions/jsexpr.py), matching Druid's javascript extractionFn
    (DimensionSpecs, query-module-overview.md:45)."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": [
                {
                    "type": "extraction",
                    "dimension": "event_type",
                    "outputName": "jskey",
                    "extractionFn": {
                        "type": "javascript",
                        "function": (
                            "function(x) { return x.charAt(0).toUpperCase()"
                            " + ':' + String(x.length) }"
                        ),
                    },
                }
            ],
            "aggregations": [{"type": "count", "name": "rows"}],
            "intervals": EVENTS_INTERVAL,
        }
    ).drop("ts_bucket")


@q(
    "timeseries_js_filter_agg",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows,
           round(sum(value * value), 2) AS sumsq
    FROM events
    WHERE {EVENTS_WHERE}
      AND position('c' IN event_type) >= 1 AND length(event_type) >= 5
    GROUP BY 1
    """,
)
def timeseries_js_filter_agg(spark, sf_dir):
    """JS-SOURCE filter + JS-SOURCE additive-fold aggregator in one
    timeseries: both transpiled to whole-stage-codegen expressions — the
    filter to a predicate, the fnAggregate to a native sum of the
    per-row increment (functions/jsexpr.py)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "filter": {
                "type": "javascript",
                "dimension": "event_type",
                "function": (
                    "function(t) { return t.indexOf('c') >= 0"
                    " && t.length >= 5 }"
                ),
            },
            "aggregations": [
                {"type": "count", "name": "rows"},
                {
                    "type": "javascript",
                    "name": "sumsq",
                    "fieldNames": ["value"],
                    "fnAggregate": (
                        "function(current, v) { return current + v * v }"
                    ),
                    "fnCombine": "function(a, b) { return a + b }",
                    "fnReset": "function() { return 0 }",
                },
            ],
            "intervals": EVENTS_INTERVAL,
            "context": {"skipEmptyBuckets": True},
        }
    )
    return df.withColumn("sumsq", F.round(F.col("sumsq"), 2))


# ---------------------------------------------------------------------------
# Event-sequence analytics (operators/sessions.py): sessionization, as-of
# join, cohort retention, ordered funnels — sequence-aware operators over
# the reference's timestamped fact-table model (query-timeseries.md:40-52)
# ---------------------------------------------------------------------------


@q(
    "sessions_stats_30m",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
    ), numbered AS (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_seq
      FROM marked
    )
    SELECT user_id, session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0, 6)
             AS duration_secs
    FROM numbered GROUP BY 1, 2
    """,
)
def sessions_stats_30m(spark, sf_dir):
    """30-minute-gap sessionization + per-session rollup: one user-keyed
    shuffle, windows and aggregation inside the partition
    (operators/sessions.py — sequence analytics over the reference's
    timestamped fact model, query/query-timeseries.md:40-52)."""
    eng = engine_for(spark, sf_dir)
    return sessions.session_stats(eng.catalog.table("events"), gap_seconds=1800)


@q(
    "events_asof_last_purchase",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, max(value) AS value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.event_id, c.user_id, round(p.value, 4) AS value_asof
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def events_asof_last_purchase(spark, sf_dir):
    """As-of join: every click picks up the user's most recent prior
    purchase amount (inclusive bound). Union + last_value-over-window
    formulation — ONE key shuffle of both inputs, no range join, no
    broadcast requirement (operators/sessions.py)."""
    eng = engine_for(spark, sf_dir)
    ev = eng.catalog.table("events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = sessions.asof_join(clicks, purchases, key_col="user_id", ts_col="ts",
                             value_cols=["value"])
    return out.select("event_id", "user_id", F.round(F.col("value_asof"), 4).alias("value_asof"))


@q(
    "events_cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week FROM events
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(date_diff('day', cohort_week, activity_week) // 7 AS BIGINT)
             AS week_offset,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark, sf_dir):
    """Weekly cohort retention matrix (first-seen week × activity-week
    offset). User-keyed aggregations and join; final key space is weeks²
    (operators/sessions.py)."""
    eng = engine_for(spark, sf_dir)
    return sessions.cohort_retention(eng.catalog.table("events"))


@q(
    "events_funnel_3step",
    """
    WITH s0 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), s1 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s0 ON e.user_id = s0.user_id
      WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step,
             CAST(count(*) AS BIGINT) AS n_users FROM s0
      UNION ALL
      SELECT CAST(1 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s1
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s2
    )
    """,
)
def events_funnel_3step(spark, sf_dir):
    """Ordered funnel view → click → purchase: per-user first-qualifying
    timestamps, each stage strictly after the previous — k-1 user-keyed
    joins whose cardinality only shrinks (operators/sessions.py)."""
    eng = engine_for(spark, sf_dir)
    return sessions.funnel_conversion(
        eng.catalog.table("events"), ["view", "click", "purchase"]
    )


# ---------------------------------------------------------------------------
# movingAverage query type (plans/moving_average.py — public Druid
# movingAverage extension semantics: trailing-window averagers with
# interval auto-expansion for warm-up buckets)
# ---------------------------------------------------------------------------


@q(
    "movavg_daily_mean7",
    """
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-04',
                                    TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS ts_bucket
    ), agg AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket, sum(value) AS total
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-04' AND ts < TIMESTAMP '2024-01-31'
      GROUP BY 1
    ), filled AS (
      SELECT spine.ts_bucket, COALESCE(total, 0.0) AS total
      FROM spine LEFT JOIN agg USING (ts_bucket)
    )
    SELECT ts_bucket, round(total, 4) AS total,
           round(avg(total) OVER (ORDER BY ts_bucket
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg7
    FROM filled
    QUALIFY ts_bucket >= TIMESTAMP '2024-01-10'
    """,
)
def movavg_daily_mean7(spark, sf_dir):
    """movingAverage: 7-bucket trailing mean of a daily doubleSum. The
    interval expands backward 6 buckets internally so the first output
    bucket has full history; warm-up buckets are trimmed."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "movingAverage",
            "dataSource": "events",
            "granularity": "day",
            "aggregations": [{"type": "doubleSum", "name": "total", "fieldName": "value"}],
            "averagers": [
                {"type": "doubleMean", "name": "avg7", "fieldName": "total", "buckets": 7}
            ],
            "intervals": ["2024-01-10T00:00:00/2024-01-31T00:00:00"],
        }
    )
    return _r4(df, "total", "avg7")


@q(
    "movavg_by_type_max3",
    """
    WITH spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-08',
                                    TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS ts_bucket
    ), agg AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
             event_type, CAST(count(*) AS BIGINT) AS rows
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-31'
      GROUP BY 1, 2
    ), grid AS (
      SELECT s.ts_bucket, t.event_type
      FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM agg) t
    ), filled AS (
      SELECT grid.ts_bucket, grid.event_type, COALESCE(rows, 0) AS rows
      FROM grid LEFT JOIN agg ON grid.ts_bucket = agg.ts_bucket
                             AND grid.event_type = agg.event_type
    )
    SELECT ts_bucket, event_type, CAST(rows AS BIGINT) AS rows,
           CAST(max(rows) OVER (PARTITION BY event_type ORDER BY ts_bucket
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS max3
    FROM filled
    QUALIFY ts_bucket >= TIMESTAMP '2024-01-10'
    """,
)
def movavg_by_type_max3(spark, sf_dir):
    """movingAverage with a dimension: per-event-type 3-bucket trailing
    max of the daily count — the window partitions by the dimension, the
    zero-fill grid is spine × dimension values."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "movingAverage",
            "dataSource": "events",
            "granularity": "day",
            "dimensions": ["event_type"],
            "aggregations": [{"type": "count", "name": "rows"}],
            "averagers": [
                {"type": "doubleMax", "name": "max3", "fieldName": "rows", "buckets": 3}
            ],
            "intervals": ["2024-01-10T00:00:00/2024-01-31T00:00:00"],
        }
    ).withColumn("max3", F.col("max3").cast("long"))


# ---------------------------------------------------------------------------
# Text normalization + corpus length profile (operators/text.py)
# ---------------------------------------------------------------------------


@q(
    "text_normalize",
    r"""
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(coalesce(text, ''),
                              '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
               '\s+', ' ', 'g')) AS norm_text
      FROM documents
    )
    SELECT doc_id, norm_text,
           CAST(length(norm_text) AS BIGINT) AS norm_chars,
           md5(norm_text) AS norm_md5
    FROM norm
    """,
)
def text_normalize(spark, sf_dir):
    """Ingest text cleanup: control-char strip + whitespace collapse +
    trim, plus the canonical digest for byte-noise dedup. Map-only."""
    eng = engine_for(spark, sf_dir)
    return text.normalize_text(eng.catalog.table("documents"))


@q(
    "text_length_histogram",
    f"""
    WITH counts AS (
      SELECT CAST(len({DUCK_TOKS}) AS BIGINT) AS n FROM documents
    )
    SELECT CAST(CASE
             WHEN n < 10 THEN 0 WHEN n < 30 THEN 10 WHEN n < 100 THEN 30
             WHEN n < 300 THEN 100 WHEN n < 1000 THEN 300
             WHEN n < 3000 THEN 1000 WHEN n < 10000 THEN 3000
             ELSE 10000 END AS BIGINT) AS bucket_lo,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens
    FROM counts GROUP BY 1
    """,
)
def text_length_histogram(spark, sf_dir):
    """Sequence-length planning histogram: fixed right-open token-count
    buckets; one map + one bucket-keyed aggregation."""
    eng = engine_for(spark, sf_dir)
    return text.length_histogram(eng.catalog.table("documents"))


def _duck_char_entropy() -> str:
    alpha = text.ENTROPY_ALPHABET
    counts = ", ".join(
        f"length(t) - length(replace(t, '{ch}', '')) AS c{i}"
        for i, ch in enumerate(alpha)
    )
    tt = " + ".join(f"c{i}" for i in range(len(alpha)))
    terms = " + ".join(
        f"CASE WHEN c{i} > 0 THEN -(c{i}*1.0/tt)*log2(c{i}*1.0/tt) ELSE 0.0 END"
        for i in range(len(alpha))
    )
    return f"""
    WITH c AS (SELECT doc_id, lower(coalesce(text,'')) AS t FROM documents),
    cnt AS (SELECT doc_id, {counts} FROM c),
    tot AS (SELECT *, ({tt}) AS tt FROM cnt)
    SELECT doc_id,
           round(CASE WHEN tt > 0 THEN {terms} ELSE 0.0 END, 6) AS char_entropy
    FROM tot
    """


def _duck_unigram_nll(vocab_size: int, src: str = "documents") -> str:
    """Unigram-NLL oracle (shared by text_unigram_nll,
    text_perplexity_buckets, and the composed pipeline entries):
    mirrors text.unigram_logprob_score over ``src`` — the model trains
    on whatever corpus the operator is given, so a filtered pipeline
    stage passes its OWN survivor set here."""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({DUCK_TOKS}) AS tok FROM {src}
    ), counts AS (
      SELECT tok, count(*) AS c FROM toks GROUP BY 1
    ), tot AS (SELECT CAST(sum(c) AS DOUBLE) AS T FROM counts),
    vocab AS (SELECT tok, c FROM counts ORDER BY c DESC, tok ASC LIMIT {vocab_size})
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(-log2(coalesce(v.c, 1) * 1.0 / T)), 6) AS nll_per_token
    FROM toks LEFT JOIN vocab v USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """


@q("text_unigram_nll", _duck_unigram_nll(100))
def text_unigram_nll(spark, sf_dir):
    """CCNet-style unigram LM quality proxy: mean -log2 p(token) under
    the corpus's own top-100 unigram model, count-1 smoothing for OOV.
    The vocab broadcast is bounded by the V parameter."""
    eng = engine_for(spark, sf_dir)
    return text.unigram_logprob_score(
        eng.catalog.table("documents"), vocab_size=100, cache=True
    )


@q("text_char_entropy", _duck_char_entropy())
def text_char_entropy(spark, sf_dir):
    """Character-entropy quality signal (gibberish/spam detector):
    Shannon bits/char over a fixed alphabet, map-only expressions."""
    eng = engine_for(spark, sf_dir)
    return text.char_entropy(eng.catalog.table("documents"))


def _bm25_pieces(terms: list[str], k1: float, b: float) -> tuple[str, str, str, str]:
    """The four SQL fragments of the BM25 oracle (tf columns, df
    columns, left-to-right term-score sum, matched predicate) — shared
    by _duck_bm25 and _duck_hybrid_rrf so both spell the identical
    floating-point op order of operators/retrieval.bm25_topk."""
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter({DUCK_TOKS}, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms))
    )
    term_scores = " + ".join(
        f"ln(1.0 + ((N - df{i}) + 0.5) / (df{i} + 0.5)) * tf{i} * {k1 + 1.0} "
        f"/ (tf{i} + {k1} * ({1.0 - b} + ({b} * dl) / avgdl))"
        for i in range(len(terms))
    )
    matched = " + ".join(f"tf{i}" for i in range(len(terms)))
    return tf_cols, df_cols, term_scores, matched


def _duck_bm25(terms: list[str], top_k: int, k1: float, b: float) -> str:
    """BM25 oracle with the exact floating-point op order of
    operators/retrieval.bm25_topk (term scores summed left to right;
    rounded before ordering so the top-k tie-break is deterministic)."""
    tf_cols, df_cols, term_scores, matched = _bm25_pieces(terms, k1, b)
    return f"""
    WITH base AS (
      SELECT doc_id, CAST(len({DUCK_TOKS}) AS DOUBLE) AS dl,
             {tf_cols}
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS N, avg(dl) AS avgdl, {df_cols}
      FROM base
    )
    SELECT doc_id, round({term_scores}, 6) AS bm25
    FROM base CROSS JOIN stats
    WHERE {matched} > 0
    ORDER BY bm25 DESC, doc_id
    LIMIT {top_k}
    """


@q("text_bm25_top20", _duck_bm25(["spark", "join", "filter"], 20, 1.2, 0.75))
def text_bm25_top20(spark, sf_dir):
    """BM25 keyword retrieval (Lucene-default scoring): top-20 documents
    for a 3-term query. Corpus statistics reduce to ONE broadcast row
    (partial agg); scoring is map-only; only the k heads cross the wire
    (TakeOrderedAndProject)."""
    eng = engine_for(spark, sf_dir)
    return retrieval.bm25_topk(
        eng.catalog.table("documents"), "spark join filter", top_k=20
    )


_BM25_BATCH_QUERIES = [
    (1, "spark join"),
    (2, "filter value table"),
    (3, "customer query zzzabsent"),
]


def _duck_bm25_batch(queries: list[tuple[int, str]], top_k: int,
                     k1: float = 1.2, b: float = 0.75) -> str:
    """Batch-BM25 oracle with the exact FP op order of
    retrieval.bm25_batch_topk — parameterized so the fuzz surface and
    the contract entry share one builder (same rule as _duck_bm25).
    Query tokenization mirrors operators/text.tokens() exactly —
    lowercase + ASCII-only \\s+ split (Java regex \\s is ASCII; bare
    Python str.split() would also split non-ASCII whitespace and
    diverge) — and terms are SQL-escaped."""
    import re as _re

    values = ", ".join(
        "({}, '{}')".format(qid, term.replace("'", "''"))
        for qid, text_ in queries
        for term in dict.fromkeys(
            t for t in _re.split(r"\s+", (text_ or "").lower().strip(),
                                 flags=_re.ASCII)
            if t
        )
    )
    if not values:
        raise ValueError(
            "batch BM25 oracle needs at least one non-empty query term")
    return f"""
    WITH qt(qid, term) AS (VALUES {values}),
    uq AS (SELECT DISTINCT term FROM qt),
    nd AS (
      SELECT CAST(count(*) AS DOUBLE) AS N,
             avg(CAST(len({DUCK_TOKS}) AS DOUBLE)) AS avgdl
      FROM documents
    ),
    dt AS (
      SELECT doc_id, term,
             CAST(count(*) AS DOUBLE) AS tf,
             CAST(any_value(dl) AS DOUBLE) AS dl
      FROM (
        SELECT doc_id, len({DUCK_TOKS}) AS dl,
               unnest({DUCK_TOKS}) AS term
        FROM documents
      ) x JOIN uq USING (term)
      GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS dfq FROM dt GROUP BY 1
    ),
    scored AS (
      SELECT qid, doc_id,
             round(sum(
               ln(1.0 + ((N - dfq) + 0.5) / (dfq + 0.5)) * tf * {k1 + 1.0}
               / (tf + {k1} * ({1.0 - b} + ({b} * dl) / avgdl))
             ), 6) AS bm25
      FROM dt JOIN dfreq USING (term) JOIN qt USING (term) CROSS JOIN nd
      GROUP BY qid, doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY bm25 DESC, doc_id
      ) AS rn FROM scored
    )
    SELECT CAST(qid AS BIGINT) AS query_id, doc_id, bm25
    FROM ranked WHERE rn <= {top_k}
    """


@q("text_bm25_batch", _duck_bm25_batch(_BM25_BATCH_QUERIES, 5))
def text_bm25_batch(spark, sf_dir):
    """Batch BM25: top-5 documents for each of 3 queries in ONE plan —
    query terms broadcast into the exploded-token stream so only
    matching tokens shuffle; corpus stats are a one-row broadcast; the
    per-query cut is a window over matched candidates only."""
    eng = engine_for(spark, sf_dir)
    queries = spark.createDataFrame(
        _BM25_BATCH_QUERIES, "query_id long, query string"
    )
    return retrieval.bm25_batch_topk(
        eng.catalog.table("documents"), queries, top_k=5
    )


@q(
    "text_bigram_nll",
    f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS t FROM documents),
    pairs AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)),
                         i -> array_to_string(list_slice(t, i, i + 1), ' '))
                    ELSE CAST([] AS VARCHAR[]) END) AS pair,
             unnest(CASE WHEN len(t) >= 2 THEN list_slice(t, 2, len(t))
                    ELSE CAST([] AS VARCHAR[]) END) AS tok
      FROM toks
    ),
    pc AS (SELECT pair, count(*) AS cbi FROM pairs GROUP BY 1),
    prevc AS (
      SELECT split_part(pair, ' ', 1) AS prev, count(*) AS cprev
      FROM pairs GROUP BY 1
    ),
    pmodel AS (
      SELECT pair, CAST(cbi AS DOUBLE) / CAST(cprev AS DOUBLE) AS pbi
      FROM pc JOIN prevc ON split_part(pc.pair, ' ', 1) = prevc.prev
      ORDER BY cbi DESC, pair ASC LIMIT 300
    ),
    uc AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS T FROM uc),
    vocab AS (SELECT tok, c FROM uc ORDER BY c DESC, tok ASC LIMIT 100)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(-log2(
             0.7 * coalesce(pbi, 0.0)
             + (1.0 - 0.7) * (coalesce(v.c, 1) * 1.0 / T)
           )), 6) AS nll_per_pair
    FROM pairs
    LEFT JOIN pmodel USING (pair)
    LEFT JOIN vocab v USING (tok)
    CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_bigram_nll(spark, sf_dir):
    """Interpolated bigram LM quality proxy (0.7·p_bi + 0.3·p_uni,
    top-300 bigrams / top-100 unigrams): word-ORDER typicality on top
    of unigram NLL. Both models are parameter-bounded broadcasts; the
    per-document aggregation is the only data-scaled shuffle."""
    eng = engine_for(spark, sf_dir)
    return text.bigram_logprob_score(
        eng.catalog.table("documents"), vocab_size=100, bigram_size=300,
        lam=0.7,
    )


_DUCK_BUCKET = "CAST(('0x' || substring(md5(tok), 1, 6)) AS BIGINT) % 512"


@q(
    "sampling_dsir_weights",
    f"""
    WITH tgt_b AS (
      SELECT {_DUCK_BUCKET} AS bucket
      FROM (SELECT unnest({DUCK_TOKS}) AS tok FROM documents
            WHERE lang = 'en')
    ), tgt_c AS (SELECT bucket, count(*) AS c FROM tgt_b GROUP BY 1),
    tgt_t AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM tgt_b),
    raw_b AS (
      SELECT {_DUCK_BUCKET} AS bucket
      FROM (SELECT unnest({DUCK_TOKS}) AS tok FROM documents)
    ), raw_c AS (SELECT bucket, count(*) AS c FROM raw_b GROUP BY 1),
    raw_t AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM raw_b),
    spine AS (SELECT range AS bucket FROM range(512)),
    ratio AS (
      SELECT spine.bucket,
             ln(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / (tt.T + 512))
           - ln(CAST(coalesce(rc.c, 0) + 1 AS DOUBLE) / (rt.T + 512)) AS lr
      FROM spine
      LEFT JOIN tgt_c tc ON spine.bucket = tc.bucket
      LEFT JOIN raw_c rc ON spine.bucket = rc.bucket
      CROSS JOIN tgt_t tt CROSS JOIN raw_t rt
    ), doc_b AS (
      SELECT doc_id, {_DUCK_BUCKET} AS bucket
      FROM (SELECT doc_id, unnest({DUCK_TOKS}) AS tok FROM documents)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(lr), 6) AS logratio_sum,
           round(avg(lr), 6) AS logratio_avg
    FROM doc_b JOIN ratio ON doc_b.bucket = ratio.bucket
    GROUP BY doc_id
    """,
)
def sampling_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): score the whole pool
    toward the English-document target distribution via 512 hashed
    unigram buckets with add-1 smoothing. Both distribution passes
    aggregate on ≤512 keys (map-side combine); the log-ratio table is a
    512-row broadcast; the doc-keyed sum is the only data shuffle."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    return importance.dsir_weights(
        docs, docs.where(F.col("lang") == "en"), num_buckets=512
    )


@q(
    "timeseries_grand_total",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows, round(sum(value), 4) AS total
    FROM events WHERE {EVENTS_WHERE} AND event_type = 'click'
    GROUP BY 1
    UNION ALL
    SELECT CAST(NULL AS TIMESTAMP), CAST(count(*) AS BIGINT),
           round(sum(value), 4)
    FROM events WHERE {EVENTS_WHERE} AND event_type = 'click'
    """,
)
def timeseries_grand_total(spark, sf_dir):
    """context.grandTotal: one extra null-timestamp row re-aggregating
    the whole interval (exact even for non-additive aggregators because
    it re-aggregates the base, not the bucket rows)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "filter": {"type": "selector", "dimension": "event_type",
                       "value": "click"},
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "intervals": EVENTS_INTERVAL,
            "context": {"skipEmptyBuckets": True, "grandTotal": True},
        }
    )
    return _r4(df, "total")


@q(
    "groupby_subtotals",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket, event_type,
           CAST(count(*) AS BIGINT) AS rows,
           round(sum(value), 4) AS total
    FROM events WHERE {EVENTS_WHERE}
    GROUP BY GROUPING SETS ((1, event_type), (1))
    """,
)
def groupby_subtotals(spark, sf_dir):
    """subtotalsSpec (public Druid groupBy semantics): per-type daily
    rows PLUS the per-day rollup in one result — compiled to ONE native
    grouping-sets aggregation (single Expand + single shuffle), not one
    job per subset."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "day",
            "dimensions": ["event_type"],
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "subtotalsSpec": [["event_type"], []],
            "intervals": EVENTS_INTERVAL,
        }
    )
    return _r4(df, "total")


@q(
    "timeseries_hour_origin_phase",
    """
    WITH b AS (
      SELECT make_timestamp((1704069000000
               + CAST(floor((epoch_ms(ts) - 1704069000000) / 3600000.0) AS BIGINT)
                 * 3600000) * 1000) AS ts_bucket,
             value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01 00:30:00'
        AND ts < TIMESTAMP '2024-01-02 00:30:00'
    )
    SELECT ts_bucket, CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total
    FROM b GROUP BY 1
    """,
)
def timeseries_hour_origin_phase(spark, sf_dir):
    """Period granularity with an ORIGIN: PT1H anchored at :30 buckets
    on half-hour boundaries (round-5 fix — the single-unit trunc
    mapping previously dropped the origin). Oracle mirrors the
    origin-anchored epoch arithmetic; the origin-aware SPINE is
    covered by tests/test_extraction_granularity.py."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": {"type": "period", "period": "PT1H",
                            "origin": "2024-01-01T00:30:00"},
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "intervals": ["2024-01-01T00:30:00/2024-01-02T00:30:00"],
            "context": {"skipEmptyBuckets": True},
        }
    )
    return _r4(df, "total")


@q(
    "groupby_join_datasource",
    f"""
    WITH lk AS (
      SELECT * FROM (VALUES ('click', 'engagement'), ('view', 'engagement'),
                            ('purchase', 'revenue')) AS t(k, v)
    )
    SELECT lk.v AS segment,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total
    FROM events LEFT JOIN lk ON events.event_type = lk.k
    WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def groupby_join_datasource(spark, sf_dir):
    """JOIN dataSource (public post-0.12 Druid dataSource type): events
    LEFT-joined to an inline key/value table, grouped by the joined
    column. The right side broadcasts (plan-asserted in
    tests/test_join_datasource.py); the condition is a Druid expression
    with prefixed right-column references."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": {
                "type": "join",
                "left": "events",
                "right": {
                    "type": "inline",
                    "columnNames": ["k", "v"],
                    "rows": [["click", "engagement"], ["view", "engagement"],
                             ["purchase", "revenue"]],
                },
                "rightPrefix": "r.",
                "condition": 'event_type == "r.k"',
                "joinType": "LEFT",
            },
            "granularity": "all",
            "dimensions": [{"type": "default", "dimension": "r.v",
                            "outputName": "segment"}],
            "intervals": EVENTS_INTERVAL,
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
        }
    ).drop("ts_bucket")
    return _r4(df, "total")


@q(
    "groupby_expression_filter",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total
    FROM events
    WHERE {EVENTS_WHERE}
      AND user_id % 2 = 0 AND value > 10
    GROUP BY 1
    """,
)
def groupby_expression_filter(spark, sf_dir):
    """The `expression` filter type in Druid's own dialect (`%` on
    longs, `&&`, comparisons): compiles to a raw boolean predicate that
    reaches PushedFilters (plan-asserted in tests/test_filters.py)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "filter": {"type": "expression",
                       "expression": "user_id % 2 == 0 && value > 10"},
            "intervals": EVENTS_INTERVAL,
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
        }
    ).drop("ts_bucket")
    return _r4(df, "total")


@q(
    "timeseries_virtual_column",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
           round(sum(value * 0.9), 4) AS net
    FROM events
    WHERE {EVENTS_WHERE} AND event_type = 'purchase'
    GROUP BY 1
    """,
)
def timeseries_virtual_column(spark, sf_dir):
    """Expression virtual column consumed by an aggregator: net = 0.9 ×
    value, summed per day. The projection folds into codegen; the
    selector filter on the SOURCE column still reaches PushedFilters."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "virtualColumns": [
                {"type": "expression", "name": "net", "expression": "value * 0.9"}
            ],
            "filter": {"type": "selector", "dimension": "event_type", "value": "purchase"},
            "aggregations": [{"type": "doubleSum", "name": "net", "fieldName": "net"}],
            "intervals": EVENTS_INTERVAL,
            "context": {"skipEmptyBuckets": True},
        }
    )
    return _r4(df, "net")


@q(
    "timeseries_virtual_column_druid_expr",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows,
           round(sum(value), 4) AS evening_total
    FROM events
    WHERE {EVENTS_WHERE}
      AND hour(ts) >= 18 AND user_id % 2 = 0
    GROUP BY 1
    """,
)
def timeseries_virtual_column_druid_expr(spark, sf_dir):
    """virtualColumns written in DRUID'S OWN expression dialect
    (functions/druidexpr.py): timestamp_extract over timestamp_floor of
    __time, Druid's long % long arithmetic, and 1/0 boolean outputs —
    a real Druid query runs unmodified. Both virtual columns feed the
    FILTER (bound + selector on the computed values); the oracle
    recomputes from raw SQL."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "virtualColumns": [
                {
                    "type": "expression",
                    "name": "hod",
                    "expression": "timestamp_extract(timestamp_floor(__time, 'PT1H'), 'HOUR')",
                },
                {
                    "type": "expression",
                    "name": "is_even_user",
                    "expression": "user_id % 2 == 0",
                },
            ],
            "filter": {
                "type": "and",
                "fields": [
                    {"type": "bound", "dimension": "hod", "lower": "18",
                     "ordering": "numeric"},
                    {"type": "selector", "dimension": "is_even_user", "value": "1"},
                ],
            },
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "evening_total", "fieldName": "value"},
            ],
            "intervals": EVENTS_INTERVAL,
            "context": {"skipEmptyBuckets": True},
        }
    )
    return _r4(df, "evening_total")


@q(
    "groupby_virtual_dimension",
    f"""
    SELECT CASE WHEN value > 50 THEN 'high' ELSE 'low' END AS band,
           CAST(count(*) AS BIGINT) AS rows,
           round(sum(value), 4) AS total
    FROM events WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def groupby_virtual_dimension(spark, sf_dir):
    """Expression virtual column as a groupBy DIMENSION (if() banding —
    syntax-identical in Druid's expression language and Spark SQL)."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "virtualColumns": [
                {
                    "type": "expression",
                    "name": "band",
                    "expression": "if(value > 50, 'high', 'low')",
                }
            ],
            "dimensions": ["band"],
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "intervals": EVENTS_INTERVAL,
        }
    ).drop("ts_bucket")
    return _r4(df, "total")


# ---------------------------------------------------------------------------
# Rollup materialized views + automatic routing (rollup.py): the Spark
# side reads a pre-aggregated hourly table; the oracle computes from RAW
# events — hash equality proves the rewrite is lossless.
# ---------------------------------------------------------------------------

_ROLLUP_AGGS = [
    {"type": "count", "name": "cnt"},
    {"type": "doubleSum", "name": "sum_value", "fieldName": "value"},
    {"type": "doubleMax", "name": "max_value", "fieldName": "value"},
]


_ROLLUP_ENGINES: dict = {}


def _rollup_engine(spark, sf_dir):
    """A DEDICATED engine with the hourly events rollup registered —
    separate from engine_for's shared instance so no other contract
    query silently routes (routing is lossless, but isolation keeps
    every query's plan exactly what its own function declares). The
    rollup is materialized once per (session, sf) under the repo-local
    .rollups/ scratch dir."""
    from pathlib import Path

    from coolplaydruid_spark.engine import DruidEngine
    from coolplaydruid_spark.rollup import RollupSpec
    from coolplaydruid_spark.sources import batch

    key = (id(spark), sf_dir)
    if key in _ROLLUP_ENGINES:
        return _ROLLUP_ENGINES[key]
    eng = DruidEngine(spark, engine_for(spark, sf_dir).catalog)
    dest = str(
        Path(__file__).resolve().parent.parent
        / ".rollups"
        / Path(sf_dir).name
        / "events_hourly"
    )
    batch.index_task(
        spark,
        {"type": "table", "path": f"{sf_dir}/events.parquet"},
        dest,
        time_column="ts",
        rollup={
            "granularity": "hour",
            "dimensions": ["event_type"],
            "aggregations": _ROLLUP_AGGS,
        },
    )
    batch.register_ingested(eng.catalog, "events_hourly", dest, time_column="ts")
    eng.register_rollup(
        RollupSpec(
            base="events",
            table="events_hourly",
            granularity="hour",
            dimensions={"event_type"},
            aggregations=_ROLLUP_AGGS,
        )
    )
    _ROLLUP_ENGINES[key] = eng
    return eng


@q(
    "timeseries_rollup_routed",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows,
           round(sum(value), 4) AS total,
           round(max(value), 4) AS peak
    FROM events
    WHERE {EVENTS_WHERE} AND event_type IN ('click', 'view')
    GROUP BY 1
    """,
)
def timeseries_rollup_routed(spark, sf_dir):
    """Day-granularity timeseries silently ROUTED to the materialized
    hourly rollup (count → longSum(cnt), sums/maxes re-aggregated);
    the oracle reads raw events — equality proves losslessness. The
    routed plan scans ~rollup-factor fewer rows with the identical
    bucket-keyed aggregation shape (asserted in
    tests/test_rollup_routing.py)."""
    eng = _rollup_engine(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "filter": {
                "type": "in",
                "dimension": "event_type",
                "values": ["click", "view"],
            },
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
                {"type": "doubleMax", "name": "peak", "fieldName": "value"},
            ],
            "intervals": EVENTS_INTERVAL,
            "context": {"skipEmptyBuckets": True},
        }
    )
    return _r4(df, "total", "peak")


@q(
    "timeseries_rollup_filtered_agg",
    f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
           CAST(count(*) AS BIGINT) AS rows,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks,
           round(COALESCE(sum(value) FILTER (WHERE event_type = 'purchase'), 0), 4)
             AS purchase_total
    FROM events
    WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def timeseries_rollup_filtered_agg(spark, sf_dir):
    """FILTERED aggregators routed to the hourly rollup: a filter over a
    preserved dimension selects whole rollup rows (they partition the
    raw rows by that dimension), so filtered count → filtered
    longSum(cnt) and filtered doubleSum → filtered sum-of-sums rewrite
    losslessly. The oracle reads raw events; Spark reads the rollup
    (routing asserted in tests/test_rollup_routing.py)."""
    eng = _rollup_engine(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "aggregations": [
                {"type": "count", "name": "rows"},
                {
                    "type": "filtered",
                    "name": "clicks",
                    "filter": {"type": "selector", "dimension": "event_type",
                               "value": "click"},
                    "aggregator": {"type": "count", "name": "clicks"},
                },
                {
                    "type": "filtered",
                    "name": "purchase_total",
                    "filter": {"type": "selector", "dimension": "event_type",
                               "value": "purchase"},
                    "aggregator": {"type": "doubleSum", "name": "purchase_total",
                                   "fieldName": "value"},
                },
            ],
            "intervals": EVENTS_INTERVAL,
            "context": {"skipEmptyBuckets": True},
        }
    )
    return _r4(df, "purchase_total")


@q(
    "groupby_js_postagg",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS rows,
           round(sum(value), 4) AS total,
           round(sum(value) / count(*) * 100, 4) AS pct_avg
    FROM events WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def groupby_js_postagg(spark, sf_dir):
    """JS-SOURCE post-aggregator (Druid 0.12 javascript post-agg): the
    function source transpiles to a native numeric Column over the
    aggregate outputs — whole-stage codegen, no script engine."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "aggregations": [
                {"type": "count", "name": "rows"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "postAggregations": [
                {
                    "type": "javascript",
                    "name": "pct_avg",
                    "fieldNames": ["total", "rows"],
                    "function": "function(t, r) { return t / r * 100 }",
                }
            ],
            "intervals": EVENTS_INTERVAL,
        }
    ).drop("ts_bucket")
    return _r4(df, "total", "pct_avg")


@q(
    "segment_metadata_minmax_size",
    """
    WITH s AS (
      SELECT CAST(count(DISTINCT event_id) AS BIGINT) AS card_id,
             CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_id,
             CAST(min(event_id) AS VARCHAR) AS min_id,
             CAST(max(event_id) AS VARCHAR) AS max_id,
             CAST(sum(COALESCE(strlen(CAST(event_id AS VARCHAR)), 0)) AS BIGINT) AS size_id,
             CAST(count(DISTINCT event_type) AS BIGINT) AS card_ty,
             CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ty,
             CAST(min(event_type) AS VARCHAR) AS min_ty,
             CAST(max(event_type) AS VARCHAR) AS max_ty,
             CAST(sum(COALESCE(strlen(event_type), 0)) AS BIGINT) AS size_ty,
             CAST(count(*) AS BIGINT) AS rows
      FROM events
    )
    SELECT 'event_id' AS column, 'bigint' AS type, card_id AS cardinality,
           null_id AS nullCount, rows AS numRows, min_id AS minValue,
           max_id AS maxValue, size_id AS byteSize
    FROM s
    UNION ALL
    SELECT 'event_type', 'string', card_ty, null_ty, rows, min_ty, max_ty, size_ty
    FROM s
    """,
)
def segment_metadata_minmax_size(spark, sf_dir):
    """segmentMetadata with toInclude column list + analysisTypes
    minmax/size — one aggregation pass regardless of analyses requested;
    exact cardinality under useExactCountDistinct."""
    eng = engine_for(spark, sf_dir)
    return eng.plan(
        {
            "queryType": "segmentMetadata",
            "dataSource": "events",
            "toInclude": {"type": "list", "columns": ["event_id", "event_type"]},
            "analysisTypes": ["minmax", "size"],
            "context": {"useExactCountDistinct": True},
        }
    )


@q(
    "sql_druid_time_functions",
    """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS next_hour,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
           CAST(count(*) AS BIGINT) AS rows
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
    GROUP BY 1, 2, 3
    """,
)
def sql_druid_time_functions(spark, sf_dir):
    """Druid SQL's time functions running as inlined Spark SQL UDFs
    (sqlcompat.py): TIME_FLOOR / TIME_SHIFT / TIME_EXTRACT in a query
    written in Druid SQL idiom."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT TIME_FLOOR(ts, 'PT1H') AS hour_bucket,
               TIME_SHIFT(TIME_FLOOR(ts, 'PT1H'), 'PT1H', 1) AS next_hour,
               TIME_EXTRACT(ts, 'HOUR') AS h,
               CAST(count(*) AS BIGINT) AS rows
        FROM events
        WHERE ts >= TIME_PARSE('2024-01-05 00:00:00')
          AND ts < TIME_PARSE('2024-01-06 00:00:00')
        GROUP BY 1, 2, 3
        """
    )


@q(
    "sql_druid_scalar_functions",
    """
    SELECT CAST(l_orderkey AS BIGINT) AS okey,
           round(floor(l_extendedprice / 100 * 10) / 10, 6) AS price_trunc,
           CAST(strpos(l_returnflag || l_linestatus, 'F') AS BIGINT) AS f_pos,
           l_returnflag || l_linestatus AS flag_status,
           CAST(l_orderkey // 7 AS BIGINT) AS div7,
           CAST(l_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(xor(l_orderkey, 255) AS BIGINT) AS xored,
           CAST(l_linenumber << 2 AS BIGINT) AS shifted
    FROM lineitem WHERE l_orderkey < 64
    """,
)
def sql_druid_scalar_functions(spark, sf_dir):
    """Druid SQL scalar functions with no same-name Spark builtin —
    TRUNCATE / STRPOS / TEXTCAT / DIV / BITWISE_* — as inlined SQL UDFs
    (sqlcompat.py), whole-stage codegen."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        SELECT CAST(l_orderkey AS BIGINT) AS okey,
               round(TRUNCATE(l_extendedprice / 100, 1), 6) AS price_trunc,
               CAST(STRPOS(TEXTCAT(l_returnflag, l_linestatus), 'F') AS BIGINT) AS f_pos,
               TEXTCAT(l_returnflag, l_linestatus) AS flag_status,
               DIV(l_orderkey, 7) AS div7,
               BITWISE_AND(l_orderkey, 255) AS low_byte,
               BITWISE_XOR(l_orderkey, 255) AS xored,
               CAST(BITWISE_SHIFT_LEFT(l_linenumber, 2) AS BIGINT) AS shifted
        FROM lineitem WHERE l_orderkey < 64
        """
    )


@q(
    "sessions_window_stats_10m",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 600000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
    ), numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, seq
    """,
)
def sessions_window_stats_10m(spark, sf_dir):
    """Native session_window on a BATCH frame (the same operator code a
    stream runs): Spark's gap rule is exclusive (an event exactly gap
    after the previous starts a NEW session — `>=` in the oracle, vs
    sessionize's strict `>`), and session_end is last event + gap."""
    eng = engine_for(spark, sf_dir)
    return sessions.session_window_stats(eng.catalog.table("events"), gap="10 minutes")


@q(
    "events_funnel_3step_1h",
    """
    WITH s0 AS (
      SELECT user_id, min(ts) AS t, min(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), s1 AS (
      SELECT e.user_id, s0.t0, min(e.ts) AS t
      FROM events e JOIN s0 ON e.user_id = s0.user_id
      WHERE e.event_type = 'click' AND e.ts > s0.t
        AND epoch_us(e.ts) - epoch_us(s0.t0) <= 3600000000
      GROUP BY 1, 2
    ), s2 AS (
      SELECT e.user_id, s1.t0, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s1.t
        AND epoch_us(e.ts) - epoch_us(s1.t0) <= 3600000000
      GROUP BY 1, 2
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step,
             CAST(count(*) AS BIGINT) AS n_users FROM s0
      UNION ALL
      SELECT CAST(1 AS BIGINT), 'click', CAST(count(*) AS BIGINT) FROM s1
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'purchase', CAST(count(*) AS BIGINT) FROM s2
    )
    """,
)
def events_funnel_3step_1h(spark, sf_dir):
    """Conversion-window funnel: every step must land within 1 hour of
    the user's FIRST step (the anchor rides the per-stage joins)."""
    eng = engine_for(spark, sf_dir)
    return sessions.funnel_conversion(
        eng.catalog.table("events"), ["view", "click", "purchase"],
        within_seconds=3600,
    )


@q(
    "theta_click_view_overlap",
    """
    WITH flags AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket, user_id,
             bool_or(event_type = 'click') AS a,
             bool_or(event_type = 'view') AS b
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      GROUP BY 1, 2
    ), agg AS (
      SELECT ts_bucket,
             CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS click_users,
             CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS view_users,
             CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS both_users,
             CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS click_only
      FROM flags GROUP BY 1
    ), spine AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                    TIMESTAMP '2024-01-07',
                                    INTERVAL 1 DAY)) AS ts_bucket
    )
    SELECT spine.ts_bucket,
           coalesce(click_users, 0) AS click_users,
           coalesce(view_users, 0) AS view_users,
           coalesce(both_users, 0) AS both_users,
           coalesce(click_only, 0) AS click_only,
           round(CASE WHEN coalesce(click_users, 0) = 0 THEN 0
                 ELSE both_users * 1.0 / click_users END, 4) AS overlap_ratio
    FROM spine LEFT JOIN agg USING (ts_bucket)
    """,
)
def theta_click_view_overlap(spark, sf_dir):
    """thetaSketch set operations (Druid DataSketches surface): per-day
    distinct users who clicked, viewed, did BOTH (INTERSECT), clicked
    but never viewed (NOT), and the overlap ratio — the funnel-overlap
    question per-row filtered aggregation cannot answer. Exact two-level
    aggregation (functions/theta.py), zero-filled buckets included."""
    eng = engine_for(spark, sf_dir)
    fa = lambda n: {"type": "fieldAccess", "fieldName": n}  # noqa: E731
    df = eng.plan(
        {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "day",
            "intervals": ["2024-01-01T00:00:00/2024-01-08T00:00:00"],
            "aggregations": [
                {
                    "type": "filtered", "name": "click_users",
                    "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
                    "aggregator": {"type": "thetaSketch", "name": "click_users", "fieldName": "user_id"},
                },
                {
                    "type": "filtered", "name": "view_users",
                    "filter": {"type": "selector", "dimension": "event_type", "value": "view"},
                    "aggregator": {"type": "thetaSketch", "name": "view_users", "fieldName": "user_id"},
                },
            ],
            "postAggregations": [
                {
                    "type": "thetaSketchEstimate", "name": "both_users",
                    "field": {"type": "thetaSketchSetOp", "func": "INTERSECT",
                              "fields": [fa("click_users"), fa("view_users")]},
                },
                {
                    "type": "thetaSketchEstimate", "name": "click_only",
                    "field": {"type": "thetaSketchSetOp", "func": "NOT",
                              "fields": [fa("click_users"), fa("view_users")]},
                },
                {
                    "type": "arithmetic", "name": "overlap_ratio", "fn": "/",
                    "fields": [fa("both_users"), fa("click_users")],
                },
            ],
        }
    )
    return _r4(df, "overlap_ratio")


@q(
    "theta_groupby_value_tiers",
    """
    WITH flags AS (
      SELECT event_type, user_id, bool_or(value >= 250) AS hi
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
      GROUP BY 1, 2
    )
    SELECT CAST(TIMESTAMP '2024-01-01' AS TIMESTAMP) AS ts_bucket, event_type,
           CAST(count(*) AS BIGINT) AS users,
           CAST(sum(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS hi_users,
           round(sum(CASE WHEN hi THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS hi_share
    FROM flags GROUP BY 1, 2
    """,
)
def theta_groupby_value_tiers(spark, sf_dir):
    """groupBy + thetaSketch: per event type, distinct users overall
    (unfiltered sketch) vs distinct users with any high-value event
    (filtered sketch), and the share — exercises the theta join keyed by
    (bucket, dimension) and the unfiltered-membership path."""
    eng = engine_for(spark, sf_dir)
    df = eng.plan(
        {
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["event_type"],
            "intervals": EVENTS_INTERVAL,
            "aggregations": [
                {"type": "thetaSketch", "name": "users", "fieldName": "user_id"},
                {
                    "type": "filtered", "name": "hi_users",
                    "filter": {"type": "bound", "dimension": "value",
                               "lower": "250", "ordering": "numeric"},
                    "aggregator": {"type": "thetaSketch", "name": "hi_users", "fieldName": "user_id"},
                },
            ],
            "postAggregations": [
                {
                    "type": "arithmetic", "name": "hi_share", "fn": "/",
                    "fields": [
                        {"type": "fieldAccess", "fieldName": "hi_users"},
                        {"type": "fieldAccess", "fieldName": "users"},
                    ],
                }
            ],
        }
    )
    return _r4(df, "hi_share")


@q(
    "sql_mv_ipv4_suite",
    """
    WITH base AS (
      SELECT doc_id, n_chars,
             concat('10.', CAST(doc_id % 256 AS VARCHAR), '.',
                    CAST((doc_id * 7) % 256 AS VARCHAR), '.',
                    CAST((doc_id * 13) % 256 AS VARCHAR)) AS ip,
             (10 * 16777216 + (doc_id % 256) * 65536
              + ((doc_id * 7) % 256) * 256 + (doc_id * 13) % 256) AS ipnum,
             string_split(text, ' ') AS toks,
             substr(text, 1, 16) AS head
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(ipnum AS BIGINT) AS ip_long,
           concat(CAST((ipnum + 1) >> 24 AS VARCHAR), '.',
                  CAST(((ipnum + 1) >> 16) & 255 AS VARCHAR), '.',
                  CAST(((ipnum + 1) >> 8) & 255 AS VARCHAR), '.',
                  CAST((ipnum + 1) & 255 AS VARCHAR)) AS next_ip,
           (ipnum >> 24) = 10 AS in_ten_slash8,
           (ipnum >> 12) = ((10 * 16777216 + 42 * 65536) >> 12) AS in_carved_slash20,
           CAST(len(toks) AS BIGINT) AS n_toks,
           list_contains(toks, 'data') AS has_data,
           toks[1] AS first_tok,
           CASE WHEN doc_id = 0 THEN NULL
                ELSE round(n_chars * 1.0 / doc_id, 4) END AS chars_per_id,
           decode(from_base64(base64(encode(head)))) AS b64_roundtrip
    FROM base
    """,
)
def sql_mv_ipv4_suite(spark, sf_dir):
    """Druid SQL scalar families via the SQL front-end: IPV4_PARSE/
    STRINGIFY/MATCH, the MV_* multi-value string functions, SAFE_DIVIDE
    and DECODE_BASE64_UTF8 — all inline SQL UDFs (sqlcompat.py), so the
    whole projection stays in whole-stage codegen."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        WITH base AS (
          SELECT doc_id, n_chars,
                 concat('10.', CAST(doc_id % 256 AS STRING), '.',
                        CAST((doc_id * 7) % 256 AS STRING), '.',
                        CAST((doc_id * 13) % 256 AS STRING)) AS ip,
                 STRING_TO_MV(text, ' ') AS toks,
                 substr(text, 1, 16) AS head
          FROM documents WHERE doc_id < 100
        )
        SELECT doc_id,
               IPV4_PARSE(ip) AS ip_long,
               IPV4_STRINGIFY(IPV4_PARSE(ip) + 1) AS next_ip,
               IPV4_MATCH(ip, '10.0.0.0/8') AS in_ten_slash8,
               IPV4_MATCH(ip, '10.42.0.0/20') AS in_carved_slash20,
               CAST(MV_LENGTH(toks) AS BIGINT) AS n_toks,
               MV_CONTAINS(toks, 'data') AS has_data,
               MV_OFFSET(toks, 0) AS first_tok,
               round(SAFE_DIVIDE(CAST(n_chars AS DOUBLE), CAST(doc_id AS DOUBLE)), 4) AS chars_per_id,
               DECODE_BASE64_UTF8(base64(head)) AS b64_roundtrip
        FROM base
        """
    )


@q(
    "sql_time_full_signatures",
    f"""
    SELECT CAST(timezone('America/New_York',
                date_trunc('day', timezone('America/New_York',
                                           ts::TIMESTAMPTZ))) AS TIMESTAMP) AS local_day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN hour(timezone('America/New_York', ts::TIMESTAMPTZ))
                         >= 18 THEN 1 ELSE 0 END) AS BIGINT) AS local_evening,
           CAST(make_timestamp((1704069000000
             + CAST(floor((min(epoch_ms(ts)) - 1704069000000) / 3600000.0) AS BIGINT)
               * 3600000) * 1000) AS TIMESTAMP) AS first_half_hour_bucket
    FROM events
    WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def sql_time_full_signatures(spark, sf_dir):
    """Druid SQL time functions at their FULL signatures through the SQL
    front-end: TIME_FLOOR with a timezone (DST-aware local-day buckets),
    TIME_EXTRACT with a timezone (local evening flag), and TIME_FLOOR
    with an ORIGIN (half-hour-anchored buckets). Oracle mirrors with
    DuckDB timezone round-trips and epoch arithmetic."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        f"""
        SELECT TIME_FLOOR(ts, 'P1D', NULL, 'America/New_York') AS local_day,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN TIME_EXTRACT(ts, 'HOUR', 'America/New_York')
                             >= 18 THEN 1 ELSE 0 END) AS BIGINT) AS local_evening,
               TIME_FLOOR(min(ts), 'PT1H',
                          TIMESTAMP '2024-01-01 00:30:00') AS first_half_hour_bucket
        FROM events
        WHERE {EVENTS_WHERE}
        GROUP BY 1
        """
    )


@q(
    "sql_mv_extended_suite",
    """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 100
    ), ev AS (
      SELECT CAST(count(*) AS BIGINT) AS n_in_iv FROM events
      WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-05'
    )
    SELECT doc_id,
           CAST(len(list_append(toks, 'X')) AS BIGINT) AS len_app,
           list_prepend('Y', toks)[1] AS first_after_prepend,
           CAST(len(list_concat(toks, toks)) AS BIGINT) AS len_double,
           array_to_string(toks[2:3], '-') AS mid,
           CAST(len(list_filter(toks, x -> list_contains(['data','the','of'], x)))
                AS BIGINT) AS n_kept,
           CAST(len(list_filter(toks, x -> NOT list_contains(['data','the','of'], x)))
                AS BIGINT) AS n_dropped,
           (SELECT n_in_iv FROM ev) AS n_in_iv
    FROM base
    """,
)
def sql_mv_extended_suite(spark, sf_dir):
    """Extended Druid SQL multi-value family (MV_APPEND/PREPEND/CONCAT/
    SLICE/FILTER_ONLY/FILTER_NONE — order- and duplicate-preserving,
    which is why FILTER_ONLY is a lambda filter, not array_intersect)
    plus TIME_IN_INTERVAL — all inline SQL UDFs in codegen."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        """
        WITH base AS (
          SELECT doc_id, STRING_TO_MV(text, ' ') AS toks
          FROM documents WHERE doc_id < 100
        ), ev AS (
          SELECT CAST(count(*) AS BIGINT) AS n_in_iv FROM events
          WHERE TIME_IN_INTERVAL(ts, '2024-01-03T00:00:00/2024-01-05T00:00:00')
        )
        SELECT doc_id,
               CAST(MV_LENGTH(MV_APPEND(toks, 'X')) AS BIGINT) AS len_app,
               MV_OFFSET(MV_PREPEND('Y', toks), 0) AS first_after_prepend,
               CAST(MV_LENGTH(MV_CONCAT(toks, toks)) AS BIGINT) AS len_double,
               MV_TO_STRING(MV_SLICE(toks, 1, 3), '-') AS mid,
               CAST(MV_LENGTH(MV_FILTER_ONLY(toks, array('data','the','of')))
                    AS BIGINT) AS n_kept,
               CAST(MV_LENGTH(MV_FILTER_NONE(toks, array('data','the','of')))
                    AS BIGINT) AS n_dropped,
               (SELECT n_in_iv FROM ev) AS n_in_iv
        FROM base
        """
    )


@q(
    "sql_druid_aggregate_renames",
    f"""
    SELECT event_type,
           round(min_by(value, ts), 4) AS first_val,
           round(max_by(value, ts), 4) AS last_val,
           CAST(bit_and(user_id) AS BIGINT) AS band,
           CAST(bit_or(user_id) AS BIGINT) AS bor
    FROM events WHERE {EVENTS_WHERE}
    GROUP BY 1
    """,
)
def sql_druid_aggregate_renames(spark, sf_dir):
    """Druid SQL aggregate spellings (EARLIEST_BY/LATEST_BY,
    BITWISE_AND_AGG/BITWISE_OR_AGG) rewritten to exact Spark aggregates
    at the SQL front-end (sqlcompat.rewrite_druid_sql) — a Druid SQL
    statement runs unmodified; the oracle uses the native DuckDB
    spellings."""
    eng = engine_for(spark, sf_dir)
    return eng.sql(
        f"""
        SELECT event_type,
               round(EARLIEST_BY(value, ts), 4) AS first_val,
               round(LATEST_BY(value, ts), 4) AS last_val,
               BITWISE_AND_AGG(user_id) AS band,
               BITWISE_OR_AGG(user_id) AS bor
        FROM events WHERE {EVENTS_WHERE}
        GROUP BY 1
        """
    )


@q(
    "text_dup_span_stats",
    f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKS} AS toks FROM documents),
    w0 AS (
      SELECT doc_id,
             unnest(list_transform(range(0, greatest(len(toks) - 8 + 1, 0)),
                    i -> {{'pos': i,
                           'h': md5(array_to_string(toks[i+1:i+8], ' '))}})) AS u
      FROM t
    ),
    w AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM w0),
    dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    dpos AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)),
    cov AS (
      SELECT doc_id, count(DISTINCT p) AS covered FROM (
        SELECT doc_id, unnest(list_transform(range(0, 8), o -> pos + o)) AS p
        FROM dpos) GROUP BY 1
    ),
    nd AS (SELECT doc_id, count(*) AS n_dup_windows FROM dpos GROUP BY 1)
    SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(nd.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
           CAST(len(toks) - coalesce(cov.covered, 0) AS BIGINT) AS retained_tokens
    FROM t LEFT JOIN nd USING (doc_id) LEFT JOIN cov USING (doc_id)
    """,
)
def text_dup_span_stats(spark, sf_dir):
    """Cross-document duplicate-SPAN detection (substring-level dedup,
    the Lee et al. 2022 training-data step): every 8-token sliding
    window fingerprinted (md5 of the normalized span), windows recurring
    in ≥2 distinct documents marked, per-doc covered/retained token
    counts emitted. Two md5-keyed shuffles over ~token-count rows —
    the MinHash exchange profile, no pairwise joins
    (operators/spans.py; the text REWRITE form remove_duplicate_spans
    is invariant-tested in tests/test_spans.py)."""
    eng = engine_for(spark, sf_dir)
    return spans.duplicate_span_stats(
        eng.catalog.table("documents"), cache=True
    )


@q(
    "text_classifier_score",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({DUCK_TOKS}) AS tok FROM documents
    ), b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 64 AS bucket
      FROM toks
    ), s AS (
      SELECT doc_id, count(*) AS n,
             sum(((bucket * 37) % 21 - 10) / 10.0) AS ws
      FROM b GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(n, 0) AS BIGINT) AS n_toks,
           round(1e-9 + -0.1 + coalesce(ws / n, 0), 4) AS margin,
           round(1e-9 + 1 / (1 + exp(-(-0.1 + coalesce(ws / n, 0)))), 4) AS prob
    FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
)
def text_classifier_score(spark, sf_dir):
    """fastText-style hashed linear classifier scoring (the standard
    quality/toxicity filter for LLM corpora): 64-bucket model with a
    fixed synthetic weight vector, inline map-literal path — zero
    shuffles, whole-stage codegen (operators/classifier.py).

    Both sides nudge by 1e-9 before rounding: the toy weights are
    multiples of 0.1, so margins land EXACTLY on 4-decimal round-half
    ties (e.g. -0.14125 at n=80) where FP sum-order noise (~1e-16)
    flips Spark and DuckDB to opposite sides; the shared nudge moves
    every value 1e-9 off the tie lattice — far above FP noise, far
    below the 1e-4 resolution."""
    eng = engine_for(spark, sf_dir)
    weights = {b: ((b * 37) % 21 - 10) / 10.0 for b in range(64)}
    df = classifier.hashed_linear_score(
        eng.catalog.table("documents"), weights, n_buckets=64, bias=-0.1
    )
    for c in ("margin", "prob"):
        df = df.withColumn(c, F.round(F.col(c) + F.lit(1e-9), 4))
    return df


# ---------------------------------------------------------------------------
# Round-8 additions (second wave): Gopher repetition/quality rules, the
# oracled IVF assignment pass, hybrid RRF retrieval, CCNet perplexity
# bucketing. Oracle builders are parameterized so the pipeline-op fuzzer
# can draw random parameters through the same SQL.
# ---------------------------------------------------------------------------


def _duck_dup_ngram(ns: tuple[int, ...]) -> str:
    """Duplicated-n-gram char-fraction oracle: mirrors
    text.dup_ngram_stats relationally (unnest + GROUP BY per n) — the
    Spark side is a shuffle-free fold, the oracle is the set-based
    restatement of the same character accounting."""
    ctes, selects, joins = [], [], []
    for n in ns:
        grams = (
            f"list_transform(range(1, len(t) - {n - 2}), "
            f"i -> array_to_string(list_slice(t, i, i + {n - 1}), ' '))"
        )
        ctes.append(f"""
    g{n} AS (SELECT doc_id, unnest(CASE WHEN len(t) >= {n} THEN {grams}
             ELSE CAST([] AS VARCHAR[]) END) AS gm FROM toks),
    c{n} AS (SELECT doc_id, gm, count(*) AS c FROM g{n} GROUP BY 1, 2),
    s{n} AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_{n}grams,
             round(CAST(sum(CASE WHEN c >= 2 THEN c * len(gm) ELSE 0 END) AS DOUBLE)
                   / CAST(sum(c * len(gm)) AS DOUBLE), 6) AS dup_{n}gram_char_frac
             FROM c{n} GROUP BY 1)""")
        selects.append(
            f"coalesce(s{n}.n_{n}grams, 0) AS n_{n}grams, "
            f"coalesce(s{n}.dup_{n}gram_char_frac, 0.0) AS dup_{n}gram_char_frac"
        )
        joins.append(f"LEFT JOIN s{n} ON d.doc_id = s{n}.doc_id")
    return f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS t FROM documents),
    {','.join(ctes)}
    SELECT d.doc_id, {', '.join(selects)}
    FROM documents d {' '.join(joins)}
    """


@q("text_dup_ngram_stats", _duck_dup_ngram((2, 3)))
def text_dup_ngram_stats(spark, sf_dir):
    """Gopher's duplicated-n-gram repetition signal (Rae et al. 2021
    §A1.1): per document, the fraction of n-gram characters belonging
    to n-grams occurring ≥ 2 times, for n = 2 and 3. Spark side is
    map-only — run-length accounting over the SORTED per-document gram
    array, no explode, zero shuffles."""
    eng = engine_for(spark, sf_dir)
    return text.dup_ngram_stats(eng.catalog.table("documents"), ns=(2, 3))


def _duck_gopher(
    min_words: int, max_words: int, min_mean: float, max_mean: float,
    max_symbol: float, min_alpha: float, min_stop: int,
    src: str = "documents",
) -> str:
    """Gopher rule-filter oracle: same rounded signals, same fixed-order
    fail-reason list as text.gopher_quality_filter. ``src`` lets the
    composed pipeline oracles filter their own survivor CTE — one copy
    of the rule SQL serves every entry (the module's no-second-copy
    doctrine)."""
    stoplist = ", ".join(f"'{w}'" for w in text.LANG_STOPWORDS["en"])
    fails = f"""list_filter([
      CASE WHEN n_words < {min_words} THEN 'too_few_words' END,
      CASE WHEN n_words > {max_words} THEN 'too_many_words' END,
      CASE WHEN mean_word_len < {min_mean} OR mean_word_len > {max_mean} THEN 'mean_word_len' END,
      CASE WHEN symbol_word_ratio > {max_symbol} THEN 'symbol_ratio' END,
      CASE WHEN alpha_word_frac < {min_alpha} THEN 'alpha_frac' END,
      CASE WHEN stop_hits < {min_stop} THEN 'stopwords' END
    ], x -> x IS NOT NULL)"""
    return f"""
    WITH base AS (
      SELECT doc_id, {DUCK_TOKS} AS t, coalesce(text, '') AS txt FROM {src}
    ), m AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
        CASE WHEN len(t) > 0 THEN round(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE) / len(t), 6) ELSE 0.0 END AS mean_word_len,
        CASE WHEN len(t) > 0 THEN round(CAST(len(regexp_extract_all(txt, '[#…]')) AS DOUBLE) / len(t), 6) ELSE 0.0 END AS symbol_word_ratio,
        CASE WHEN len(t) > 0 THEN round(CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(t), 6) ELSE 0.0 END AS alpha_word_frac,
        CAST(len(list_intersect(list_distinct(t), [{stoplist}])) AS BIGINT) AS stop_hits
      FROM base
    )
    SELECT doc_id, n_words, mean_word_len, symbol_word_ratio, alpha_word_frac,
           stop_hits,
           coalesce(array_to_string({fails}, ','), '') AS fail_reasons,
           len({fails}) = 0 AS passes
    FROM m
    """


# Thresholds tuned so the fixture corpus splits into a meaningful
# pass/fail mix (12 distinct fail-reason combinations at sf0.001; the
# published Gopher defaults fail every fixture doc on the same single
# rule, which would prove nothing).
_GOPHER_PARAMS = dict(min_words=40, max_words=80, min_mean=3.0, max_mean=4.6,
                      max_symbol=0.1, min_alpha=0.8, min_stop=1)


def _spark_gopher(docs, params: dict | None = None):
    """gopher_quality_filter at ``params`` (default _GOPHER_PARAMS) —
    the SINGLE place the oracle-builder parameter names map onto the
    operator's keyword names (every entry and fuzzer that pairs with a
    _duck_gopher oracle must come through here; a rename applied to a
    second copy of this mapping would silently desynchronize them)."""
    p = params if params is not None else _GOPHER_PARAMS
    return text.gopher_quality_filter(
        docs,
        min_words=p["min_words"], max_words=p["max_words"],
        min_mean_word_len=p["min_mean"], max_mean_word_len=p["max_mean"],
        max_symbol_word_ratio=p["max_symbol"],
        min_alpha_word_frac=p["min_alpha"], min_stop_hits=p["min_stop"],
    )


@q("text_gopher_filter", _duck_gopher(**_GOPHER_PARAMS))
def text_gopher_filter(spark, sf_dir):
    """Gopher rule-based quality filter (Rae et al. 2021 §A1.1): named
    pass/fail heuristics with an explicit fail-reason trail per
    document. Map-only — one projection over the scan."""
    eng = engine_for(spark, sf_dir)
    return _spark_gopher(eng.catalog.table("documents"))


def _duck_nearest_centroid(n_centroids: int) -> str:
    """Nearest-centroid assignment oracle: centroids are the first
    ``n_centroids`` vectors by id (deterministic, SQL-expressible);
    every other vector goes to its argmax-cosine centroid, ties on the
    rounded cosine toward the lowest centroid id."""
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {n_centroids}),
    pts AS (SELECT vec_id, v FROM e WHERE vec_id >= {n_centroids}),
    scored AS (
      SELECT vec_id, centroid_id,
             round(list_dot_product(v, cv) /
                   (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))), 6)
               AS cosine
      FROM pts CROSS JOIN cent
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY vec_id
                 ORDER BY cosine DESC, centroid_id) AS rn
      FROM scored
    )
    SELECT vec_id, centroid_id, cosine FROM r WHERE rn = 1
    """


@q("embedding_nearest_centroid", _duck_nearest_centroid(8))
def embedding_nearest_centroid(spark, sf_dir):
    """The IVF/k-means ASSIGNMENT pass as a standalone exactly-oracled
    operator (similarity.nearest_centroid): centroids broadcast,
    scoring map-only, argmax via max_by partial aggregation — no
    window, one id-keyed shuffle. Complements similarity_topk_ivf,
    whose iterative training half is Python-validated: this pins the
    relational half to an exact SQL oracle. Centroids here are the
    first 8 corpus vectors by id so the oracle can name them."""
    eng = engine_for(spark, sf_dir)
    emb = eng.catalog.table("embeddings")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.nearest_centroid(emb.where(F.col("vec_id") >= 8), cent)


def _duck_hybrid_rrf(
    terms: list[str], query_id: int, top_k: int, pool: int, rrf_k: int,
    k1: float = 1.2, b: float = 0.75,
) -> str:
    """Hybrid BM25+cosine RRF oracle: the BM25 leg reuses _bm25_pieces
    (identical FP op order to retrieval.bm25_topk), the cosine leg the
    embedding-oracle recipe; both rank top-``pool``, fuse as
    1/(rrf_k+rank) sums, round 6, cut at ``top_k``."""
    tf_cols, df_cols, term_scores, matched = _bm25_pieces(terms, k1, b)
    return f"""
    WITH base AS (
      SELECT doc_id, CAST(len({DUCK_TOKS}) AS DOUBLE) AS dl,
             {tf_cols}
      FROM documents WHERE doc_id <> {query_id}
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS N, avg(dl) AS avgdl, {df_cols}
      FROM base
    ), bm_pool AS (
      SELECT doc_id, round({term_scores}, 6) AS bm25
      FROM base CROSS JOIN stats
      WHERE {matched} > 0
      ORDER BY bm25 DESC, doc_id LIMIT {pool}
    ), bm AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS bm25_rank
      FROM bm_pool
    ), e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qv AS (SELECT v AS q FROM e WHERE vec_id = {query_id}),
    scored AS (
      SELECT vec_id AS doc_id,
             round(list_dot_product(v, q) /
                   (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(q, q))), 6)
               AS cosine
      FROM e CROSS JOIN qv WHERE vec_id <> {query_id}
    ), cosr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS INT) AS cosine_rank
      FROM scored ORDER BY cosine DESC, doc_id LIMIT {pool}
    ), fused AS (
      SELECT coalesce(bm.doc_id, cosr.doc_id) AS doc_id,
             round(coalesce(1.0 / ({rrf_k} + bm25_rank), 0.0)
                   + coalesce(1.0 / ({rrf_k} + cosine_rank), 0.0), 6) AS rrf_score,
             bm25_rank, cosine_rank
      FROM bm FULL OUTER JOIN cosr ON bm.doc_id = cosr.doc_id
    )
    SELECT doc_id, rrf_score, bm25_rank, cosine_rank
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {top_k}
    """


@q("retrieval_hybrid_rrf",
   _duck_hybrid_rrf(["spark", "join", "filter"], query_id=0, top_k=15,
                    pool=50, rrf_k=60))
def retrieval_hybrid_rrf(spark, sf_dir):
    """Hybrid lexical+dense retrieval fused by reciprocal rank
    (Cormack et al. 2009) — the production RAG shape: BM25 and cosine
    each rank a top-50 pool, rrf = Σ 1/(60+rank), top-15 cut. Both
    legs are the already-scale-shaped operators; the fusion join
    touches 2×pool rows (operators/retrieval.hybrid_rrf_topk)."""
    eng = engine_for(spark, sf_dir)
    return retrieval.hybrid_rrf_topk(
        eng.catalog.table("documents"), eng.catalog.table("embeddings"),
        "spark join filter", query_id=0, top_k=15, pool=50, rrf_k=60,
    )


def _duck_perplexity_buckets(vocab_size: int) -> str:
    """CCNet bucket oracle over the shared unigram-NLL CTE: thresholds
    via quantile_cont (bit-identical to Spark's percentile(), verified
    at both test scale factors), head/middle/tail split at 1/3, 2/3."""
    return f"""
    WITH nll AS ({_duck_unigram_nll(vocab_size)}),
    th AS (SELECT quantile_cont(nll_per_token, [1.0/3, 2.0/3]) AS p FROM nll)
    SELECT CASE WHEN nll_per_token <= p[1] THEN 'head'
                WHEN nll_per_token <= p[2] THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(nll_per_token) AS min_nll,
           max(nll_per_token) AS max_nll,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM nll CROSS JOIN th
    GROUP BY 1
    """


@q("text_perplexity_buckets", _duck_perplexity_buckets(100))
def text_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): the
    corpus split into head/middle/tail at the 1/3 and 2/3 quantiles of
    the unigram-NLL quality proxy — the standard quality-aware mixture
    input. One eager single-row threshold job folded into a map-only
    CASE as literals on top of unigram_logprob_score's shape
    (operators/text.perplexity_buckets)."""
    eng = engine_for(spark, sf_dir)
    return text.perplexity_buckets(eng.catalog.table("documents"), vocab_size=100)


def _duck_quality_mixture(rates: dict[str, float], vocab_size: int,
                          src: str = "documents") -> str:
    """Quality-mixture oracle: the perplexity-bucket CTE plus the same
    md5 gate arithmetic as the sampling oracles, rate chosen per
    bucket. ``src`` is the corpus the NLL model trains on — the
    composed pipeline oracle passes its survivor CTE, same rule as
    _duck_unigram_nll."""
    rate_case = "CASE bucket " + " ".join(
        f"WHEN '{k}' THEN {int(v * _SAMPLE_DENOM)}"
        for k, v in sorted(rates.items())
    ) + " ELSE 0 END"
    return f"""
    WITH nll AS ({_duck_unigram_nll(vocab_size, src)}),
    th AS (SELECT quantile_cont(nll_per_token, [1.0/3, 2.0/3]) AS p FROM nll),
    labeled AS (
      SELECT doc_id, n_tokens,
             CASE WHEN nll_per_token <= p[1] THEN 'head'
                  WHEN nll_per_token <= p[2] THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM nll CROSS JOIN th
    )
    SELECT doc_id, bucket, n_tokens FROM labeled
    WHERE {_DUCK_BUCKET_ID} < {rate_case}
    """


_QUALITY_MIX_RATES = {"head": 1.0, "middle": 0.5, "tail": 0.1}


@q("sampling_quality_mixture", _duck_quality_mixture(_QUALITY_MIX_RATES, 100))
def sampling_quality_mixture(spark, sf_dir):
    """The CCNet quality-weighted thinning recipe end-to-end: label
    every document head/middle/tail by perplexity tercile, then keep
    each bucket at its own deterministic md5 rate (1.0/0.5/0.1). The
    composition proof for perplexity_bucket_labels × hash gating
    (operators/sampling.quality_mixture)."""
    eng = engine_for(spark, sf_dir)
    return sampling.quality_mixture(
        eng.catalog.table("documents"), rates=dict(_QUALITY_MIX_RATES),
        vocab_size=100,
    )


def _duck_pmi(k: int, min_count: int) -> str:
    """PMI collocation oracle: identical log2 expression grouping to
    corpus.pmi_top_pairs."""
    return f"""
    WITH toks AS (SELECT {DUCK_TOKS} AS t FROM documents),
    pairs AS (
      SELECT unnest(CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)),
                  i -> array_to_string(list_slice(t, i, i + 1), ' '))
             ELSE CAST([] AS VARCHAR[]) END) AS pair
      FROM toks
    ),
    pc AS (SELECT pair, CAST(count(*) AS BIGINT) AS n_pair FROM pairs GROUP BY 1),
    ptot AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS P FROM pc),
    uc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
    ),
    utot AS (SELECT CAST(sum(c) AS DOUBLE) AS T FROM uc)
    SELECT pair, n_pair,
           round(log2((CAST(n_pair AS DOUBLE) / P)
                      / ((CAST(c1.c AS DOUBLE) / T) * (CAST(c2.c AS DOUBLE) / T))), 6)
             AS pmi
    FROM pc
    JOIN uc c1 ON split_part(pair, ' ', 1) = c1.tok
    JOIN uc c2 ON split_part(pair, ' ', -1) = c2.tok
    CROSS JOIN ptot CROSS JOIN utot
    WHERE n_pair >= {min_count}
    ORDER BY pmi DESC, pair ASC
    LIMIT {k}
    """


@q("corpus_pmi_top_pairs", _duck_pmi(40, 5))
def corpus_pmi_top_pairs(spark, sf_dir):
    """Top-40 adjacent word pairs by pointwise mutual information with
    a min-count-5 floor (Church & Hanks 1990 collocations — the
    tokenizer-merge / boilerplate-phrase mining statistic). Two
    map-side-combined count aggregations; everything downstream is
    vocabulary-bounded with broadcast unigram joins
    (operators/corpus.pmi_top_pairs)."""
    eng = engine_for(spark, sf_dir)
    return corpus.pmi_top_pairs(eng.catalog.table("documents"), k=40, min_count=5)


@q(
    "corpus_quality_report",
    f"""
    WITH gph AS ({_duck_gopher(**_GOPHER_PARAMS)}),
    nll AS ({_duck_unigram_nll(100)}),
    joined AS (
      SELECT d.source, gph.passes, nll.n_tokens, nll.nll_per_token
      FROM documents d
      JOIN gph ON d.doc_id = gph.doc_id
      JOIN nll ON d.doc_id = nll.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           round(sum(CASE WHEN passes THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS pass_rate,
           round(avg(nll_per_token), 6) AS mean_nll,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM joined
    GROUP BY source
    """,
)
def corpus_quality_report(spark, sf_dir):
    """Per-source corpus observability — the dashboard every pipeline
    runs after a filter change: document counts, Gopher pass rates, and
    mean unigram NLL per source. Composes the map-only rule filter with
    the NLL scorer; the report aggregation is keyed on source
    cardinality (tiny), with map-side combine."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    g = _spark_gopher(docs).select("doc_id", "passes")
    nll = text.unigram_logprob_score(docs, vocab_size=100)
    return (
        docs.select("doc_id", "source")
        .join(g, on="doc_id")
        .join(nll, on="doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("passes").cast("long")).cast("long").alias("n_pass"),
            F.round(
                F.sum(F.col("passes").cast("long"))
                / F.count(F.lit(1)).cast("double"), 6
            ).alias("pass_rate"),
            F.round(F.avg("nll_per_token"), 6).alias("mean_nll"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


def _duck_quality_pipeline(
    gopher_params: dict, dup_cut: float, rates: dict, vocab_size: int
) -> str:
    """End-to-end oracle for the composed v2 cleaning pipeline,
    parameterized so the fuzzer can draw every stage's knobs through
    the same SQL the contract entry uses. The tercile/gate block IS
    _duck_quality_mixture over the survivor CTE — one copy of the
    mixture SQL serves both entries."""
    return f"""
    WITH gph AS ({_duck_gopher(**gopher_params)}),
    dupg AS ({_duck_dup_ngram((2,))}),
    keepdocs AS (
      SELECT d.* FROM documents d
      JOIN gph ON d.doc_id = gph.doc_id
      JOIN dupg ON d.doc_id = dupg.doc_id
      WHERE gph.passes AND dupg.dup_2gram_char_frac <= {dup_cut}
    ),
    kept AS ({_duck_quality_mixture(rates, vocab_size, 'keepdocs')})
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM kept GROUP BY bucket
    """


def _spark_quality_pipeline(docs, gopher_params: dict, dup_cut: float,
                            rates: dict, vocab_size: int):
    """Spark side of the composed pipeline (shared by the contract
    entry and the fuzzer — both must assemble the stages identically):
    Gopher rules → duplicated-bigram cut → quality_mixture (terciles
    retrained on the survivors + md5 thinning) → per-bucket stats."""
    # r14 (guide §4.4-adjacent): pin the doc-scaled stat tables BEFORE
    # filtering on their computed columns. A .where() on a column
    # derived through higher-order functions is evaluated by the
    # interpreted predicate, which does NO subexpression elimination
    # under lambdas — the tokenize expression re-runs per array
    # element, measured 0.8 s → 22 s on the dup-bigram filter alone at
    # sf0.1. Filtering the cached (id, stat) rows costs 0.7 s.
    from coolplaydruid_spark.operators.dedup import _pin_cache

    g = _pin_cache(
        _spark_gopher(docs, gopher_params).select("doc_id", "passes")
    ).where("passes").select("doc_id")
    d2 = (
        _pin_cache(
            text.dup_ngram_stats(docs, ns=(2,))
            .select("doc_id", "dup_2gram_char_frac"))
        .where(F.col("dup_2gram_char_frac") <= dup_cut)
        .select("doc_id")
    )
    keep = docs.join(g, on="doc_id").join(d2, on="doc_id")
    mix = sampling.quality_mixture(keep, rates=dict(rates),
                                   vocab_size=vocab_size)
    return mix.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@q(
    "pipeline_quality_corpus",
    _duck_quality_pipeline(_GOPHER_PARAMS, 0.6, _QUALITY_MIX_RATES, 100),
)
def pipeline_quality_corpus(spark, sf_dir):
    """The wave-2 cleaning recipe end-to-end, composed from the
    operator library: Gopher rule filter → duplicated-bigram cut
    (≤ 0.6 of bigram chars in duplicates) → CCNet perplexity terciles
    TRAINED ON THE SURVIVORS → per-bucket deterministic thinning
    (1.0/0.5/0.1) → per-bucket corpus stats. The filters are map-only;
    the NLL model retrains on the filtered set exactly as a staged
    pipeline would; the md5 gates keep the output reproducible."""
    eng = engine_for(spark, sf_dir)
    return _spark_quality_pipeline(
        eng.catalog.table("documents"), _GOPHER_PARAMS, 0.6,
        _QUALITY_MIX_RATES, 100,
    )


# ---------------------------------------------------------------------------
# The canonical production chain end-to-end (r12 verdict #4): ingest →
# exact dedup → minhash near-dedup → Gopher quality filter → semantic
# dedup → contamination check → quality-mixture sampling [→ packing].
# One oracle proves the stages INTEROPERATE — every stage's keep set is
# the next stage's input, so a drift anywhere surfaces as a value-hash
# mismatch here even if each stage's own entry still passes.
# ---------------------------------------------------------------------------


def _duck_llm_corpus(
    minhash_tau: float = 0.5,
    minhash_cap: int | None = 100,
    gopher_params: dict | None = None,
    sem_tau: float = 0.3,
    max_cell: int = 250,
    cont_cut: float = 0.05,
    rates: dict | None = None,
    vocab_size: int = 100,
) -> str:
    """End-to-end corpus-build oracle, composed from the existing
    builders (the module's no-second-copy doctrine): DUCK_SHINGLES /
    _duck_minhash_exprs / _duck_band_selects for the minhash stage,
    _duck_gopher(src=...), _duck_semantic_pairs(member_pred=...),
    _duck_quality_mixture(src=...). Near-dup retention is keep-smallest-
    id per transitive component (recursive reach CTE — the
    dedup_cluster_sizes rule); the contamination probe is the RAW first
    20 docs (the benchmark set is fixed before any cleaning), docs with
    ≥cont_cut of their shingles in the probe are dropped, and probe
    docs themselves never enter the final corpus. Every stage knob is a
    parameter so the fuzzer draws through the same SQL the contract
    entry pins (the _duck_quality_pipeline pattern). Stage CTEs are
    MATERIALIZED: DuckDB inlines CTEs by default, and each stage here
    is referenced down a long chain — inlining multiplied the parquet
    scans until the process ran out of file descriptors."""
    gopher_params = gopher_params or _GOPHER_PARAMS
    rates = rates or _QUALITY_MIX_RATES
    minhash = _duck_minhash_pair_ctes(minhash_tau, 12, 4, shf="lshf",
                                      max_band_bucket=minhash_cap,
                                      materialized=True)
    shingles_d1 = DUCK_SHINGLES.replace("FROM documents", "FROM d1")
    shingles_probe = DUCK_SHINGLES.replace(
        "FROM documents", "FROM documents WHERE doc_id < 20")
    sem = _duck_semantic_pairs(
        8, sem_tau, max_cell=max_cell,
        member_pred="vec_id IN (SELECT doc_id FROM d3)")
    gopher = _duck_gopher(**gopher_params, src="d2")
    kept = _duck_quality_mixture(rates, vocab_size, "d5")
    return f"""
    WITH RECURSIVE
    -- stage 1: exact dedup (keep smallest doc id per md5(text) digest)
    s1 AS MATERIALIZED (SELECT min(doc_id) AS doc_id
           FROM documents GROUP BY md5(coalesce(text, ''))),
    d1 AS MATERIALIZED (SELECT d.* FROM documents d JOIN s1 USING (doc_id)),
    -- stage 2: minhash LSH near-dup pairs over d1 (the SHARED
    -- candidate/verify block — one copy with _duck_minhash_lsh)
    lshf AS MATERIALIZED ({shingles_d1} SELECT doc_id, shingle FROM shf),
    {minhash},
    mp AS MATERIALIZED (SELECT doc_a, doc_b FROM mh_pairs),
    medges AS (SELECT doc_a AS src, doc_b AS dst FROM mp
               UNION SELECT doc_b, doc_a FROM mp),
    mreach AS (
      SELECT src AS vertex, src AS r FROM medges
      UNION
      SELECT e.dst AS vertex, rr.r FROM mreach rr JOIN medges e ON e.src = rr.vertex
    ),
    mcomp AS MATERIALIZED (SELECT vertex, min(r) AS component FROM mreach GROUP BY vertex),
    d2 AS MATERIALIZED (SELECT d1.* FROM d1 WHERE doc_id NOT IN
           (SELECT vertex FROM mcomp WHERE component <> vertex)),
    -- stage 3: Gopher rule filter over the near-dedup survivors
    g AS MATERIALIZED ({gopher}),
    d3 AS MATERIALIZED (SELECT d2.* FROM d2 JOIN g USING (doc_id) WHERE g.passes),
    -- stage 4: semantic dedup (pinned first-8 centroids of the FULL
    -- embedding table; participants = d3 survivors; keep-smallest-id)
    sp AS MATERIALIZED ({sem}),
    sedges AS (SELECT id_a AS src, id_b AS dst FROM sp
               UNION SELECT id_b, id_a FROM sp),
    sreach AS (
      SELECT src AS vertex, src AS r FROM sedges
      UNION
      SELECT e.dst AS vertex, rr.r FROM sreach rr JOIN sedges e ON e.src = rr.vertex
    ),
    scomp AS MATERIALIZED (SELECT vertex, min(r) AS component FROM sreach GROUP BY vertex),
    d4 AS MATERIALIZED (SELECT d3.* FROM d3 WHERE doc_id NOT IN
           (SELECT vertex FROM scomp WHERE component <> vertex)),
    -- stage 5: decontamination — drop any survivor with ≥5% of its
    -- shingles in the RAW probe docs (<20); probe docs leave the
    -- corpus too (same rounded-frac rule as text_contamination_fraction)
    pshf AS MATERIALIZED ({shingles_probe} SELECT DISTINCT shingle FROM shf),
    cfrac AS MATERIALIZED (
      SELECT s.doc_id,
             round(sum(CASE WHEN p.shingle IS NOT NULL THEN 1 ELSE 0 END)
                   * 1.0 / count(*), 6) AS contaminated_frac
      FROM lshf s LEFT JOIN pshf p USING (shingle)
      GROUP BY 1
    ),
    d5 AS MATERIALIZED (SELECT d4.* FROM d4 JOIN cfrac USING (doc_id)
           WHERE doc_id >= 20 AND contaminated_frac < {cont_cut}),
    -- stage 6: quality-mixture thinning, NLL model trained on the
    -- SURVIVORS (exactly what a staged pipeline would do)
    kept AS MATERIALIZED ({kept})
    SELECT doc_id, bucket, n_tokens FROM kept
    """


def _spark_llm_corpus_stages(spark, sf_dir, **kw) -> dict:
    """Spark side of the composed corpus build, one keyed frame per
    stage (shared by the two contract entries, the non-vacuity test,
    and the end-to-end fuzzer — all must assemble the stages
    identically). Every stage is the library operator, composed:
    nothing here re-implements a rule. Keyword knobs mirror
    _duck_llm_corpus one-for-one."""
    minhash_tau = kw.get("minhash_tau", 0.5)
    minhash_cap = kw.get("minhash_cap", 100)
    gopher_params = kw.get("gopher_params") or _GOPHER_PARAMS
    sem_tau = kw.get("sem_tau", 0.3)
    max_cell = kw.get("max_cell", 250)
    cont_cut = kw.get("cont_cut", 0.05)
    rates = kw.get("rates") or _QUALITY_MIX_RATES
    vocab_size = kw.get("vocab_size", 100)
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    emb = eng.catalog.table("embeddings")
    # 1: exact dedup — survivors are exact_dedup's per-digest keeper.
    # (r15: pinning s1 and the stage-3 survivor corpus was measured and
    # REJECTED — interleaved A/B 26.3 s pinned vs 18.2 s unpinned at
    # sf1: the pin materialization, and caching the text-bearing
    # survivor corpus, cost more than the re-run groupBy they avoid.)
    s1 = dedup.exact_dedup(docs).select(F.col("survivor_id").alias("doc_id"))
    d1 = docs.join(s1, on="doc_id")
    # 2: minhash LSH pairs → components → keep smallest id. The
    # composed chain is the canonical 100 TB recipe, so its near-dup
    # stage carries the SAME degenerate-blocking guard the standalone
    # dedup_minhash_capped evidences (r13 verdict #4): minhash_cap=100
    # by default — an LSH (band, bh) bucket holding >100 docs after
    # exact dedup is mass-duplicated boilerplate, and dropping it
    # bounds the candidate join at bands × cap² pairs per bucket (its
    # members are conservatively all kept). Never binds at gate scale
    # (buckets ≤ 3 docs there, so the SQL oracle stays exact on the
    # uncapped values); the fuzzer draws binding caps (2, 3) to
    # exercise the exclusion semantics through the composed chain.
    mpairs = dedup.minhash_lsh_dedup(d1, threshold=minhash_tau, cache=True,
                                     max_band_bucket=minhash_cap)
    mlosers = (
        graph.connected_components(mpairs)
        .where(F.col("component") != F.col("vertex"))
        .select(F.col("vertex").alias("doc_id"))
    )
    d2 = d1.join(mlosers, on="doc_id", how="left_anti")
    # 3: Gopher rule filter — pinned before the .where("passes"): the
    # interpreted predicate would otherwise re-evaluate the per-rule
    # token expressions (and d2's whole join lineage below them) with
    # no subexpression elimination (_spark_quality_pipeline's r14 note)
    from coolplaydruid_spark.operators.dedup import _pin_cache

    d3 = d2.join(
        _pin_cache(_spark_gopher(d2, gopher_params)
                   .select("doc_id", "passes"))
        .where("passes").select("doc_id"),
        on="doc_id")
    # 4: semantic dedup — centroids pinned to the full table's first 8
    # (pinned BEFORE filtering, so assignment is stable across stages),
    # pairs among survivors only, keep smallest id
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    sub = emb.join(d3.select(F.col("doc_id").alias("vec_id")), on="vec_id")
    # max_cell_size=250 (SemDeDup's mean-cell-population design point):
    # with PINNED centroids the within-cell self-join is quadratic in
    # the corpus by construction, and the hot-cell cap is the engine's
    # production guard for exactly this configuration — an over-cap
    # cell emits no pairs (all members conservatively kept). It never
    # binds at gate scale (135 survivors across 8 cells), so the SQL
    # oracle stays exact; at the sf1 tail it is the mechanism that
    # keeps the composed chain pair-bounded. The corpus-scaled-cells
    # production shape is separately evidenced by the *_scaled
    # semantic entries.
    spairs = dedup.semantic_dedup_pairs(sub, cent, threshold=sem_tau,
                                        max_cell_size=max_cell)
    slosers = (
        graph.connected_components(spairs, src_col="id_a", dst_col="id_b")
        .where(F.col("component") != F.col("vertex"))
        .select(F.col("vertex").alias("doc_id"))
    )
    d4 = d3.join(slosers, on="doc_id", how="left_anti")
    # 5: decontamination against the raw probe docs (<20) at the 5%
    # shingle-overlap threshold; probe docs never enter the corpus,
    # and a shingle-less (empty) doc has no measurable fraction — it
    # is dropped, on both sides, by the inner join
    frac = _pin_cache(text.contamination_fraction(
        d4.where(F.col("doc_id") >= 20), docs.where(F.col("doc_id") < 20)))
    d5 = d4.join(
        frac.where(F.col("contaminated_frac") < cont_cut).select("doc_id"),
        on="doc_id")
    # 6: quality-mixture thinning trained on the survivors
    kept = sampling.quality_mixture(
        d5, rates=dict(rates), vocab_size=vocab_size)
    return {"d1": d1, "d2": d2, "d3": d3, "d4": d4, "d5": d5, "kept": kept}


@q("pipeline_llm_corpus", _duck_llm_corpus())
def pipeline_llm_corpus(spark, sf_dir):
    """The canonical LLM training-corpus build end-to-end, composed
    from the operator library: exact dedup → minhash near-dedup (τ=0.5,
    keep-smallest per component) → Gopher rules → semantic dedup
    (pinned centroids, τ=0.3, hot-cell cap) → benchmark
    decontamination (5% shingle overlap) → CCNet
    quality-mixture thinning. Returns the selected corpus as (doc_id,
    bucket, n_tokens) — the full relational chain is value-hash-checked
    against one composed DuckDB oracle; tests/test_operators.py asserts
    every stage genuinely prunes at gate scale."""
    return _spark_llm_corpus_stages(spark, sf_dir)["kept"]


@q("pipeline_llm_corpus_capped", _duck_llm_corpus(minhash_cap=1))
def pipeline_llm_corpus_capped(spark, sf_dir):
    """The composed corpus build with a BINDING minhash hot-bucket cap
    (r13 verdict #4's standing evidence): max_band_bucket=1 drops every
    multi-doc LSH bucket before the candidate join, so near-dup losers
    that only collide through those buckets survive — 38 kept docs at
    gate scale vs the default chain's 36, value-hash-checked against
    the SAME shared oracle builder at the same knob. Together with the
    default entry this pins both sides of the cap's conservative-recall
    contract end-to-end (members of a dropped bucket are KEPT, never
    wrongly dropped); the fuzzer additionally draws cap ∈
    {None, 2, 3, 100} with random taus."""
    return _spark_llm_corpus_stages(spark, sf_dir, minhash_cap=1)["kept"]


@q("pipeline_llm_corpus_packed")  # no SQL oracle: FFD bin assignment is
# order-dependent by nature — exact end-to-end replay validator below
def pipeline_llm_corpus_packed(spark, sf_dir):
    """The corpus build driven through to TRAINING SEQUENCES: the
    pipeline_llm_corpus selection packed into ≤128-token bins
    (per-partition first-fit-decreasing). The validator replays the
    ENTIRE chain — the composed DuckDB oracle reproduces the selected
    doc set, then pure-Python FFD must reproduce the bins bit-for-bit —
    so this single entry certifies ingest-to-packer interoperation."""
    from coolplaydruid_spark.operators import packing

    kept = _spark_llm_corpus_stages(spark, sf_dir)["kept"]
    return packing.pack_sequences(kept, budget=128, token_col="n_tokens")


@validator("pipeline_llm_corpus_packed")
def _validate_llm_corpus_packed(spark, sf_dir, rows):
    """End-to-end exact replay: run the composed corpus-build oracle in
    DuckDB on the same parquet (selected docs + token counts), then
    verify the packed bins are exactly the per-namespace FFD of that
    selection (_ffd_replay_check — the same replay pack_training_
    sequences passes)."""
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sel = con.execute(_duck_llm_corpus()).fetchall()
    tokens = {r[0]: r[2] for r in sel}
    if not tokens:
        return False, "oracle selected no documents — the check is vacuous"
    ok, msg = _ffd_replay_check(rows, tokens, 128)
    if not ok:
        return ok, msg
    return True, (
        f"end-to-end replay: {len(tokens)} oracle-selected docs, {msg}")


def _duck_overlap_matrix(group: str, k: int) -> str:
    """Cross-group shingle-overlap oracle: same shingle rule as
    dedup.shingles (short docs contribute their whole token sequence;
    empty shingles dropped), distinct per group, pairwise shared
    counts + Jaccard."""
    grams = (
        f"list_transform(range(1, len(t) - {k - 2}), "
        f"i -> array_to_string(list_slice(t, i, i + {k - 1}), ' '))"
    )
    return f"""
    WITH toks AS (SELECT doc_id, {group} AS grp, {DUCK_TOKS} AS t FROM documents),
    sh0 AS (
      SELECT grp, CASE WHEN len(t) >= {k} THEN {grams}
             ELSE [array_to_string(t, ' ')] END AS arr
      FROM toks
    ),
    gsh AS (SELECT DISTINCT grp, unnest(arr) AS shingle FROM sh0),
    gshf AS (SELECT grp, shingle FROM gsh WHERE shingle <> ''),
    sizes AS (SELECT grp, count(*) AS n FROM gshf GROUP BY 1),
    shared AS (
      SELECT a.grp AS group_a, b.grp AS group_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM gshf a JOIN gshf b ON a.shingle = b.shingle AND a.grp < b.grp
      GROUP BY 1, 2
    )
    SELECT group_a, group_b, n_shared,
           round(CAST(n_shared AS DOUBLE)
                 / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6) AS jaccard
    FROM shared
    JOIN sizes sa ON shared.group_a = sa.grp
    JOIN sizes sb ON shared.group_b = sb.grp
    """


@q("corpus_overlap_matrix", _duck_overlap_matrix("source", 3))
def corpus_overlap_matrix(spark, sf_dir):
    """Cross-subcorpus duplication matrix (shingle-set Jaccard per
    source pair) — the statistic that prioritizes dedup between crawl
    snapshots. The corpus reduces to DISTINCT (group, shingle) rows;
    the shingle self-join is bounded per key by the group count, so
    the pair stream is vocabulary-scaled, never corpus-scaled
    (operators/corpus.source_overlap_matrix)."""
    eng = engine_for(spark, sf_dir)
    return corpus.source_overlap_matrix(
        eng.catalog.table("documents"), group_col="source", k=3
    )


def _duck_overlap_incremental(group: str, k: int, batch_where: str) -> str:
    """Batch × corpus overlap oracle: same shingle rule as
    _duck_overlap_matrix, with the documents split by ``batch_where``
    into the incoming batch (group_b side) and the standing corpus
    (group_a side) — the oracle recomputes both distinct shingle sets
    from the union table, the engine never re-pairs corpus × corpus."""
    grams = (
        f"list_transform(range(1, len(t) - {k - 2}), "
        f"i -> array_to_string(list_slice(t, i, i + {k - 1}), ' '))"
    )
    return f"""
    WITH toks AS (SELECT doc_id, {group} AS grp, {DUCK_TOKS} AS t FROM documents),
    sh0 AS (
      SELECT doc_id, grp, CASE WHEN len(t) >= {k} THEN {grams}
             ELSE [array_to_string(t, ' ')] END AS arr
      FROM toks
    ),
    allsh AS (SELECT doc_id, grp, unnest(arr) AS shingle FROM sh0),
    corpus_sh AS (SELECT DISTINCT grp, shingle FROM allsh
                  WHERE NOT ({batch_where}) AND shingle <> ''),
    batch_sh AS (SELECT DISTINCT grp, shingle FROM allsh
                 WHERE ({batch_where}) AND shingle <> ''),
    sizes_a AS (SELECT grp, count(*) AS n FROM corpus_sh GROUP BY 1),
    sizes_b AS (SELECT grp, count(*) AS n FROM batch_sh GROUP BY 1),
    shared AS (
      SELECT a.grp AS group_a, b.grp AS group_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM corpus_sh a JOIN batch_sh b ON a.shingle = b.shingle
      GROUP BY 1, 2
    )
    SELECT group_a, group_b, n_shared,
           round(CAST(n_shared AS DOUBLE)
                 / CAST(sa.n + sb.n - n_shared AS DOUBLE), 6) AS jaccard
    FROM shared
    JOIN sizes_a sa ON shared.group_a = sa.grp
    JOIN sizes_b sb ON shared.group_b = sb.grp
    """


@q(
    "corpus_overlap_incremental",
    _duck_overlap_incremental("source", 3, "doc_id % 5 = 0"),
)
def corpus_overlap_incremental(spark, sf_dir):
    """Daily-ingest overlap: an incoming batch (every 5th document)
    against the standing corpus (the rest), per source pair — the
    incremental form that prices each shard by the BATCH, never
    re-joining corpus × corpus
    (operators/corpus.source_overlap_incremental)."""
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    return corpus.source_overlap_incremental(
        docs.where(F.col("doc_id") % 5 == 0),
        corpus_df=docs.where(F.col("doc_id") % 5 != 0),
        group_col="source", k=3,
    )


@q(
    "corpus_overlap_from_store",
    _duck_overlap_incremental("source", 3, "doc_id % 5 = 0"),
)
def corpus_overlap_from_store(spark, sf_dir):
    """The overlap-matrix ingest loop: the index task materializes the
    corpus's DISTINCT (source, shingle) table at accept time
    (signatures=[{"type": "group_shingles"}]); the incremental overlap
    operator reads the STORE as corpus_group_shingles= — the corpus is
    never re-shingled, and the operator's own .distinct() guard (r10)
    collapses the per-__dt distincts into the global one. Oracle
    identical to corpus_overlap_incremental."""
    from coolplaydruid_spark.sources import batch as _batch

    dest = _corpus_store(
        spark, sf_dir,
        [{"type": "group_shingles", "group_col": "source",
          "text_col": "text", "id_col": "doc_id"}],
        "docs_overlap")
    corpus_gs = _batch.read_signatures(
        spark, dest, "group_shingles").select("source", "shingle")
    eng = engine_for(spark, sf_dir)
    docs = eng.catalog.table("documents")
    return corpus.source_overlap_incremental(
        docs.where(F.col("doc_id") % 5 == 0),
        corpus_group_shingles=corpus_gs,
        group_col="source", k=3,
    )
