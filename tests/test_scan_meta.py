"""Scan/select/search/timeBoundary/segmentMetadata/dataSourceMetadata
(Q4-Q9) + error envelope + cancel plumbing (SURVEY §2.10)."""

import json
from datetime import datetime

from tests.conftest import assert_df_matches_duck

INTERVAL = ["2024-01-01T00:00:00/2024-02-01T00:00:00"]


def test_scan_oracle(engine, duck):
    q = {
        "queryType": "scan",
        "dataSource": "events",
        "columns": ["event_id", "event_type", "value"],
        "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
        "intervals": ["2024-01-01T00:00:00/2024-01-03T00:00:00"],
    }
    df = engine.plan(q).drop("__time")
    sql = """
    SELECT event_id, event_type, value FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
      AND event_type = 'click'
    """
    assert_df_matches_duck(df, duck, sql)


def test_scan_limit_ordered(engine):
    q = {
        "queryType": "scan",
        "dataSource": "events",
        "columns": ["event_id"],
        "order": "descending",
        "limit": 5,
        "intervals": INTERVAL,
    }
    rows = engine.plan(q).collect()
    assert len(rows) == 5
    ts = [r["__time"] for r in rows]
    assert ts == sorted(ts, reverse=True)


def test_unlimited_scan_never_collects(engine, monkeypatch):
    """r12 verdict #2: a LIMITLESS scan through execute() must not
    df.collect() — that materializes the whole table in the JVM driver
    at once. It routes through toLocalIterator (partition-at-a-time,
    driver peak ~2 prefetched partitions) and returns the same rows.
    A scan WITH a limit keeps the collect fast path (CollectLimit is
    bounded by construction)."""
    # patch the CONCRETE class (Spark 4: pyspark.sql.classic overrides
    # the pyspark.sql.DataFrame base methods, so patching the base
    # would intercept nothing)
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"collect": 0, "iter": 0}
    real_collect, real_iter = DataFrame.collect, DataFrame.toLocalIterator

    def spy_collect(self):
        calls["collect"] += 1
        return real_collect(self)

    def spy_iter(self, prefetchPartitions=False):
        calls["iter"] += 1
        return real_iter(self, prefetchPartitions=prefetchPartitions)

    monkeypatch.setattr(DataFrame, "collect", spy_collect)
    monkeypatch.setattr(DataFrame, "toLocalIterator", spy_iter)
    base = {
        "queryType": "scan",
        "dataSource": "events",
        "columns": ["event_id", "event_type"],
        "intervals": INTERVAL,
    }
    unlimited = engine.execute(base)
    assert calls == {"collect": 0, "iter": 1}
    assert len(unlimited) > 100  # the whole fixture month, not a page
    limited = engine.execute(dict(base, limit=7))
    assert calls["iter"] == 1 and calls["collect"] >= 1
    assert len(limited) == 7
    # both deliveries serialize the same row shape, and the limited
    # result is a subset of the unlimited one
    all_ids = {r["event_id"] for r in unlimited}
    assert {r["event_id"] for r in limited} <= all_ids


def test_select_paging(engine):
    base = {
        "queryType": "select",
        "dataSource": "events",
        "dimensions": ["event_type"],
        "metrics": ["value"],
        "intervals": INTERVAL,
    }
    page1 = engine.plan(dict(base, pagingSpec={"threshold": 10, "offset": 0})).collect()
    page2 = engine.plan(dict(base, pagingSpec={"threshold": 10, "offset": 10})).collect()
    assert len(page1) == 10 and len(page2) == 10
    assert page1[-1]["__time"] <= page2[0]["__time"]
    ids = {(r["__time"], r["value"]) for r in page1} & {(r["__time"], r["value"]) for r in page2}
    assert not ids  # pages disjoint


def test_search_oracle(engine, duck):
    q = {
        "queryType": "search",
        "dataSource": "events",
        "searchDimensions": ["event_type"],
        "query": {"type": "insensitive_contains", "value": "i"},
        "intervals": INTERVAL,
    }
    df = engine.plan(q)
    sql = """
    SELECT 'event_type' AS dimension, event_type AS value,
           CAST(count(*) AS BIGINT) AS count
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
      AND contains(lower(event_type), 'i')
    GROUP BY 2
    """
    assert_df_matches_duck(df, duck, sql)


def test_time_boundary(engine, duck):
    df = engine.plan({"queryType": "timeBoundary", "dataSource": "events"})
    sql = "SELECT min(ts) AS minTime, max(ts) AS maxTime FROM events"
    assert_df_matches_duck(df, duck, sql)


def test_datasource_metadata(engine, duck):
    df = engine.plan({"queryType": "dataSourceMetadata", "dataSource": "events"})
    sql = "SELECT max(ts) AS maxIngestedEventTime FROM events"
    assert_df_matches_duck(df, duck, sql)


def test_segment_metadata(engine, duck):
    q = {
        "queryType": "segmentMetadata",
        "dataSource": "events",
        "context": {"useExactCountDistinct": True},
    }
    df = engine.plan(q).select("column", "cardinality", "numRows")
    sql = """
    SELECT 'event_id' AS column, CAST(count(DISTINCT event_id) AS BIGINT) AS cardinality,
           CAST(count(*) AS BIGINT) AS numRows FROM events
    UNION ALL SELECT 'ts', CAST(count(DISTINCT ts) AS BIGINT), CAST(count(*) AS BIGINT) FROM events
    UNION ALL SELECT 'user_id', CAST(count(DISTINCT user_id) AS BIGINT), CAST(count(*) AS BIGINT) FROM events
    UNION ALL SELECT 'event_type', CAST(count(DISTINCT event_type) AS BIGINT), CAST(count(*) AS BIGINT) FROM events
    UNION ALL SELECT 'value', CAST(count(DISTINCT value) AS BIGINT), CAST(count(*) AS BIGINT) FROM events
    UNION ALL SELECT 'props', CAST(count(DISTINCT props) AS BIGINT), CAST(count(*) AS BIGINT) FROM events
    """
    assert_df_matches_duck(df, duck, sql)


def test_error_envelope(engine):
    """query/query-module-overview.md:60-87: failures return
    {error, errorMessage, errorClass, host}."""
    out = json.loads(engine.execute_json({"queryType": "nope", "dataSource": "events"}))
    assert set(out) == {"error", "errorMessage", "errorClass", "host"}
    assert out["error"] == "Unknown exception"

    out2 = json.loads(engine.execute_json("{not json"))
    assert out2["error"] == "Unknown exception"
    assert out2["errorClass"] == "JsonParseException"


def test_sql_frontend(engine, duck):
    df = engine.sql("""
        SELECT event_type, count(*) AS rows FROM events GROUP BY event_type
    """)
    sql = "SELECT event_type, CAST(count(*) AS BIGINT) AS rows FROM events GROUP BY 1"
    assert_df_matches_duck(df, duck, sql)


def test_search_strlen_sort(engine):
    base = {
        "queryType": "search",
        "dataSource": "events",
        "searchDimensions": ["event_type"],
        "query": {"type": "insensitive_contains", "value": "i"},
        "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
    }
    lex = [r["value"] for r in engine.execute(base)]
    assert lex == sorted(lex)
    strlen = [r["value"] for r in engine.execute(dict(base, sort={"type": "strlen"}))]
    assert strlen == sorted(strlen, key=lambda v: (len(v), v))
    assert set(lex) == set(strlen)


def test_scan_compacted_list_format(engine):
    q = {
        "queryType": "scan",
        "dataSource": "events",
        "columns": ["event_id", "event_type"],
        "intervals": ["2024-01-01T00:00:00/2024-01-03T00:00:00"],
        "limit": 10,
    }
    rows = engine.execute(q)
    batches = engine.execute(dict(q, resultFormat="compactedList"))
    assert len(batches) == 1
    batch = batches[0]
    assert batch["columns"] == list(rows[0].keys())
    assert len(batch["events"]) == len(rows) == 10
    assert batch["events"][0] == [rows[0][c] for c in batch["columns"]]


def test_select_result_envelope(engine):
    """Druid 0.12 select result shape: pagingIdentifiers carry the next
    offset so the client can feed them back to page forward."""
    q = {
        "queryType": "select",
        "dataSource": "events",
        "dimensions": ["event_type"],
        "metrics": ["value"],
        "intervals": INTERVAL,
        "pagingSpec": {"threshold": 10, "offset": 20},
    }
    out = engine.execute(q)
    assert len(out) == 1
    result = out[0]["result"]
    assert result["pagingIdentifiers"] == {"events": 30}
    assert len(result["events"]) == 10
    assert [e["offset"] for e in result["events"]] == list(range(20, 30))
    assert "event_type" in result["events"][0]["event"]


def test_druid_sql_time_functions(engine):
    """sqlcompat's SQL UDFs: fixed-length periods (PT15M), calendar
    shifts (P1M months), TIME_CEIL identity on boundaries."""
    rows = engine.sql("""
        SELECT TIME_FLOOR(TIMESTAMP '2024-03-15 13:47:21', 'PT15M') AS f15,
               TIME_SHIFT(TIMESTAMP '2024-01-31 00:00:00', 'P1M', 1) AS shifted,
               TIME_CEIL(TIMESTAMP '2024-03-15 13:00:00', 'PT1H') AS ceil_on_edge,
               TIME_CEIL(TIMESTAMP '2024-03-15 13:00:01', 'PT1H') AS ceil_mid,
               TIME_EXTRACT(TIMESTAMP '2024-03-15 13:47:21', 'DOY') AS doy,
               TIMESTAMP_TO_MILLIS(MILLIS_TO_TIMESTAMP(1700000000000)) AS millis_rt
    """).collect()[0]
    assert rows.f15.minute == 45 and rows.f15.second == 0
    assert rows.shifted.month == 2 and rows.shifted.day == 29  # Jan 31 + 1M → Feb 29
    assert rows.ceil_on_edge.hour == 13      # already on boundary → identity
    assert rows.ceil_mid.hour == 14
    assert rows.doy == 75
    assert rows.millis_rt == 1700000000000


def test_lookup_sql_function(engine):
    """Druid SQL LOOKUP(expr, 'name'): registered lookups inlined as map
    literals; unknown names and missing keys yield NULL; registry
    changes re-register."""
    engine.catalog.register_lookup(
        "type_names", {"click": "Click!", "view": "View"}
    )
    rows = engine.sql("""
        SELECT LOOKUP('click', 'type_names') AS a,
               LOOKUP('error', 'type_names') AS miss,
               LOOKUP('click', 'no_such') AS unk
    """).collect()[0]
    assert rows.a == "Click!" and rows.miss is None and rows.unk is None
    engine.catalog.register_lookup("type_names", {"click": "C2"})
    assert engine.sql("SELECT LOOKUP('click', 'type_names') AS a").collect()[0].a == "C2"


def test_druid_sql_time_function_edges(engine):
    """Review-driven edges: multi-month periods floor via month-index
    arithmetic, TIME_PARSE is NULL-on-garbage (ANSI-safe), DOW is ISO
    (Monday=1), P1W is epoch-anchored like the native period path, and
    lookups with backslashes/quotes/duplicate keys survive inlining."""
    r = engine.sql("""
        SELECT TIME_FLOOR(TIMESTAMP '2024-05-15 13:00:00', 'P2M') AS p2m,
               TIME_CEIL(TIMESTAMP '2024-05-15 13:00:00', 'P2M') AS c2m,
               TIME_PARSE('garbage') AS bad,
               TIME_EXTRACT(TIMESTAMP '2024-03-18 12:00:00', 'DOW') AS dow_mon,
               TIME_FLOOR(TIMESTAMP '2024-03-15 13:00:00', 'P1W') AS p1w
    """).collect()[0]
    assert (r.p2m.month, r.p2m.day) == (5, 1)
    assert (r.c2m.month, r.c2m.day) == (7, 1)
    assert r.bad is None
    assert r.dow_mon == 1
    assert r.p1w.strftime("%A") == "Thursday"  # epoch-anchored, like period P1W

    engine.catalog.register_lookup("esc_lkp", {"k": "C:\\path\\", "q": "it's"})
    row = engine.sql(
        "SELECT LOOKUP('k','esc_lkp') AS a, LOOKUP('q','esc_lkp') AS b"
    ).collect()[0]
    assert row.a == "C:\\path\\" and row.b == "it's"


def test_mv_index_and_ipv4_match_edges(engine):
    """Druid returns NULL for ALL out-of-range MV indexes including
    negative ones (Spark's try_element_at would throw on 0 and index
    from the END on negatives), and IPV4_MATCH fails soft: FALSE for an
    unparseable address, NULL-not-abort for a malformed subnet."""
    r = engine.sql("""
        SELECT MV_OFFSET(array('a','b','c'), -1) AS off_neg1,
               MV_OFFSET(array('a','b','c'), -2) AS off_neg2,
               MV_OFFSET(array('a','b','c'), 3) AS off_past,
               MV_OFFSET(array('a','b','c'), 0) AS off_first,
               MV_ORDINAL(array('a','b','c'), 0) AS ord_zero,
               MV_ORDINAL(array('a','b','c'), -1) AS ord_neg,
               MV_ORDINAL(array('a','b','c'), 1) AS ord_first,
               IPV4_MATCH('not.an.ip', '10.0.0.0/8') AS bad_addr,
               IPV4_MATCH('10.1.2.3', 'garbage') AS bad_subnet,
               IPV4_MATCH('10.1.2.3', '10.0.0.0') AS no_slash,
               IPV4_MATCH('10.1.2.3', '10.0.0.0/8') AS hit,
               IPV4_MATCH('11.1.2.3', '10.0.0.0/8') AS miss
    """).collect()[0]
    assert r.off_neg1 is None and r.off_neg2 is None and r.off_past is None
    assert r.off_first == "a"
    assert r.ord_zero is None and r.ord_neg is None and r.ord_first == "a"
    assert r.bad_addr is False
    assert r.bad_subnet is False and r.no_slash is False
    assert r.hit is True and r.miss is False


def test_mv_extended_and_time_in_interval(engine):
    """MV_APPEND/PREPEND/CONCAT/SLICE/FILTER_* preserve order and
    duplicates; TIME_IN_INTERVAL is start-inclusive end-exclusive."""
    r = engine.sql("""
        SELECT MV_APPEND(array('a','b'), 'c') AS app,
               MV_PREPEND('z', array('a','b')) AS pre,
               MV_CONCAT(array('a'), array('a','b')) AS cc,
               MV_SLICE(array('a','b','c','d'), 1, 3) AS sl,
               MV_SLICE(array('a','b'), -1, 1) AS sl_bad,
               MV_FILTER_ONLY(array('a','b','a','c'), array('a','c')) AS only,
               MV_FILTER_NONE(array('a','b','a','c'), array('a','c')) AS none,
               TIME_IN_INTERVAL(TIMESTAMP '2024-01-03 00:00:00',
                                '2024-01-03T00:00:00/2024-01-05T00:00:00') AS lo,
               TIME_IN_INTERVAL(TIMESTAMP '2024-01-05 00:00:00',
                                '2024-01-03T00:00:00/2024-01-05T00:00:00') AS hi
    """).collect()[0]
    assert r.app == ["a", "b", "c"]
    assert r.pre == ["z", "a", "b"]
    assert r.cc == ["a", "a", "b"]       # duplicates preserved
    assert r.sl == ["b", "c"]
    assert r.sl_bad is None
    assert r.only == ["a", "a", "c"]     # order + duplicates preserved
    assert r.none == ["b"]
    assert r.lo is True and r.hi is False


def test_druid_sql_aggregate_renames(engine):
    """Druid-SQL-only aggregate names rewrite to exact Spark
    equivalents: EARLIEST_BY/LATEST_BY (min_by/max_by), BITWISE_*_AGG,
    APPROX_QUANTILE (percentile_approx) — case-insensitive, inside a
    real grouped query over a registered dataSource."""
    rows = engine.sql("""
        SELECT event_type,
               EARLIEST_BY(value, ts) AS first_val,
               latest_by(value, ts) AS last_val,
               BITWISE_AND_AGG(user_id) AS band,
               BITWISE_OR_AGG(user_id) AS bor,
               APPROX_QUANTILE(value, 0.5) AS med
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 2
    """).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.first_val is not None and r.last_val is not None
        assert isinstance(r.band, int) and isinstance(r.bor, int)
        assert r.med is not None
    # sanity against direct Spark aggregates
    direct = engine.sql("""
        SELECT event_type, min_by(value, ts) AS first_val
        FROM events GROUP BY 1 ORDER BY 1 LIMIT 2
    """).collect()
    assert [r.first_val for r in rows] == [r.first_val for r in direct]


def test_approx_quantile_ds_two_arg_ok_three_arg_fails(engine):
    """APPROX_QUANTILE_DS(expr, prob) maps to percentile_approx; the
    3-arg form carries Druid's sketch-size k (NOT Spark's accuracy) and
    must fail loudly instead of silently degrading precision."""
    import pytest

    r = engine.sql(
        "SELECT APPROX_QUANTILE_DS(value, 0.5) AS med FROM events"
    ).collect()
    assert r[0].med is not None
    with pytest.raises(Exception, match="APPROX_QUANTILE_DS"):
        engine.sql(
            "SELECT APPROX_QUANTILE_DS(value, 0.5, 128) AS med FROM events"
        ).collect()
    # plain APPROX_QUANTILE's 3rd arg is Druid's resolution (~50), not
    # Spark accuracy (~10000) — same silent-degradation class, same guard
    with pytest.raises(Exception, match="APPROX_QUANTILE"):
        engine.sql(
            "SELECT APPROX_QUANTILE(value, 0.5, 200) AS med FROM events"
        ).collect()
    # arg counting is string-literal-aware: commas inside '...' don't
    # inflate the arity of an unrelated 2-arg call
    r2 = engine.sql(
        "SELECT APPROX_QUANTILE_DS(value, 0.5) AS med, "
        "'a,b,c' AS lit FROM events"
    ).collect()
    assert r2[0].med is not None and r2[0].lit == "a,b,c"
    # and a 3-arg-looking shape INSIDE a string literal must not reject
    # the query
    r3 = engine.sql(
        "SELECT count(*) AS n, 'use APPROX_QUANTILE_DS(a, b, c)!' AS doc "
        "FROM events"
    ).collect()
    assert r3[0].n > 0


def test_information_schema_and_sys_segments(engine):
    """Druid SQL metadata introspection: dotted INFORMATION_SCHEMA /
    sys.segments spellings rewrite to catalog-backed views; EXPLAIN
    PLAN FOR works."""
    tables = {r.TABLE_NAME for r in engine.sql(
        "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES"
    ).collect()}
    assert {"events", "orders", "lineitem", "documents"} <= tables

    cols = engine.sql("""
        SELECT COLUMN_NAME, DATA_TYPE, ORDINAL_POSITION
        FROM INFORMATION_SCHEMA.COLUMNS
        WHERE TABLE_NAME = 'events' ORDER BY ORDINAL_POSITION
    """).collect()
    by_name = {r.COLUMN_NAME: r.DATA_TYPE for r in cols}
    assert by_name["event_type"] == "VARCHAR"
    assert by_name["value"] == "DOUBLE"
    assert by_name["__time"] == "TIMESTAMP"
    assert [r.ORDINAL_POSITION for r in cols] == list(range(1, len(cols) + 1))

    segs = engine.sql(
        "SELECT datasource, size, start, `end` FROM sys.segments "
        "WHERE datasource = 'events'"
    ).collect()
    assert len(segs) >= 1 and all(s.size is None or s.size > 0 for s in segs)
    # interval ends must be ISO-8601-parseable (next day T00:00:00, not
    # the hour-24 spelling many parsers reject)
    from datetime import datetime, timedelta

    for s in segs:
        if s.start is None:
            continue
        assert "T24" not in s.end
        st = datetime.fromisoformat(s.start.replace("Z", "+00:00"))
        en = datetime.fromisoformat(s.end.replace("Z", "+00:00"))
        assert en == st + timedelta(days=1)

    plan = engine.sql(
        "EXPLAIN PLAN FOR SELECT count(*) FROM events"
    ).collect()
    assert plan and "Aggregate" in plan[0][0]


def test_sys_tasks_view(engine, spark, tmp_path):
    """sys.tasks reflects the task registry, refreshing per query."""
    from coolplaydruid_spark.sources import batch

    before = engine.sql("SELECT count(*) AS n FROM sys.tasks").collect()[0].n
    src = tmp_path / "x.csv"
    src.write_text("ts,event_type,value\n2024-01-01T00:00:05,click,1.0\n")
    batch.index_task(
        spark, {"type": "file", "path": str(src), "format": "csv"},
        str(tmp_path / "t"), time_column="ts",
    )
    rows = engine.sql(
        "SELECT status, type FROM sys.tasks ORDER BY created_time DESC"
    ).collect()
    assert len(rows) == before + 1
    assert rows[0].status == "SUCCESS" and rows[0].type == "index"


def test_time_function_tz_origin_and_lookup_default_args(engine):
    """Druid SQL full signatures: TIME_FLOOR/CEIL origin + timezone
    args, TIME_EXTRACT/FORMAT/PARSE timezone args, LOOKUP's
    replaceMissingValueWith."""
    engine.catalog.register_lookup("tl", {"a": "A"})
    r = engine.sql("""
        SELECT TIME_FLOOR(TIMESTAMP '2024-03-15 13:47:21', 'PT1H',
                          TIMESTAMP '2024-01-01 00:30:00') AS f_origin,
               TIME_FLOOR(TIMESTAMP '2024-03-15 13:47:21', 'P1D',
                          NULL, 'America/New_York') AS f_tz,
               TIME_CEIL(TIMESTAMP '2024-03-15 13:47:21', 'P1D',
                         NULL, 'America/New_York') AS c_tz,
               TIME_EXTRACT(TIMESTAMP '2024-03-15 13:47:21', 'HOUR',
                            'America/New_York') AS h_tz,
               TIME_EXTRACT(TIMESTAMP '2024-03-15 13:47:21', 'EPOCH') AS epoch_s,
               TIME_FORMAT(TIMESTAMP '2024-03-15 13:47:21', 'HH:mm',
                           'Asia/Tokyo') AS fmt_tz,
               TIME_PARSE('15/03/2024 13:47', 'dd/MM/yyyy HH:mm') AS p_pat,
               TIME_PARSE('2024-03-15 09:47:21', NULL,
                          'America/New_York') AS p_tz,
               LOOKUP('a', 'tl', 'dflt') AS hit,
               LOOKUP('z', 'tl', 'dflt') AS miss,
               LOOKUP('z', 'tl') AS miss_null
    """).collect()[0]
    assert r.f_origin.minute == 30  # anchored at the origin's phase
    # 13:47 UTC = 09:47 EDT -> local midnight = 04:00 UTC
    assert (r.f_tz.hour, r.f_tz.day) == (4, 15)
    assert (r.c_tz.hour, r.c_tz.day) == (4, 16)
    assert r.h_tz == 9
    assert r.epoch_s == 1710510441
    assert r.fmt_tz == "22:47"  # UTC+9
    assert (r.p_pat.day, r.p_pat.hour) == (15, 13)
    assert (r.p_tz.hour, r.p_tz.minute) == (13, 47)  # EDT -> UTC
    assert r.hit == "A" and r.miss == "dflt" and r.miss_null is None


def test_time_shims_precise_periods_offset_preserving(engine):
    """ADVICE r07: the SQL shim's tz path for time-only (precise)
    periods must match granularity.py's instant-timeline semantics —
    offset-preserving truncation keeps BOTH occurrences of a DST
    repeated hour distinct (the wall-clock round trip collapsed
    2024-10-27T01:30Z@Berlin to 00:30Z), and TIME_CEIL/TIME_SHIFT step
    by fixed millis instead of skipping the repeated-hour bucket."""
    r = engine.sql("""
        SELECT TIME_FLOOR(TIMESTAMP '2024-10-27 01:30:00', 'PT1M',
                          NULL, 'Europe/Berlin') AS fl_min,
               TIME_FLOOR(TIMESTAMP '2024-10-27 01:30:00', 'PT1H',
                          NULL, 'Europe/Berlin') AS fl_hr,
               TIME_CEIL(TIMESTAMP '2024-11-03 05:30:00', 'PT1H',
                         NULL, 'America/New_York') AS ceil_rep,
               TIME_SHIFT(TIMESTAMP '2024-11-03 05:00:00', 'PT1H', 1,
                          'America/New_York') AS shift_rep,
               TIME_FLOOR(TIMESTAMP '2024-03-15 13:47:21', 'PT15M',
                          NULL, 'Asia/Kolkata') AS fl_1530,
               TIME_SHIFT(TIMESTAMP '2024-11-03 05:00:00', 'P1D', 1,
                          'America/New_York') AS shift_wall
    """).collect()[0]
    assert r.fl_min == datetime(2024, 10, 27, 1, 30)   # NOT 00:30
    assert r.fl_hr == datetime(2024, 10, 27, 1, 0)
    assert r.ceil_rep == datetime(2024, 11, 3, 6)      # NOT 07:00
    assert r.shift_rep == datetime(2024, 11, 3, 6)
    # +05:30 offset: local 19:17 floors to :15 -> 13:45Z
    assert r.fl_1530 == datetime(2024, 3, 15, 13, 45)
    # imprecise P1D keeps the wall-clock shift (25h across fall-back)
    assert r.shift_wall == datetime(2024, 11, 4, 6)
    # shim ≡ native granularity bucketing for the precise+tz cases
    from coolplaydruid_spark.functions.granularity import parse_granularity
    g = parse_granularity(
        {"type": "period", "period": "PT1M", "timeZone": "Europe/Berlin"})
    assert g.bucket_py(datetime(2024, 10, 27, 1, 30)) == r.fl_min
    g15 = parse_granularity(
        {"type": "period", "period": "PT15M", "timeZone": "Asia/Kolkata"})
    assert g15.bucket_py(datetime(2024, 3, 15, 13, 47, 21)) == r.fl_1530


def test_time_ceil_origin_tz_wall_anchored(engine):
    """Review-found r07: with origin+tz+P{n}D, TIME_FLOOR anchors at the
    origin's LOCAL wall phase, so TIME_CEIL must step off it by a LOCAL
    day too — a fixed +24h across the NY fall-back produced a non-
    boundary result that preceded t."""
    r = engine.sql("""
        SELECT TIME_FLOOR(TIMESTAMP '2024-11-04 04:30:00', 'P1D',
                          TIMESTAMP '2024-01-01 05:00:00',
                          'America/New_York') AS f,
               TIME_CEIL(TIMESTAMP '2024-11-04 04:30:00', 'P1D',
                         TIMESTAMP '2024-01-01 05:00:00',
                         'America/New_York') AS c
    """).collect()[0]
    # origin = local midnight EST; floor = local midnight Nov 3 (EDT,
    # 04:00Z); the fall-back bucket is 25h, so ceil = next local
    # midnight = 05:00Z (fixed +24h returned 04:00Z, before t)
    assert r.f == datetime(2024, 11, 3, 4, 0)
    assert r.c == datetime(2024, 11, 4, 5, 0)


def test_engine_explain_native_query(engine):
    """engine.explain: the Catalyst plan for a native JSON query without
    executing it — the native counterpart of EXPLAIN PLAN FOR."""
    s = engine.explain({
        "queryType": "timeseries", "dataSource": "events",
        "granularity": "day",
        "aggregations": [{"type": "count", "name": "rows"}],
        "intervals": ["2024-01-01T00:00:00/2024-01-04T00:00:00"],
    })
    assert "HashAggregate" in s and "PushedFilters" in s
    simple = engine.explain({
        "queryType": "scan", "dataSource": "events", "limit": 5,
    }, mode="simple")
    assert "Scan parquet" in simple or "FileScan" in simple
