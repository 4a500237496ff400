"""Druid-native expression language (functions/druidexpr.py): parser
unit tests against hand-computed expectations, Druid type semantics
(long/long integral division, ^-as-power, 1/0 booleans), time functions
via the shared granularity machinery, and the virtualColumns dialect
priority (Druid first, Spark SQL fallback)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.functions.druidexpr import (
    DruidExprError,
    compile_druid_expr,
)


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (7, 2.5, "hello world", datetime(2024, 3, 15, 13, 47, 21), None),
            (-3, 0.0, "", datetime(2024, 1, 1, 0, 0, 0), "x"),
        ],
        "n long, d double, s string, t timestamp, maybe string",
    )


def _one(frame, src, **extra):
    df = frame.limit(1).select(compile_druid_expr(src, frame).alias("v"))
    return df.collect()[0]["v"]


class TestArithmetic:
    def test_long_long_stays_long_integral_division(self, frame):
        # Druid: 7/2 == 3 (integral), 7.0/2 == 3.5
        assert _one(frame, "n / 2") == 3
        assert _one(frame, "n / 2.0") == 3.5
        assert _one(frame, "7 / 2") == 3
        assert _one(frame, "7 % 3") == 1

    def test_caret_is_power_not_xor(self, frame):
        assert _one(frame, "2 ^ 10") == 1024  # Spark SQL would say 8
        assert _one(frame, "2 ^ 0.5") == pytest.approx(2**0.5)
        # right-associative: 2^(3^2)
        assert _one(frame, "2 ^ 3 ^ 2") == 512

    def test_precedence_and_unary(self, frame):
        assert _one(frame, "1 + 2 * 3") == 7
        assert _one(frame, "-(1 + 2) * 3") == -9
        assert _one(frame, "2 * n + 1") == 15

    def test_string_plus_concatenates(self, frame):
        assert _one(frame, "s + '!'") == "hello world!"
        assert _one(frame, "'n=' + n") == "n=7"


class TestBooleansAndNulls:
    def test_comparisons_yield_long_1_0(self, frame):
        assert _one(frame, "n > 2") == 1
        assert _one(frame, "n < 2") == 0
        assert _one(frame, "n == 7 && d < 3") == 1
        assert _one(frame, "n == 0 || d == 2.5") == 1
        assert _one(frame, "!(n == 7)") == 0

    def test_if_nvl_isnull(self, frame):
        assert _one(frame, "if(n > 5, 'big', 'small')") == "big"
        assert _one(frame, "nvl(maybe, 'dflt')") == "dflt"
        assert _one(frame, "isnull(maybe)") == 1
        assert _one(frame, "notnull(maybe)") == 0

    def test_case_searched_and_simple(self, frame):
        assert _one(frame, "case_searched(n > 10, 'big', n > 5, 'mid', 'small')") == "mid"
        assert _one(frame, "case_simple(s, 'hello world', 'greeting', 'other')") == "greeting"


class TestStrings:
    def test_druid_indexing_semantics(self, frame):
        # substring is 0-based, -1 length = to end; strpos 0-based, -1 absent
        assert _one(frame, "substring(s, 6, -1)") == "world"
        assert _one(frame, "substring(s, 0, 5)") == "hello"
        assert _one(frame, "strpos(s, 'world')") == 6
        assert _one(frame, "strpos(s, 'zzz')") == -1
        assert _one(frame, "strlen(s)") == 11

    def test_string_functions(self, frame):
        assert _one(frame, "upper(left(s, 5))") == "HELLO"
        assert _one(frame, "right(s, 5)") == "world"
        assert _one(frame, "replace(s, 'l', 'L')") == "heLLo worLd"
        assert _one(frame, "concat(s, '/', n)") == "hello world/7"
        assert _one(frame, "like(s, 'hello%')") == 1
        assert _one(frame, "regexp_like(s, '^h.*d$')") == 1
        assert _one(frame, "regexp_extract(s, 'h(\\w+)', 1)") == "ello"
        assert _one(frame, "regexp_extract(s, 'zzz(9)?', 1)") is None
        assert _one(frame, "contains_string(s, 'o w')") == 1
        assert _one(frame, "icontains_string(s, 'HELLO')") == 1
        assert _one(frame, "parse_long('42')") == 42
        assert _one(frame, "parse_long('4x2')") is None

    def test_cast(self, frame):
        assert _one(frame, "cast(d, 'LONG')") == 2
        assert _one(frame, "cast(n, 'STRING')") == "7"
        assert _one(frame, "cast('3.5', 'DOUBLE')") == 3.5


class TestTime:
    def test_floor_ceil_shift_type_preserving(self, frame):
        assert _one(frame, "timestamp_floor(t, 'PT1H')") == datetime(2024, 3, 15, 13)
        assert _one(frame, "timestamp_floor(t, 'P1D')") == datetime(2024, 3, 15)
        assert _one(frame, "timestamp_ceil(t, 'PT1H')") == datetime(2024, 3, 15, 14)
        # on-boundary ceil is identity
        assert _one(frame, "timestamp_ceil(timestamp_floor(t, 'P1D'), 'P1D')") == datetime(2024, 3, 15)
        assert _one(frame, "timestamp_shift(t, 'P1M', 2)") == datetime(2024, 5, 15, 13, 47, 21)
        assert _one(frame, "timestamp_shift(t, 'PT15M', -1)") == datetime(2024, 3, 15, 13, 32, 21)

    def test_millis_long_inputs_stay_druid_longs(self, frame):
        # cast(t,'LONG') -> epoch millis; floor on millis returns millis
        millis = _one(frame, "cast(t, 'LONG')")
        assert millis == int(datetime(2024, 3, 15, 13, 47, 21).timestamp() * 1000)
        floored = _one(frame, "timestamp_floor(cast(t, 'LONG'), 'PT1H')")
        assert floored == int(datetime(2024, 3, 15, 13).timestamp() * 1000)

    def test_extract_and_format(self, frame):
        assert _one(frame, "timestamp_extract(t, 'HOUR')") == 13
        assert _one(frame, "timestamp_extract(t, 'DOY')") == 75
        assert _one(frame, "timestamp_extract(t, 'DOW')") == 5  # Friday, ISO
        assert _one(frame, "timestamp_format(t, 'yyyy-MM-dd')") == "2024-03-15"
        assert _one(frame, "timestamp_extract(t, 'HOUR', 'America/New_York')") == 9
        parsed = _one(frame, "timestamp_parse('2024-03-15T13:47:21')")
        assert parsed == datetime(2024, 3, 15, 13, 47, 21)

    def test_tz_floor_matches_granularity_path(self, frame):
        # P1D in New York: 13:47 UTC on 3/15 is 09:47 EDT -> local midnight
        # is 04:00 UTC
        assert _one(
            frame, "timestamp_floor(t, 'P1D', null, 'America/New_York')"
        ) == datetime(2024, 3, 15, 4)

    def test_ntz_timestamp_columns_work(self, spark):
        # parquet fixtures load as TIMESTAMP_NTZ; every time fn must
        # accept it (unix_seconds/unix_millis reject NTZ without the
        # ltz normalization in _time_in)
        ntz = spark.createDataFrame(
            [(datetime(2024, 3, 15, 13, 47, 21),)], "t timestamp_ntz"
        )
        epoch = int(datetime(2024, 3, 15, 13, 47, 21).timestamp())
        assert _one(ntz, "timestamp_extract(t, 'EPOCH')") == epoch
        assert _one(ntz, "timestamp_extract(t, 'MILLIS', 'Asia/Tokyo')") == epoch * 1000
        assert _one(ntz, "cast(t, 'LONG')") == epoch * 1000
        assert _one(ntz, "unix_timestamp(t)") == epoch
        assert _one(ntz, "timestamp_shift(t, 'PT1H', 1)") == datetime(
            2024, 3, 15, 14, 47, 21
        )
        assert _one(ntz, "timestamp_ceil(t, 'P1D', null, 'America/New_York')") == datetime(2024, 3, 16, 4)

    def test_extract_epoch_millis_ignore_tz(self, frame):
        # Druid returns the absolute instant regardless of the timezone
        # argument; previously this crashed (convert_timezone yields
        # TIMESTAMP_NTZ, which unix_seconds/unix_millis reject).
        epoch = int(datetime(2024, 3, 15, 13, 47, 21).timestamp())
        assert _one(frame, "timestamp_extract(t, 'EPOCH')") == epoch
        assert (
            _one(frame, "timestamp_extract(t, 'EPOCH', 'America/New_York')")
            == epoch
        )
        assert (
            _one(frame, "timestamp_extract(t, 'MILLIS', 'Asia/Tokyo')")
            == epoch * 1000
        )

    def test_tz_ceil_shifts_in_local_wall_clock(self, frame):
        # 2024-03-15T13:47:21Z = 09:47 EDT -> next local midnight is
        # 2024-03-16T00:00 EDT = 04:00 UTC
        assert _one(
            frame, "timestamp_ceil(t, 'P1D', null, 'America/New_York')"
        ) == datetime(2024, 3, 16, 4)
        # Across spring-forward (2024-03-10 02:00 EST->EDT): ceil of
        # 2024-03-10T01:00 EST (06:00Z) to P1D must land on local
        # midnight 3/11 = 04:00Z (EDT), not 05:00Z (fixed +24h).
        assert _one(
            frame,
            "timestamp_ceil(timestamp_parse('2024-03-10T06:00:00'), "
            "'P1D', null, 'America/New_York')",
        ) == datetime(2024, 3, 11, 4)

    def test_tz_ceil_time_only_periods_stay_on_instant_timeline(self, frame):
        """ADVICE r07: time-only periods (PT1H…) are precise Joda fields
        — a tz'd ceil steps by fixed millis, so at a DST fall-back
        (2024-11-03 @NY) the repeated-hour bucket 06:00Z is visited, not
        skipped by a wall-clock +1h (which returned 07:00Z)."""
        ceil = (
            "timestamp_ceil(timestamp_parse('2024-11-03T05:30:00'), "
            "'PT1H', null, 'America/New_York')"
        )
        assert _one(frame, ceil) == datetime(2024, 11, 3, 6)
        # ceil must be a fixed point of floor
        assert _one(
            frame,
            f"timestamp_floor({ceil}, 'PT1H', null, 'America/New_York')",
        ) == datetime(2024, 11, 3, 6)


class TestMath:
    def test_ceil_floor_double_preserving(self, frame):
        import math

        # huge doubles: no long clamp (Spark F.ceil would return 9.2e18)
        assert _one(frame, "ceil(exp(600.0))") == pytest.approx(
            math.exp(600.0), rel=1e-9)
        # infinities pass through (Inf % 1.0 is NaN in the trunc formula)
        assert _one(frame, "ceil(exp(1000.0))") == float("inf")
        assert _one(frame, "floor(0.0 - exp(1000.0))") == float("-inf")
        # NaN in, NaN out
        assert math.isnan(_one(frame, "ceil(sqrt(0.0 - 4.0))"))
        # null propagates; normal values match Math.ceil/floor
        assert _one(frame, "ceil(null)") is None
        assert _one(frame, "ceil(-1.5)") == -1.0
        assert _one(frame, "floor(-1.5)") == -2.0

    def test_functions(self, frame):
        assert _one(frame, "abs(-3.5)") == 3.5
        assert _one(frame, "max(n, 10)") == 10
        assert _one(frame, "min(n, 2)") == 2
        assert _one(frame, "round(d + 0.04, 1)") == 2.5
        assert _one(frame, "div(17, 5)") == 3
        assert _one(frame, "sqrt(n + 2)") == 3.0
        assert _one(frame, "floor(d)") == 2.0
        assert _one(frame, "pow(2, 3)") == 8.0


class TestErrorsAndFallback:
    def test_out_of_subset_raises(self, frame):
        for bad in [
            "date_trunc('hour', t)",  # Spark SQL function
            "n +",  # truncated
            "unknown_fn(1)",
            "timestamp_floor(t, s)",  # non-literal period
            "nosuchcol + 1",
        ]:
            with pytest.raises((DruidExprError, ValueError)):
                compile_druid_expr(bad, frame)

    def test_extract_non_literal_tz_fails_even_for_epoch(self, frame):
        # the EPOCH/MILLIS early return must not skip tz validation
        for src in ["timestamp_extract(t, 'EPOCH', s)",
                    "timestamp_extract(t, 'MILLIS', s)"]:
            with pytest.raises(DruidExprError):
                compile_druid_expr(src, frame)

    def test_unary_math_extra_args_fail_loudly(self, frame):
        # abs(x, y) must not silently compute abs(x)
        for bad in ["abs(n, 1)", "sqrt(n, 2)", "floor(d, 1)", "sin(d, d)",
                    "signum(n, 0)", "ln(d, 2)"]:
            with pytest.raises(DruidExprError):
                compile_druid_expr(bad, frame)

    def test_virtual_column_dialect_priority(self, engine):
        """Druid dialect compiles first; Spark-SQL-only expressions fall
        back; explicit dialect pins; `^` resolves to POWER (druid) by
        default but XOR under dialect=sql."""
        base = {
            "queryType": "timeseries",
            "dataSource": "events",
            "granularity": "all",
            "intervals": ["2024-01-01T00:00:00/2024-01-02T00:00:00"],
            "aggregations": [{"type": "doubleMax", "name": "m", "fieldName": "vc"}],
        }
        druid_pow = engine.plan(dict(base, virtualColumns=[
            {"type": "expression", "name": "vc", "expression": "2 ^ 3"}]))
        assert druid_pow.collect()[0]["m"] == 8.0  # power, not xor
        sql_xor = engine.plan(dict(base, virtualColumns=[
            {"type": "expression", "name": "vc", "expression": "2 ^ 3",
             "dialect": "sql"}]))
        assert sql_xor.collect()[0]["m"] == 1.0  # Spark XOR
        fallback = engine.plan(dict(base, virtualColumns=[
            {"type": "expression", "name": "vc",
             "expression": "hour(__time)"}]))  # Spark-SQL-only source
        assert 0.0 <= fallback.collect()[0]["m"] <= 23.0

    def test_druid_time_virtual_column_groups(self, engine, duck):
        """The verdict's 'runs unmodified' check: a virtualColumn written
        in pure Druid dialect (timestamp_floor + timestamp_extract)
        drives a groupBy, matching a DuckDB oracle on raw SQL."""
        df = engine.plan({
            "queryType": "groupBy",
            "dataSource": "events",
            "granularity": "all",
            "dimensions": ["hod"],
            "virtualColumns": [{
                "type": "expression", "name": "hod",
                "expression": "timestamp_extract(timestamp_floor(__time, 'PT1H'), 'HOUR')",
            }],
            "intervals": ["2024-01-01T00:00:00/2024-01-08T00:00:00"],
            "aggregations": [{"type": "count", "name": "n"}],
            "limitSpec": {"type": "default", "limit": 1000,
                          "columns": [{"dimension": "hod"}]},
        })
        got = [(r["hod"], r["n"]) for r in df.collect()]
        exp = duck.execute("""
            SELECT CAST(hour(date_trunc('hour', ts)) AS BIGINT), count(*)
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
            GROUP BY 1 ORDER BY 1
        """).fetchall()
        assert got == [(h, n) for h, n in exp]


def test_lookup_in_druid_expression(engine):
    """Druid's lookup(expr, 'name') inside a virtualColumn expression:
    registered lookups inline as map literals; missing keys yield null
    (nvl provides Druid's replaceMissingValueWith pattern)."""
    engine.catalog.register_lookup("type_labels", {"click": "Click!", "view": "View"})
    df = engine.plan({
        "queryType": "groupBy",
        "dataSource": "events",
        "granularity": "all",
        "dimensions": ["label"],
        "virtualColumns": [{
            "type": "expression", "name": "label",
            "expression": "nvl(lookup(event_type, 'type_labels'), 'other')",
        }],
        "intervals": ["2024-01-01T00:00:00/2024-01-08T00:00:00"],
        "aggregations": [{"type": "count", "name": "n"}],
        "limitSpec": {"type": "default", "limit": 10,
                      "columns": [{"dimension": "label"}]},
    })
    rows = {r["label"]: r["n"] for r in df.collect()}
    assert set(rows) == {"Click!", "View", "other"}
    assert rows["other"] > 0


class TestArrays:
    def test_array_functions(self, spark):
        df = spark.createDataFrame(
            [(["a", "b", "c"], "x,y")], "arr array<string>, s string"
        )

        def one(src):
            return df.select(compile_druid_expr(src, df).alias("v")).collect()[0]["v"]

        assert one("array_length(arr)") == 3
        assert one("array_contains(arr, 'b')") == 1
        assert one("array_contains(arr, 'z')") == 0
        assert one("array_offset(arr, 0)") == "a"
        assert one("array_offset(arr, -1)") is None
        assert one("array_offset(arr, 5)") is None
        assert one("array_ordinal(arr, 1)") == "a"
        assert one("array_ordinal(arr, 0)") is None
        assert one("array_offset_of(arr, 'c')") == 2
        assert one("array_offset_of(arr, 'z')") is None
        assert one("array_ordinal_of(arr, 'c')") == 3
        assert one("array_to_string(arr, '-')") == "a-b-c"
        assert one("array_length(string_to_array(s, ','))") == 2
        assert one("array_length(array_append(arr, 'd'))") == 4
        assert one("array_offset(array_prepend('z', arr), 0)") == "z"
        assert one("array_length(array_concat(arr, arr))") == 6
        assert one("array_to_string(array_slice(arr, 1, 3), '')") == "bc"
        assert one("array_slice(arr, -1, 2)") is None
        assert one("array_to_string(array('p', 'q'), '+')") == "p+q"

    def test_array_in_virtual_column(self, engine):
        """MV dimension through an array expression virtualColumn."""
        df = engine.plan({
            "queryType": "timeseries",
            "dataSource": "documents",
            "granularity": "all",
            "virtualColumns": [{
                "type": "expression", "name": "n_toks",
                "expression": "array_length(string_to_array(text, ' '))",
            }],
            "aggregations": [
                {"type": "longSum", "name": "total_toks", "fieldName": "n_toks"}],
        })
        assert df.collect()[0]["total_toks"] > 0


def test_parse_long_radix_and_strpos_from_index(frame):
    """Review-driven: parse_long radix follows Long.parseLong (negative
    sign, full-string validation, 0x at 16 — not conv's unsigned
    wraparound / partial parse); strpos clamps negative fromIndex."""
    assert _one(frame, "parse_long('-5', 10)") == -5
    assert _one(frame, "parse_long('ff', 16)") == 255
    assert _one(frame, "parse_long('0x1f', 16)") == 31
    assert _one(frame, "parse_long('-ff', 16)") == -255
    assert _one(frame, "parse_long('12z', 10)") is None
    assert _one(frame, "parse_long('101', 2)") == 5
    assert _one(frame, "strpos(s, 'l', 3)") == 3
    assert _one(frame, "strpos(s, 'l', 4)") == 9
    assert _one(frame, "strpos(s, 'h', -1)") == 0  # clamp, Java indexOf
    assert _one(frame, "strpos(s, 'zzz', 2)") == -1
