"""Druid SQL compatibility functions for the SQL front-end.

The reference declares a SQL layer over the native queries
(`query/query-module-overview.md:48-49`, `TOC.md:40`). Spark SQL covers
the ANSI surface; this module adds the Druid-SQL-specific time functions
(public Druid SQL function list) as Spark SQL UDFs — pure SQL
expression bodies (Spark 4 `CREATE FUNCTION ... RETURN <expr>`), so
they inline into the plan and stay in whole-stage codegen; nothing here
is a Python UDF.

Registered (scalar) functions:
 - TIME_FLOOR(t, period)      — bucket start for an ISO-8601 period:
   calendar periods map to date_trunc; fixed-length PT{n}S/M/H, P{n}D,
   P{n}W floor epoch-millis arithmetic (epoch origin, like Druid's
   default).
 - TIME_CEIL(t, period)       — bucket end (floor + one period).
 - TIME_SHIFT(t, period, n)   — t shifted by n periods (calendar months
   via timestampadd, fixed-length via millis).
 - TIME_EXTRACT(t, unit)      — EPOCH/SECOND/MINUTE/HOUR/DAY/DOW/DOY/
   WEEK/MONTH/QUARTER/YEAR, as BIGINT.
 - MILLIS_TO_TIMESTAMP / TIMESTAMP_TO_MILLIS
 - TIME_PARSE(s)              — ISO string → timestamp.
 - DRUID_PERIOD_MILLIS(p)     — helper; length of a fixed-length period.
 - TRUNCATE(x, d)             — truncate toward zero to d decimal digits.
 - STRPOS(haystack, needle)   — 1-based position, 0 when absent (Druid's
                                argument order).
 - TEXTCAT(a, b)              — concat (DIV needs no shim: Spark's
                                builtin div() matches Druid's).
 - BITWISE_AND/OR/XOR(x, y), BITWISE_SHIFT_LEFT/RIGHT(x, n)
 - SAFE_DIVIDE(x, y)          — NULL on divide-by-zero.
 - DECODE_BASE64_UTF8(s)
 - IPV4_PARSE / IPV4_STRINGIFY / IPV4_MATCH(addr, 'cidr/n')
 - MV_LENGTH / MV_CONTAINS / MV_OVERLAP / MV_OFFSET / MV_ORDINAL /
   MV_TO_STRING / STRING_TO_MV / MV_APPEND / MV_PREPEND / MV_CONCAT /
   MV_SLICE / MV_FILTER_ONLY / MV_FILTER_NONE / MV_TO_ARRAY /
   ARRAY_TO_MV — Druid multi-value string functions over ARRAY<STRING>
   columns (our multi-value dimension type).
 - TIME_IN_INTERVAL(t, 'start/end') — ISO interval containment.

Druid SQL aggregate names that Spark covers natively need no shim:
APPROX_COUNT_DISTINCT is a same-name Spark builtin; APPROX_QUANTILE's
Spark spelling is approx_percentile (documented rename).

All are TEMPORARY functions on the session (CREATE OR REPLACE —
idempotent; re-registration is free).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FIXED_MS = """
  CASE WHEN p RLIKE '^PT[0-9]+S$'
         THEN CAST(regexp_extract(p, '^PT([0-9]+)S$', 1) AS BIGINT) * 1000
       WHEN p RLIKE '^PT[0-9]+M$'
         THEN CAST(regexp_extract(p, '^PT([0-9]+)M$', 1) AS BIGINT) * 60000
       WHEN p RLIKE '^PT[0-9]+H$'
         THEN CAST(regexp_extract(p, '^PT([0-9]+)H$', 1) AS BIGINT) * 3600000
       WHEN p RLIKE '^P[0-9]+D$'
         THEN CAST(regexp_extract(p, '^P([0-9]+)D$', 1) AS BIGINT) * 86400000
       WHEN p RLIKE '^P[0-9]+W$'
         THEN CAST(regexp_extract(p, '^P([0-9]+)W$', 1) AS BIGINT) * 604800000
       ELSE NULL END
"""

_CALENDAR_TRUNC = """
  CASE p WHEN 'PT1S' THEN date_trunc('second', t)
         WHEN 'PT1M' THEN date_trunc('minute', t)
         WHEN 'PT1H' THEN date_trunc('hour', t)
         WHEN 'P1D'  THEN date_trunc('day', t)
         WHEN 'P1M'  THEN date_trunc('month', t)
         WHEN 'P3M'  THEN date_trunc('quarter', t)
         WHEN 'P1Y'  THEN date_trunc('year', t)
         ELSE NULL END
"""

_DEFS = [
    f"""CREATE OR REPLACE TEMPORARY FUNCTION DRUID_PERIOD_MILLIS(p STRING)
        RETURNS BIGINT RETURN {_FIXED_MS}""",
    """CREATE OR REPLACE TEMPORARY FUNCTION DRUID_PERIOD_MONTHS(p STRING)
        RETURNS INT RETURN CASE
          WHEN p RLIKE '^P[0-9]+M$'
            THEN CAST(regexp_extract(p, '^P([0-9]+)M$', 1) AS INT)
          WHEN p RLIKE '^P[0-9]+Y$'
            THEN 12 * CAST(regexp_extract(p, '^P([0-9]+)Y$', 1) AS INT)
          ELSE NULL END""",
    # Internal 2-arg floor core (CREATE FUNCTION bodies cannot
    # self-reference, so the public TIME_FLOOR wraps this).
    f"""CREATE OR REPLACE TEMPORARY FUNCTION DRUID_TIME_FLOOR2(t TIMESTAMP, p STRING)
        RETURNS TIMESTAMP RETURN COALESCE(
          {_CALENDAR_TRUNC},
          CASE WHEN DRUID_PERIOD_MONTHS(p) IS NOT NULL THEN
            CAST(make_date(
              1970 + CAST(floor((((year(t) - 1970) * 12 + month(t) - 1)
                     - pmod((year(t) - 1970) * 12 + month(t) - 1,
                            DRUID_PERIOD_MONTHS(p))) / 12) AS INT),
              CAST(pmod((((year(t) - 1970) * 12 + month(t) - 1)
                   - pmod((year(t) - 1970) * 12 + month(t) - 1,
                          DRUID_PERIOD_MONTHS(p))), 12) AS INT) + 1,
              1) AS TIMESTAMP)
          END,
          timestamp_millis(
            CAST(floor(unix_millis(t) / DRUID_PERIOD_MILLIS(p))
                 * DRUID_PERIOD_MILLIS(p) AS BIGINT)))""",
    # Offset-preserving floor for time-only (precise-field) periods with
    # a timezone — mirrors granularity.py's Granularity.bucket exactly:
    # PT1S/PT1M/PT1H truncate by the instant's OWN utc-offset (Joda
    # ZonedChronology roundFloor — keeps both occurrences of a DST
    # repeated hour distinct); multi-unit PT{n}X periods are fixed
    # durations on the instant timeline anchored at 1970-01-01T00:00
    # LOCAL time in tz (granularity.py _tz_epoch_origin_ms). A wall-
    # clock round trip here would collapse the repeated hour into its
    # first occurrence (PT1M@Europe/Berlin at 2024-10-27T01:30Z floored
    # to 00:30Z — the exact bug the native engine fixed in round 6).
    """CREATE OR REPLACE TEMPORARY FUNCTION DRUID_TZ_PRECISE_FLOOR(
          t TIMESTAMP, p STRING, tz STRING)
        RETURNS TIMESTAMP RETURN CASE
          WHEN p IN ('PT1S', 'PT1M', 'PT1H') THEN
            timestamp_millis(
              (unix_millis(t)
                 + (unix_millis(from_utc_timestamp(t, tz)) - unix_millis(t)))
              - pmod(unix_millis(t)
                       + (unix_millis(from_utc_timestamp(t, tz)) - unix_millis(t)),
                     DRUID_PERIOD_MILLIS(p))
              - (unix_millis(from_utc_timestamp(t, tz)) - unix_millis(t)))
          ELSE
            timestamp_millis(
              unix_millis(to_utc_timestamp(TIMESTAMP '1970-01-01 00:00:00', tz))
              + (unix_millis(t)
                   - unix_millis(to_utc_timestamp(TIMESTAMP '1970-01-01 00:00:00', tz)))
              - pmod(unix_millis(t)
                       - unix_millis(to_utc_timestamp(TIMESTAMP '1970-01-01 00:00:00', tz)),
                     DRUID_PERIOD_MILLIS(p)))
          END""",
    # TIME_FLOOR(t, p[, origin[, tz]]) — Druid SQL's full signature:
    # origin anchors fixed-length buckets at its phase (day/week periods
    # with a tz anchor at the origin's LOCAL wall time, matching
    # granularity.py's wallduration); a tz floors day-and-coarser
    # periods in local wall-clock (convert→floor→convert) and time-only
    # periods offset-preservingly on the instant timeline
    # (DRUID_TZ_PRECISE_FLOOR, the granularity.py precise-field
    # semantics). origin+calendar periods raise.
    """CREATE OR REPLACE TEMPORARY FUNCTION TIME_FLOOR(
          t TIMESTAMP, p STRING,
          o TIMESTAMP DEFAULT NULL, tz STRING DEFAULT NULL)
        RETURNS TIMESTAMP RETURN CASE
          WHEN o IS NOT NULL THEN
            CASE WHEN DRUID_PERIOD_MILLIS(p) IS NULL THEN
              raise_error(concat('TIME_FLOOR: origin with calendar period ',
                                 p, ' is unsupported'))
            WHEN tz IS NOT NULL AND p RLIKE '^P[0-9]+[DW]$' THEN
              to_utc_timestamp(timestamp_millis(
                unix_millis(from_utc_timestamp(o, tz))
                + CAST(floor((unix_millis(from_utc_timestamp(t, tz))
                              - unix_millis(from_utc_timestamp(o, tz)))
                       / DRUID_PERIOD_MILLIS(p))
                       * DRUID_PERIOD_MILLIS(p) AS BIGINT)), tz)
            ELSE
              timestamp_millis(unix_millis(o)
                + CAST(floor((unix_millis(t) - unix_millis(o))
                       / DRUID_PERIOD_MILLIS(p))
                       * DRUID_PERIOD_MILLIS(p) AS BIGINT))
            END
          WHEN tz IS NOT NULL THEN
            CASE WHEN p RLIKE '^PT[0-9]+[SMH]$'
                 THEN DRUID_TZ_PRECISE_FLOOR(t, p, tz)
            ELSE convert_timezone(tz, 'UTC',
              DRUID_TIME_FLOOR2(convert_timezone('UTC', tz, t), p))
            END
          ELSE DRUID_TIME_FLOOR2(t, p) END""",
    # Internal tz-less shift core (CREATE FUNCTION bodies cannot
    # self-reference).
    # timestampadd, NOT add_months: add_months returns a DATE and drops
    # the time-of-day (fuzz-found: TIME_SHIFT(t,'P1M',5) lost 13:47:21).
    # timestampadd(MONTH, ...) clamps end-of-month the same way and
    # keeps the time component.
    """CREATE OR REPLACE TEMPORARY FUNCTION DRUID_TIME_SHIFT3(
          t TIMESTAMP, p STRING, n INT)
        RETURNS TIMESTAMP RETURN CASE
          WHEN p RLIKE '^P[0-9]+M$'
            THEN timestampadd(MONTH, n * CAST(regexp_extract(p, '^P([0-9]+)M$', 1) AS INT), t)
          WHEN p RLIKE '^P[0-9]+Y$'
            THEN timestampadd(MONTH, n * 12 * CAST(regexp_extract(p, '^P([0-9]+)Y$', 1) AS INT), t)
          ELSE timestamp_millis(unix_millis(t) + n * DRUID_PERIOD_MILLIS(p)) END""",
    # tz shifts imprecise (day-and-coarser) periods in LOCAL wall-clock
    # (convert → shift → convert), so P1D across a DST change lands on
    # the next local midnight, not midnight ± 1h. Time-only periods are
    # precise fields: fixed millis on the instant timeline even with a
    # tz (a PT1H shift across a DST fall-back must not skip the
    # repeated hour).
    """CREATE OR REPLACE TEMPORARY FUNCTION TIME_SHIFT(
          t TIMESTAMP, p STRING, n INT, tz STRING DEFAULT NULL)
        RETURNS TIMESTAMP RETURN CASE
          WHEN tz IS NOT NULL AND NOT p RLIKE '^PT[0-9]+[SMH]$'
            THEN convert_timezone(tz, 'UTC',
              DRUID_TIME_SHIFT3(convert_timezone('UTC', tz, t), p, n))
          ELSE DRUID_TIME_SHIFT3(t, p, n) END""",
    # tz ceil of imprecise (day-and-coarser) periods works in LOCAL
    # wall-clock (floor + one local period, then back to UTC) so a P1D
    # ceil across a DST change lands on local midnight, not midnight
    # ± 1h. Time-only periods ceil on the instant timeline (precise
    # floor + fixed millis) — the TIME_FLOOR/TIME_SHIFT branches below
    # already split on the period shape, so the generic fallthrough
    # handles them.
    """CREATE OR REPLACE TEMPORARY FUNCTION TIME_CEIL(
          t TIMESTAMP, p STRING,
          o TIMESTAMP DEFAULT NULL, tz STRING DEFAULT NULL)
        RETURNS TIMESTAMP RETURN CASE
          WHEN tz IS NOT NULL AND o IS NULL
               AND NOT p RLIKE '^PT[0-9]+[SMH]$'
            THEN convert_timezone(tz, 'UTC',
              CASE WHEN DRUID_TIME_FLOOR2(convert_timezone('UTC', tz, t), p)
                        = convert_timezone('UTC', tz, t)
                   THEN convert_timezone('UTC', tz, t)
                   ELSE TIME_SHIFT(
                     DRUID_TIME_FLOOR2(convert_timezone('UTC', tz, t), p), p, 1)
              END)
          WHEN TIME_FLOOR(t, p, o, tz) = t THEN t
          ELSE TIME_SHIFT(TIME_FLOOR(t, p, o, tz), p, 1, tz) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION TIME_EXTRACT(
          t0 TIMESTAMP, u STRING, tz STRING DEFAULT NULL)
        RETURNS BIGINT RETURN CAST(CASE upper(u)
          WHEN 'EPOCH' THEN unix_seconds(t0)
          WHEN 'MILLIS' THEN unix_millis(t0)
          ELSE CASE upper(u)
            WHEN 'SECOND' THEN second(COALESCE(convert_timezone('UTC', tz, t0), t0))
            WHEN 'MINUTE' THEN minute(COALESCE(convert_timezone('UTC', tz, t0), t0))
            WHEN 'HOUR' THEN hour(COALESCE(convert_timezone('UTC', tz, t0), t0))
            WHEN 'DAY' THEN day(COALESCE(convert_timezone('UTC', tz, t0), t0))
            WHEN 'DOW' THEN weekday(COALESCE(convert_timezone('UTC', tz, t0), t0)) + 1
            WHEN 'DOY' THEN dayofyear(COALESCE(convert_timezone('UTC', tz, t0), t0))
            WHEN 'WEEK' THEN weekofyear(COALESCE(convert_timezone('UTC', tz, t0), t0))
            WHEN 'MONTH' THEN month(COALESCE(convert_timezone('UTC', tz, t0), t0))
            WHEN 'QUARTER' THEN quarter(COALESCE(convert_timezone('UTC', tz, t0), t0))
            WHEN 'YEAR' THEN year(COALESCE(convert_timezone('UTC', tz, t0), t0))
            ELSE NULL END
          END AS BIGINT)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MILLIS_TO_TIMESTAMP(x BIGINT)
        RETURNS TIMESTAMP RETURN timestamp_millis(x)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION TIMESTAMP_TO_MILLIS(t TIMESTAMP)
        RETURNS BIGINT RETURN unix_millis(t)""",
    # TIME_PARSE(s[, pattern[, tz]]): pattern parses with Java patterns;
    # tz interprets the string as wall-clock time IN tz.
    """CREATE OR REPLACE TEMPORARY FUNCTION TIME_PARSE(
          s STRING, p STRING DEFAULT NULL, tz STRING DEFAULT NULL)
        RETURNS TIMESTAMP RETURN CASE
          WHEN tz IS NOT NULL THEN convert_timezone(tz, 'UTC',
            CASE WHEN p IS NOT NULL THEN try_to_timestamp(s, p)
                 ELSE TRY_CAST(s AS TIMESTAMP) END)
          WHEN p IS NOT NULL THEN try_to_timestamp(s, p)
          ELSE TRY_CAST(s AS TIMESTAMP) END""",
    # Joda and java.time patterns agree on the subset Druid SQL docs use
    # (yyyy MM dd HH mm ss EEE MMM); exotic Joda tokens are a documented
    # divergence. 3rd arg renders in tz.
    """CREATE OR REPLACE TEMPORARY FUNCTION TIME_FORMAT(
          t TIMESTAMP, p STRING, tz STRING DEFAULT NULL)
        RETURNS STRING RETURN CASE
          WHEN tz IS NOT NULL
            THEN date_format(convert_timezone('UTC', tz, t), p)
          ELSE date_format(t, p) END""",
    # ---- Druid SQL scalar functions with no same-name Spark builtin ----
    # TRUNCATE(x[, d]): truncate toward zero to d decimal digits (Druid
    # semantics — unlike round(); negative d truncates left of the
    # point; d defaults to 0 as in Druid's 1-arg form).
    """CREATE OR REPLACE TEMPORARY FUNCTION TRUNCATE(x DOUBLE, d INT DEFAULT 0)
        RETURNS DOUBLE RETURN CASE WHEN x >= 0
          THEN floor(x * power(10, d)) / power(10, d)
          ELSE ceil(x * power(10, d)) / power(10, d) END""",
    # STRPOS(haystack, needle): 1-based position, 0 when absent — Druid's
    # argument order (Spark's position() takes (substr, str)).
    """CREATE OR REPLACE TEMPORARY FUNCTION STRPOS(h STRING, n STRING)
        RETURNS INT RETURN position(n, h)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION TEXTCAT(a STRING, b STRING)
        RETURNS STRING RETURN concat(a, b)""",
    # (Druid's DIV(x, y) needs no shim: Spark's builtin div() is the
    # same exact integral division. TRUNC is intentionally NOT
    # registered: it would shadow Spark's builtin trunc(date, fmt).)
    """CREATE OR REPLACE TEMPORARY FUNCTION BITWISE_AND(x BIGINT, y BIGINT)
        RETURNS BIGINT RETURN x & y""",
    """CREATE OR REPLACE TEMPORARY FUNCTION BITWISE_OR(x BIGINT, y BIGINT)
        RETURNS BIGINT RETURN x | y""",
    """CREATE OR REPLACE TEMPORARY FUNCTION BITWISE_XOR(x BIGINT, y BIGINT)
        RETURNS BIGINT RETURN x ^ y""",
    """CREATE OR REPLACE TEMPORARY FUNCTION BITWISE_SHIFT_LEFT(x BIGINT, n INT)
        RETURNS BIGINT RETURN shiftleft(x, n)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION BITWISE_SHIFT_RIGHT(x BIGINT, n INT)
        RETURNS BIGINT RETURN shiftright(x, n)""",
    # SAFE_DIVIDE: NULL on divide-by-zero (Druid SQL; distinct from the
    # native arithmetic post-agg's `/`-yields-0 rule).
    """CREATE OR REPLACE TEMPORARY FUNCTION SAFE_DIVIDE(x DOUBLE, y DOUBLE)
        RETURNS DOUBLE RETURN try_divide(x, y)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION DECODE_BASE64_UTF8(s STRING)
        RETURNS STRING RETURN CAST(unbase64(s) AS STRING)""",
    # ---- IPv4 functions (Druid SQL) ----
    # Octet regex/split use [.] character classes, not \\. — Spark SQL
    # string literals process backslash escapes, and a bracket class
    # needs none.
    """CREATE OR REPLACE TEMPORARY FUNCTION IPV4_PARSE(s STRING)
        RETURNS BIGINT RETURN CASE WHEN s RLIKE
          '^((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])[.]){3}(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])$'
        THEN CAST(split(s, '[.]')[0] AS BIGINT) * 16777216
           + CAST(split(s, '[.]')[1] AS BIGINT) * 65536
           + CAST(split(s, '[.]')[2] AS BIGINT) * 256
           + CAST(split(s, '[.]')[3] AS BIGINT)
        ELSE NULL END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION IPV4_STRINGIFY(x BIGINT)
        RETURNS STRING RETURN CASE WHEN x BETWEEN 0 AND 4294967295 THEN
          concat(CAST(x DIV 16777216 AS STRING), '.',
                 CAST((x DIV 65536) % 256 AS STRING), '.',
                 CAST((x DIV 256) % 256 AS STRING), '.',
                 CAST(x % 256 AS STRING))
        ELSE NULL END""",
    # IPV4_MATCH(addr, 'a.b.c.d/n'): compare the n-bit prefixes. All
    # values are < 2^32 so arithmetic shiftright is exact. Druid returns
    # FALSE for an unparseable address (not NULL), and a malformed
    # subnet must fail soft: try_cast keeps a missing '/n' from
    # throwing under ANSI mode, and coalesce(..., false) converts the
    # resulting NULL comparison to FALSE.
    """CREATE OR REPLACE TEMPORARY FUNCTION IPV4_MATCH(addr STRING, subnet STRING)
        RETURNS BOOLEAN RETURN COALESCE(
          shiftright(IPV4_PARSE(addr),
                     32 - TRY_CAST(split_part(subnet, '/', 2) AS INT))
          = shiftright(IPV4_PARSE(split_part(subnet, '/', 1)),
                       32 - TRY_CAST(split_part(subnet, '/', 2) AS INT)),
          false)""",
    # ---- Multi-value string functions (Druid SQL MV_*) over ARRAY
    # columns — our representation of Druid multi-value dimensions. ----
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_LENGTH(a ARRAY<STRING>)
        RETURNS INT RETURN size(a)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_CONTAINS(a ARRAY<STRING>, x STRING)
        RETURNS BOOLEAN RETURN array_contains(a, x)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_OVERLAP(a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS BOOLEAN RETURN arrays_overlap(a, b)""",
    # MV_OFFSET is 0-based, MV_ORDINAL 1-based; Druid returns NULL for
    # ALL out-of-range indexes including negative ones. The explicit
    # sign guards matter: try_element_at(a, 0) throws
    # INVALID_INDEX_OF_ZERO (so MV_OFFSET(a,-1) / MV_ORDINAL(a,0) would
    # abort the query), and more-negative indexes would silently index
    # from the END of the array via Spark's negative-index semantics.
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_OFFSET(a ARRAY<STRING>, i INT)
        RETURNS STRING RETURN
          CASE WHEN i < 0 THEN NULL ELSE try_element_at(a, i + 1) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_ORDINAL(a ARRAY<STRING>, i INT)
        RETURNS STRING RETURN
          CASE WHEN i <= 0 THEN NULL ELSE try_element_at(a, i) END""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_TO_STRING(a ARRAY<STRING>, d STRING)
        RETURNS STRING RETURN array_join(a, d)""",
    # Druid's delimiter is a regex; so is Spark's split().
    """CREATE OR REPLACE TEMPORARY FUNCTION STRING_TO_MV(s STRING, d STRING)
        RETURNS ARRAY<STRING> RETURN split(s, d)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_APPEND(a ARRAY<STRING>, x STRING)
        RETURNS ARRAY<STRING> RETURN array_append(a, x)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_PREPEND(x STRING, a ARRAY<STRING>)
        RETURNS ARRAY<STRING> RETURN array_prepend(a, x)""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_CONCAT(a ARRAY<STRING>, b ARRAY<STRING>)
        RETURNS ARRAY<STRING> RETURN concat(a, b)""",
    # MV_SLICE: 0-based [start, end) like Druid; negative/invalid ranges
    # yield NULL (Druid behavior for out-of-range slices).
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_SLICE(a ARRAY<STRING>, s INT, e INT)
        RETURNS ARRAY<STRING> RETURN
          CASE WHEN s < 0 OR e < s THEN NULL
               ELSE slice(a, s + 1, e - s) END""",
    # MV_FILTER_ONLY/NONE preserve order AND duplicates (array_intersect
    # would dedup — wrong for multi-value dimensions).
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_FILTER_ONLY(a ARRAY<STRING>, allow ARRAY<STRING>)
        RETURNS ARRAY<STRING> RETURN filter(a, x -> array_contains(allow, x))""",
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_FILTER_NONE(a ARRAY<STRING>, deny ARRAY<STRING>)
        RETURNS ARRAY<STRING> RETURN filter(a, x -> NOT array_contains(deny, x))""",
    # Identity pair in our representation (multi-value dims ARE arrays).
    """CREATE OR REPLACE TEMPORARY FUNCTION MV_TO_ARRAY(a ARRAY<STRING>)
        RETURNS ARRAY<STRING> RETURN a""",
    """CREATE OR REPLACE TEMPORARY FUNCTION ARRAY_TO_MV(a ARRAY<STRING>)
        RETURNS ARRAY<STRING> RETURN a""",
    # TIME_IN_INTERVAL(t, 'start/end'): ISO interval containment,
    # start-inclusive end-exclusive (Druid SQL). Duration-form endpoints
    # (P1D) are not supported — both endpoints must be timestamps.
    """CREATE OR REPLACE TEMPORARY FUNCTION TIME_IN_INTERVAL(t TIMESTAMP, iv STRING)
        RETURNS BOOLEAN RETURN
          t >= TIME_PARSE(split_part(iv, '/', 1))
          AND t < TIME_PARSE(split_part(iv, '/', 2))""",
]

# Druid SQL AGGREGATE names that are pure renames of Spark aggregates.
# CREATE FUNCTION bodies are scalar-only, so these rewrite at the text
# level (whole word + '(' — see rewrite_druid_sql). Shapes align:
# APPROX_QUANTILE(expr, prob[, k]) ≡ percentile_approx;
# EARLIEST_BY/LATEST_BY(expr, ts) ≡ min_by/max_by;
# BITWISE_*_AGG(expr) ≡ bit_and/bit_or/bit_xor;
# APPROX_COUNT_DISTINCT_DS_* 1-arg form ≡ approx_count_distinct (a
# second lgK argument is NOT an rsd — left to fail loudly).
_AGG_RENAMES = {
    "APPROX_QUANTILE": "percentile_approx",
    "APPROX_QUANTILE_DS": "percentile_approx",
    "APPROX_COUNT_DISTINCT_DS_HLL": "approx_count_distinct",
    "APPROX_COUNT_DISTINCT_DS_THETA": "approx_count_distinct",
    "EARLIEST_BY": "min_by",
    "LATEST_BY": "max_by",
    "BITWISE_AND_AGG": "bit_and",
    "BITWISE_OR_AGG": "bit_or",
    "BITWISE_XOR_AGG": "bit_xor",
}

import re as _re

_AGG_RENAME_RE = _re.compile(
    r"\b(" + "|".join(sorted(_AGG_RENAMES, key=len, reverse=True)) + r")\s*\(",
    _re.IGNORECASE,
)


# Dotted Druid metadata tables → underscore temp views (Spark temp view
# names cannot contain dots); the views themselves are materialized by
# sqlmeta.register_metadata_views. EXPLAIN PLAN FOR is Druid SQL's
# explain spelling; Spark's is plain EXPLAIN.
_META_RENAMES = {
    "INFORMATION_SCHEMA.SCHEMATA": "information_schema_schemata",
    "INFORMATION_SCHEMA.TABLES": "information_schema_tables",
    "INFORMATION_SCHEMA.COLUMNS": "information_schema_columns",
    "SYS.SEGMENTS": "sys_segments",
    "SYS.TASKS": "sys_tasks",
}

_META_RENAME_RE = _re.compile(
    r"\b(" + "|".join(_re.escape(k) for k in _META_RENAMES) + r")\b",
    _re.IGNORECASE,
)

_EXPLAIN_RE = _re.compile(r"^\s*EXPLAIN\s+PLAN\s+FOR\b", _re.IGNORECASE)


def _top_level_arg_count(statement: str, start: int) -> int:
    """Count top-level comma-separated arguments of a call whose open
    paren is at ``start``. Skips nested parens and ``'...'`` string
    literals (with ``''`` escapes). Returns -1 if unbalanced."""
    depth, args, i, n = 1, 1, start + 1, len(statement)
    while i < n:
        c = statement[i]
        if c == "'":
            i += 1
            while i < n:
                if statement[i] == "'":
                    if i + 1 < n and statement[i + 1] == "'":
                        i += 1
                    else:
                        break
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return args
        elif c == "," and depth == 1:
            args += 1
        i += 1
    return -1


_APPROX_Q_RE = _re.compile(
    r"\b(APPROX_QUANTILE(?:_DS)?)\s*\(", _re.IGNORECASE
)


def _literal_spans(statement: str) -> list[tuple[int, int]]:
    """[start, end] index ranges of ``'...'`` string literals (with
    ``''`` escapes), so syntactic checks can skip matches inside them."""
    spans, i, n = [], 0, len(statement)
    while i < n:
        if statement[i] == "'":
            j = i + 1
            while j < n:
                if statement[j] == "'":
                    if j + 1 < n and statement[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j, n - 1)))
            i = j + 1
        else:
            i += 1
    return spans


def rewrite_druid_sql(statement: str) -> str:
    """Rename Druid-SQL-only aggregate functions to their exact Spark
    equivalents, dotted metadata tables to their underscore views, and
    EXPLAIN PLAN FOR to EXPLAIN. Word-boundary matching; a (rare)
    string literal containing one of these shapes would also rewrite —
    documented limitation of text-level renaming."""
    # APPROX_QUANTILE[_DS](expr, prob[, third]): only the 2-arg forms
    # map to percentile_approx. Druid's third argument is a resolution
    # (APPROX_QUANTILE, default 50) or a DataSketches sketch-size k
    # (_DS, ~128) — NOT Spark's accuracy (~10000 default) — so passing
    # it through would silently produce far coarser estimates. Fail
    # loudly instead (like the DS lgK count-distinct case, which is
    # left unrenamed on purpose). Matches inside string literals are
    # skipped — a literal mentioning the function must not reject the
    # query.
    lits = _literal_spans(statement)
    for m in _APPROX_Q_RE.finditer(statement):
        if any(a <= m.start() <= b for a, b in lits):
            continue
        if _top_level_arg_count(statement, m.end() - 1) >= 3:
            raise ValueError(
                f"{m.group(1)} with an explicit third argument is not "
                "translatable: Druid's resolution/sketch-size parameter "
                "is not percentile_approx's accuracy. Use the 2-arg "
                "form, or call percentile_approx(expr, prob, accuracy) "
                "directly with a Spark accuracy value."
            )
    statement = _EXPLAIN_RE.sub("EXPLAIN", statement)
    statement = _META_RENAME_RE.sub(
        lambda m: _META_RENAMES[m.group(1).upper()], statement
    )
    return _AGG_RENAME_RE.sub(
        lambda m: _AGG_RENAMES[m.group(1).upper()] + "(", statement
    )


_REGISTERED: set[str] = set()


def _session_key(spark: SparkSession) -> str:
    # applicationId is unique per session lifetime — immune to CPython
    # id() reuse after a session is stopped and a new one allocated at
    # the same address.
    return spark.sparkContext.applicationId


def register_druid_sql_functions(spark: SparkSession) -> None:
    """Idempotent per-session registration."""
    key = _session_key(spark)
    if key in _REGISTERED:
        return
    for ddl in _DEFS:
        spark.sql(ddl)
    _REGISTERED.add(key)


# Per-lookup size cap for SQL inlining: Druid lookups are replicated
# in-heap maps, so a bounded literal is the faithful analogue; beyond
# the cap the plan literal would bloat — use the broadcast-join path
# (registeredLookup extractionFn) instead.
MAX_INLINE_LOOKUP_ENTRIES = 10_000

_LOOKUP_VERSIONS: dict[tuple[str, str], int] = {}


def _sql_str(v) -> str:
    # Spark SQL string literals process backslash escapes: double them
    # FIRST, then the quotes, or values like C:\path silently corrupt
    # and a trailing backslash breaks the generated DDL.
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def register_lookup_sql_function(spark: SparkSession, catalog) -> None:
    """Druid SQL's LOOKUP(expr, 'name') — registered lookups inlined as
    map literals in a SQL UDF (CASE over the lookup name). Faithful to
    Druid's replicated in-heap maps; re-registered only when the
    catalog's lookup registry changes."""
    version = catalog.lookup_version
    if not hasattr(catalog, "_sqlcompat_uuid"):
        import uuid as _uuid

        catalog._sqlcompat_uuid = str(_uuid.uuid4())
    cache_key = (_session_key(spark), catalog._sqlcompat_uuid)
    if _LOOKUP_VERSIONS.get(cache_key) == version:
        return
    arms = []
    for name, df in catalog.lookups().items():
        rows = df.limit(MAX_INLINE_LOOKUP_ENTRIES + 1).collect()
        if len(rows) > MAX_INLINE_LOOKUP_ENTRIES:
            # Too large to inline — leave it to the broadcast-join path
            # (registeredLookup extractionFn). LOOKUP() returns NULL for
            # this name; unrelated SQL must keep working (raising here
            # would break every engine.sql call once a big lookup is
            # registered).
            import warnings

            warnings.warn(
                f"lookup {name!r} exceeds {MAX_INLINE_LOOKUP_ENTRIES} entries; "
                "not inlined into SQL LOOKUP() — use the registeredLookup "
                "extractionFn (broadcast join) for it",
                stacklevel=2,
            )
            continue
        k_col, v_col = df.columns[0], df.columns[1]
        if rows:
            # last-write-wins dedup: an inlined map literal with duplicate
            # keys throws DUPLICATED_MAP_KEY at evaluation time
            seen: dict = {}
            for r in rows:
                seen[r[k_col]] = r[v_col]
            pairs = ", ".join(
                f"{_sql_str(k)}, {_sql_str(v)}" for k, v in seen.items()
            )
            arms.append(f"WHEN {_sql_str(name)} THEN element_at(map({pairs}), x)")
    body = (
        "CASE n " + " ".join(arms) + " ELSE CAST(NULL AS STRING) END"
        if arms
        else "CAST(NULL AS STRING)"
    )
    # 3rd arg = Druid's replaceMissingValueWith (LOOKUP(expr, name, d)).
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION LOOKUP"
        "(x STRING, n STRING, d STRING DEFAULT NULL) "
        f"RETURNS STRING RETURN COALESCE({body}, d)"
    )
    _LOOKUP_VERSIONS[cache_key] = version
