"""Granularities — Druid's query-time time bucketing.

Reference: component declared at query/query-module-overview.md:44 and
TOC.md:33; ``"granularity": "day"`` with exact bucketing + zero-fill
semantics at query/query-timeseries.md:12,58,74-95. The full v0.12 set is
public Druid knowledge: simple grains (``all none second minute
fifteen_minute thirty_minute hour day week month quarter year``), plus
``{"type": "duration", "duration": <ms>, "origin"?}`` and
``{"type": "period", "period": <ISO8601>, "timeZone"?, "origin"?}``.

Spark mapping: simple grains → ``F.date_trunc`` (JVM-side, codegen'd, keeps
the bucket expression inside WholeStageCodegen); duration → epoch
arithmetic; period with timeZone → trunc in the target zone via
``from_utc_timestamp``/``to_utc_timestamp``. Bucketing never leaves the JVM.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

# Simple grains Spark's date_trunc handles directly (identical bucket
# boundaries in DuckDB's date_trunc — used by the oracle tests).
_TRUNC_GRAINS = {
    "second": "second",
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "week": "week",  # ISO week, Monday start — same in Druid/Spark/DuckDB
    "month": "month",
    "quarter": "quarter",
    "year": "year",
}
# Grains expressed as fixed-length durations (milliseconds).
_DURATION_GRAINS = {
    "fifteen_minute": 900_000,
    "thirty_minute": 1_800_000,
}

_PERIOD_RE = re.compile(
    r"^P(?:(?P<years>\d+)Y)?(?:(?P<months>\d+)M)?(?:(?P<weeks>\d+)W)?(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+)S)?)?$"
)

EPOCH = datetime(1970, 1, 1)

# Sub-day grains are PRECISE fields (fixed length): tz truncation is
# offset-preserving arithmetic, not a wall-clock round trip (see
# Granularity.bucket). Hour is included because offsets can be
# fractional-hour (+05:30, +05:45).
_PRECISE_GRAIN_MS = {"second": 1000, "minute": 60_000, "hour": 3_600_000}


def _trunc_grain(ts: datetime, g: str) -> datetime:
    """Wall-clock truncation of a naive datetime to a grain start."""
    if g == "second":
        return ts.replace(microsecond=0)
    if g == "minute":
        return ts.replace(second=0, microsecond=0)
    if g == "hour":
        return ts.replace(minute=0, second=0, microsecond=0)
    if g == "day":
        return ts.replace(hour=0, minute=0, second=0, microsecond=0)
    if g == "week":
        day = ts.replace(hour=0, minute=0, second=0, microsecond=0)
        return day - timedelta(days=day.weekday())
    if g == "month":
        return ts.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if g == "quarter":
        month = 3 * ((ts.month - 1) // 3) + 1
        return ts.replace(month=month, day=1, hour=0, minute=0, second=0, microsecond=0)
    if g == "year":
        return ts.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    raise ValueError(f"unknown grain {g!r}")


def _step_grain(bucket: datetime, g: str) -> datetime:
    """Wall-clock start of the grain bucket after `bucket` (naive)."""
    if g == "second":
        return bucket + timedelta(seconds=1)
    if g == "minute":
        return bucket + timedelta(minutes=1)
    if g == "hour":
        return bucket + timedelta(hours=1)
    if g == "day":
        return bucket + timedelta(days=1)
    if g == "week":
        return bucket + timedelta(days=7)
    if g == "month":
        y, m = bucket.year + (bucket.month // 12), bucket.month % 12 + 1
        return bucket.replace(year=y, month=m)
    if g == "quarter":
        m0 = bucket.month + 3
        y, m = bucket.year + (m0 - 1) // 12, (m0 - 1) % 12 + 1
        return bucket.replace(year=y, month=m)
    if g == "year":
        return bucket.replace(year=bucket.year + 1)
    raise ValueError(f"cannot step grain {g!r}")


@dataclass(frozen=True)
class Granularity:
    """Normalized granularity: a trunc grain, a fixed duration in
    milliseconds (with origin), a multi-month calendar period, or
    'all'/'none'."""

    kind: str  # 'all' | 'none' | 'trunc' | 'duration' | 'wallduration' | 'months'
    grain: str | None = None  # for kind='trunc'
    duration_ms: int | None = None  # for kind='duration'/'wallduration'
    origin_ms: int = 0  # epoch-millis origin for duration buckets
    n_months: int | None = None  # for kind='months' (P2M, P1Y6M, ...)
    time_zone: str | None = None  # tz for 'trunc'/'months'/'wallduration'

    def bucket(self, col: Column) -> Column:
        """Bucket-start expression for a timestamp column."""
        if self.kind == "all":
            # Single bucket; Druid keys it by the interval start — planner
            # overrides with the interval start, this is the fallback.
            return F.to_timestamp(F.lit("1970-01-01 00:00:00"))
        if self.kind == "none":
            return col
        if self.kind == "trunc":
            if self.time_zone:
                if self.grain in _PRECISE_GRAIN_MS:
                    # Precise (sub-day) fields truncate OFFSET-
                    # PRESERVINGLY, like Joda's ZonedChronology
                    # roundFloor (Druid's engine): shift by the
                    # instant's own utc-offset, floor, shift back. A
                    # wall-clock round trip would collapse the DST
                    # repeated hour into its first occurrence —
                    # fuzz-found: PT1M@Europe/Berlin bucketed
                    # 2024-10-27T01:30Z an hour early.
                    g = F.lit(_PRECISE_GRAIN_MS[self.grain])
                    t_ms = F.unix_millis(col.cast("timestamp_ltz"))
                    off = (
                        F.unix_millis(
                            F.from_utc_timestamp(col, self.time_zone)
                            .cast("timestamp_ltz")
                        )
                        - t_ms
                    )
                    lm = t_ms + off
                    return F.timestamp_millis(lm - F.pmod(lm, g) - off)
                local = F.from_utc_timestamp(col, self.time_zone)
                return F.to_utc_timestamp(F.date_trunc(self.grain, local), self.time_zone)
            return F.date_trunc(self.grain, col)
        if self.kind == "months":
            # Calendar multi-month period (P2M, P1Y6M...): month index
            # since epoch floored to a multiple of n, in the target
            # zone's wall clock. pmod keeps pre-1970 months flooring
            # toward -inf. Pure integer codegen'd arithmetic.
            local = F.from_utc_timestamp(col, self.time_zone) if self.time_zone else col
            midx = (F.year(local) - F.lit(1970)) * 12 + F.month(local) - 1
            bidx = midx - F.pmod(midx, F.lit(self.n_months))
            y = F.lit(1970) + F.floor(bidx / 12).cast("int")
            m = F.pmod(bidx, F.lit(12)).cast("int") + 1
            start = F.make_date(y, m, F.lit(1)).cast("timestamp")
            return F.to_utc_timestamp(start, self.time_zone) if self.time_zone else start
        if self.kind == "wallduration":
            # Day/week-bearing fixed periods with a timeZone (P2D@NY):
            # Joda adds imprecise fields in LOCAL time, so buckets live
            # on the local wall-clock timeline anchored at local
            # midnight 1970 — floor the wall-clock millis, then convert
            # back (earlier offset at DST overlaps, like Joda).
            wall = F.unix_millis(
                F.from_utc_timestamp(col, self.time_zone).cast("timestamp_ltz")
            )
            d = F.lit(self.duration_ms)
            o = F.lit(self.origin_ms)  # origin's LOCAL wall millis
            delta = wall - o
            floored = F.timestamp_millis(o + delta - F.pmod(delta, d))
            return F.to_utc_timestamp(floored, self.time_zone)
        # duration: origin + floor((t - origin) / d) * d, all in epoch
        # millis and all integral (pmod implements the floor), so
        # sub-second durations bucket exactly. The ltz cast is an
        # identity under the UTC session zone but required: unix_millis
        # rejects TIMESTAMP_NTZ inputs.
        t = F.unix_millis(col.cast("timestamp_ltz"))
        d = F.lit(self.duration_ms)
        o = F.lit(self.origin_ms)
        delta = t - o
        return F.timestamp_millis(o + delta - F.pmod(delta, d))

    def bucket_py(self, ts: datetime) -> datetime:
        """Driver-side bucketing (for zero-fill spine generation; spine
        cardinality = #buckets, always tiny relative to data).

        Mirrors ``bucket()`` exactly — including time_zone: a period
        granularity with a timeZone truncates in the target zone's wall
        clock and the result converts back to UTC, so spine bucket starts
        line up with the Spark-side aggregate buckets (otherwise the
        zero-fill left join would drop every real aggregate row)."""
        if self.kind == "all":
            return EPOCH
        if self.kind == "none":
            return ts
        if self.kind == "duration":
            naive = ts.astimezone(timezone.utc).replace(tzinfo=None) if ts.tzinfo else ts
            e = (naive - EPOCH) // timedelta(milliseconds=1)
            b = self.origin_ms + ((e - self.origin_ms) // self.duration_ms) * self.duration_ms
            return EPOCH + timedelta(milliseconds=b)
        if self.kind == "wallduration":
            local = self._utc_to_local(ts)
            e = (local - EPOCH) // timedelta(milliseconds=1)
            o = self.origin_ms  # origin's LOCAL wall millis
            b = o + ((e - o) // self.duration_ms) * self.duration_ms
            return self._local_to_utc(EPOCH + timedelta(milliseconds=b))
        if self.kind == "months":
            local = self._utc_to_local(ts) if self.time_zone else ts
            midx = (local.year - 1970) * 12 + local.month - 1
            bidx = midx - (midx % self.n_months)
            start = datetime(1970 + bidx // 12, bidx % 12 + 1, 1)
            return self._local_to_utc(start) if self.time_zone else start
        if self.time_zone:
            if self.grain in _PRECISE_GRAIN_MS:
                # offset-preserving, mirroring bucket() exactly (the
                # zero-fill spine must produce the same keys the JVM
                # aggregation does — including BOTH occurrences of a
                # DST repeated hour)
                off = self._utc_offset(ts)
                g = timedelta(milliseconds=_PRECISE_GRAIN_MS[self.grain])
                lm = (ts - EPOCH) + off
                return EPOCH + (lm - (lm % g)) - off
            return self._local_to_utc(_trunc_grain(self._utc_to_local(ts), self.grain))
        return _trunc_grain(ts, self.grain)

    def next_bucket_py(self, bucket: datetime) -> datetime:
        """Start of the bucket after `bucket` (driver-side, for spines).
        With a time_zone, the step happens in local wall-clock time (a
        'day' in a DST zone can be 23 or 25 UTC hours)."""
        if self.kind == "duration":
            return bucket + timedelta(milliseconds=self.duration_ms)
        if self.kind == "wallduration":
            return self._local_to_utc(
                self._utc_to_local(bucket)
                + timedelta(milliseconds=self.duration_ms)
            )
        if self.kind == "months":
            local = self._utc_to_local(bucket) if self.time_zone else bucket
            midx = (local.year - 1970) * 12 + local.month - 1 + self.n_months
            nxt = datetime(1970 + midx // 12, midx % 12 + 1, 1)
            return self._local_to_utc(nxt) if self.time_zone else nxt
        if self.time_zone:
            if self.grain in _PRECISE_GRAIN_MS:
                # precise fields step by their fixed duration — wall-
                # clock stepping would skip the second occurrence of a
                # DST repeated hour and the spine would drop that
                # bucket's aggregate row
                return bucket + timedelta(
                    milliseconds=_PRECISE_GRAIN_MS[self.grain])
            return self._local_to_utc(_step_grain(self._utc_to_local(bucket), self.grain))
        return _step_grain(bucket, self.grain)

    def _utc_to_local(self, ts: datetime) -> datetime:
        from zoneinfo import ZoneInfo

        return (
            ts.replace(tzinfo=timezone.utc)
            .astimezone(ZoneInfo(self.time_zone))
            .replace(tzinfo=None)
        )

    def _utc_offset(self, ts: datetime) -> timedelta:
        from zoneinfo import ZoneInfo

        return (
            ts.replace(tzinfo=timezone.utc)
            .astimezone(ZoneInfo(self.time_zone))
            .utcoffset()
        )

    def _local_to_utc(self, local: datetime) -> datetime:
        from zoneinfo import ZoneInfo

        return (
            local.replace(tzinfo=ZoneInfo(self.time_zone))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)
        )

    # Default cap on zero-fill spine cardinality: the spine is built on
    # the driver, one datetime per bucket — a sub-second duration over a
    # wide interval without skipEmptyBuckets would otherwise loop for
    # minutes and allocate GBs before the query even plans. Raises the
    # Druid "Resource limit exceeded" envelope (errors.py), matching
    # Druid's own resource-guard behavior for over-limit queries;
    # per-query override via context.maxZeroFillBuckets.
    MAX_SPINE_BUCKETS = 1_000_000

    def buckets_in(
        self, start: datetime, end: datetime, max_buckets: int | None = None
    ) -> list[datetime]:
        """All bucket starts for buckets intersecting [start, end) —
        the zero-fill spine (query/query-timeseries.md:74-95: every bucket
        inside the queried intervals appears in the result)."""
        from coolplaydruid_spark.errors import ResourceLimitExceededError

        cap = self.MAX_SPINE_BUCKETS if max_buckets is None else int(max_buckets)
        if self.kind in ("all", "none"):
            raise ValueError("spine only defined for bucketing granularities")
        if self.kind in ("duration", "wallduration"):
            est = ((end - start).total_seconds() * 1000) / self.duration_ms
            if est > cap:
                raise ResourceLimitExceededError(
                    f"zero-fill spine would have ~{int(est)} buckets "
                    f"(cap {cap}); narrow the interval, coarsen the "
                    "granularity, set skipEmptyBuckets, or raise "
                    "context.maxZeroFillBuckets"
                )
        out = []
        b = self.bucket_py(start)
        while b < end:
            out.append(b)
            b = self.next_bucket_py(b)
            if len(out) > cap:
                raise ResourceLimitExceededError(
                    f"zero-fill spine exceeds {cap} buckets; narrow the "
                    "interval, coarsen the granularity, set "
                    "skipEmptyBuckets, or raise context.maxZeroFillBuckets"
                )
        return out


def parse_granularity(spec) -> Granularity:
    """Parse a Druid granularity spec: a simple-grain string, a
    ``{"type": "duration"}`` object, or a ``{"type": "period"}`` object."""
    if isinstance(spec, Granularity):
        return spec
    if spec is None:
        return Granularity(kind="all")
    if isinstance(spec, str):
        s = spec.lower()
        if s == "all":
            return Granularity(kind="all")
        if s == "none":
            return Granularity(kind="none")
        if s in _TRUNC_GRAINS:
            return Granularity(kind="trunc", grain=_TRUNC_GRAINS[s])
        if s in _DURATION_GRAINS:
            return Granularity(kind="duration", duration_ms=_DURATION_GRAINS[s])
        raise ValueError(f"unknown granularity {spec!r}")
    if isinstance(spec, dict):
        gtype = spec.get("type")
        if gtype == "duration":
            ms = int(spec["duration"])
            if ms <= 0:
                raise ValueError("duration must be positive milliseconds")
            return Granularity(kind="duration", duration_ms=ms,
                               origin_ms=_origin_ms(spec))
        if gtype == "period":
            return _parse_period(spec)
        raise ValueError(f"unknown granularity type {gtype!r}")
    raise TypeError(f"bad granularity spec: {spec!r}")


def _parse_period(spec: dict) -> Granularity:
    period = spec["period"]
    tz = spec.get("timeZone")
    m = _PERIOD_RE.match(period)
    if not m:
        raise ValueError(f"bad ISO period {period!r}")
    parts = {k: int(v) for k, v in m.groupdict().items() if v}
    # Map the common single-unit periods onto trunc grains (origin-less).
    single = {
        ("years", 1): "year",
        ("months", 3): "quarter",
        ("months", 1): "month",
        ("weeks", 1): "week",
        ("days", 1): "day",
        ("hours", 1): "hour",
        ("minutes", 1): "minute",
        ("seconds", 1): "second",
    }
    has_origin = bool(spec.get("origin"))
    if has_origin and ("years" in parts or "months" in parts):
        raise ValueError(
            f"calendar period {period!r} with origin is unsupported "
            "(calendar buckets are epoch-anchored; use a fixed-length "
            "period for origin-shifted buckets)"
        )
    if len(parts) == 1 and not has_origin:
        # Single-unit periods map to trunc grains — but an origin SHIFTS
        # the bucket phase (PT1H origin :30 buckets at half-hours), so
        # origin'd fixed-length periods take the duration path below
        # instead of an origin-less truncation.
        (unit, n), = parts.items()
        if (unit, n) in single:
            return Granularity(kind="trunc", grain=single[(unit, n)], time_zone=tz)
    if "years" in parts or "months" in parts:
        # Pure calendar periods (P2M, P6M, P2Y, P1Y6M): month-index
        # arithmetic, origin-less (epoch-anchored, like Druid's default).
        if set(parts) - {"years", "months"}:
            raise ValueError(
                f"mixed calendar+time period {period!r} unsupported "
                "(use a pure month/year period or a fixed-length one)"
            )
        n = parts.get("years", 0) * 12 + parts.get("months", 0)
        if n <= 0:
            raise ValueError(f"period {period!r} must span at least one month")
        return Granularity(kind="months", n_months=n, time_zone=tz)
    ms = 1000 * (
        parts.get("weeks", 0) * 604800
        + parts.get("days", 0) * 86400
        + parts.get("hours", 0) * 3600
        + parts.get("minutes", 0) * 60
        + parts.get("seconds", 0)
    )
    if ms <= 0:
        raise ValueError(f"period {period!r} must have positive length")
    if tz is not None:
        # Druid's default origin is 1970-01-01T00:00:00 IN THE QUERY
        # TIMEZONE (PeriodGranularity: withZoneRetainFields), not the
        # UTC epoch — a PT6H@America/New_York bucket boundary falls at
        # 05:00Z, not 00:00Z.
        if "days" in parts or "weeks" in parts:
            if set(parts) - {"days", "weeks"}:
                # Joda's compound truncation adds day fields locally
                # but hour/minute fields on the instant timeline —
                # a P1DT12H@tz grid cannot be expressed as either a
                # fixed-duration or a wall-clock floor. Fail loudly
                # rather than bucket rows one DST-hour off.
                raise ValueError(
                    f"mixed day+time period {period!r} with a timeZone "
                    "is unsupported (use a pure day/week period, a "
                    "time-only period, or drop the timeZone)"
                )
            # imprecise fields: Joda adds them in LOCAL time, so the
            # buckets live on the wall-clock timeline (a P2D bucket
            # containing a DST change spans 47 or 49 real hours). An
            # explicit origin anchors the grid at ITS local wall time.
            wall_origin = 0
            if has_origin:
                from zoneinfo import ZoneInfo

                o = _parse_iso(spec["origin"]).astimezone(
                    ZoneInfo(tz)).replace(tzinfo=None)
                wall_origin = (o - EPOCH) // timedelta(milliseconds=1)
            return Granularity(kind="wallduration", duration_ms=ms,
                               origin_ms=wall_origin, time_zone=tz)
        if not has_origin:
            return Granularity(kind="duration", duration_ms=ms,
                               origin_ms=_tz_epoch_origin_ms(tz))
        # precise fields with an explicit origin: instant-anchored at
        # the origin (Joda precise-field arithmetic), tz irrelevant
    return Granularity(kind="duration", duration_ms=ms, origin_ms=_origin_ms(spec))


def _tz_epoch_origin_ms(tz: str) -> int:
    """Epoch-millis of 1970-01-01T00:00:00 local time in ``tz`` — the
    default anchor for fixed-length period granularities with a
    timeZone (NY was UTC-5 in Jan 1970 → origin 1970-01-01T05:00Z)."""
    from zoneinfo import ZoneInfo

    local = datetime(1970, 1, 1, tzinfo=ZoneInfo(tz))
    return int(local.timestamp() * 1000)


def _origin_ms(spec: dict) -> int:
    if not spec.get("origin"):
        return 0
    # Integer epoch-millis: float .timestamp()*1000 truncates 1 ms low
    # for many fractional-second origins (e.g. ...00.021Z).
    o = _parse_iso(spec["origin"])
    return (o - EPOCH.replace(tzinfo=timezone.utc)) // timedelta(milliseconds=1)


def _parse_iso(s: str) -> datetime:
    s = s.replace("Z", "+00:00")
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt


def parse_interval(interval: str) -> tuple[datetime, datetime]:
    """Parse one ISO-8601 interval ``start/end`` (half-open), as used by the
    required ``intervals`` field (query/query-timeseries.md:40,51)."""
    a, b = interval.split("/")
    start = _parse_iso(a).astimezone(timezone.utc).replace(tzinfo=None)
    end = _parse_iso(b).astimezone(timezone.utc).replace(tzinfo=None)
    return start, end


def intervals_predicate(intervals: list[str], col: Column) -> Column:
    """Compile the intervals list to an OR of half-open range predicates on
    the time column. These predicates reach the Parquet scan (partition
    pruning + row-group min/max) — the Spark analogue of Druid's
    interval→segment pruning (query/query-internal-procedure.md:7)."""
    pred = None
    for iv in intervals:
        start, end = parse_interval(iv)
        p = (col >= F.lit(start)) & (col < F.lit(end))
        pred = p if pred is None else (pred | p)
    if pred is None:
        raise ValueError("intervals must be non-empty")
    return pred
