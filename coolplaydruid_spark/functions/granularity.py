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
# Grains expressed as fixed-length durations (seconds).
_DURATION_GRAINS = {
    "fifteen_minute": 900,
    "thirty_minute": 1800,
}

_PERIOD_RE = re.compile(
    r"^P(?:(?P<years>\d+)Y)?(?:(?P<months>\d+)M)?(?:(?P<weeks>\d+)W)?(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+)S)?)?$"
)

EPOCH = datetime(1970, 1, 1)


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
    """Normalized granularity: either a trunc grain, a fixed duration in
    seconds (with origin), or 'all'/'none'."""

    kind: str  # 'all' | 'none' | 'trunc' | 'duration'
    grain: str | None = None  # for kind='trunc'
    duration_s: int | None = None  # for kind='duration'
    origin_s: int = 0  # epoch-seconds origin for duration buckets
    time_zone: str | None = None  # for kind='trunc' with a period timeZone

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
                local = F.from_utc_timestamp(col, self.time_zone)
                return F.to_utc_timestamp(F.date_trunc(self.grain, local), self.time_zone)
            return F.date_trunc(self.grain, col)
        # duration: origin + floor((t - origin) / d) * d, all in epoch seconds
        t = F.unix_timestamp(col)
        d = F.lit(self.duration_s)
        o = F.lit(self.origin_s)
        return F.timestamp_seconds(o + F.floor((t - o) / d) * d)

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
            e = int(ts.timestamp()) if ts.tzinfo else int(
                ts.replace(tzinfo=timezone.utc).timestamp()
            )
            b = self.origin_s + ((e - self.origin_s) // self.duration_s) * self.duration_s
            return datetime.fromtimestamp(b, tz=timezone.utc).replace(tzinfo=None)
        if self.time_zone:
            return self._local_to_utc(_trunc_grain(self._utc_to_local(ts), self.grain))
        return _trunc_grain(ts, self.grain)

    def next_bucket_py(self, bucket: datetime) -> datetime:
        """Start of the bucket after `bucket` (driver-side, for spines).
        With a time_zone, the step happens in local wall-clock time (a
        'day' in a DST zone can be 23 or 25 UTC hours)."""
        if self.kind == "duration":
            return bucket + timedelta(seconds=self.duration_s)
        if self.time_zone:
            return self._local_to_utc(_step_grain(self._utc_to_local(bucket), self.grain))
        return _step_grain(bucket, self.grain)

    def _utc_to_local(self, ts: datetime) -> datetime:
        from zoneinfo import ZoneInfo

        return (
            ts.replace(tzinfo=timezone.utc)
            .astimezone(ZoneInfo(self.time_zone))
            .replace(tzinfo=None)
        )

    def _local_to_utc(self, local: datetime) -> datetime:
        from zoneinfo import ZoneInfo

        return (
            local.replace(tzinfo=ZoneInfo(self.time_zone))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)
        )

    def buckets_in(self, start: datetime, end: datetime) -> list[datetime]:
        """All bucket starts for buckets intersecting [start, end) —
        the zero-fill spine (query/query-timeseries.md:74-95: every bucket
        inside the queried intervals appears in the result)."""
        if self.kind in ("all", "none"):
            raise ValueError("spine only defined for bucketing granularities")
        out = []
        b = self.bucket_py(start)
        while b < end:
            out.append(b)
            b = self.next_bucket_py(b)
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
            return Granularity(kind="duration", duration_s=_DURATION_GRAINS[s])
        raise ValueError(f"unknown granularity {spec!r}")
    if isinstance(spec, dict):
        gtype = spec.get("type")
        if gtype == "duration":
            ms = int(spec["duration"])
            if ms % 1000:
                raise ValueError("sub-second duration granularities unsupported")
            origin_s = 0
            if spec.get("origin"):
                origin_s = int(_parse_iso(spec["origin"]).timestamp())
            return Granularity(kind="duration", duration_s=ms // 1000, origin_s=origin_s)
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
    if len(parts) == 1:
        (unit, n), = parts.items()
        if (unit, n) in single:
            return Granularity(kind="trunc", grain=single[(unit, n)], time_zone=tz)
    # Any other time-based period → fixed duration (calendar-based
    # multi-unit periods beyond P3M are out of scope).
    if "years" in parts or "months" in parts:
        raise ValueError(f"calendar period {period!r} unsupported (use year/quarter/month)")
    seconds = (
        parts.get("weeks", 0) * 604800
        + parts.get("days", 0) * 86400
        + parts.get("hours", 0) * 3600
        + parts.get("minutes", 0) * 60
        + parts.get("seconds", 0)
    )
    origin_s = 0
    if spec.get("origin"):
        origin_s = int(_parse_iso(spec["origin"]).timestamp())
    return Granularity(kind="duration", duration_s=seconds, origin_s=origin_s)


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
