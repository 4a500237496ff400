"""Granularity fuzzer (functions/granularity.py): the zero-fill spine
joins driver-side `bucket_py` starts against JVM-side `bucket`
expressions — if they EVER disagree the left join silently drops every
real aggregate row for that bucket, so their equivalence is a
correctness-critical contract. This fuzzes random granularity specs
(simple grains, durations with origins, fixed/calendar periods, DST
timezones) over timestamps that include DST transitions, month ends,
leap day, and a pre-1970 instant, asserting:

  1. bucket() (JVM, batched one Spark job per ~20 specs) equals
     bucket_py() (driver) on every row;
  2. bucket invariants: bucket(t) <= t < next_bucket(bucket(t)) and
     idempotence bucket(bucket(t)) == bucket(t).

Reproduce: FUZZ_SEED=<seed> pytest <this file>.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.functions.granularity import parse_granularity

SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
N_SPECS = int(os.environ.get("FUZZ_N", "120"))
BATCH = 20

TS = [
    dt.datetime(2024, 3, 15, 13, 47, 21, 500000),
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 3, 10, 6, 30, 0),    # DST spring-forward (NY)
    dt.datetime(2024, 11, 3, 5, 30, 0),    # DST fall-back (NY)
    dt.datetime(2024, 2, 29, 8, 15, 0),    # leap day
    dt.datetime(2024, 12, 31, 23, 59, 59),
    dt.datetime(2024, 7, 1, 0, 0, 0),
    dt.datetime(1965, 5, 15, 7, 3, 2),     # pre-1970: negative epoch
    dt.datetime(2024, 6, 30, 23, 0, 1),
    dt.datetime(2024, 10, 27, 1, 30, 0),   # EU DST fall-back morning
]

TZS = [None, "America/New_York", "Asia/Tokyo", "Europe/Berlin",
       "America/Los_Angeles"]


def gen_gran(rng: random.Random):
    k = rng.choice(["simple", "duration", "period_fixed", "period_cal",
                    "period_origin"])
    if k == "simple":
        return rng.choice([
            "second", "minute", "hour", "day", "week", "month",
            "quarter", "year", "fifteen_minute", "thirty_minute",
        ])
    if k == "duration":
        ms = rng.choice([1000, 60000, 90000, 777000, 900000, 3600000,
                         21600000, 43200000, 86400000])
        spec = {"type": "duration", "duration": ms}
        if rng.random() < 0.4:
            spec["origin"] = rng.choice([
                "2024-01-01T00:17:00Z", "2020-06-15T07:00:00Z",
                "1999-12-31T23:59:59.500Z",
            ])
        return spec
    if k == "period_fixed":
        p = rng.choice(["P1D", "PT1H", "PT1M", "P1W", "P2D", "PT6H",
                        "PT90M", "PT30S", "P2DT12H"])
        spec = {"type": "period", "period": p}
        # mixed day+time periods reject a timeZone (fail-loudly
        # boundary: Joda compound truncation is not expressible)
        tz = None if p == "P2DT12H" else rng.choice(TZS)
        if tz:
            spec["timeZone"] = tz
        return spec
    if k == "period_cal":
        p = rng.choice(["P1M", "P2M", "P3M", "P6M", "P1Y", "P1Y6M",
                        "P2Y"])
        spec = {"type": "period", "period": p}
        tz = rng.choice(TZS)
        if tz:
            spec["timeZone"] = tz
        return spec
    # fixed period with origin (shifts bucket phase)
    p = rng.choice(["PT1H", "PT15M", "P1D"])
    return {"type": "period", "period": p,
            "origin": rng.choice(["2024-01-01T00:30:00Z",
                                  "2024-02-03T04:05:06Z"])}


@pytest.fixture(scope="module")
def ts_frame(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(TS)],
                                 "id long, t timestamp")


def test_fuzz_granularity_jvm_matches_driver(spark, ts_frame):
    rng = random.Random(SEED)
    specs = [gen_gran(rng) for _ in range(N_SPECS)]
    failures = []
    for start in range(0, len(specs), BATCH):
        batch = specs[start:start + BATCH]
        grans = [parse_granularity(s) for s in batch]
        cols = [g.bucket(F.col("t")).alias(f"b{j}")
                for j, g in enumerate(grans)]
        rows = ts_frame.select("id", *cols).orderBy("id").collect()
        for row in rows:
            t = TS[row["id"]]
            for j, (spec, g) in enumerate(zip(batch, grans)):
                jvm = row[f"b{j}"]
                drv = g.bucket_py(t)
                if jvm != drv:
                    failures.append(
                        (start + j, spec,
                         f"t={t}: jvm={jvm} driver={drv}"))
    if failures:
        msg = [f"{len(failures)} jvm/driver bucket divergences "
               f"(seed={SEED}); first 5:"]
        for idx, spec, err in failures[:5]:
            msg.append(f"--- spec #{idx} {spec!r} ---\n {err}")
        raise AssertionError("\n".join(msg))


def test_dst_repeated_hour_buckets_stay_distinct():
    """Pinned fuzz find: hour/minute truncation with a tz must be
    OFFSET-PRESERVING (Joda precise-field roundFloor). Europe/Berlin
    falls back 2024-10-27 03:00 CEST -> 02:00 CET, so local 02:xx
    occurs twice; a wall-clock round trip collapsed the second
    occurrence into the first (bucketing 01:30Z an hour early), and
    wall-clock spine stepping skipped the repeated hour's bucket —
    whose aggregate row the zero-fill left join would then drop."""
    g = parse_granularity({"type": "period", "period": "PT1H",
                           "timeZone": "Europe/Berlin"})
    first = dt.datetime(2024, 10, 27, 0, 30)   # 02:30 CEST
    second = dt.datetime(2024, 10, 27, 1, 30)  # 02:30 CET (repeat)
    assert g.bucket_py(first) == dt.datetime(2024, 10, 27, 0, 0)
    assert g.bucket_py(second) == dt.datetime(2024, 10, 27, 1, 0)
    spine = g.buckets_in(dt.datetime(2024, 10, 26, 22, 0),
                         dt.datetime(2024, 10, 27, 4, 0))
    # 6 UTC hours -> 6 buckets, including BOTH 02:00-wall occurrences
    assert spine == [dt.datetime(2024, 10, 26, 22 + i, 0) if 22 + i < 24
                     else dt.datetime(2024, 10, 27, i - 2, 0)
                     for i in range(6)]


def test_fixed_period_tz_anchors_at_local_1970():
    """Review-driven: Druid's default period-granularity origin is
    1970-01-01T00:00 IN THE QUERY TIMEZONE. PT6H@America/New_York
    buckets at 05/11/17/23Z (NY was UTC-5 in Jan 1970), not
    00/06/12/18Z; previously the tz was silently dropped for
    multi-unit fixed periods."""
    g = parse_granularity({"type": "period", "period": "PT6H",
                           "timeZone": "America/New_York"})
    assert g.bucket_py(dt.datetime(2024, 1, 15, 7, 0)) == dt.datetime(
        2024, 1, 15, 5, 0)
    assert g.bucket_py(dt.datetime(2024, 1, 15, 4, 59)) == dt.datetime(
        2024, 1, 14, 23, 0)
    # day-bearing periods live on the local wall-clock timeline: the
    # P2D bucket over the NY spring-forward day spans 47 real hours
    g2 = parse_granularity({"type": "period", "period": "P2D",
                            "timeZone": "America/New_York"})
    b = g2.bucket_py(dt.datetime(2024, 3, 10, 12, 0))
    # 2024-03-10 is an even local-day index -> starts its own bucket,
    # at local midnight EST
    assert b == dt.datetime(2024, 3, 10, 5, 0)
    nxt = g2.next_bucket_py(b)
    assert nxt == dt.datetime(2024, 3, 12, 4, 0)  # midnight 3/12 EDT
    # the bucket contains the spring-forward: 47 real hours
    assert (nxt - b) == dt.timedelta(hours=47)
    # an explicit origin still wins over the tz default
    g3 = parse_granularity({"type": "period", "period": "PT6H",
                            "timeZone": "America/New_York",
                            "origin": "2024-01-01T01:00:00Z"})
    assert g3.bucket_py(dt.datetime(2024, 1, 15, 7, 30)) == dt.datetime(
        2024, 1, 15, 7, 0)
    # P1D + tz + origin anchors the grid at the ORIGIN'S LOCAL WALL
    # TIME and tracks DST (review-found: the duration path would pin it
    # to fixed UTC): origin 05:00Z = local midnight EST, and after the
    # 2024-03-10 spring-forward the daily boundary moves to 04:00Z
    g4 = parse_granularity({"type": "period", "period": "P1D",
                            "timeZone": "America/New_York",
                            "origin": "2024-01-01T05:00:00Z"})
    assert g4.bucket_py(dt.datetime(2024, 2, 1, 12, 0)) == dt.datetime(
        2024, 2, 1, 5, 0)
    assert g4.bucket_py(dt.datetime(2024, 3, 20, 12, 0)) == dt.datetime(
        2024, 3, 20, 4, 0)
    # mixed day+time periods with a tz fail loudly (Joda compound
    # truncation is not expressible as a fixed or wall-clock floor)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mixed day\\+time"):
        parse_granularity({"type": "period", "period": "P1DT12H",
                           "timeZone": "America/New_York"})


def test_fuzz_granularity_invariants():
    rng = random.Random(SEED + 1)
    for _ in range(N_SPECS):
        spec = gen_gran(rng)
        g = parse_granularity(spec)
        for t in TS:
            b = g.bucket_py(t)
            assert b <= t, (spec, t, b)
            assert g.bucket_py(b) == b, ("not idempotent", spec, t, b)
            nxt = g.next_bucket_py(b)
            assert t < nxt, (spec, t, b, nxt)
            # the next bucket starts where this one ends
            assert g.bucket_py(nxt) == nxt, (spec, t, nxt)
