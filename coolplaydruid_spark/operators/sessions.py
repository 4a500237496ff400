"""Event-stream behavioral operators: sessionization, as-of join,
cohort retention, ordered funnels.

The reference's event model (a timestamped fact table queried by
interval, `query/query-timeseries.md:40,51-52`) stops at per-bucket
aggregation; these operators add the sequence-aware analytics a
training-data / product-analytics pipeline layers on top of the same
table.

Scale design notes (100 TB / 1000 executors):
 - Every operator shuffles ONCE on the entity key (`user_id`) and then
   runs window functions *within* a partition — the canonical Spark
   sequence-analytics shape. Entity keys are high-cardinality and
   uniformly distributed, so the shuffle balances; one pathological
   entity (a bot with 10^9 events) is the documented skew case and is
   handled upstream by event-count capping, not by the operator.
 - Timestamps compare as exact integer microseconds (`unix_micros`) —
   no float rounding at session-gap boundaries, and the DuckDB oracle
   (`epoch_us`) matches bit-for-bit.
 - The as-of join is the union+last_value formulation: ONE shuffle of
   both inputs keyed on the join key, no time-range blow-up, no
   broadcast requirement on either side. This is the plan a range join
   would only reach with a perfect optimizer; here it is the plan by
   construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(col) -> Column:
    """Exact integer microseconds for a TIMESTAMP or TIMESTAMP_NTZ column
    (the session timezone is UTC, so the NTZ→TZ cast is the identity);
    DuckDB's epoch_us() matches bit-for-bit."""
    return F.unix_micros(F.col(col).cast("timestamp") if isinstance(col, str) else col.cast("timestamp"))


def sessionize(
    df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Assign session ordinals: a new session starts when the gap since
    the user's previous event exceeds ``gap_seconds``. Adds
    ``session_seq`` (1-based per-user session ordinal) and ``session_id``
    (globally unique ``user:seq`` string).

    One shuffle (hash on ``user_col``); the lag/cumsum windows run
    within the shuffled partition with no further exchange.
    """
    us = _us(ts_col)
    w = Window.partitionBy(user_col).orderBy(us)
    gap_us = int(gap_seconds) * 1_000_000
    is_new = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
    ).otherwise(0)
    seq = F.sum(is_new).over(
        Window.partitionBy(user_col).orderBy(us).rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("session_seq", seq.cast("long")).withColumn(
        "session_id", F.concat_ws(":", F.col(user_col).cast("string"), F.col("session_seq"))
    )


def session_stats(
    df: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-session rollup: start/end, event count, exact duration in
    seconds (microsecond-accurate, rounded to 6dp). Reuses the
    sessionize shuffle — the groupBy keys are a superset of the window
    partitioning, so AQE plans the aggregation without a second
    full exchange of the fact rows."""
    s = sessionize(df, gap_seconds=gap_seconds, ts_col=ts_col, user_col=user_col)
    return s.groupBy(F.col(user_col), F.col("session_seq")).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(
            (F.max(_us(ts_col)) - F.min(_us(ts_col)))
            / F.lit(1_000_000.0),
            6,
        ).alias("duration_secs"),
    )


def session_window_stats(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per-session rollup via Spark's native ``session_window`` — works
    on BATCH and STREAMING frames with the same code. On a stream, pass
    ``watermark``: sessions close (and emit, in append mode) once the
    watermark passes their end — the streaming-state analogue of the
    reference's in-memory incremental index flushing closed segments
    (`arch/druid-arch.md:29-32`).

    Boundary semantics differ from :func:`sessionize` by one point:
    ``session_window`` extends a session ``gap`` past each event
    *exclusive* (an event exactly ``gap`` later starts a new session),
    while ``sessionize`` keeps it (strict ``> gap`` starts a new one).
    Streaming state is per (user, open-session) and bounded by the
    watermark — Spark merges overlapping windows as events arrive.

    Returns (user, session_start, session_end, n_events) where
    ``session_end`` is the window end (last event + gap).
    """
    src = df
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("__w")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col(user_col),
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            F.col("n_events"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: each left row picks up the ``value_cols`` of the most
    recent right row with ``right.ts <= left.ts`` for the same key
    (inclusive, like SQL ``ASOF JOIN ... ON l.ts >= r.ts``); null when
    no prior right row exists. Right rows are deduplicated to one per
    (key, ts) — last-write-wins via max — so the result is
    deterministic.

    Implementation: tag and union both inputs, then ``last(value,
    ignorenulls)`` over a (key, ts, side) window — right rows sort
    before left rows at equal timestamps, giving the inclusive bound.
    Both inputs shuffle once on the key; there is no range-condition
    join (which Spark would plan as a broadcast-nested-loop or a
    cartesian at worst) and no state blow-up for long histories.
    """
    rdeduped = right.groupBy(key_col, ts_col).agg(
        *[F.max(c).alias(c) for c in value_cols]
    )
    lcols = [c for c in left.columns]
    # The right row rides as ONE struct: last(payload, ignorenulls) then
    # picks the most recent right ROW atomically — a genuine NULL inside
    # a value column stays NULL (filling columns independently would
    # reach past it to an older row, and could even stitch together
    # values from different right rows).
    payload = F.struct(*[F.col(c) for c in value_cols])
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{rdeduped.schema[c].dataType.simpleString()}" for c in value_cols
            ) + ">"
        ).alias("__payload"),
    )
    r_tag = rdeduped.select(
        *[
            F.col(c) if c in (key_col, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key_col)
        .orderBy(_us(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        F.col("__side"),
        F.last(F.col("__payload"), ignorenulls=True).over(w).alias("__payload"),
    )
    return (
        filled.where(F.col("__side") == 1)
        .select(
            *lcols,
            *[F.col(f"__payload.{c}").alias(f"{c}{suffix}") for c in value_cols],
        )
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week
    (date_trunc('week') — ISO Monday in both Spark and DuckDB), counted
    distinct in each subsequent week. Returns (cohort_week, week_offset,
    n_users).

    Two aggregations and one join, all keyed on the user id: the
    first-seen aggregation reuses the fact shuffle, the join is
    user-keyed (AQE broadcasts the cohort table only when runtime stats
    say it is small — it is user-cardinality, so never forced), and the
    final aggregation's key space is tiny (weeks²)."""
    first_seen = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    activity = df.select(
        F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("activity_week")
    ).distinct()
    joined = activity.join(first_seen, on=user_col)
    return (
        joined.groupBy(
            F.col("cohort_week"),
            F.datediff(F.col("activity_week"), F.col("cohort_week")).cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).cast("long").alias("n_users"))
        .withColumn("week_offset", (F.col("week_offset") / 7).cast("long"))
    )


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    type_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel: how many users performed step[0], then step[1]
    strictly after their first step[0], then step[2] strictly after
    that, ... Returns (step_index, step, n_users) with step_index
    0-based. ``within_seconds`` bounds the whole funnel: every later
    step must also fall within that window of the user's FIRST step
    (the standard conversion-window semantics).

    k-1 user-keyed joins for k steps, each stage aggregating to one row
    per surviving user (min qualifying timestamp). Every stage's output
    is ≤ previous-stage cardinality, so AQE's runtime stats shrink the
    join strategy stage by stage; nothing is force-broadcast. At 100 TB
    the dominant cost is the single scan — each stage filters one step's
    events (pushed to the scan when ``type_col`` is a partition/sort
    key) before its aggregation."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    stage = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    ).withColumn("__t0", F.col("__t"))
    counts = [stage.select(F.count(F.lit(1)).cast("long").alias("n_users"))]
    for s in steps[1:]:
        cond = F.col(ts_col) > F.col("__prev")
        if within_seconds is not None:
            cond = cond & (
                _us(ts_col) - _us(F.col("__t0"))
                <= int(within_seconds) * 1_000_000
            )
        nxt = (
            df.where(F.col(type_col) == s)
            .join(
                stage.select(
                    user_col, F.col("__t").alias("__prev"), F.col("__t0")
                ),
                on=user_col,
            )
            .where(cond)
            .groupBy(user_col, "__t0")
            .agg(F.min(ts_col).alias("__t"))
        )
        counts.append(nxt.select(F.count(F.lit(1)).cast("long").alias("n_users")))
        stage = nxt
    out = None
    for i, (s, c) in enumerate(zip(steps, counts)):
        row = c.select(
            F.lit(i).cast("long").alias("step_index"),
            F.lit(s).alias("step"),
            F.col("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out
