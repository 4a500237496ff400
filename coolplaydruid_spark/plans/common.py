"""Shared planning helpers: interval filtering, the filtered base frame,
and the zero-fill bucket spine."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.catalog import RAW_TIME_NS, TIME_COLUMN
from coolplaydruid_spark.functions.filters import compile_filter
from coolplaydruid_spark.functions.granularity import (
    Granularity,
    intervals_predicate,
    parse_interval,
)

BUCKET = "ts_bucket"

_EPOCH = datetime(1970, 1, 1)
_US = timedelta(microseconds=1)


def _epoch_ns(dt: datetime) -> int:
    """Naive-UTC datetime → epoch nanoseconds, exact integer arithmetic
    (float .timestamp() loses sub-second precision past 2^53 ns)."""
    return ((dt - _EPOCH) // _US) * 1000


def grouped_agg(base: DataFrame, key_cols: list, key_names: list[str], aggs) -> DataFrame:
    """groupBy + agg handling the JVM/pandas split: GROUPED_AGG pandas
    UDF aggregates (CompiledAggs.py_exprs) cannot share an agg() with JVM
    aggregates, so they run as a second groupBy over the same keys joined
    back (the keys are identical, so the join is a co-partitioned merge of
    two already-shuffled sides — AQE handles the small result)."""
    if aggs.py_exprs and aggs.exprs:
        jvm = base.groupBy(*key_cols).agg(*aggs.exprs)
        py = base.groupBy(*key_cols).agg(*aggs.py_exprs)
        return jvm.join(py, on=key_names, how="inner")
    if aggs.py_exprs:
        return base.groupBy(*key_cols).agg(*aggs.py_exprs)
    return base.groupBy(*key_cols).agg(*aggs.exprs)


def _lookup_resolver(engine):
    """name -> bounded {key: value} dict for Druid-expression lookup().
    Same inlining cap as the SQL LOOKUP shim; oversized lookups raise
    toward the broadcast-join path (registeredLookup extractionFn)."""
    if engine is None:
        return None
    from coolplaydruid_spark.sqlcompat import MAX_INLINE_LOOKUP_ENTRIES

    def resolve(name: str) -> dict:
        df_l = engine.catalog.lookup(name)
        rows = df_l.limit(MAX_INLINE_LOOKUP_ENTRIES + 1).collect()
        if len(rows) > MAX_INLINE_LOOKUP_ENTRIES:
            raise ValueError(
                f"lookup {name!r} exceeds {MAX_INLINE_LOOKUP_ENTRIES} entries; "
                "use the registeredLookup extractionFn (broadcast join)"
            )
        out = {}
        for r in rows:  # last-write-wins, like the SQL shim
            out[r["key"]] = r["value"]
        return out

    return resolve


def apply_virtual_columns(df: DataFrame, query: dict, engine=None) -> DataFrame:
    """``virtualColumns``: computed columns usable by filters, dimensions
    and aggregators of the same query (public Druid expression virtual
    columns). The PRIMARY dialect is Druid's own expression language
    (functions/druidexpr.py — ``timestamp_floor(__time,'PT1H')``,
    ``nvl()``, ``if()``, Druid's long/long integral division and
    ``^``-as-power), so a real Druid query runs unmodified; sources
    outside that subset fall back to Spark SQL, which remains fully
    supported. An explicit ``"dialect": "sql"``/``"druid"`` key pins
    one dialect (Druid spec extension — absent keys are ignored by
    Druid itself). Each column is a projection folded into whole-stage
    codegen; Catalyst still pushes filters on *source* columns beneath
    the Project, so scan pruning is unaffected."""
    from coolplaydruid_spark.functions.druidexpr import (
        DruidExprError,
        compile_druid_expr,
    )

    lookups = _lookup_resolver(engine)
    for vc in query.get("virtualColumns") or []:
        vtype = vc.get("type", "expression")
        if vtype != "expression":
            raise ValueError(f"unknown virtualColumn type {vtype!r}")
        dialect = vc.get("dialect")
        if dialect == "sql":
            col = F.expr(vc["expression"])
        elif dialect == "druid":
            col = compile_druid_expr(vc["expression"], df, lookups=lookups)
        else:
            try:
                col = compile_druid_expr(vc["expression"], df, lookups=lookups)
            except DruidExprError:
                col = F.expr(vc["expression"])
        df = df.withColumn(vc["name"], col)
    return df


def filtered_frame(df: DataFrame, query: dict, engine=None) -> DataFrame:
    """Apply the query's ``virtualColumns``, ``intervals`` + ``filter``
    to the dataSource frame. ``engine`` (optional) supplies the lookup
    registry for Druid-expression ``lookup()``.

    The predicates are plain Columns, so Catalyst pushes them into the
    Parquet scan: the intervals predicate is the Spark analogue of Druid's
    interval→segment pruning (query/query-internal-procedure.md:7), and
    dimension filters land in PushedFilters (≈ bitmap-index skipping,
    TOC.md:39-40).
    """
    df = apply_virtual_columns(df, query, engine=engine)
    intervals = query.get("intervals")
    if intervals:
        if isinstance(intervals, str):
            intervals = [intervals]
        df = df.filter(intervals_predicate(intervals, F.col(TIME_COLUMN)))
        # Tables whose Parquet time column is raw int64 nanos carry a
        # RAW_TIME_NS shadow (catalog.py): the __time predicate above is
        # arithmetic over the scan column (not pushable), so also emit the
        # equivalent plain int64 range — Catalyst pushes it through the
        # Project into PushedFilters, restoring row-group skipping.
        if RAW_TIME_NS in df.columns:
            ns_pred = None
            for iv in intervals:
                start, end = parse_interval(iv)
                p = (F.col(RAW_TIME_NS) >= F.lit(_epoch_ns(start))) & (
                    F.col(RAW_TIME_NS) < F.lit(_epoch_ns(end))
                )
                ns_pred = p if ns_pred is None else (ns_pred | p)
            df = df.filter(ns_pred)
        # Segment pruning (query/query-internal-procedure.md:7): on tables
        # ingested by sources.batch the partition column __dt carries the
        # date — derive an explicit __dt predicate so Catalyst prunes
        # whole partition directories, not just row groups.
        if "__dt" in df.columns:
            dt_pred = None
            for iv in intervals:
                start, end = parse_interval(iv)
                p = (F.col("__dt") >= F.lit(str(start.date()))) & (
                    F.col("__dt") <= F.lit(str(end.date()))
                )
                dt_pred = p if dt_pred is None else (dt_pred | p)
            df = df.filter(dt_pred)
    pred = compile_filter(query.get("filter"), df)
    if pred is not None:
        df = df.filter(pred)
    return df


# Above this many spine buckets the zero-fill join drops its forced
# broadcast hint: a forced F.broadcast of a multi-million-row aggregate
# side risks Spark's broadcast cap, where an unhinted join lets AQE pick
# the strategy from observed sizes.
ZERO_FILL_BROADCAST_MAX = 100_000


def bucket_spine(
    spark, gran: Granularity, intervals: list[str], max_buckets: int | None = None
) -> tuple[DataFrame, int]:
    """One-column DataFrame of every bucket start inside the queried
    intervals — the zero-fill spine (query/query-timeseries.md:74-95) —
    plus its (driver-known) row count so callers can gate broadcast
    hints on actual spine size.

    Bucket starts are computed driver-side (bucket count is bounded by
    the cap in Granularity.buckets_in — Resource limit exceeded beyond
    it — independent of data volume) and parallelized.
    """
    if isinstance(intervals, str):
        intervals = [intervals]
    buckets: set = set()
    for iv in intervals:
        start, end = parse_interval(iv)
        buckets.update(gran.buckets_in(start, end, max_buckets=max_buckets))
    # Arrow-backed conversion yields a LocalTableScan (pure JVM at
    # execution); a list-of-tuples createDataFrame would instead plan a
    # Python-RDD scan that re-serializes through the driver on every run.
    # The explicit schema keeps the empty-spine case (degenerate interval,
    # start == end) a valid empty result instead of a schema-inference error.
    import pandas as pd

    pdf = pd.DataFrame({BUCKET: pd.Series(sorted(buckets), dtype="datetime64[us]")})
    return spark.createDataFrame(pdf, f"{BUCKET} timestamp"), len(buckets)


def zero_fill(
    agg_df: DataFrame,
    spine: DataFrame,
    fills: dict[str, object],
    extra_cols: list[str] | None = None,
    spine_rows: int | None = None,
) -> DataFrame:
    """Left-join aggregates onto the bucket spine and substitute each
    aggregator's identity for missing buckets (empty buckets are
    zero-filled unless skipEmptyBuckets, query/query-timeseries.md:74-95).

    Both sides are bucket-cardinality; for the common small spine the
    aggregate side is broadcast (Spark cannot broadcast the preserved
    side of a left-outer join), so the spine join adds no shuffle. Above
    ZERO_FILL_BROADCAST_MAX buckets the hint is dropped — the aggregate
    side is spine-sized too, and forcing a multi-million-row broadcast
    would hit Spark's broadcast cap where AQE can pick a shuffle join.
    """
    small = spine_rows is None or spine_rows <= ZERO_FILL_BROADCAST_MAX
    right = F.broadcast(agg_df) if small else agg_df
    joined = spine.join(right, on=BUCKET, how="left")
    cols = [F.col(BUCKET)]
    for name in extra_cols or []:
        cols.append(F.col(name))
    for name, fill in fills.items():
        if fill is None:
            cols.append(F.col(name))
        else:
            cols.append(F.coalesce(F.col(name), F.lit(fill)).alias(name))
    return joined.select(*cols)
