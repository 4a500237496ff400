"""Metadata queries: timeBoundary (Q4), segmentMetadata (Q5),
dataSourceMetadata (Q6).

Reference: declared at query/query-module-overview.md:28-30, TOC.md:24-26.
 - timeBoundary: min/max timestamp of a dataSource, optionally one bound.
 - segmentMetadata: per-column metadata — type, cardinality, null count
   (we report table-level metadata: a Parquet table's "segments" are its
   partitions and Spark exposes per-file stats internally; table-level is
   the useful granularity here).
 - dataSourceMetadata: latest ingested event timestamp.

All are metadata-cheap: timeBoundary/dataSourceMetadata reduce to a
min/max agg Catalyst can often answer from Parquet footer stats; the
cardinality pass is one scan with per-column partial HLL or exact
count_distinct.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.catalog import RAW_TIME_NS, TIME_COLUMN
from coolplaydruid_spark.plans.common import filtered_frame


def plan_time_boundary(engine, query: dict) -> DataFrame:
    df = filtered_frame(engine.resolve_datasource(query["dataSource"]), query, engine=engine)
    bound = query.get("bound")
    aggs = []
    if bound in (None, "minTime"):
        aggs.append(F.min(TIME_COLUMN).alias("minTime"))
    if bound in (None, "maxTime"):
        aggs.append(F.max(TIME_COLUMN).alias("maxTime"))
    return df.agg(*aggs)


def plan_datasource_metadata(engine, query: dict) -> DataFrame:
    df = engine.resolve_datasource(query["dataSource"])
    return df.agg(F.max(TIME_COLUMN).alias("maxIngestedEventTime"))


def plan_segment_metadata(engine, query: dict) -> DataFrame:
    """Per-column analysis: type, cardinality (exact iff
    context.useExactCountDistinct else HLL), null count, row count.
    ``toInclude: {"type": "list", "columns": [...]}`` restricts the
    analyzed columns; ``analysisTypes`` extends the output — "minmax"
    adds minValue/maxValue (typed min/max rendered as strings),
    "size" adds byteSize (UTF-8 bytes of the string rendering, the
    engine-independent stand-in for serialized size). Everything is ONE
    aggregation pass over the (filtered) table regardless of how many
    analyses are requested; output is one row per column."""
    df = filtered_frame(engine.resolve_datasource(query["dataSource"]), query, engine=engine)
    context = query.get("context") or {}
    exact = bool(context.get("useExactCountDistinct"))
    analysis = set(query.get("analysisTypes") or [])
    cols = [f for f in df.schema.fields if f.name not in (TIME_COLUMN, RAW_TIME_NS)]
    include = query.get("toInclude")
    if isinstance(include, dict) and include.get("type") == "list":
        wanted = set(include.get("columns") or [])
        cols = [f for f in cols if f.name in wanted]
    if not cols:
        # toInclude matched nothing (typo, or only internal columns):
        # an empty analysis, not an internal error.
        schema = "column string, type string, cardinality long, nullCount long, numRows long"
        if "minmax" in analysis:
            schema += ", minValue string, maxValue string"
        if "size" in analysis:
            schema += ", byteSize long"
        return engine.spark.createDataFrame([], schema)
    distinct_fn = F.count_distinct if exact else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for f in cols:
        c = F.col(f.name)
        aggs.append(distinct_fn(c).alias(f"__card_{f.name}"))
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"__null_{f.name}")
        )
        if "minmax" in analysis:
            aggs.append(F.min(c).cast("string").alias(f"__min_{f.name}"))
            aggs.append(F.max(c).cast("string").alias(f"__max_{f.name}"))
        if "size" in analysis:
            aggs.append(
                F.sum(F.coalesce(F.octet_length(c.cast("string")), F.lit(0)))
                .alias(f"__size_{f.name}")
            )
    stats = df.agg(*aggs)

    # Melt the single stats row into one row per column (stack keeps it in
    # one JVM-side projection — no Python round-trip).
    parts = []
    for f in cols:
        sel = [
            F.lit(f.name).alias("column"),
            F.lit(f.dataType.simpleString()).alias("type"),
            F.col(f"__card_{f.name}").cast("long").alias("cardinality"),
            F.col(f"__null_{f.name}").cast("long").alias("nullCount"),
            F.col("__rows").cast("long").alias("numRows"),
        ]
        if "minmax" in analysis:
            sel.append(F.col(f"__min_{f.name}").alias("minValue"))
            sel.append(F.col(f"__max_{f.name}").alias("maxValue"))
        if "size" in analysis:
            sel.append(F.col(f"__size_{f.name}").cast("long").alias("byteSize"))
        parts.append(stats.select(*sel))
    return reduce(lambda a, b: a.unionByName(b), parts)
