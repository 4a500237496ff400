"""TopN query (Q2) — grouped aggregation over ONE dimension, top N by a
metric, per time bucket.

Reference: declared at query/query-module-overview.md:24, TOC.md:22;
guidance ":51-53" (recommended over groupBy for single-dim ranking).
Druid computes topN *approximately* (per-segment top-K then merge — public
v0.12 behavior); we implement it EXACTLY (documented divergence, SURVEY
§2.1 Q2): a single groupBy shuffle then per-bucket ranking.

Plan shape at scale: partial/final HashAggregate on (bucket, dim), then a
window row_number partitioned by bucket. The window's sort is per bucket
over #distinct-dim rows — already reduced by the aggregation, so no
full-data sort. For the common single-bucket case Spark rewrites
sort+limit to TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from coolplaydruid_spark.catalog import TIME_COLUMN
from coolplaydruid_spark.functions.aggregators import compile_aggregators
from coolplaydruid_spark.functions.extraction import (
    dimension_column,
    rewrite_list_filtered,
    unwrap_list_filtered,
)
from coolplaydruid_spark.functions.granularity import parse_granularity, parse_interval
from coolplaydruid_spark.functions.postaggs import compile_post_aggregators
from coolplaydruid_spark.functions.theta import attach_theta, split_query
from coolplaydruid_spark.plans.common import BUCKET, filtered_frame, grouped_agg


def plan_topn(engine, query: dict) -> DataFrame:
    df = engine.resolve_datasource(query["dataSource"])
    context = query.get("context") or {}
    gran = parse_granularity(query.get("granularity", "all"))
    base = filtered_frame(df, query, engine=engine)

    dim_spec = query["dimension"]
    array_dims = {f.name for f in base.schema.fields if f.dataType.typeName() == "array"}
    if unwrap_list_filtered(dim_spec) is not None:
        # listFiltered: element-filter into a TEMP column (never the
        # source — aggregators over the same multi-value dimension must
        # still see the row's real values) and behave as the rewritten
        # delegate; validates the delegate is array-typed (same
        # ValueError as groupBy).
        base, dim_spec = rewrite_list_filtered(dim_spec, base, array_dims, "__lf_0")
        array_dims = array_dims | {"__lf_0"}
        query = dict(query, dimension=dim_spec)
    dim_col, dim_name = dimension_column(dim_spec)
    threshold = int(query["threshold"])

    # Multi-value string dimension: one group per element, same core 0.12
    # semantics as groupBy (the filter has already run with any-element
    # semantics — explode only for the grouping).
    raw_dim = dim_spec if isinstance(dim_spec, str) else dim_spec.get("dimension")
    if raw_dim in array_dims:
        base = base.withColumn(raw_dim, F.explode_outer(F.col(raw_dim)))

    if gran.kind == "all":
        start = (
            min(parse_interval(iv)[0] for iv in _intervals(query))
            if query.get("intervals")
            else None
        )
        bucket = F.lit(start).cast("timestamp").alias(BUCKET)
    else:
        bucket = gran.bucket(F.col(TIME_COLUMN)).alias(BUCKET)

    # thetaSketch aggregators (legal in topN — e.g. rank dimensions by
    # distinct-user overlap) plan as the same separate two-level
    # aggregation as timeseries/groupBy, joined back on (bucket, dim).
    tsplit = split_query(query)
    agg_specs, drop_cols = tsplit.other_aggs, []
    if tsplit.sketches and not agg_specs:
        agg_specs = [{"type": "count", "name": "__theta_rows"}]
        drop_cols = ["__theta_rows"]

    aggs = compile_aggregators(agg_specs, context, df=base)
    out = grouped_agg(base, [bucket, dim_col.alias(dim_name)], [BUCKET, dim_name], aggs)
    if tsplit.sketches:
        out, _tf = attach_theta(
            out, base, [bucket, dim_col.alias(dim_name)], [BUCKET, dim_name], tsplit,
            context=context,
        )
    out = out.drop(*drop_cols)
    for name, col in compile_post_aggregators(tsplit.other_posts):
        out = out.withColumn(name, col)
    out = out.drop(*tsplit.hoisted)

    metric = query.get("metric")
    ps = _previous_stop(metric)
    if ps is not None:
        # previousStop (dimension/lexicographic metric spec): resume the
        # paging strictly AFTER this value IN THE SPEC'S ORDER — Druid's
        # topN paging contract. The comparison must match the ordering
        # (numeric specs compare numerically, not lexically) and the
        # direction (an inverted spec pages downward). Applied
        # post-aggregation (dimension-cardinality rows), before ranking.
        stop, ordering, inv = ps
        if ordering == "numeric":
            c, s = F.col(dim_name).try_cast("double"), F.lit(float(stop))
            out = out.where(c < s if inv else c > s)
        elif ordering == "strlen":
            c = F.col(dim_name).cast("string")
            sv = str(stop)
            after = (F.length(c) > len(sv)) | (
                (F.length(c) == len(sv)) & (c > F.lit(sv)))
            before = (F.length(c) < len(sv)) | (
                (F.length(c) == len(sv)) & (c < F.lit(sv)))
            out = out.where(before if inv else after)
        elif ordering == "alphanumeric":
            from coolplaydruid_spark.functions.ordering import (
                alphanumeric_key,
                alphanumeric_key_py,
            )

            # composite (key, raw) comparison matching _metric_order's
            # tie-broken ordering (the upstream-exact key is injective
            # on NUL-free values, so the raw leg is belt-and-braces)
            c = alphanumeric_key(F.col(dim_name))
            s = F.lit(alphanumeric_key_py(str(stop)))
            raw, rawlit = F.col(dim_name).cast("string"), F.lit(str(stop))
            after = (c > s) | ((c == s) & (raw > rawlit))
            before = (c < s) | ((c == s) & (raw < rawlit))
            out = out.where(before if inv else after)
        else:
            # lexicographic: STRING comparison even for numeric dims —
            # a bare long-vs-string comparison would coerce numeric and
            # break the paging order (paging fuzzer find, r8)
            c, s = F.col(dim_name).cast("string"), F.lit(str(stop))
            out = out.where(c < s if inv else c > s)
    order = _metric_order(metric, dim_name, inverted=False)
    if gran.kind == "all":
        # Single bucket: the bucket column is a constant, so a
        # partitionBy(BUCKET) window would constant-fold to a global
        # (single-partition) sort. orderBy+limit instead plans as
        # TakeOrderedAndProject — each task keeps its local top-k, the
        # driver merges k-sized heaps. No full sort, no single-task
        # window, regardless of dimension cardinality.
        return out.orderBy(*order).limit(threshold)
    w = Window.partitionBy(BUCKET).orderBy(*order)
    return (
        out.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= threshold)
        .drop("__rank")
        .orderBy(F.col(BUCKET).asc(), *order)
    )


def _metric_order(metric, dim_name: str, inverted: bool):
    """TopNMetricSpec → ordering columns. String → numeric metric
    descending (largest first); {'type':'numeric'} same;
    {'type':'inverted'} flips the wrapped spec; {'type':'dimension'|
    'lexicographic'} orders by dimension value ascending. Ties broken by
    dimension for determinism."""
    if isinstance(metric, str):
        col = F.col(metric)
        return [col.asc() if inverted else col.desc(), F.col(dim_name).asc()]
    mtype = metric.get("type", "numeric")
    if mtype == "numeric":
        col = F.col(metric["metric"])
        return [col.asc() if inverted else col.desc(), F.col(dim_name).asc()]
    if mtype == "inverted":
        return _metric_order(metric["metric"], dim_name, inverted=not inverted)
    if mtype in ("dimension", "lexicographic"):
        ordering = metric.get("ordering", "lexicographic")
        col = F.col(dim_name)
        if ordering == "numeric":
            col = col.cast("double")
        elif ordering == "lexicographic":
            # Druid dimension values are strings: lexicographic means
            # BYTE-WISE order even for numeric-typed columns ('10' <
            # '2') — found by the paging fuzzer walking user_id.
            col = col.cast("string")
        elif ordering == "strlen":
            # Druid's strlen StringComparator: shorter first, ties
            # lexicographic (same tuple as functions/filters._bound).
            s = col.cast("string")
            cols = [F.length(s), s]
            return [c.desc() if inverted else c.asc() for c in cols]
        elif ordering == "alphanumeric":
            from coolplaydruid_spark.functions.ordering import alphanumeric_key

            # raw byte order as a deterministic tiebreak (unreachable
            # for NUL-free values — the upstream-exact key encodes the
            # zero-count, so distinct values get distinct keys)
            cols = [alphanumeric_key(col), col.cast("string")]
            return [c.desc() if inverted else c.asc() for c in cols]
        else:
            raise ValueError(
                f"unsupported dimension ordering {ordering!r} for topN "
                "(lexicographic/numeric/strlen/alphanumeric)"
            )
        return [col.desc() if inverted else col.asc()]
    raise ValueError(f"unknown topN metric spec {metric!r}")


def _previous_stop(metric, inverted: bool = False):
    """(previousStop, ordering, inverted) from a dimension/lexicographic
    metric spec, tracking inversion through wrappers; None when absent."""
    if not isinstance(metric, dict):
        return None
    if metric.get("type") == "inverted":
        return _previous_stop(metric.get("metric"), not inverted)
    if metric.get("type") in ("dimension", "lexicographic"):
        stop = metric.get("previousStop")
        if stop is None:
            return None
        return stop, metric.get("ordering", "lexicographic"), inverted
    return None


def _intervals(query: dict) -> list[str]:
    intervals = query.get("intervals")
    return [intervals] if isinstance(intervals, str) else list(intervals or [])
