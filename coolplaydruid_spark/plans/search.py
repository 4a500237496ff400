"""Search query (Q7) — find dimension VALUES (not rows) matching a search
spec within intervals/filter.

Reference: declared at query/query-module-overview.md:32-33, TOC.md:27.
Public v0.12 semantics: for each searched dimension, return the distinct
matching values with the count of rows carrying each value, sorted, with
an optional limit.

Plan shape: one pass per searched dimension (cheap: column-pruned scans of
only that dimension), each a groupBy count — unioned. At scale the scans
share the cached filtered base; counts shuffle only distinct values.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.plans.common import filtered_frame


def _match(col, qspec: dict):
    qtype = qspec.get("type", "insensitive_contains")
    if qtype == "insensitive_contains":
        return F.lower(col).contains(qspec["value"].lower())
    if qtype == "contains":
        if qspec.get("caseSensitive", True):
            return col.contains(qspec["value"])
        return F.lower(col).contains(qspec["value"].lower())
    if qtype == "fragment":
        case_sensitive = qspec.get("caseSensitive", False)
        preds = [
            col.contains(v) if case_sensitive else F.lower(col).contains(v.lower())
            for v in qspec.get("values", [])
        ]
        return reduce(lambda a, b: a & b, preds) if preds else F.lit(True)
    if qtype == "regex":
        return col.rlike(qspec["pattern"])
    raise ValueError(f"unknown search query type {qtype!r}")


def plan_search(engine, query: dict) -> DataFrame:
    df = filtered_frame(engine.resolve_datasource(query["dataSource"]), query, engine=engine)
    dims = query.get("searchDimensions")
    if not dims:
        dims = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
    qspec = query.get("query", {})
    parts: list[DataFrame] = []
    for dim in dims:
        part = (
            df.filter(_match(F.col(dim), qspec))
            .groupBy(F.lit(dim).alias("dimension"), F.col(dim).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).alias("count"))
        )
        parts.append(part)
    out = reduce(lambda a, b: a.unionByName(b), parts)
    # SearchSortSpec (public v0.12): lexicographic (default) or strlen
    # (shortest value first, lexicographic tiebreak).
    sort = (query.get("sort") or {}).get("type", "lexicographic")
    if sort == "lexicographic":
        value_order = [F.col("value").asc()]
    elif sort == "strlen":
        value_order = [F.length("value").asc(), F.col("value").asc()]
    elif sort == "alphanumeric":
        from coolplaydruid_spark.functions.ordering import alphanumeric_key

        # raw byte order as a deterministic tiebreak (unreachable for
        # NUL-free values — the upstream-exact key is injective)
        value_order = [alphanumeric_key(F.col("value")).asc(),
                       F.col("value").asc()]
    else:
        raise ValueError(f"unknown search sort type {sort!r}")
    out = out.orderBy(F.col("dimension").asc(), *value_order)
    limit = query.get("limit")
    if limit is not None:
        out = out.limit(int(limit))
    return out
