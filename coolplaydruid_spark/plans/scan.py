"""Scan (Q9) and Select (Q8) queries — raw row retrieval.

Reference: select declared at query/query-module-overview.md:36 (paged via
pagingSpec); scan declared at ":37" (streaming, limit, time order).
Public v0.12 semantics: select pages with (offset, threshold) per
dataSource; scan returns raw rows with optional 'ascending'/'descending'
time order and a limit.

Plan shape: projection + pushed-down filters; limit without order is
CollectLimit (no shuffle); time-ordered limit is TakeOrderedAndProject
(per-partition top-K — never a full sort). Paging uses row_number over a
stable (time, row-id) ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.catalog import RAW_TIME_NS, TIME_COLUMN
from coolplaydruid_spark.functions.extraction import safe_col
from coolplaydruid_spark.plans.common import filtered_frame


def _projection(df: DataFrame, query: dict) -> DataFrame:
    cols = query.get("columns") or (
        (query.get("dimensions") or []) + (query.get("metrics") or [])
    )
    if cols:
        keep = [c for c in cols if c in df.columns]
        if TIME_COLUMN in df.columns and TIME_COLUMN not in keep:
            keep = [TIME_COLUMN] + keep
        # safe_col, not bare strings: join-dataSource columns carry the
        # rightPrefix in the NAME (default "r." -> "r.v"), which an
        # unquoted select would parse as a struct-field path
        # (fuzz-found r07: scan columns over a join failed to resolve).
        return df.select(*[safe_col(c) for c in keep])
    internal = [RAW_TIME_NS] + [c for c in df.columns if c.startswith("__lkp_")]
    return df.drop(*internal)


def plan_scan(engine, query: dict) -> DataFrame:
    df = filtered_frame(engine.resolve_datasource(query["dataSource"]), query, engine=engine)
    df = _projection(df, query)
    order = query.get("order", "none")
    if order in ("ascending", "descending"):
        col = F.col(TIME_COLUMN)
        df = df.orderBy(col.asc() if order == "ascending" else col.desc())
    limit = query.get("limit")
    if limit is not None:
        df = df.limit(int(limit))
    return df


def plan_select(engine, query: dict) -> DataFrame:
    """Select with pagingSpec {threshold, offset}. Later Druid deprecated
    select in favor of scan; we keep it for parity. A stable total order
    (time, then remaining columns) makes pages deterministic.

    Plan shape: sort + offset + limit plans as TakeOrderedAndProject —
    each partition keeps only its top offset+threshold rows, so no global
    sort and no single-partition window materializes the whole table on
    one executor (a page is small by construction; offset+threshold rows
    reach the driver regardless of table size)."""
    df = filtered_frame(engine.resolve_datasource(query["dataSource"]), query, engine=engine)
    df = _projection(df, query)
    paging = query.get("pagingSpec") or {}
    threshold = int(paging.get("threshold", 1000))
    offset = int(paging.get("offset", 0))
    descending = bool(query.get("descending"))
    time_col = F.col(TIME_COLUMN).desc() if descending else F.col(TIME_COLUMN).asc()
    tiebreak = [safe_col(c) for c in df.columns if c != TIME_COLUMN]
    return df.orderBy(time_col, *tiebreak).offset(offset).limit(threshold)
