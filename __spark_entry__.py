"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship zero-filled timeseries on sf0.001.
queries()       — every implemented operator from SURVEY.md §2 plus the
                  north-star extensions, as (spark, sf_dir) -> DataFrame.
oracle_sql()    — exact DuckDB equivalents (identical column names; doubles
                  rounded identically on both sides).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from coolplaydruid_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's example
    timeseries (or-filter + longSum/doubleSum + arithmetic post-agg, day
    granularity, zero-filled buckets — query/query-timeseries.md:8-95)."""
    return contract.QUERIES["timeseries_day"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLES)
