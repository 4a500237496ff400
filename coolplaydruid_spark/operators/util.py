"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, by: str | None = None,
           min_partitions: int | None = None) -> DataFrame:
    """Ensure a compute-heavy per-row operator runs with at least
    cluster-parallelism tasks.

    Expensive projections (shingling, per-bit hashing, pairwise scoring)
    inherit the *scan's* partitioning — and a source with few/large row
    groups (one-file test fixtures; badly compacted uploads at cluster
    scale) serializes them onto a handful of tasks. When the input has
    fewer partitions than ``spark.default.parallelism``, repartition
    first: the exchange moves only the raw input bytes (cheap relative to
    the compute it unlocks). Inputs that are already wide (the normal
    100 TB case: thousands of row groups) pass through untouched.

    Pass ``by`` (a uniformly-distributed key column, e.g. the doc id) to
    hash-partition — cheaper than round-robin, which local-sorts every
    row for deterministic retries.

    Reserve this for operators whose per-row cost dwarfs a row's shuffle
    cost; for cheap projections the added exchange is pure overhead.
    """
    if df.isStreaming:
        # Streaming frames cannot be probed, and their parallelism is the
        # micro-batch planner's concern — pass through so map-only
        # operators stay usable on streams.
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # Two-stage width probe. inputFiles() is a cheap metadata call and
    # lower-bounds the scan partition count, so the common 100 TB case —
    # a many-files table — passes through with zero planning overhead.
    # Only when it reports narrow do we pay the precise probe
    # (df.rdd.getNumPartitions() converts the plan to an RDD — measurable
    # per call), because at that point the alternative is adding a real
    # shuffle: being wrong would cost far more than the probe.
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0
    if width >= target:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    if by is not None and by in df.columns:
        return df.repartition(target, F.col(by))
    return df.repartition(target)
