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
    # Two-stage width probe, both plan-side (no df.rdd — converting the
    # plan to an RDD pays full physical planning per call).
    # inputFiles() is a cheap metadata call and lower-bounds the scan
    # partition count, so the common 100 TB case — a many-files table —
    # passes through with zero planning overhead. When it reports
    # narrow, consult the (already-computed) analyzed logical plan: a
    # shuffle-introducing operator anywhere upstream means the frame is
    # shuffle.partitions wide regardless of its file count, so
    # repartitioning would only add an exchange.
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0
    if width >= target:
        return df
    if _plan_has_exchange(df):
        return df
    if by is not None and by in df.columns:
        return df.repartition(target, F.col(by))
    return df.repartition(target)


def constant_partition(col):
    """A window partition expression that is 0 on every row but NOT
    constant-foldable, for windows that legitimately run over an
    already-BOUNDED row set (a top-k pool, a group-cardinality report).
    Spark's `WindowExec: No Partition Defined` warning targets
    accidental global windows over raw data; an empty partition spec on
    a pool-bounded window floods logs with hundreds of false alarms per
    run, burying real ones (r8 verdict #6). ``pmod(length(x), length(x))``
    is 0 for any non-null, non-empty rendering of ``col`` (ids, scores)
    and keeps a non-empty partition spec the optimizer won't eliminate.

    ONLY for row sets already bounded upstream — on unbounded data this
    still funnels everything into one partition, exactly the case the
    warning exists for."""
    rendered = F.length(F.concat(F.lit("#"), F.col(col).cast("string")))
    # coalesce: a NULL column renders NULL → pmod NULL, which would
    # split NULL rows into a SECOND partition with its own rank
    # sequence (r9 review find) — pin them to the same 0 partition
    return F.coalesce(F.pmod(rendered, rendered), F.lit(0))


def md5_bucket(col, n_buckets: int, hex_chars: int = 6):
    """Deterministic bucket in [0, n_buckets) from the first
    ``hex_chars`` md5 hex digits — the repo-wide cross-engine hashing
    idiom. DuckDB mirror:
    ``CAST(('0x' || substring(md5(x), 1, H)) AS BIGINT) % B``.
    Callers: classifier.token_bucket (8 hex), importance._token_buckets
    (6 hex); sampling.hash_bucket is the no-modulo 6-hex variant."""
    return (
        F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")
        % int(n_buckets)
    )


import re as _re

# Logical operators whose physical plan ALWAYS carries an Exchange (or a
# range partitioning), making the frame spark.sql.shuffle.partitions
# wide. Join is deliberately absent: a broadcast join preserves the
# (possibly narrow) left partitioning, and the safe failure mode is an
# extra repartition of a wide frame, never single-partition compute.
_WIDE_NODES = (
    "RepartitionByExpression",  # before "Repartition": \b needs the full name
    "Repartition",
    "Aggregate",
    "Window",
    "Distinct",
    "Deduplicate",
    "Sort",
    "Intersect",
    "Except",
)

# Plan-tree lines put the operator name first after the tree-drawing
# prefix ("+- Sort [...]", ":  +- Aggregate [...]"); anchoring there
# keeps literals and column names (a column called sort_key, a filter
# value 'Sorted') from false-matching.
_WIDE_NODE_RE = _re.compile(
    r"^[\s:+\-*]*(?:" + "|".join(_WIDE_NODES) + r")\b", _re.MULTILINE
)


def _plan_has_exchange(df: DataFrame) -> bool:
    """True when the analyzed logical plan (already materialized — schema
    analysis ran at DataFrame creation) contains an operator that always
    plans with a shuffle, so the frame's width is the shuffle partition
    count rather than its input file count."""
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False
    return bool(_WIDE_NODE_RE.search(plan))
