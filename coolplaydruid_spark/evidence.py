"""Deterministic candidate-volume evidence for blocked pair joins.

The sf1 scale gate (tests/test_scale_records.py, BLOCKED class) used to
assert raw ``shuffle_write_records`` — a PLAN property, not a data
property: when AQE declines to broadcast the (small) candidate side of
the verify join it falls back to a shuffle join and the shingle table
crosses the wire once, inflating the metric ~7× on bit-identical inputs
and bit-identical output pairs (r13: 84,294 / 84,294 / 124,596 measured
across three fresh runs of the same minhash query on the same data; the
round driver recorded 607,172). Both outcomes are correct and both are
linear in the corpus — but a scalar gate on the metric can't tell "AQE
chose the linear fallback" from "candidate volume exploded", which is
the regression the gate exists to catch.

This module captures the quantity the blocking argument is actually
about: the exact number of candidate pairs the blocked join will
produce, computed from the pre-join bucketed tables as

    self-join  (id< within bucket): Σ_bucket C(n_bucket, 2)
    cross-join (corpus × batch)   : Σ_bucket n_left · n_right

— a pure function of the data and the blocking knobs, identical run to
run regardless of join strategy, AQE decisions, or cache eviction.

Mechanics: every blocking operator calls :func:`record_blocking` with
its post-cap pre-join table(s) at DataFrame-CONSTRUCTION time (a no-op
unless a capture is active, so production plans are untouched).
bench.py builds each BLOCKED query under :func:`capture` — without
executing it — and aggregates the recorded blockings with
:func:`candidate_stats`; the counts land in PLANMETRICS.json beside the
(telemetry-only) stage metrics, and the scale gate ratios THEM. Because
the operators record the exact DataFrames they join, the evidence can
never drift from the plan the way a re-implemented side-channel counter
could.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SINK: list | None = None


def record_blocking(label: str, left: DataFrame, keys: list[str],
                    right: DataFrame | None = None) -> None:
    """Record a blocked pair join's pre-join input(s).

    ``left``/``right`` must be the tables AS JOINED (after hot-key caps,
    distincts, band explosion — whatever the operator feeds the join),
    and ``keys`` the equi-join bucket columns (empty list = a single
    global block, the unblocked test-scale embedding form).
    ``right=None`` declares a self-join with an ``id <`` ordering
    predicate (C(n,2) candidates per bucket); otherwise the two sides
    cross within each bucket (n_l × n_r). No-op unless a capture() is
    active — the check is one module-global read, so operators call
    this unconditionally on the hot construction path."""
    if _SINK is not None:
        _SINK.append((label, left, right, list(keys)))


@contextmanager
def capture():
    """Activate the sink for the duration; yields the list of recorded
    blockings (label, left, right, keys). Nested captures stack — the
    inner capture sees only its own recordings."""
    global _SINK
    prev = _SINK
    _SINK = sink = []
    try:
        yield sink
    finally:
        _SINK = prev


def candidate_stats(sink: list) -> dict:
    """Aggregate captured blockings into exact candidate counts.

    Returns ``{"candidate_pairs": int, "blocked_rows": int, "blocks":
    [{"label", "candidate_pairs", "blocked_rows"}, ...]}`` where
    ``blocked_rows`` is the total rows entering the blocked join(s) —
    the deterministic denominator for growth ratios (unlike stage
    ``input_records``, it can't double under cache-eviction recompute).
    Each aggregation is one groupBy-count over a pre-join table — far
    cheaper than the pairing query itself, and trivially parallel."""
    total_pairs = 0
    total_rows = 0
    blocks = []
    for label, left, right, keys in sink:
        gb_l = left.groupBy(*[F.col(k) for k in keys])
        if right is None:
            agg = gb_l.agg(F.count(F.lit(1)).cast("long").alias("n"))
            row = agg.agg(
                F.sum(F.expr("n * (n - 1) DIV 2")).alias("p"),
                F.sum("n").alias("r"),
            ).collect()[0]
            pairs, rows = int(row["p"] or 0), int(row["r"] or 0)
        else:
            ln = gb_l.agg(F.count(F.lit(1)).cast("long").alias("__nl"))
            rn = right.groupBy(*[F.col(k) for k in keys]).agg(
                F.count(F.lit(1)).cast("long").alias("__nr"))
            if keys:
                joined = ln.join(rn, on=keys)
            else:
                joined = ln.crossJoin(rn)
            row = joined.agg(
                F.sum(F.expr("__nl * __nr")).alias("p")).collect()[0]
            pairs = int(row["p"] or 0)
            rows = (int(ln.agg(F.sum("__nl")).collect()[0][0] or 0)
                    + int(rn.agg(F.sum("__nr")).collect()[0][0] or 0))
        total_pairs += pairs
        total_rows += rows
        blocks.append({"label": label, "candidate_pairs": pairs,
                       "blocked_rows": rows})
    return {"candidate_pairs": total_pairs, "blocked_rows": total_rows,
            "blocks": blocks}
