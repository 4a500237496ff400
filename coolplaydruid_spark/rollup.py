"""Rollup materialized views with automatic query routing.

Druid ingests rolled-up segments ("快速的数据聚合" at write time,
`intro/what-is-druid.md:3`; rollup index tasks
`arch/indexing-service/indexing-service-submit-task.md:75-93`) and
queries transparently read them. Here the same contract is explicit
machinery: `sources.batch.index_task(rollup=...)` materializes the
pre-aggregated table, `engine.register_rollup` declares it, and
`rewrite_with_rollup` silently reroutes any answerable aggregation
query from the raw table to the rollup.

A query is answerable from a rollup iff:
 - its dataSource is the rollup's base table (plain string),
 - its granularity is COARSER-OR-EQUAL and ALIGNED with the rollup's
   (every rollup bucket nests inside one query bucket),
 - its interval endpoints are aligned to rollup bucket boundaries
   (otherwise edge buckets would need raw rows),
 - every dimension referenced by its filter / dimensions / dimension
   extraction inputs was preserved by the rollup,
 - every aggregator re-aggregates from a rollup metric: count →
   longSum(count-metric); longSum/doubleSum(x) → sum of the sum-metric;
   longMin/doubleMin(x) → min of the min-metric (max likewise);
   hyperUnique(x) → fold of the rollup's mergeable HLL sketch column
   (functions/aggregators.py detects binary sketch inputs and applies
   hll_union_agg — lossless distinct-count re-aggregation, TOC.md:41).

At 100 TB this is the difference between scanning the raw fact table
and scanning a table ~(raw rows / rollup factor) — the query's plan is
otherwise identical (same bucket-keyed partial/final aggregation), so
every downstream property (pushdown, zero-fill, AQE) carries over.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from coolplaydruid_spark.functions.granularity import (
    Granularity,
    parse_granularity,
    parse_interval,
)

# grain-nesting partial order: g nests in h ⟺ every h-bucket is a whole
# number of g-buckets. Weeks only nest in themselves (a month/quarter/
# year boundary can split a week).
_NESTS: dict[str, set[str]] = {
    "second": {"second", "minute", "hour", "day", "week", "month", "quarter", "year"},
    "minute": {"minute", "hour", "day", "week", "month", "quarter", "year"},
    "hour": {"hour", "day", "week", "month", "quarter", "year"},
    "day": {"day", "week", "month", "quarter", "year"},
    "week": {"week"},
    "month": {"month", "quarter", "year"},
    "quarter": {"quarter", "year"},
    "year": {"year"},
}


@dataclass
class RollupSpec:
    base: str
    table: str
    granularity: Granularity
    dimensions: set[str]
    aggregations: list[dict]
    # derived: base aggregator → rollup metric name, by kind
    _count_metric: str | None = field(default=None, init=False)
    _sums: dict[str, tuple[str, str]] = field(default_factory=dict, init=False)
    _mins: dict[str, str] = field(default_factory=dict, init=False)
    _maxs: dict[str, str] = field(default_factory=dict, init=False)
    _uniques: dict[str, str] = field(default_factory=dict, init=False)

    def __post_init__(self):
        if isinstance(self.granularity, (str, dict)):
            self.granularity = parse_granularity(self.granularity)
        self.dimensions = set(self.dimensions)
        for spec in self.aggregations:
            atype, name = spec.get("type"), spec.get("name")
            fn = spec.get("fieldName")
            if atype == "count":
                self._count_metric = name
            elif atype in ("longSum", "doubleSum"):
                self._sums[fn] = (name, atype)
            elif atype in ("longMin", "doubleMin"):
                self._mins[fn] = name
            elif atype in ("longMax", "doubleMax"):
                self._maxs[fn] = name
            elif atype == "hyperUnique":
                self._uniques[fn] = name

    # ---- answerability ---------------------------------------------------

    def _gran_compatible(self, q: Granularity) -> bool:
        r = self.granularity
        if q.kind == "all":
            return True
        if q.kind == "trunc" and r.kind == "trunc":
            return (
                q.time_zone == r.time_zone and q.grain in _NESTS.get(r.grain, set())
            )
        if q.kind == "duration" and r.kind == "duration":
            return (
                q.duration_ms % r.duration_ms == 0
                and (q.origin_ms - r.origin_ms) % r.duration_ms == 0
            )
        if q.kind == "months" and r.kind == "months":
            return q.time_zone == r.time_zone and q.n_months % r.n_months == 0
        if q.kind == "months" and r.kind == "trunc":
            return q.time_zone == r.time_zone and "month" in _NESTS.get(r.grain, set())
        if q.kind == "duration" and r.kind == "trunc":
            # A 2h-duration query nests in an hourly (tz-less) rollup:
            # fixed-length rollup grains bucket at epoch multiples, so
            # the query's buckets align iff its length AND origin are
            # whole multiples of the grain.
            grain_ms = {"second": 1000, "minute": 60_000,
                        "hour": 3_600_000}.get(r.grain)
            if grain_ms is None or r.time_zone is not None:
                return False
            return (
                q.duration_ms % grain_ms == 0
                and q.origin_ms % grain_ms == 0
            )
        if q.kind == "trunc" and r.kind == "duration":
            # Calendar query grains coarser than a fixed-length rollup
            # (day query over a 15-minute rollup): every calendar
            # bucket boundary is a multiple of the rollup duration iff
            # the duration divides a day, is epoch-anchored, and the
            # query grain is day-or-coarser-aligned (weeks/days align
            # at midnights; months/quarters/years too). tz'd query
            # grains shift boundaries by the zone offset, which stays
            # a whole number of rollup buckets only for durations
            # dividing the smallest real offset unit — keep the
            # conservative tz-less case.
            return (
                q.time_zone is None
                and r.origin_ms == 0
                and 86_400_000 % r.duration_ms == 0
                and q.grain in ("day", "week", "month", "quarter", "year")
            )
        return False

    def _intervals_aligned(self, intervals) -> bool:
        if isinstance(intervals, str):
            intervals = [intervals]
        for iv in intervals or []:
            start, end = parse_interval(iv)
            if self.granularity.bucket_py(start) != start:
                return False
            if self.granularity.bucket_py(end) != end:
                return False
        return True

    def _filter_dims_ok(self, spec) -> bool:
        if spec is None:
            return True
        ftype = spec.get("type")
        if ftype in ("and", "or"):
            return all(self._filter_dims_ok(f) for f in spec.get("fields", []))
        if ftype == "not":
            return self._filter_dims_ok(spec.get("field"))
        if ftype == "columnComparison":
            return all(
                (d if isinstance(d, str) else d.get("dimension")) in self.dimensions
                for d in spec.get("dimensions", [])
            )
        if ftype == "interval":
            # interval filters hit __time, which the rollup truncated —
            # only safe when every endpoint is bucket-aligned
            dim = spec.get("dimension")
            if dim not in ("__time", None):
                return dim in self.dimensions
            return self._intervals_aligned(spec.get("intervals"))
        if ftype in ("true", "false"):
            return True  # constant filters touch no columns
        # Remaining leaf types must name a preserved dimension. FAIL
        # CLOSED for anything without one (expression filters, unknown
        # types): an unverifiable filter must not route to the rollup —
        # it could reference a dropped or pre-aggregated column.
        dim = spec.get("dimension")
        return dim is not None and dim in self.dimensions

    def _rewrite_agg(self, spec: dict) -> dict | None:
        atype = spec.get("type")
        name = spec.get("name")
        fn = spec.get("fieldName")
        if atype == "filtered":
            # A filtered aggregator whose filter touches only preserved
            # dimensions rewrites exactly: the rollup groups by those
            # dimensions, so its rows PARTITION the raw rows by filter
            # outcome — filtering rollup rows selects precisely the
            # pre-aggregates of the matching raw rows, and the inner
            # re-aggregation (sum-of-sums, min-of-mins, sketch union)
            # runs over them unchanged.
            if not self._filter_dims_ok(spec.get("filter")):
                return None
            inner_spec = dict(spec.get("aggregator") or {})
            inner_spec.setdefault("name", name or inner_spec.get("name"))
            inner = self._rewrite_agg(inner_spec)
            if inner is None:
                return None
            return {
                "type": "filtered",
                "name": name or inner.get("name"),
                "filter": spec["filter"],
                "aggregator": inner,
            }
        if atype == "count":
            if self._count_metric is None:
                return None
            return {"type": "longSum", "name": name, "fieldName": self._count_metric}
        if atype in ("longSum", "doubleSum"):
            hit = self._sums.get(fn)
            if hit is None:
                return None
            return {"type": atype, "name": name, "fieldName": hit[0]}
        if atype in ("longMin", "doubleMin"):
            if fn not in self._mins:
                return None
            return {"type": atype, "name": name, "fieldName": self._mins[fn]}
        if atype in ("longMax", "doubleMax"):
            if fn not in self._maxs:
                return None
            return {"type": atype, "name": name, "fieldName": self._maxs[fn]}
        if atype == "hyperUnique":
            if fn not in self._uniques:
                return None
            # the rollup column is a mergeable HLL sketch; the
            # hyperUnique compiler folds binary inputs with hll_union_agg
            return {"type": "hyperUnique", "name": name, "fieldName": self._uniques[fn]}
        return None

    def try_rewrite(self, query: dict) -> dict | None:
        """Rewritten query against the rollup table, or None if any part
        is not answerable from the rollup."""
        if query.get("queryType") not in ("timeseries", "topN", "groupBy", "movingAverage"):
            return None
        if query.get("dataSource") != self.base:
            return None
        if query.get("virtualColumns"):
            return None  # expressions may read columns the rollup dropped
        if query.get("subtotalsSpec") is not None and query.get("queryType") != "groupBy":
            return None
        if not self._gran_compatible(parse_granularity(query.get("granularity", "all"))):
            return None
        if not self._intervals_aligned(query.get("intervals")):
            return None
        if not self._filter_dims_ok(query.get("filter")):
            return None
        dims = query.get("dimensions") or []
        if query.get("queryType") == "topN" and query.get("dimension") is not None:
            dims = list(dims) + [query["dimension"]]
        for d in dims:
            src = d if isinstance(d, str) else d.get("dimension")
            if src not in self.dimensions:
                return None
        new_aggs = []
        for a in query.get("aggregations") or []:
            ra = self._rewrite_agg(a)
            if ra is None:
                return None
            new_aggs.append(ra)
        out = dict(query)
        out["dataSource"] = self.table
        out["aggregations"] = new_aggs
        return out


def rewrite_with_rollup(rollups: list[RollupSpec], query: dict) -> dict:
    """First answerable rollup wins (register coarsest-first to prefer
    the smallest table)."""
    for spec in rollups:
        rewritten = spec.try_rewrite(query)
        if rewritten is not None:
            return rewritten
    return query
