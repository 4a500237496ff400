"""Theta-sketch set-operation aggregations (Druid DataSketches surface).

Druid's ``thetaSketch`` aggregator builds a KMV sketch of the distinct
values of a column per result row; ``thetaSketchSetOp`` post-aggregators
combine sketches with UNION / INTERSECT / NOT and
``thetaSketchEstimate`` finalizes a sketch to a distinct count. The
canonical use is funnel overlap: "how many users did A *and* B today"
— a question plain per-row filtered aggregation cannot answer. The
query taxonomy the reference declares is extension-open
(query/query-module-overview.md:20-33); sketches are named at TOC.md:41.

Spark-first design — exact, not sketched (documented divergence, the
same choice as topN/percentile): a two-level distributed aggregation.

  level 1  groupBy(query keys, field value) → one BOOLEAN MEMBERSHIP
           FLAG per sketch (``bool_or`` of the sketch's filter).
           Map-side partial aggregation collapses duplicate values
           before the shuffle, so the exchange carries at most one row
           per DISTINCT (keys, value) pair — the same cardinality a
           sketch build would see.
  level 2  groupBy(query keys) → each estimate is a conditional count
           over flag combinations; set ops are boolean algebra on the
           flags (INTERSECT = a & b, UNION = a | b, NOT = a & ~b).

Both levels are JVM-side HashAggregates with partial/final split; no
Python, no collect. At 100 TB the level-1 shuffle is bounded by
|distinct (group, value)| — for user-overlap queries that is ~|active
users| per bucket, the minimum any exact algorithm must move. The
approximate path (trade exactness for a fixed-size shuffle) remains
available by pointing `cardinality`/`hyperUnique` at the same field.

Estimates are exact counts emitted as BIGINT (Druid emits a double
estimate; exact integers are strictly more informative and
oracle-testable — divergence documented in SURVEY §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.functions.extraction import safe_col

from coolplaydruid_spark.functions.filters import compile_filter


_THETA_POST_TYPES = ("thetaSketchEstimate", "thetaSketchSetOp")


def _nullsafe_join(left: DataFrame, right: DataFrame, keys: list[str], how: str) -> DataFrame:
    """Join on ``keys`` with NULL-SAFE equality, keeping the left side's
    key columns. Group keys are legitimately null (granularity 'all'
    without intervals keys the single bucket by a null timestamp; null
    dimension values form real groups) and a plain equi-join would drop
    those rows' matches."""
    renamed = right
    for i, k in enumerate(keys):
        renamed = renamed.withColumnRenamed(k, f"__rk_{i}")
    cond = None
    for i, k in enumerate(keys):
        c = left[k].eqNullSafe(renamed[f"__rk_{i}"])
        cond = c if cond is None else (cond & c)
    joined = left.join(renamed, cond, how)
    if how == "full":
        # Right-only rows carry the key only on the right. Under
        # null-safe matching a right-only row's key can be null ONLY
        # when no left row had a null key either — so coalesce is exact.
        for i, k in enumerate(keys):
            joined = joined.withColumn(k, F.coalesce(left[k], renamed[f"__rk_{i}"]))
    return joined.drop(*[f"__rk_{i}" for i in range(len(keys))])


def _unwrap(spec: dict) -> tuple[str, dict | None] | None:
    """If ``spec`` is a thetaSketch aggregator (possibly wrapped in
    ``filtered``), return (fieldName, filter_spec|None); else None."""
    if spec.get("type") == "thetaSketch":
        return spec["fieldName"], None
    if spec.get("type") == "filtered":
        inner = spec.get("aggregator") or {}
        if inner.get("type") == "thetaSketch":
            return inner["fieldName"], spec.get("filter")
    return None


@dataclass
class ThetaSplit:
    """A query's aggregator/post-agg lists split into the theta part
    (planned by :func:`theta_frame`) and the remainder (planned by the
    normal single-pass aggregation)."""

    sketches: dict = field(default_factory=dict)  # name -> (fieldName, filter)
    theta_posts: list = field(default_factory=list)
    other_aggs: list = field(default_factory=list)
    other_posts: list = field(default_factory=list)
    # Synthetic columns created by hoisting theta nodes nested inside
    # arithmetic/greatest/least post-agg trees; the planner drops them
    # after compiling other_posts.
    hoisted: list = field(default_factory=list)

    @property
    def names(self) -> list[str]:
        return [*self.sketches, *[p["name"] for p in self.theta_posts]]


def _hoist_nested(spec, s: "ThetaSplit") -> dict:
    """A thetaSketchEstimate/thetaSketchSetOp node nested inside another
    post-aggregator's field tree (legal in Druid — e.g. an arithmetic
    ratio of two estimates) is hoisted to its own synthetically-named
    theta post-agg and replaced in the tree by a fieldAccess reference,
    so compile_post_aggregator only ever sees numeric nodes. Copies the
    touched nodes — never mutates the caller's query dict."""
    if not isinstance(spec, dict):
        return spec
    if spec.get("type") in _THETA_POST_TYPES:
        name = f"__theta_h{len(s.hoisted)}"
        s.theta_posts.append({**spec, "name": name})
        s.hoisted.append(name)
        return {"type": "fieldAccess", "fieldName": name}
    if isinstance(spec.get("fields"), list):
        spec = {**spec, "fields": [_hoist_nested(f, s) for f in spec["fields"]]}
    if isinstance(spec.get("field"), dict):
        spec = {**spec, "field": _hoist_nested(spec["field"], s)}
    return spec


def split_query(query: dict) -> ThetaSplit:
    s = ThetaSplit()
    for spec in query.get("aggregations") or []:
        unwrapped = _unwrap(spec)
        if unwrapped is not None:
            s.sketches[spec["name"]] = unwrapped
        else:
            s.other_aggs.append(spec)
    for spec in query.get("postAggregations") or []:
        if spec.get("type") in _THETA_POST_TYPES:
            s.theta_posts.append(spec)
        else:
            s.other_posts.append(_hoist_nested(spec, s))
    if s.theta_posts and not s.sketches:
        raise ValueError("thetaSketch post-aggregators require thetaSketch aggregators")
    return s


def _post_domain(spec: dict, split: ThetaSplit) -> str:
    """Walk a sketch-valued post-agg field tree and return the single
    source column it draws on. Set ops across different source columns
    have no exact relational meaning on shared keys and are rejected."""
    ptype = spec.get("type")
    if ptype in ("fieldAccess", "finalizingFieldAccess"):
        name = spec["fieldName"]
        if name not in split.sketches:
            raise ValueError(f"theta set op references non-theta aggregator {name!r}")
        return split.sketches[name][0]
    if ptype == "thetaSketchSetOp":
        func = spec.get("func", "UNION").upper()
        if func not in ("UNION", "INTERSECT", "NOT"):
            raise ValueError(f"unknown thetaSketchSetOp func {func!r}")
        domains = {_post_domain(f, split) for f in spec["fields"]}
        if len(domains) != 1:
            raise ValueError(
                f"thetaSketchSetOp over different fieldNames {sorted(domains)!r}"
            )
        return domains.pop()
    raise ValueError(f"unexpected node {ptype!r} in theta post-aggregator")


def _membership(spec: dict, flags: dict[str, Column]) -> Column:
    """Compile a (single-domain, pre-validated) field tree to a boolean
    membership expression over the level-1 flags."""
    ptype = spec.get("type")
    if ptype in ("fieldAccess", "finalizingFieldAccess"):
        return flags[spec["fieldName"]]
    func = spec.get("func", "UNION").upper()
    cols = [_membership(f, flags) for f in spec["fields"]]
    out = cols[0]
    for c in cols[1:]:
        if func == "UNION":
            out = out | c
        elif func == "INTERSECT":
            out = out & c
        else:  # NOT — Druid: first operand minus the union of the rest
            out = out & ~c
    return out


# ---- approximate mode (context.useApproxTheta) -------------------------
#
# The exact two-level plan's level-1 shuffle is |distinct (group, value)|
# — the exactness minimum, but unbounded at extreme per-bucket
# cardinality. The approximate mode bounds it with Spark's native
# DataSketches HLL aggregates (hll_sketch_agg): fixed-size sketches with
# MAP-SIDE partial aggregation, so the exchange carries one ~2^lgK-byte
# sketch per (group, sketch) regardless of cardinality — the same
# fixed-size-shuffle property as Druid's own thetaSketch. Set-op
# estimates come from sketch unions + inclusion-exclusion (HLL unions
# are native; intersections are derived: |A∩B| = |A|+|B|-|A∪B|), which
# matches Druid's sketch-algebra error model. INTERSECT/NOT operands
# must be union-representable (fieldAccess or nested UNIONs); trees with
# nested intersections raise — use the exact mode for those.


def _union_units(spec: dict, sketches: dict[str, Column]) -> list[Column] | None:
    """The node's set as a list of HLL sketch columns whose UNION is the
    set, or None when the node is not union-representable."""
    ptype = spec.get("type")
    if ptype in ("fieldAccess", "finalizingFieldAccess"):
        return [sketches[spec["fieldName"]]]
    if ptype == "thetaSketchSetOp" and spec.get("func", "UNION").upper() == "UNION":
        out: list[Column] = []
        for f in spec["fields"]:
            u = _union_units(f, sketches)
            if u is None:
                return None
            out.extend(u)
        return out
    return None


def _est_union(units: list[Column]) -> Column:
    u = units[0]
    for c in units[1:]:
        u = F.hll_union(u, c)
    return F.hll_sketch_estimate(u)


def _approx_estimate(spec: dict, sketches: dict[str, Column]) -> Column:
    """Estimate a set-op tree from HLL sketches via unions +
    inclusion-exclusion."""
    ptype = spec.get("type")
    units = _union_units(spec, sketches)
    if units is not None:
        return _est_union(units)
    func = spec.get("func", "UNION").upper()
    operands = [_union_units(f, sketches) for f in spec["fields"]]
    if any(u is None for u in operands):
        raise ValueError(
            "approx thetaSketch: INTERSECT/NOT operands must be fieldAccess "
            "or UNION trees (nested intersections need the exact mode)"
        )
    if func == "INTERSECT":
        if len(operands) > 6:
            raise ValueError("approx thetaSketch INTERSECT limited to 6 operands")
        # |∩ S_i| = Σ_{∅≠T⊆S} (-1)^{|T|+1} |∪_{i∈T} S_i|
        from itertools import combinations

        est = F.lit(0.0)
        for r in range(1, len(operands) + 1):
            sign = 1.0 if r % 2 == 1 else -1.0
            for combo in combinations(operands, r):
                est = est + F.lit(sign) * _est_union([c for u in combo for c in u])
        return est
    if func == "NOT":
        # |A \ (B∪…)| = |A ∪ rest| - |rest|; a single-operand NOT is
        # just A (matching the exact-mode fold over one operand).
        rest = [c for u in operands[1:] for c in u]
        if not rest:
            return _est_union(operands[0])
        return _est_union(operands[0] + rest) - _est_union(rest)
    raise ValueError(f"unknown thetaSketchSetOp func {func!r}")


def _approx_theta_frame(
    base: DataFrame,
    key_cols: list,
    key_names: list[str],
    split: ThetaSplit,
    lg_k: int,
) -> tuple[DataFrame, dict[str, object]]:
    by_field: dict[str, list[str]] = {}
    for name, (fname, _flt) in split.sketches.items():
        by_field.setdefault(fname, []).append(name)
    post_domains = {
        post["name"]: _post_domain(post["field"] if "field" in post else post, split)
        for post in split.theta_posts
    }
    out: DataFrame | None = None
    for fname, names in by_field.items():
        sk_aggs = []
        for name in names:
            _f, flt = split.sketches[name]
            pred = compile_filter(flt, base) if flt is not None else F.lit(True)
            # aggregate functions skip nulls, so gating through when()
            # restricts each sketch to its filter's rows
            gated = F.when(F.coalesce(pred, F.lit(False)), safe_col(fname))
            sk_aggs.append(
                F.hll_sketch_agg(gated.cast("string"), lg_k).alias(f"__sk_{name}")
            )
        part = (
            base.where(safe_col(fname).isNotNull())
            .groupBy(*key_cols)
            .agg(*sk_aggs)
        )
        sketches = {name: F.col(f"__sk_{name}") for name in names}
        cols = [F.col(k) for k in key_names]
        for name in names:
            cols.append(
                F.greatest(F.lit(0), F.round(F.hll_sketch_estimate(sketches[name])))
                .cast("long").alias(name)
            )
        for post in split.theta_posts:
            if post_domains[post["name"]] != fname:
                continue
            src = post["field"] if "field" in post else post
            est = _approx_estimate(src, sketches)
            cols.append(
                F.greatest(F.lit(0.0), F.round(est)).cast("long").alias(post["name"])
            )
        part = part.select(*cols)
        out = part if out is None else _nullsafe_join(out, part, key_names, "full")
    return out, {name: 0 for name in split.names}


def theta_frame(
    base: DataFrame, key_cols: list, key_names: list[str], split: ThetaSplit
) -> tuple[DataFrame, dict[str, object]]:
    """Plan the theta part: a DataFrame keyed by ``key_names`` with one
    BIGINT estimate column per sketch aggregator and per theta post-agg,
    plus the zero-fill identity map (0 — an empty sketch estimates 0).

    One (level-1, level-2) aggregation pair per distinct source column;
    multiple source columns join on the group keys (each side is
    result-row cardinality)."""
    by_field: dict[str, list[str]] = {}
    for name, (fname, _flt) in split.sketches.items():
        by_field.setdefault(fname, []).append(name)
    # Validate every post-agg up front (single source column per tree).
    post_domains = {
        post["name"]: _post_domain(post["field"] if "field" in post else post, split)
        for post in split.theta_posts
    }

    out: DataFrame | None = None
    for fname, names in by_field.items():
        flag_aggs = []
        for name in names:
            _f, flt = split.sketches[name]
            pred = compile_filter(flt, base) if flt is not None else F.lit(True)
            flag_aggs.append(
                F.bool_or(F.coalesce(pred, F.lit(False))).alias(f"__in_{name}")
            )
        inner = (
            base.where(safe_col(fname).isNotNull())
            .groupBy(*key_cols, safe_col(fname).alias("__theta_value"))
            .agg(*flag_aggs)
        )
        flags = {name: F.col(f"__in_{name}") for name in names}
        estimates = [
            F.sum(F.when(flags[name], 1).otherwise(0)).cast("long").alias(name)
            for name in names
        ]
        for post in split.theta_posts:
            if post_domains[post["name"]] != fname:
                continue
            src = post["field"] if "field" in post else post
            expr = _membership(src, flags)
            estimates.append(
                F.sum(F.when(expr, 1).otherwise(0)).cast("long").alias(post["name"])
            )
        part = inner.groupBy(*[F.col(k) for k in key_names]).agg(*estimates)
        # Full outer across field groups: a group may have values in one
        # source column and none in another. Null-safe keys — see above.
        out = part if out is None else _nullsafe_join(out, part, key_names, "full")

    fills = {name: 0 for name in split.names}
    return out, fills


def attach_theta(
    agg_df: DataFrame,
    base: DataFrame,
    key_cols: list,
    key_names: list[str],
    split: ThetaSplit,
    context: dict | None = None,
) -> tuple[DataFrame, dict[str, object]]:
    """Left-join the theta estimates onto the main aggregation frame
    (which owns the complete group set) and fill absent groups — groups
    whose rows all had null sketch values — with 0.

    ``context.useApproxTheta`` switches to the fixed-size HLL-sketch
    plan (bounded level-1 shuffle — see the approximate-mode comment
    above); ``context.approxThetaLgK`` sets sketch precision
    (default 12 ≈ Druid's default sketch accuracy class)."""
    context = context or {}
    if context.get("useApproxTheta"):
        lg_k = int(context.get("approxThetaLgK", 12))
        tdf, fills = _approx_theta_frame(base, key_cols, key_names, split, lg_k)
    else:
        tdf, fills = theta_frame(base, key_cols, key_names, split)
    joined = _nullsafe_join(agg_df, tdf, key_names, "left")
    for name in split.names:
        joined = joined.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
    return joined, fills
