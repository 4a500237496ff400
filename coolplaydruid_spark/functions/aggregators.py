"""Aggregators (A1-A9) and their zero-fill identities.

Reference: Aggregations component declared query/query-module-overview.md:42,
TOC.md:30; ``longSum``/``doubleSum`` spec'd at query/query-timeseries.md:27-28.
The rest (count, min/max variants, first/last, cardinality, hyperUnique,
filtered, javascript) is public Druid v0.12 surface; HLL is named at
TOC.md:41.

All aggregators compile to built-in Spark aggregate expressions — they run
as partial (map-side) + final (reduce-side) HashAggregate pairs, which is
exactly Druid's per-segment-runner → broker mergeResults topology
(query/query-01.jpg) expressed by Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from coolplaydruid_spark.functions.extraction import safe_col

from coolplaydruid_spark.catalog import TIME_COLUMN
from coolplaydruid_spark.functions.filters import compile_filter


@dataclass
class CompiledAggs:
    exprs: list[Column]  # JVM aggregate expressions, aliased to output names
    names: list[str]  # output names in order (JVM + python)
    fills: dict[str, object]  # name -> zero-fill identity (None = leave null)
    # GROUPED_AGG pandas UDF aggregates — Spark cannot mix them with JVM
    # aggregates in one agg(), so planners run them as a parallel groupBy
    # joined back on the group keys.
    py_exprs: list[Column] = None  # type: ignore[assignment]


def compile_aggregators(
    specs: list[dict] | None,
    context: dict | None = None,
    df=None,
) -> CompiledAggs:
    """Compile an ``aggregations`` list. ``context['useExactCountDistinct']``
    switches cardinality/hyperUnique from HLL (approx_count_distinct,
    Druid-faithful) to exact count distinct (oracle-testable).

    ``df`` (optional) supplies the input schema: a ``hyperUnique`` whose
    field is a BinaryType column is treated as a pre-built HLL sketch
    column (Druid ingests hyperUnique *sketch* columns at rollup,
    TOC.md:41) and folds it with ``hll_union_agg`` instead of re-counting
    raw values."""
    context = context or {}
    binary_cols: set[str] = set()
    if df is not None:
        binary_cols = {
            f.name for f in df.schema.fields if f.dataType.typeName() == "binary"
        }
    context = dict(context, _binary_cols=binary_cols)
    exprs: list[Column] = []
    py_exprs: list[Column] = []
    names: list[str] = []
    fills: dict[str, object] = {}
    for spec in specs or []:
        name = spec["name"]
        col, fill = _compile_one(spec, context, filter_pred=None, df=df)
        if _is_python_agg(spec):
            py_exprs.append(col.alias(name))
        else:
            exprs.append(col.alias(name))
        names.append(name)
        fills[name] = fill
    return CompiledAggs(exprs, names, fills, py_exprs)


def _is_python_agg(spec: dict) -> bool:
    if spec.get("type") == "filtered":
        return _is_python_agg(spec.get("aggregator", {}))
    return spec.get("type") == "javascript" and callable(
        spec.get("fn") or spec.get("function")
    )


def _field(spec: dict) -> Column:
    # safe_col: join-dataSource right columns carry a dotted prefix
    return safe_col(spec["fieldName"])


def _compile_one(spec: dict, context: dict, filter_pred: Column | None, df=None):
    """Return (unaliased aggregate Column, zero-fill identity)."""
    atype = spec["type"]
    if atype == "filtered":
        # df: multi-value (ArrayType) dimensions in the wrapped filter
        # need any-element-matches compilation
        pred = compile_filter(spec["filter"], df)
        inner = dict(spec["aggregator"])
        inner.setdefault("name", spec.get("name", inner.get("name")))
        col, fill = _compile_one(inner, context, filter_pred=pred, df=df)
        return col, fill

    def guard(col: Column) -> Column:
        # Filtered aggregator (A8): aggregate only rows matching the
        # wrapped filter — conditional aggregation, no extra pass.
        return F.when(filter_pred, col) if filter_pred is not None else col

    if atype == "count":
        if filter_pred is not None:
            return F.coalesce(F.sum(F.when(filter_pred, F.lit(1)).otherwise(F.lit(0))), F.lit(0)).cast("long"), 0
        return F.count(F.lit(1)), 0
    if atype == "longSum":
        return F.coalesce(F.sum(guard(_field(spec))), F.lit(0)).cast("long"), 0
    if atype in ("doubleSum", "floatSum"):
        return F.coalesce(F.sum(guard(_field(spec)).cast("double")), F.lit(0.0)), 0.0
    if atype == "longMin":
        return F.min(guard(_field(spec))).cast("long"), None
    if atype == "longMax":
        return F.max(guard(_field(spec))).cast("long"), None
    if atype in ("doubleMin", "floatMin"):
        return F.min(guard(_field(spec)).cast("double")), None
    if atype in ("doubleMax", "floatMax"):
        return F.max(guard(_field(spec)).cast("double")), None
    if atype in ("longFirst", "doubleFirst", "floatFirst", "stringFirst"):
        ts = spec.get("timeColumn", TIME_COLUMN)
        return F.min_by(guard(_field(spec)), guard(F.col(ts))), None
    if atype in ("longLast", "doubleLast", "floatLast", "stringLast"):
        ts = spec.get("timeColumn", TIME_COLUMN)
        return F.max_by(guard(_field(spec)), guard(F.col(ts))), None
    if atype == "cardinality":
        fields = spec.get("fields") or [spec["fieldName"]]
        cols = [guard(F.col(f if isinstance(f, str) else f["dimension"])) for f in fields]
        by_row = spec.get("byRow", False)
        if len(cols) > 1 and not by_row:
            # Druid byRow=false: cardinality of the UNION of the fields'
            # value sets (not of tuples). One pass: build a sketch per
            # field and union them — JVM-side, mergeable, no explode.
            # hll_sketch_agg skips null AND "" — which is exactly Druid
            # 0.12's cardinality behavior under null≡"". Exactness over a
            # union is not a single aggregate; the exact switch applies
            # to the byRow/tuple form only.
            sketches = [F.hll_sketch_agg(c.cast("string")) for c in cols]
            union = sketches[0]
            for s in sketches[1:]:
                union = F.hll_union(union, s)
            return F.hll_sketch_estimate(union), 0
        # single field, or byRow=true: distinct count of the value/tuple
        if context.get("useExactCountDistinct"):
            return F.count_distinct(*cols), 0
        return F.approx_count_distinct(cols[0] if len(cols) == 1 else F.struct(*cols)), 0
    if atype == "hyperUnique":
        col = guard(_field(spec))
        if spec["fieldName"] in context.get("_binary_cols", ()):
            # Pre-built HLL sketch column (written by rollup ingest with
            # buildSketches — Druid's mergeable HyperLogLog metric,
            # TOC.md:41): fold sketches, estimate at the end. Merging is
            # lossless, so distinct counts survive rollup. Exactness is
            # unrecoverable from a sketch; useExactCountDistinct cannot
            # apply here.
            return F.hll_sketch_estimate(F.hll_union_agg(col)), 0
        if context.get("buildSketches"):
            # Ingest-time form: BUILD the mergeable sketch (binary) so the
            # rolled-up table can answer distinct-count queries later.
            return F.hll_sketch_agg(col), None
        # Raw-value form: approx_count_distinct is Spark's HLL++ over the
        # raw column (SURVEY §7.5.5).
        if context.get("useExactCountDistinct"):
            return F.count_distinct(col), 0
        return F.approx_count_distinct(col), 0
    if atype in ("percentile", "approxHistogramFold"):
        # Druid 0.12's approximate-histogram extension exposes quantiles;
        # like topN we compute them EXACTLY (documented divergence — the
        # approximate form is a context switch away). `probability` in
        # [0,1]; exact percentile is oracle-testable against DuckDB
        # quantile_cont. `context['useApproxQuantile']` switches to
        # percentile_approx (sketch-based, mergeable — the 100 TB path).
        p = float(spec.get("probability", 0.5))
        col = guard(_field(spec)).cast("double")
        if context.get("useApproxQuantile"):
            return F.percentile_approx(col, p), None
        return F.percentile(col, p), None
    if atype == "javascript":
        # Druid's JS fold/combine extension point (A9) — we accept a
        # *Python* callable (pd.Series -> scalar) instead of JS source
        # (documented divergence, SURVEY §2.9). Runs as an Arrow-batched
        # GROUPED_AGG pandas_udf — the only aggregator that leaves the JVM.
        fn = spec.get("fn") or spec.get("function")
        if callable(fn):
            import pandas as pd

            from pyspark.sql.functions import pandas_udf

            return_type = spec.get("returnType", "double")
            fields = spec.get("fieldNames") or [spec["fieldName"]]
            # Series->scalar type hints select the GROUPED_AGG form (the
            # PandasUDFType enum is deprecated). Annotations are set as
            # live objects because this module's postponed evaluation
            # (`from __future__ import annotations`) would otherwise hand
            # pyspark unresolvable strings.
            if len(fields) == 1:
                def wrapper(s):
                    return fn(s)

                wrapper.__annotations__ = {"s": pd.Series, "return": float}
            else:
                def wrapper(*series):
                    return fn(*series)

                wrapper.__annotations__ = {"series": pd.Series, "return": float}
            udaf = pandas_udf(wrapper, return_type)
            return udaf(*[guard(F.col(f)) for f in fields]), None
        if isinstance(spec.get("fnAggregate"), str):
            # JS-source additive folds (`return current + <expr>`) are
            # transpiled to a native sum over the per-row increment
            # (functions/jsexpr.py) — fully JVM-side and mergeable, which
            # is the only JS-aggregator shape with a distributed
            # equivalent that needs no per-row script engine. fnCombine/
            # fnReset are implied by sum semantics and ignored.
            from coolplaydruid_spark.functions.jsexpr import (
                compile_additive_aggregator,
            )

            fields = spec.get("fieldNames") or [spec["fieldName"]]
            return (
                compile_additive_aggregator(
                    spec["fnAggregate"], [guard(F.col(f)) for f in fields]
                ),
                0.0,
            )
        raise NotImplementedError(
            "javascript aggregator: pass JS fnAggregate source (additive "
            "fold subset) or a Python callable as 'fn' (SURVEY §2.9)"
        )
    raise ValueError(f"unknown aggregator type {atype!r}")
