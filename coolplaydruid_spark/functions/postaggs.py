"""Post-aggregators (P1-P5) — expressions over aggregate outputs.

Reference: component declared query/query-module-overview.md:43, TOC.md:31;
``arithmetic`` + ``fieldAccess`` spec'd with a worked example at
query/query-timeseries.md:31-39,58. Druid semantics for ``/``: integer-ish
division that yields 0 on divide-by-zero; ``quotient`` is IEEE double
division. Post-aggs evaluate per result row (after grouping), so they are
a plain projection.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from coolplaydruid_spark.functions.extraction import safe_col


def compile_post_aggregator(spec: dict) -> Column:
    ptype = spec["type"]
    if ptype == "fieldAccess" or ptype == "finalizingFieldAccess":
        return safe_col(spec["fieldName"])
    if ptype == "constant":
        return F.lit(spec["value"])
    if ptype == "hyperUniqueCardinality":
        # Our hyperUnique aggregator output is already a finalized number.
        return safe_col(spec["fieldName"])
    if ptype == "arithmetic":
        fields = [compile_post_aggregator(f) for f in spec["fields"]]
        fn = spec["fn"]
        if fn == "+":
            return reduce(lambda a, b: a + b, fields)
        if fn == "-":
            return reduce(lambda a, b: a - b, fields)
        if fn == "*":
            return reduce(lambda a, b: a * b, fields)
        if fn == "/":
            # Druid: division by zero -> 0
            return reduce(
                lambda a, b: F.when(b == 0, F.lit(0.0)).otherwise(a / b), fields
            )
        if fn == "quotient":
            return reduce(lambda a, b: a / b, fields)
        raise ValueError(f"unknown arithmetic fn {fn!r}")
    if ptype in ("doubleGreatest", "longGreatest"):
        cols = [compile_post_aggregator(f) for f in spec["fields"]]
        out = F.greatest(*cols)
        return out.cast("long") if ptype.startswith("long") else out
    if ptype in ("doubleLeast", "longLeast"):
        cols = [compile_post_aggregator(f) for f in spec["fields"]]
        out = F.least(*cols)
        return out.cast("long") if ptype.startswith("long") else out
    if ptype == "javascript":
        # Druid 0.12 javascript post-aggregator: function over the named
        # aggregate outputs. JS SOURCE transpiles to a native Column
        # (numeric parameter binding — post-agg fields are numbers, so
        # `+` adds); a Python callable is the out-of-subset escape hatch.
        fields = spec.get("fieldNames") or []
        fn = spec.get("function")
        if callable(fn):
            from pyspark.sql.types import DoubleType

            udf = F.udf(fn, DoubleType())
            return udf(*[F.col(f).cast("double") for f in fields])
        from coolplaydruid_spark.functions.jsexpr import compile_scalar

        return compile_scalar(fn, [F.col(f) for f in fields], kind="num")
    if ptype == "expression":
        # expression post-agg (a later-Druid convenience): Druid's own
        # expression dialect first, Spark SQL fallback — same priority
        # as virtualColumns (plans/common.py). No df in scope here, so
        # identifiers (aggregate outputs — always numeric) type as
        # 'unknown' and arithmetic widens to double, which is what
        # Druid's finalized post-agg doubles are anyway.
        from coolplaydruid_spark.functions.druidexpr import (
            DruidExprError,
            compile_druid_expr,
        )

        try:
            return compile_druid_expr(spec["expression"])
        except DruidExprError:
            return F.expr(spec["expression"])
    raise ValueError(f"unknown postAggregator type {ptype!r}")


def compile_post_aggregators(specs: list[dict] | None) -> list[tuple[str, Column]]:
    out = []
    for spec in specs or []:
        out.append((spec["name"], compile_post_aggregator(spec).alias(spec["name"])))
    return out
