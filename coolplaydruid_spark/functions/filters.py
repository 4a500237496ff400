"""Filter tree compiler (F1-F14 in SURVEY §2.2).

Reference: Filters component declared at query/query-module-overview.md:41;
the concrete and/or/selector grammar with nesting is exhibited at
query/query-timeseries.md:14-25. Remaining types (not/in/bound/like/regex/
search/interval/javascript/columnComparison + extractionFn wrapping) are
public Druid v0.12 semantics.

Every filter compiles to a boolean Column expression, so Catalyst pushes
eligible predicates into the Parquet scan (PushedFilters) — the Spark
analogue of Druid's bitmap-index row skipping (TOC.md:39-40). Null
handling follows Druid 0.12: null and empty string are equivalent for
string dimensions (SURVEY §7.5.3).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from coolplaydruid_spark.functions.extraction import apply_extraction
from coolplaydruid_spark.functions.granularity import intervals_predicate


def compile_filter(spec: dict | None) -> Column | None:
    """Compile a Druid filter spec to a boolean Column (None -> no filter)."""
    if spec is None:
        return None
    ftype = spec.get("type")
    if ftype in ("and", "or"):
        subs = [compile_filter(f) for f in spec["fields"]]
        op = (lambda a, b: a & b) if ftype == "and" else (lambda a, b: a | b)
        return reduce(op, subs)
    if ftype == "not":
        return ~compile_filter(spec["field"])
    dim = _dim_col(spec)
    if ftype == "selector":
        value = spec.get("value")
        if value is None or value == "":
            # Druid 0.12: null and "" match each other for string dims.
            return dim.isNull() | (dim.cast("string") == F.lit(""))
        return dim == F.lit(value)
    if ftype == "columnComparison":
        a, b = spec["dimensions"]
        return F.col(a if isinstance(a, str) else a["dimension"]) == F.col(
            b if isinstance(b, str) else b["dimension"]
        )
    if ftype == "in":
        values = spec["values"]
        non_null = [v for v in values if v is not None and v != ""]
        pred = dim.isin(non_null) if non_null else F.lit(False)
        if len(non_null) != len(values):
            pred = pred | dim.isNull() | (dim.cast("string") == F.lit(""))
        return pred
    if ftype == "bound":
        return _bound(dim, spec)
    if ftype == "like":
        return dim.like(spec["pattern"])
    if ftype == "regex":
        return dim.rlike(spec["pattern"])
    if ftype == "search":
        q = spec.get("query", {})
        qtype = q.get("type", "insensitive_contains")
        if qtype == "contains":
            pred = dim.contains(q["value"])
            if q.get("caseSensitive") is False:
                pred = F.lower(dim).contains(q["value"].lower())
            return pred
        if qtype == "insensitive_contains":
            return F.lower(dim).contains(q["value"].lower())
        if qtype == "fragment":
            frags = q.get("values", [])
            case_sensitive = q.get("caseSensitive", False)
            preds = [
                dim.contains(f) if case_sensitive else F.lower(dim).contains(f.lower())
                for f in frags
            ]
            return reduce(lambda a, b: a & b, preds) if preds else F.lit(True)
        raise ValueError(f"unknown search query type {qtype!r}")
    if ftype == "interval":
        col = F.col(spec.get("dimension", "__time"))
        return intervals_predicate(spec["intervals"], col)
    if ftype == "javascript":
        fn = spec.get("function")
        if callable(fn):
            return F.udf(fn, T.BooleanType())(dim)
        raise NotImplementedError(
            "javascript filter: pass a Python callable as 'function' "
            "(JS source compat is out of scope, SURVEY §2.9)"
        )
    if ftype == "true":
        return F.lit(True)
    if ftype == "false":
        return F.lit(False)
    raise ValueError(f"unknown filter type {ftype!r}")


def _dim_col(spec: dict) -> Column:
    dim = spec.get("dimension")
    col = F.col(dim) if dim is not None else F.lit(None)
    return apply_extraction(col, spec.get("extractionFn"))


def _bound(dim: Column, spec: dict) -> Column:
    ordering = spec.get("ordering", "lexicographic")
    if ordering == "numeric":
        dim = dim.cast("double")
        conv = float
    elif ordering == "lexicographic":
        dim = dim.cast("string")
        conv = str
    else:
        raise ValueError(f"unsupported bound ordering {ordering!r}")
    preds = []
    if spec.get("lower") is not None:
        lo = F.lit(conv(spec["lower"]))
        preds.append(dim > lo if spec.get("lowerStrict") else dim >= lo)
    if spec.get("upper") is not None:
        hi = F.lit(conv(spec["upper"]))
        preds.append(dim < hi if spec.get("upperStrict") else dim <= hi)
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)
