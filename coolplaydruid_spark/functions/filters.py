"""Filter tree compiler (F1-F14 in SURVEY §2.2).

Reference: Filters component declared at query/query-module-overview.md:41;
the concrete and/or/selector grammar with nesting is exhibited at
query/query-timeseries.md:14-25. Remaining types (not/in/bound/like/regex/
search/interval/javascript/columnComparison + extractionFn wrapping) are
public Druid v0.12 semantics.

Every filter compiles to a boolean Column expression, so Catalyst pushes
eligible predicates into the Parquet scan (PushedFilters) — the Spark
analogue of Druid's bitmap-index row skipping (TOC.md:39-40).

Null handling follows Druid 0.12 two-valued logic: null and empty string
are equivalent for string dimensions (SURVEY §7.5.3), and a filter is
never "unknown" — so ``not`` must match rows where the inner predicate
evaluates to SQL NULL (null dimension), and leaf filters whose predicate
is satisfied by "" (e.g. ``like '%'``, a regex matching the empty string,
a bound with no lower edge) must match null dimensions too. Rather than
coalescing the dimension to "" (which would wrap the scan column and kill
predicate pushdown), we keep the raw-column predicate and OR in an
``isNull`` branch exactly when "" would match — computed driver-side per
filter spec. Parquet pushes ``Or(pred, IsNull(col))`` fine.

Multi-value string dimensions (ArrayType columns): Druid's leaf string
filters match when ANY element matches (core 0.12 multi-value semantics).
selector/in compile to ``array_contains``/``arrays_overlap``; the other
leaf types compile to ``F.exists`` with the same scalar predicate applied
per element — all JVM-side, no explode needed at filter time.
"""

from __future__ import annotations

import re as _re
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from coolplaydruid_spark.functions.extraction import apply_extraction
from coolplaydruid_spark.functions.granularity import intervals_predicate

# Leaf filter types whose semantics are "dimension value satisfies a
# string predicate" — these get any-element-matches treatment on
# ArrayType dimensions.
_STRING_LEAVES = ("selector", "in", "bound", "like", "regex", "search")


def compile_filter(spec: dict | None, df: DataFrame | None = None) -> Column | None:
    """Compile a Druid filter spec to a boolean Column (None -> no filter).

    ``df`` (optional) supplies the schema used to detect multi-value
    (ArrayType) dimensions; without it, filters compile assuming scalar
    dimensions (sufficient for post-aggregation having filters).
    """
    if spec is None:
        return None
    array_dims: set[str] = set()
    if df is not None:
        array_dims = {
            f.name for f in df.schema.fields if f.dataType.typeName() == "array"
        }
    return _compile(spec, array_dims, df)


def _compile(spec: dict, array_dims: set[str], df: DataFrame | None = None) -> Column:
    ftype = spec.get("type")
    if ftype in ("and", "or"):
        subs = [_compile(f, array_dims, df) for f in spec["fields"]]
        op = (lambda a, b: a & b) if ftype == "and" else (lambda a, b: a | b)
        return reduce(op, subs)
    if ftype == "not":
        # Druid two-valued logic: the inner filter is false (not unknown)
        # on null dimensions, so NOT must match those rows — coalesce the
        # SQL NULL away before negating.
        return ~F.coalesce(_compile(spec["field"], array_dims, df), F.lit(False))
    if ftype == "columnComparison":
        a, b = spec["dimensions"]
        ca = F.col(a if isinstance(a, str) else a["dimension"])
        cb = F.col(b if isinstance(b, str) else b["dimension"])
        # null ≡ "" on both sides: two null dims compare equal.
        return F.coalesce(ca.cast("string"), F.lit("")) == F.coalesce(
            cb.cast("string"), F.lit("")
        )
    if ftype == "interval":
        col = F.col(spec.get("dimension", "__time"))
        return intervals_predicate(spec["intervals"], col)
    if ftype == "javascript":
        fn = spec.get("function")
        if callable(fn):
            return F.udf(fn, T.BooleanType())(_dim_col(spec))
        if isinstance(fn, str):
            # JS source is TRANSPILED to a native Column predicate
            # (functions/jsexpr.py) — runs in whole-stage codegen, no
            # script engine, no UDF. Out-of-subset source raises.
            from coolplaydruid_spark.functions.jsexpr import compile_predicate

            return compile_predicate(fn, [_dim_col(spec)])
        raise NotImplementedError(
            "javascript filter: pass JS source (transpiled subset) or a "
            "Python callable as 'function' (SURVEY §2.9)"
        )
    if ftype == "true":
        return F.lit(True)
    if ftype == "false":
        return F.lit(False)
    if ftype == "expression":
        # Druid expression filter: the row matches when the expression is
        # truthy (nonzero / non-empty). Druid dialect first, Spark SQL
        # fallback — the virtualColumns priority (plans/common.py).
        from coolplaydruid_spark.functions.druidexpr import (
            DruidExprError,
            compile_druid_predicate,
        )

        try:
            # predicate form: raw boolean, so comparisons reach
            # PushedFilters instead of hiding behind a 1/0-long cast;
            # df supplies column types (string comparisons stay lexical)
            col = compile_druid_predicate(spec["expression"], df)
        except DruidExprError:
            col = F.expr(spec["expression"]).cast("boolean")
        return F.coalesce(col, F.lit(False))
    if ftype == "extraction":
        # Deprecated pre-0.13 filter form: selector + extractionFn spelled
        # as its own type — normalize and recurse.
        return _compile({**spec, "type": "selector"}, array_dims, df)
    if ftype in _STRING_LEAVES:
        if spec.get("dimension") in array_dims:
            return _multivalue_leaf(spec, ftype)
        return _scalar_leaf(spec, ftype)
    raise ValueError(f"unknown filter type {ftype!r}")


def _scalar_leaf(spec: dict, ftype: str) -> Column:
    dim = _dim_col(spec)
    pred = _leaf_pred(dim, spec, ftype)
    # null ≡ "": when the empty string satisfies this filter, null
    # dimensions must match too. selector/in handle their null cases
    # inside _leaf_pred; for the rest, OR in an isNull branch (kept
    # outside the main predicate so pushdown still sees the raw
    # comparison). With an extractionFn the same rule applies to the
    # EXTRACTED value — extraction fns yield null for non-matches /
    # out-of-range input (regex, partial, substring), and Druid 0.12
    # treats that null as "" too; the isNull branch then wraps the
    # extracted column (no pushdown to lose — the predicate is already
    # an expression over the extraction).
    if (
        ftype not in ("selector", "in")
        and spec.get("dimension") is not None
        and _matches_empty(spec, ftype)
    ):
        if spec.get("extractionFn") is None:
            pred = pred | _raw_dim(spec).isNull()
        else:
            pred = pred | dim.isNull()
    return pred


def _multivalue_leaf(spec: dict, ftype: str) -> Column:
    """Any-element-matches over an ArrayType dimension. A null/empty array
    is equivalent to a null scalar dimension (Druid 0.12)."""
    arr = _raw_dim(spec)
    ex = spec.get("extractionFn")
    # null ≡ "" holds per ELEMENT too: an array containing a null value
    # matches exactly when "" would (found by the MV×extraction fuzzer —
    # array_contains/arrays_overlap skip null elements and yield null,
    # not a match, for ['a', NULL] vs '').
    has_emptyish = F.coalesce(
        F.exists(arr, lambda x: x.isNull() | (x == "")), F.lit(False)
    )
    if ftype == "selector" and ex is None:
        value = spec.get("value")
        if value is None or value == "":
            return arr.isNull() | (F.size(arr) == 0) | has_emptyish
        return F.coalesce(F.array_contains(arr, F.lit(value)), F.lit(False))
    if ftype == "in" and ex is None:
        values = spec["values"]
        non_null = [v for v in values if v is not None and v != ""]
        pred = (
            F.arrays_overlap(arr, F.array(*[F.lit(v) for v in non_null]))
            if non_null
            else F.lit(False)
        )
        if len(non_null) != len(values):
            pred = pred | arr.isNull() | (F.size(arr) == 0) | has_emptyish
        return F.coalesce(pred, F.lit(False))
    # null ≡ "" applies to arrays too: a null/empty array is one null
    # value, and an extraction yielding null for an element behaves as
    # "" — so when "" satisfies this leaf, those cases must match
    # (mirrors the scalar path's isNull branch).
    me = _matches_empty(spec, ftype)

    def per_element(x):
        ext = apply_extraction(x, ex)
        p = F.coalesce(_leaf_pred(ext, spec, ftype), F.lit(False))
        if me:
            # null extracted value ≡ "" — and with no extractionFn this
            # is the raw element: a null ELEMENT matches when "" would
            # (the ex-is-not-None guard here was wrong; MV×extraction
            # fuzzer find).
            p = p | ext.isNull()
        return p

    pred = F.coalesce(F.exists(arr, per_element), F.lit(False))
    if ex is not None:
        # A null/empty array is ONE null value, and Druid evaluates the
        # extraction over it — a lookup/regex with a replaceMissingValue-
        # style result can map null to a non-null value that the leaf
        # then matches. exists() never runs the lambda for a null/empty
        # array, so evaluate _leaf_pred over extraction(null) explicitly
        # (a constant-foldable expression per spec) instead of gating on
        # the raw _matches_empty alone; extraction(null) → null still
        # behaves as "" (me), mirroring per_element.
        ext_null = apply_extraction(F.lit(None).cast("string"), ex)
        null_case = F.coalesce(_leaf_pred(ext_null, spec, ftype), F.lit(False))
        if me:
            null_case = null_case | ext_null.isNull()
        pred = pred | ((arr.isNull() | (F.size(arr) == 0)) & null_case)
    elif me:
        pred = pred | arr.isNull() | (F.size(arr) == 0)
    return pred


def _leaf_pred(dim: Column, spec: dict, ftype: str) -> Column:
    """The scalar predicate for one dimension value (shared between the
    scalar path and the per-element multi-value path)."""
    if ftype == "selector":
        value = spec.get("value")
        if value is None or value == "":
            # Druid 0.12: null and "" match each other for string dims.
            return dim.isNull() | (dim.cast("string") == F.lit(""))
        return dim == F.lit(value)
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
            if q.get("caseSensitive") is False:
                return F.lower(dim).contains(q["value"].lower())
            return dim.contains(q["value"])
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
    raise ValueError(f"unknown leaf filter type {ftype!r}")


def _matches_empty(spec: dict, ftype: str) -> bool:
    """Would Druid's null≡"" dimension value satisfy this leaf filter?
    Computed driver-side so the isNull branch is only emitted when
    needed."""
    try:
        if ftype == "bound":
            ordering = spec.get("ordering", "lexicographic")
            if ordering == "numeric":
                return False  # "" does not parse as a number
            if ordering == "alphanumeric":
                # "" keys to "" — compare in key space, like _bound
                from coolplaydruid_spark.functions.ordering import (
                    alphanumeric_key_py as _k,
                )

                def _norm(v):
                    return _k(str(v))
            else:
                def _norm(v):
                    return str(v)
            ok = True
            lo, hi = spec.get("lower"), spec.get("upper")
            if lo is not None:
                lo = _norm(lo)
                ok = ok and (("" > lo) if spec.get("lowerStrict") else ("" >= lo))
            if hi is not None:
                hi = _norm(hi)
                ok = ok and (("" < hi) if spec.get("upperStrict") else ("" <= hi))
            return ok
        if ftype == "like":
            # a LIKE pattern matches "" iff it is all-wildcard
            return set(spec["pattern"]) <= {"%"}
        if ftype == "regex":
            return bool(_re.search(spec["pattern"], ""))
        if ftype == "search":
            q = spec.get("query", {})
            qtype = q.get("type", "insensitive_contains")
            if qtype in ("contains", "insensitive_contains"):
                return q.get("value", "") == ""
            if qtype == "fragment":
                return all(v == "" for v in q.get("values", []))
        return False
    except Exception:
        return False


def _dim_col(spec: dict) -> Column:
    from coolplaydruid_spark.functions.extraction import safe_col

    dim = spec.get("dimension")
    col = safe_col(dim) if dim is not None else F.lit(None)
    return apply_extraction(col, spec.get("extractionFn"))


def _raw_dim(spec: dict) -> Column:
    from coolplaydruid_spark.functions.extraction import safe_col

    return safe_col(spec["dimension"])


def _bound(dim: Column, spec: dict) -> Column:
    ordering = spec.get("ordering", "lexicographic")
    if ordering == "numeric":
        dim = dim.cast("double")
        conv = float
    elif ordering == "alphanumeric":
        # compare order-preserving keys on both sides (the bound
        # literal normalizes driver-side) — functions/ordering.py
        from coolplaydruid_spark.functions.ordering import (
            alphanumeric_key,
            alphanumeric_key_py,
        )

        dim = alphanumeric_key(dim)

        def conv(v):
            return alphanumeric_key_py(str(v))
    elif ordering == "lexicographic":
        dim = dim.cast("string")
        conv = str
    elif ordering == "strlen":
        # Druid's strlen StringComparator: shorter sorts first, ties
        # break lexicographically — compare the (length, value) tuple.
        dim = dim.cast("string")
        s = dim

        def _cmp(strict_op, eq_ok, bound_val):
            b = F.lit(str(bound_val))
            longer = F.length(s) > F.length(b) if strict_op == ">" else \
                F.length(s) < F.length(b)
            tie = (F.length(s) == F.length(b)) & (
                (s > b) if strict_op == ">" else (s < b)
            )
            out = longer | tie
            if eq_ok:
                out = out | (s == b)
            return out

        preds = []
        if spec.get("lower") is not None:
            preds.append(_cmp(">", not spec.get("lowerStrict"), spec["lower"]))
        if spec.get("upper") is not None:
            preds.append(_cmp("<", not spec.get("upperStrict"), spec["upper"]))
        if not preds:
            return F.lit(True)
        return reduce(lambda a, b: a & b, preds)
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
