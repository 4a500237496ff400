"""Extraction functions — transform a dimension before filtering/grouping.

Reference: DimensionSpecs component (query/query-module-overview.md:45,
TOC.md:32) declares extraction; the concrete function set (substring,
regex, timeFormat, lookup, lower/upper, strlen, cascade, javascript) is
public Druid v0.12 surface. All compile to built-in Column expressions
(JVM-side); the ``javascript`` type accepts a *Python* callable instead of
JS source (documented divergence, SURVEY §2.9) and is the only slow path.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def apply_extraction(col: Column, spec: dict | None) -> Column:
    if spec is None:
        return col
    etype = spec.get("type")
    if etype == "substring":
        # Druid SubstringDimExtractionFn returns NULL (not "") when
        # index >= length — including for the empty string. The
        # distinction surfaces in cascades: stringFormat's NULLSTRING
        # handling renders null as "null" but "" as "".
        index = int(spec.get("index", 0))
        length = spec.get("length")
        if length is None:
            out = F.substring(col, index + 1, 1 << 30)
        else:
            out = F.substring(col, index + 1, int(length))
        return F.when(F.length(col) > index, out)
    if etype == "strlen":
        return F.length(col).cast("string")
    if etype == "bucket":
        # BucketExtractionFn: numeric dim → lower bound of its bucket,
        # floor((v - offset) / size) * size + offset, as a string
        # (integral bounds render without a decimal point; non-numeric
        # input → null, matching Druid's null on unparseable values).
        size = float(spec.get("size", 1))
        if size <= 0:
            raise ValueError(f"bucket extractionFn needs size > 0, got {size}")
        offset = float(spec.get("offset", 0))
        # try_cast throughout: non-numeric input yields null, and bucket
        # bounds beyond long range render via the double branch — under
        # ANSI mode (this repo's default) a plain cast would abort the
        # whole query on the first such row.
        v = col.try_cast("double")
        b = F.floor((v - offset) / size) * size + offset
        as_long = b.try_cast("long")
        return F.when(
            b == as_long, as_long.cast("string")
        ).otherwise(b.cast("string"))
    if etype == "lower":
        return F.lower(col)
    if etype == "upper":
        return F.upper(col)
    if etype == "regex":
        idx = int(spec.get("index", 1))
        out = F.regexp_extract(col, spec["expr"], idx)
        # Druid: non-matching value -> null (or replaceMissingValueWith)
        missing = spec.get("replaceMissingValueWith")
        if spec.get("replaceMissingValue"):
            return F.when(out == "", F.lit(missing)).otherwise(out)
        return F.when(out == "", None).otherwise(out)
    if etype == "timeFormat":
        fmt = spec.get("format", "yyyy-MM-dd'T'HH:mm:ss'Z'")
        tz = spec.get("timeZone")
        ts = F.from_utc_timestamp(col, tz) if tz else col
        return F.date_format(ts, fmt)
    if etype == "partial":
        # Druid PartialDimExtractionFn: value kept verbatim when the
        # Java regex FINDS a match anywhere (not full-match), else null.
        return F.when(col.rlike(spec["expr"]), col)
    if etype == "stringFormat":
        # Druid StringFormatExtractionFn: printf with the dim value as
        # the single %s argument. nullHandling: NULLSTRING (default —
        # null renders as the literal "null"), EMPTYSTRING, RETURNNULL.
        fmt = spec["format"]
        handling = (spec.get("nullHandling") or "NULLSTRING").upper()
        if handling == "RETURNNULL":
            return F.when(col.isNotNull(), F.format_string(fmt, col))
        sub = "null" if handling == "NULLSTRING" else ""
        return F.format_string(fmt, F.coalesce(col, F.lit(sub)))
    if etype == "lookup":
        return _lookup(col, spec)
    if etype == "_joinedLookup":
        # Internal: a registered lookup already broadcast-joined by
        # plans/lookups.py — the value column carries the mapped value.
        looked = F.col(spec["column"])
        if spec.get("retainMissingValue"):
            return F.coalesce(looked, col)
        missing = spec.get("replaceMissingValueWith")
        if missing is not None:
            return F.coalesce(looked, F.lit(missing))
        return looked
    if etype == "cascade":
        for sub in spec["extractionFns"]:
            col = apply_extraction(col, sub)
        return col
    if etype == "javascript":
        fn = spec.get("function")
        if callable(fn):
            return F.udf(fn, T.StringType())(col)
        if isinstance(fn, str):
            # JS source transpiled to a native Column (functions/jsexpr.py):
            # JVM-side, codegen-friendly, no script engine. Druid
            # extractionFns emit strings, so the result is cast.
            from coolplaydruid_spark.functions.jsexpr import compile_scalar

            return compile_scalar(fn, [col]).cast("string")
        raise NotImplementedError(
            "javascript extractionFn: pass JS source (transpiled subset) "
            "or a Python callable as 'function' (SURVEY §2.9)"
        )
    raise ValueError(f"unknown extractionFn type {etype!r}")


def _lookup(col: Column, spec: dict) -> Column:
    """Map lookup. Small literal maps become a create_map expression (kept
    in codegen). At scale a lookup table would be a broadcast join; the
    inline-literal form matches the reference's registered-lookup use."""
    lookup = spec.get("lookup", {})
    if isinstance(lookup, str):
        raise ValueError(
            f"registered lookup {lookup!r} reached the Column compiler — "
            "registered lookups resolve via DruidEngine.plan (broadcast "
            "join, plans/lookups.py); register it with "
            "catalog.register_lookup and query through the engine"
        )
    mapping: dict = lookup.get("map", {})
    pairs = list(chain.from_iterable((F.lit(k), F.lit(v)) for k, v in mapping.items()))
    looked = F.element_at(F.create_map(*pairs), col) if pairs else F.lit(None).cast("string")
    if spec.get("retainMissingValue"):
        return F.coalesce(looked, col)
    missing = spec.get("replaceMissingValueWith")
    if missing is not None:
        return F.coalesce(looked, F.lit(missing))
    return looked


def safe_col(name: str) -> Column:
    """F.col that tolerates dots in the column NAME (join dataSources'
    rightPrefix default is "r.", so joined frames carry dotted columns;
    unquoted dots would parse as struct access)."""
    return F.col(f"`{name}`") if "." in name else F.col(name)


def unwrap_list_filtered(spec):
    """``listFiltered`` dimensionSpec (public Druid multi-value spec:
    filter a multi-value dimension's ELEMENTS before grouping): returns
    (delegate_spec, values, is_whitelist) or None. The planner applies
    the element filter to the array column before its explode and then
    treats the spec as its delegate."""
    if isinstance(spec, dict) and spec.get("type") == "listFiltered":
        return (
            spec["delegate"],
            [str(v) for v in spec.get("values") or []],
            bool(spec.get("isWhitelist", True)),
        )
    return None


def list_filtered_column(col: Column, values: list[str], is_whitelist: bool) -> Column:
    allow = F.array(*[F.lit(v) for v in values])
    if is_whitelist:
        return F.filter(col, lambda x: F.array_contains(allow, x))
    # blacklist: a NULL element is not in the list and must be KEPT —
    # bare ~array_contains(.., NULL) is NULL, which filter drops
    return F.filter(
        col, lambda x: ~F.coalesce(F.array_contains(allow, x), F.lit(False))
    )


def rewrite_list_filtered(spec, base, array_dims: set[str], tmp_name: str):
    """Apply a ``listFiltered`` dimensionSpec WITHOUT touching the source
    column: the element-filtered array lands in ``tmp_name`` and the
    delegate is rewritten to read it, so aggregators / other dimensions
    over the same multi-value column still see the row's REAL values
    (Druid scopes listFiltered to the one dimensionSpec's output).
    Returns (new_base, rewritten_delegate_spec)."""
    delegate, values, is_whitelist = unwrap_list_filtered(spec)
    raw = delegate if isinstance(delegate, str) else delegate.get("dimension")
    if raw not in array_dims:
        raise ValueError(
            f"listFiltered delegate {raw!r} is not a multi-value dimension"
        )
    base = base.withColumn(
        tmp_name, list_filtered_column(F.col(raw), values, is_whitelist)
    )
    if isinstance(delegate, str):
        rewritten = {"type": "default", "dimension": tmp_name, "outputName": delegate}
    else:
        rewritten = {
            **delegate,
            "dimension": tmp_name,
            "outputName": delegate.get("outputName", raw),
        }
    return base, rewritten


# outputType (public Druid DimensionSpec field): coerce the dimension
# value to the declared type; unparseable values → null (Druid's
# null-on-coercion-failure behavior, matching try_cast).
_OUTPUT_TYPES = {"STRING": "string", "LONG": "long", "FLOAT": "float",
                 "DOUBLE": "double"}


def dimension_column(spec) -> tuple[Column, str]:
    """Compile a DimensionSpec (string | {type: default|extraction}) to
    (expression, outputName)."""
    if isinstance(spec, str):
        return safe_col(spec), spec
    dtype = spec.get("type", "default")
    dim = spec["dimension"]
    out = spec.get("outputName", dim)
    col = safe_col(dim)
    if dtype == "extraction":
        col = apply_extraction(col, spec.get("extractionFn"))
    elif dtype != "default":
        raise ValueError(f"unknown dimensionSpec type {dtype!r}")
    output_type = spec.get("outputType")
    if output_type is not None:
        target = _OUTPUT_TYPES.get(str(output_type).upper())
        if target is None:
            raise ValueError(f"unknown dimensionSpec outputType {output_type!r}")
        if target == "long":
            # Druid's convertObjectToLong falls back to double-parse +
            # truncation for decimal-formatted strings ("3.5" -> 3);
            # a direct try_cast('long') would null them instead.
            col = col.try_cast("double").try_cast("long")
        else:
            col = col.try_cast(target)
    return col, out
