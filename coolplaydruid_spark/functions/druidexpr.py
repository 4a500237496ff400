"""Druid-native expression language front-end.

Druid virtual columns, transforms, and expression filters are written in
Druid's own expression dialect (public ``math-expr`` docs; the reference
declares expression virtual columns as part of the query surface,
query/query-module-overview.md:20-33). This module is a recursive-descent
parser that COMPILES that dialect to native Spark Columns — the same
pattern as jsexpr.py for JavaScript sources — so a real Druid query's
``timestamp_floor(__time,'PT1H')`` or ``nvl(x,'-')`` runs unmodified,
inside whole-stage codegen, with zero per-row interpretation.

Supported surface (the practical Druid expression subset):
 - operators: ``||  &&  <  <=  >  >=  ==  !=  +  -  *  /  %  ^``
   (``^`` is POWER — Druid, not Spark SQL where it is XOR), unary
   ``-`` and ``!``, parentheses, ternary-free (Druid uses ``if()``);
 - literals: longs, doubles, ``'strings'`` (backslash escapes), null;
   identifiers plain or ``"double-quoted"``;
 - general: ``cast(expr,'LONG'|'DOUBLE'|'STRING')``, ``if``, ``nvl``,
   ``isnull``, ``notnull``, ``case_searched``, ``case_simple``,
   ``like(expr, pattern[, escape])``;
 - strings: ``concat``, ``lower``, ``upper``, ``strlen``,
   ``strpos(haystack, needle)`` (0-based, -1 absent — Druid),
   ``substring(expr, index, length)`` (0-based, -1 = to end),
   ``left``, ``right``, ``replace`` (all occurrences, literal),
   ``trim``/``ltrim``/``rtrim``, ``repeat``, ``parse_long``,
   ``regexp_extract``, ``regexp_like``, ``contains_string``,
   ``icontains_string``;
 - time: ``timestamp_floor(t, period[, origin[, tz]])``,
   ``timestamp_ceil``, ``timestamp_shift(t, period, step[, tz])``,
   ``timestamp_extract(t, unit[, tz])``, ``timestamp_parse``,
   ``timestamp_format``, ``unix_timestamp``;
 - math: ``abs ceil floor exp ln log10 sqrt sin cos tan pow min max
   round div pi signum cbrt atan2 hypot``.

Type semantics follow Druid: long/long arithmetic stays long
(``7/2 == 3`` — integral division), any double operand widens to
double, ``+`` concatenates when either side is a string, comparisons
and logical operators yield 1/0 longs. One documented divergence:
Druid models ``__time`` as epoch-millis LONG; here time-typed columns
stay Spark timestamps through the time functions (floor/ceil/shift are
type-preserving), and ``cast(t,'LONG')``/``timestamp_parse`` convert
explicitly — millis-long inputs get exact Druid behavior.

Out-of-subset sources raise ``DruidExprError``; the virtualColumns
planner falls back to the Spark SQL dialect (plans/common.py), which
remains fully supported.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DruidExprError(ValueError):
    """The source is not a compilable Druid expression."""


_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?|\d+[eE][-+]?\d+|\d+)"
    r"|(?P<str>'(?:[^'\\]|\\.)*')"
    r"|(?P<qid>\"(?:[^\"\\]|\\.)*\")"
    r"|(?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)"
    r"|(?P<op>==|!=|<=|>=|&&|\|\||[-+*/%^!<>(),])"
    r")"
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise DruidExprError(f"unexpected character at: {src[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("num", "str", "qid", "ident", "op"):
            if m.group(kind) is not None:
                toks.append((kind, m.group(kind)))
                break
    toks.append(("eof", ""))
    return toks


class _Val:
    """Compiled expression: Column + static type tag
    ('long' | 'num' | 'str' | 'bool' | 'time' | 'unknown') + the Python
    value when the node is a literal (functions like timestamp_floor
    need driver-side literals for period parsing)."""

    __slots__ = ("col", "tag", "pyval", "is_lit")

    def __init__(self, col: Column, tag: str, pyval=None, is_lit: bool = False):
        self.col = col
        self.tag = tag
        self.pyval = pyval
        self.is_lit = is_lit


def _num(v: _Val) -> Column:
    """Operand under numeric context: bools count 1/0 (Druid's numeric
    booleans), strings coerce best-effort."""
    if v.tag == "bool":
        return v.col.cast("long")
    if v.tag == "str":
        return v.col.cast("double")
    return v.col


def _truthy(v: _Val) -> Column:
    if v.tag == "bool":
        return v.col
    if v.tag == "str":
        return v.col.isNotNull() & (v.col != "")
    return _num(v).isNotNull() & (_num(v) != 0)


def _both_long(a: _Val, b: _Val) -> bool:
    return a.tag in ("long", "bool") and b.tag in ("long", "bool")


def _value(v: _Val) -> Column:
    """A _Val used as a VALUE (function argument, branch result, string
    coercion source): Druid's booleans are 1/0 longs, so a comparison
    result materializes as long — also what keeps if/nvl/case branches
    type-consistent for Spark."""
    return v.col.cast("long") if v.tag == "bool" else v.col


def _vtag(v: _Val) -> str:
    return "long" if v.tag == "bool" else v.tag


def _as_str(v: _Val) -> Column:
    return _value(v).cast("string")


def _branches(*vals: "_Val") -> list[Column]:
    """Branch results for if/nvl/case: booleans as 1/0 longs; remaining
    numeric-width mixes are left to Spark's common-type coercion."""
    return [_value(v) for v in vals]


def _req_lit(v: _Val, what: str):
    if not v.is_lit:
        raise DruidExprError(f"{what} must be a literal")
    return v.pyval


def _arity(a: list, lo: int, hi: int, name: str) -> None:
    """Unsupported arities must raise — a silently-ignored extra
    argument (e.g. a fromIndex or timezone we don't implement) would
    return wrong values instead of falling back / failing loudly."""
    if not (lo <= len(a) <= hi):
        raise DruidExprError(
            f"{name} takes {lo}"
            + (f"..{hi}" if hi != lo else "")
            + f" arguments, got {len(a)}"
        )


# ISO-8601 period for shift arithmetic: calendar part (Y/M) via
# make_interval months, fixed part (W/D/H/M/S) via exact millis.
_PERIOD_RE = re.compile(
    r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def _period_parts(p: str) -> tuple[int, int]:
    m = _PERIOD_RE.match(p)
    if not m or p in ("P", "PT"):
        raise DruidExprError(f"bad period {p!r}")
    y, mo, w, d, h, mi, s = m.groups()
    months = int(y or 0) * 12 + int(mo or 0)
    ms = (
        int(w or 0) * 604800000
        + int(d or 0) * 86400000
        + int(h or 0) * 3600000
        + int(mi or 0) * 60000
        + int(round(float(s or 0) * 1000))
    )
    return months, ms


def _period_is_wallclock(p: str) -> bool:
    """True for periods bearing imprecise (local-time) fields — years,
    months, weeks, days — which Joda adds in LOCAL time. Time-only
    periods (PT1H, PT90M, …) are precise fields advancing on the
    instant timeline regardless of timezone."""
    m = _PERIOD_RE.match(p)
    if not m:
        raise DruidExprError(f"bad period {p!r}")
    y, mo, w, d, *_ = m.groups()
    return any(x for x in (y, mo, w, d))


def _shift_col(t: Column, period: str, n: int) -> Column:
    months, ms = _period_parts(period)
    out = t
    if months:
        out = out + F.make_interval(months=F.lit(months * n))
    if ms:
        out = F.timestamp_millis(F.unix_millis(out) + ms * n)
    return out


def _shift_ntz(t: Column, period: str, n: int) -> Column:
    # Wall-clock shift via interval arithmetic — works on the
    # TIMESTAMP_NTZ produced by convert_timezone, where unix_millis
    # (used by _shift_col) raises on Spark 4.x.
    months, ms = _period_parts(period)
    out = t
    if months:
        out = out + F.make_interval(months=F.lit(months * n))
    if ms:
        out = out + F.make_dt_interval(secs=F.lit(ms * n / 1000.0))
    return out


def _gran_for(period: str, origin, tz) -> "object":
    from coolplaydruid_spark.functions.granularity import parse_granularity

    spec: dict = {"type": "period", "period": period}
    if tz is not None:
        spec["timeZone"] = tz
    if origin is not None:
        spec["origin"] = origin
    return parse_granularity(spec)


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], resolve, lookups=None):
        self.toks = toks
        self.i = 0
        self.resolve = resolve  # name -> _Val for column identifiers
        self.lookups = lookups  # name -> bounded {key: value} dict, or None

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, value: str):
        kind, v = self.next()
        if v != value:
            raise DruidExprError(f"expected {value!r}, got {v!r}")

    def try_eat(self, value: str) -> bool:
        if self.peek()[1] == value:
            self.i += 1
            return True
        return False

    # --- precedence climbing: || < && < cmp < add < mul < pow < unary ---

    def expr(self) -> _Val:
        return self.logical_or()

    def logical_or(self) -> _Val:
        left = self.logical_and()
        while self.try_eat("||"):
            right = self.logical_and()
            left = _Val(_truthy(left) | _truthy(right), "bool")
        return left

    def logical_and(self) -> _Val:
        left = self.comparison()
        while self.try_eat("&&"):
            right = self.comparison()
            left = _Val(_truthy(left) & _truthy(right), "bool")
        return left

    def comparison(self) -> _Val:
        left = self.additive()
        while self.peek()[1] in ("<", "<=", ">", ">=", "==", "!="):
            op = self.next()[1]
            right = self.additive()
            # string-vs-string compares lexically. A 'str' against an
            # 'unknown' (untyped identifier — e.g. an expression filter
            # compiled without a schema) must NOT take the numeric path:
            # _num would cast the string side to double (NULL for
            # non-numeric text) and the comparison would silently match
            # nothing — compare raw and let Spark coerce instead.
            # Explicitly numeric operands take the numeric path.
            numeric = ("long", "num", "bool")
            if left.tag == "str" and right.tag == "str":
                a, b = left.col, right.col
            elif "str" in (left.tag, right.tag) and not (
                left.tag in numeric or right.tag in numeric
            ):
                a, b = left.col, right.col
            else:
                a, b = _num(left), _num(right)
            col = {
                "<": lambda: a < b,
                "<=": lambda: a <= b,
                ">": lambda: a > b,
                ">=": lambda: a >= b,
                "==": lambda: a == b,
                "!=": lambda: a != b,
            }[op]()
            left = _Val(col, "bool")
        return left

    def additive(self) -> _Val:
        left = self.multiplicative()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            right = self.multiplicative()
            if op == "+" and ("str" in (left.tag, right.tag)):
                left = _Val(F.concat(_as_str(left), _as_str(right)), "str")
                continue
            tag = "long" if _both_long(left, right) else "num"
            col = _num(left) + _num(right) if op == "+" else _num(left) - _num(right)
            left = _Val(col, tag)
        return left

    def multiplicative(self) -> _Val:
        left = self.power()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            right = self.power()
            both_long = _both_long(left, right)
            a, b = _num(left), _num(right)
            if op == "*":
                left = _Val(a * b, "long" if both_long else "num")
            elif op == "/":
                if both_long:
                    # Druid long/long is integral division (7/2 == 3)
                    left = _Val(F.call_function("div", a, b), "long")
                else:
                    left = _Val(a.cast("double") / b, "num")
            else:
                left = _Val(a % b, "long" if both_long else "num")
        return left

    def power(self) -> _Val:
        left = self.unary()
        if self.try_eat("^"):
            right = self.power()  # right-associative
            col = F.pow(_num(left), _num(right))
            if _both_long(left, right):
                return _Val(col.cast("long"), "long")
            return _Val(col, "num")
        return left

    def unary(self) -> _Val:
        if self.try_eat("!"):
            return _Val(~_truthy(self.unary()), "bool")
        if self.try_eat("-"):
            v = self.unary()
            tag = v.tag if v.tag in ("long", "num") else "num"
            if v.is_lit and isinstance(v.pyval, (int, float)):
                # negated numeric literal stays a literal (function args
                # like timestamp_shift(..., -1) need the Python value)
                return _Val(-_num(v), tag, -v.pyval, True)
            return _Val(-_num(v), tag)
        return self.primary()

    def args(self) -> list[_Val]:
        out = []
        if self.try_eat(")"):
            return out
        out.append(self.expr())
        while self.try_eat(","):
            out.append(self.expr())
        self.eat(")")
        return out

    def primary(self) -> _Val:
        kind, v = self.next()
        if kind == "num":
            if re.fullmatch(r"\d+", v):
                return _Val(F.lit(int(v)).cast("long"), "long", int(v), True)
            return _Val(F.lit(float(v)), "num", float(v), True)
        if kind == "str":
            # only \' and \\ are escapes; other backslashes pass through
            # verbatim (regex patterns like '\w+' keep their backslash)
            body = re.sub(r"\\(['\\])", lambda m: m.group(1), v[1:-1])
            return _Val(F.lit(body), "str", body, True)
        if v == "(":
            e = self.expr()
            self.eat(")")
            return e
        if kind == "qid":
            name = re.sub(r"\\(.)", lambda m: m.group(1), v[1:-1])
            return self.resolve(name)
        if kind == "ident":
            if v == "null":
                return _Val(F.lit(None), "unknown", None, True)
            if self.try_eat("("):
                return self.func(v, self.args())
            return self.resolve(v)
        raise DruidExprError(f"unexpected token {v!r}")

    # --- function table -------------------------------------------------

    def func(self, name: str, a: list[_Val]) -> _Val:
        fn = name.lower()
        handler = getattr(self, f"_fn_{fn}", None)
        if handler is None:
            raise DruidExprError(f"unsupported function {name!r}")
        return handler(a)

    # general
    def _fn_cast(self, a):
        _arity(a, 2, 2, "cast")
        t = str(_req_lit(a[1], "cast type")).upper()
        if t == "LONG":
            src = (
                F.unix_millis(a[0].col.cast("timestamp_ltz"))
                if a[0].tag == "time"
                else _num(a[0])
            )
            return _Val(src.cast("long"), "long")
        if t == "DOUBLE":
            return _Val(_num(a[0]).cast("double"), "num")
        if t == "STRING":
            return _Val(a[0].col.cast("string"), "str")
        raise DruidExprError(f"unsupported cast type {t!r}")

    def _fn_if(self, a):
        if len(a) != 3:
            raise DruidExprError("if(cond, then, else) takes 3 arguments")
        then, other = _branches(a[1], a[2])
        tag = _vtag(a[1]) if _vtag(a[1]) == _vtag(a[2]) else "unknown"
        return _Val(F.when(_truthy(a[0]), then).otherwise(other), tag)

    def _fn_nvl(self, a):
        _arity(a, 2, 2, "nvl")
        x, y = _branches(a[0], a[1])
        tag = _vtag(a[0]) if _vtag(a[0]) == _vtag(a[1]) else "unknown"
        return _Val(F.coalesce(x, y), tag)

    def _fn_isnull(self, a):
        _arity(a, 1, 1, "isnull")
        return _Val(a[0].col.isNull(), "bool")

    def _fn_notnull(self, a):
        _arity(a, 1, 1, "notnull")
        return _Val(a[0].col.isNotNull(), "bool")

    def _fn_case_searched(self, a):
        if len(a) < 3 or len(a) % 2 == 0:
            raise DruidExprError("case_searched(c1, r1, ..., else)")
        out = F.when(_truthy(a[0]), _value(a[1]))
        for i in range(2, len(a) - 1, 2):
            out = out.when(_truthy(a[i]), _value(a[i + 1]))
        tags = {_vtag(a[i]) for i in range(1, len(a), 2)} | {_vtag(a[-1])}
        return _Val(
            out.otherwise(_value(a[-1])), tags.pop() if len(tags) == 1 else "unknown"
        )

    def _fn_case_simple(self, a):
        if len(a) < 4 or len(a) % 2 != 0:
            raise DruidExprError("case_simple(expr, v1, r1, ..., else)")
        base = _value(a[0])
        out = F.when(base == _value(a[1]), _value(a[2]))
        for i in range(3, len(a) - 1, 2):
            out = out.when(base == _value(a[i]), _value(a[i + 1]))
        tags = {_vtag(a[i]) for i in range(2, len(a), 2)} | {_vtag(a[-1])}
        return _Val(
            out.otherwise(_value(a[-1])), tags.pop() if len(tags) == 1 else "unknown"
        )

    def _fn_lookup(self, a):
        _arity(a, 2, 2, "lookup")
        # Druid's lookup(expr, 'name'): registered lookups as inline map
        # literals — faithful to Druid's replicated in-heap maps, same
        # bounded-inlining contract as the SQL LOOKUP shim (sqlcompat).
        # Missing keys yield null (Druid's retainMissingValue=false
        # default). Oversized lookups raise toward the broadcast-join
        # path (registeredLookup extractionFn).
        if self.lookups is None:
            raise DruidExprError("lookup() requires an engine context")
        name = str(_req_lit(a[1], "lookup name"))
        mapping = self.lookups(name)
        if not mapping:
            return _Val(F.lit(None).cast("string"), "str")
        pairs: list[Column] = []
        for k, v in mapping.items():
            pairs.append(F.lit(str(k)))
            pairs.append(F.lit("" if v is None else str(v)))
        return _Val(
            F.element_at(F.create_map(*pairs), _as_str(a[0])), "str"
        )

    def _fn_like(self, a):
        _arity(a, 2, 3, "like")
        if len(a) == 3:
            return _Val(
                F.like(_as_str(a[0]), _as_str(a[1]), _as_str(a[2])), "bool"
            )
        return _Val(F.like(_as_str(a[0]), _as_str(a[1])), "bool")

    # strings
    def _fn_concat(self, a):
        return _Val(F.concat(*[_as_str(x) for x in a]), "str")

    def _fn_lower(self, a):
        _arity(a, 1, 1, "lower")
        return _Val(F.lower(_as_str(a[0])), "str")

    def _fn_upper(self, a):
        _arity(a, 1, 1, "upper")
        return _Val(F.upper(_as_str(a[0])), "str")

    def _fn_strlen(self, a):
        _arity(a, 1, 1, "strlen")
        return _Val(F.length(_as_str(a[0])).cast("long"), "long")

    def _fn_strpos(self, a):
        # Druid: 0-based position, -1 when absent; optional 0-based
        # fromIndex (locate's start is 1-based, result stays absolute).
        # Negative fromIndex clamps to 0 like Java's String.indexOf —
        # Spark's locate returns 0 ("absent") for pos < 1.
        _arity(a, 2, 3, "strpos")
        if len(a) == 3:
            start = F.greatest(F.lit(0), _num(a[2]).cast("int")) + 1
            pos = F.call_function("locate", _as_str(a[1]), _as_str(a[0]), start)
        else:
            pos = F.call_function("locate", _as_str(a[1]), _as_str(a[0]))
        return _Val((pos - 1).cast("long"), "long")

    def _fn_substring(self, a):
        _arity(a, 3, 3, "substring")
        # Druid: 0-based index; length -1 = to end
        s = _as_str(a[0])
        start = (_num(a[1]) + 1).cast("int")
        length = _num(a[2]).cast("int")
        return _Val(
            F.when(length < 0, F.substring(s, start, 2**30)).otherwise(
                F.substring(s, start, length)
            ),
            "str",
        )

    def _fn_left(self, a):
        _arity(a, 2, 2, "left")
        return _Val(F.substring(_as_str(a[0]), 1, _num(a[1]).cast("int")), "str")

    def _fn_right(self, a):
        _arity(a, 2, 2, "right")
        s = _as_str(a[0])
        n = _num(a[1]).cast("int")
        # the n <= 0 branch must still propagate a null string
        # (fuzz-found: right(null, 0) returned '' instead of null)
        out = F.when(s.isNull(), F.lit(None).cast("string")).when(
            n <= 0, F.lit("")
        ).otherwise(s.substr(-n, n))
        return _Val(out, "str")

    def _fn_replace(self, a):
        _arity(a, 3, 3, "replace")
        return _Val(
            F.call_function("replace", _as_str(a[0]), _as_str(a[1]), _as_str(a[2])),
            "str",
        )

    def _fn_trim(self, a):
        _arity(a, 1, 1, "trim")
        return _Val(F.trim(_as_str(a[0])), "str")

    def _fn_ltrim(self, a):
        _arity(a, 1, 1, "ltrim")
        return _Val(F.ltrim(_as_str(a[0])), "str")

    def _fn_rtrim(self, a):
        _arity(a, 1, 1, "rtrim")
        return _Val(F.rtrim(_as_str(a[0])), "str")

    def _fn_repeat(self, a):
        _arity(a, 2, 2, "repeat")
        return _Val(F.repeat(_as_str(a[0]), _num(a[1]).cast("int")), "str")

    def _fn_parse_long(self, a):
        _arity(a, 1, 2, "parse_long")
        if len(a) == 2:
            # Long.parseLong semantics, which F.conv alone does not give
            # (conv treats '-' input as unsigned 64-bit wraparound and
            # partial-parses invalid digits): validate the digit set for
            # the radix, handle the sign explicitly, accept 0x at 16.
            radix = int(_req_lit(a[1], "radix"))
            if not 2 <= radix <= 36:
                raise DruidExprError(f"parse_long radix {radix} out of range")
            digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:radix]
            s = F.lower(F.trim(_as_str(a[0])))
            neg = s.startswith("-")
            signed = neg | s.startswith("+")  # Long.parseLong accepts both
            body = F.when(signed, s.substr(F.lit(2), F.length(s))).otherwise(s)
            if radix == 16:
                body = F.regexp_replace(body, "^0x", "")
            mag = F.conv(body, radix, 10).try_cast("long")
            out = F.when(
                ~body.rlike(f"^[{digits}]+$"), F.lit(None).cast("long")
            ).when(neg, -mag).otherwise(mag)
            return _Val(out, "long")
        return _Val(_as_str(a[0]).try_cast("long"), "long")

    def _fn_regexp_extract(self, a):
        _arity(a, 2, 3, "regexp_extract")
        pat = str(_req_lit(a[1], "regexp pattern"))
        idx = int(_req_lit(a[2], "group index")) if len(a) > 2 else 0
        out = F.regexp_extract(_as_str(a[0]), pat, idx)
        # Druid returns null (not '') for a non-match
        return _Val(F.when(out == "", F.lit(None)).otherwise(out), "str")

    def _fn_regexp_like(self, a):
        _arity(a, 2, 2, "regexp_like")
        pat = str(_req_lit(a[1], "regexp pattern"))
        return _Val(_as_str(a[0]).rlike(pat), "bool")

    def _fn_contains_string(self, a):
        _arity(a, 2, 2, "contains_string")
        return _Val(
            F.call_function("locate", _as_str(a[1]), _as_str(a[0])) > 0, "bool"
        )

    def _fn_icontains_string(self, a):
        _arity(a, 2, 2, "icontains_string")
        return _Val(
            F.call_function(
                "locate", F.lower(_as_str(a[1])), F.lower(_as_str(a[0]))
            )
            > 0,
            "bool",
        )

    # arrays (multi-value dimensions in expressions; Druid array fns).
    # Indexing mirrors the MV_* SQL family: *_offset 0-based, *_ordinal
    # 1-based, NULL out of range (explicit guards — Spark's
    # element_at throws on 0 and indexes from the END on negatives).
    def _fn_array(self, a):
        return _Val(F.array(*[_value(x) for x in a]), "unknown")

    def _fn_array_length(self, a):
        _arity(a, 1, 1, "array_length")
        return _Val(F.size(a[0].col).cast("long"), "long")

    def _fn_array_contains(self, a):
        _arity(a, 2, 2, "array_contains")
        return _Val(
            F.coalesce(F.array_contains(a[0].col, _value(a[1])), F.lit(False)),
            "bool",
        )

    def _fn_array_offset(self, a):
        _arity(a, 2, 2, "array_offset")
        i = _num(a[1]).cast("int")
        return _Val(
            F.when(i < 0, F.lit(None)).otherwise(F.try_element_at(a[0].col, i + 1)),
            "unknown",
        )

    def _fn_array_ordinal(self, a):
        _arity(a, 2, 2, "array_ordinal")
        i = _num(a[1]).cast("int")
        return _Val(
            F.when(i <= 0, F.lit(None)).otherwise(F.try_element_at(a[0].col, i)),
            "unknown",
        )

    def _fn_array_offset_of(self, a):
        _arity(a, 2, 2, "array_offset_of")
        pos = F.array_position(a[0].col, _value(a[1]))
        return _Val(F.when(pos == 0, F.lit(None)).otherwise(pos - 1), "long")

    def _fn_array_ordinal_of(self, a):
        _arity(a, 2, 2, "array_ordinal_of")
        pos = F.array_position(a[0].col, _value(a[1]))
        return _Val(F.when(pos == 0, F.lit(None)).otherwise(pos), "long")

    def _fn_array_concat(self, a):
        _arity(a, 2, 2, "array_concat")
        return _Val(F.concat(a[0].col, a[1].col), "unknown")

    def _fn_array_append(self, a):
        _arity(a, 2, 2, "array_append")
        return _Val(F.array_append(a[0].col, _value(a[1])), "unknown")

    def _fn_array_prepend(self, a):
        _arity(a, 2, 2, "array_prepend")
        return _Val(F.array_prepend(a[1].col, _value(a[0])), "unknown")

    def _fn_array_slice(self, a):
        _arity(a, 3, 3, "array_slice")
        # [start, end) 0-based like Druid; invalid ranges → NULL
        s = _num(a[1]).cast("int")
        e = _num(a[2]).cast("int")
        return _Val(
            F.when((s < 0) | (e < s), F.lit(None)).otherwise(
                F.slice(a[0].col, s + 1, e - s)
            ),
            "unknown",
        )

    def _fn_array_to_string(self, a):
        _arity(a, 2, 2, "array_to_string")
        # call_function: F.array_join's python wrapper only takes str
        # delimiters, not Columns
        return _Val(
            F.call_function("array_join", a[0].col, _as_str(a[1])), "str"
        )

    def _fn_string_to_array(self, a):
        _arity(a, 2, 2, "string_to_array")
        return _Val(F.split(_as_str(a[0]), _as_str(a[1])), "unknown")

    # time — accepts 'time' (Spark timestamp) or long millis inputs;
    # returns the input's kind (type-preserving, see module docstring).
    def _time_in(self, v: _Val) -> tuple[Column, bool]:
        if v.tag == "time":
            # ltz cast is an identity under the UTC session zone but
            # required: parquet timestamps load as TIMESTAMP_NTZ, which
            # unix_seconds/unix_millis reject (granularity.py does the
            # same normalization).
            return v.col.cast("timestamp_ltz"), True
        return F.timestamp_millis(_num(v).cast("long")), False

    def _time_out(self, col: Column, was_time: bool) -> _Val:
        if was_time:
            return _Val(col, "time")
        return _Val(F.unix_millis(col), "long")

    def _fn_timestamp_floor(self, a):
        _arity(a, 2, 4, "timestamp_floor")
        t, was_time = self._time_in(a[0])
        period = str(_req_lit(a[1], "period"))
        origin = _req_lit(a[2], "origin") if len(a) > 2 and a[2].pyval is not None else None
        tz = str(_req_lit(a[3], "timezone")) if len(a) > 3 else None
        gran = _gran_for(period, origin, tz)
        return self._time_out(gran.bucket(t), was_time)

    def _fn_timestamp_ceil(self, a):
        _arity(a, 2, 4, "timestamp_ceil")
        t, was_time = self._time_in(a[0])
        period = str(_req_lit(a[1], "period"))
        origin = _req_lit(a[2], "origin") if len(a) > 2 and a[2].pyval is not None else None
        tz = str(_req_lit(a[3], "timezone")) if len(a) > 3 else None
        gran = _gran_for(period, origin, tz)
        floor = gran.bucket(t)
        if tz is not None and _period_is_wallclock(period):
            # Imprecise (day/week/month-bearing) periods shift in the
            # target timezone (convert → shift → convert back): a P1D
            # ceil across a DST transition lands on local midnight, not
            # midnight ± 1h.
            loc = F.convert_timezone(F.lit("UTC"), F.lit(tz), floor)
            nxt = F.convert_timezone(
                F.lit(tz), F.lit("UTC"), _shift_ntz(loc, period, 1)
            )
        else:
            # Time-only periods are precise fields: +fixed millis on the
            # instant timeline even with a tz, so a PT1H ceil at a DST
            # fall-back still visits the repeated-hour bucket that
            # granularity.py's bucketing keeps, and ceil stays a fixed
            # point of floor.
            nxt = _shift_col(floor, period, 1)
        ceil = F.when(floor == t, t).otherwise(nxt)
        return self._time_out(ceil, was_time)

    def _fn_timestamp_shift(self, a):
        _arity(a, 3, 3, "timestamp_shift (timezone argument unsupported)")
        t, was_time = self._time_in(a[0])
        period = str(_req_lit(a[1], "period"))
        n = int(_req_lit(a[2], "step"))
        return self._time_out(_shift_col(t, period, n), was_time)

    def _fn_timestamp_extract(self, a):
        _arity(a, 2, 3, "timestamp_extract")
        t, _ = self._time_in(a[0])
        unit = str(_req_lit(a[1], "unit")).upper()
        # tz validates FIRST (even for the units that ignore it) so a
        # non-literal timezone still fails loudly per _arity's rationale
        tz = str(_req_lit(a[2], "timezone")) if len(a) > 2 else None
        # EPOCH/MILLIS are absolute instants: Druid returns them
        # unchanged regardless of the tz argument, and unix_seconds/
        # unix_millis reject the TIMESTAMP_NTZ that convert_timezone
        # yields — so compute them from the un-converted timestamp
        # (mirrors the SQL shim TIME_EXTRACT).
        if unit == "EPOCH":
            return _Val(F.unix_seconds(t).cast("long"), "long")
        if unit == "MILLIS":
            return _Val(F.unix_millis(t).cast("long"), "long")
        if tz is not None:
            t = F.convert_timezone(F.lit("UTC"), F.lit(tz), t)
        col = {
            "SECOND": lambda: F.second(t),
            "MINUTE": lambda: F.minute(t),
            "HOUR": lambda: F.hour(t),
            "DAY": lambda: F.dayofmonth(t),
            "DOW": lambda: F.weekday(t) + 1,  # ISO: Monday=1
            "DOY": lambda: F.dayofyear(t),
            "WEEK": lambda: F.weekofyear(t),
            "MONTH": lambda: F.month(t),
            "QUARTER": lambda: F.quarter(t),
            "YEAR": lambda: F.year(t),
        }.get(unit)
        if col is None:
            raise DruidExprError(f"unsupported timestamp_extract unit {unit!r}")
        return _Val(col().cast("long"), "long")

    def _fn_timestamp_parse(self, a):
        _arity(a, 1, 3, "timestamp_parse")
        if len(a) > 1 and a[1].pyval is not None:
            fmt = str(_req_lit(a[1], "pattern"))
            out = F.try_to_timestamp(_as_str(a[0]), F.lit(fmt))
        else:
            out = _as_str(a[0]).try_cast("timestamp")
        if len(a) > 2:
            # the string is wall-clock time IN tz; convert to our
            # naive-UTC representation
            tz = str(_req_lit(a[2], "timezone"))
            out = F.convert_timezone(F.lit(tz), F.lit("UTC"), out)
        return _Val(out, "time")

    def _fn_timestamp_format(self, a):
        _arity(a, 1, 3, "timestamp_format")
        t, _ = self._time_in(a[0])
        fmt = str(_req_lit(a[1], "pattern")) if len(a) > 1 else "yyyy-MM-dd'T'HH:mm:ss'Z'"
        if len(a) > 2:
            tz = str(_req_lit(a[2], "timezone"))
            t = F.convert_timezone(F.lit("UTC"), F.lit(tz), t)
        return _Val(F.date_format(t, fmt), "str")

    def _fn_unix_timestamp(self, a):
        _arity(a, 1, 1, "unix_timestamp")
        t, _ = self._time_in(a[0])
        return _Val(F.unix_seconds(t), "long")

    # math
    def _fn_abs(self, a):
        _arity(a, 1, 1, "abs")
        return _Val(F.abs(_num(a[0])), a[0].tag if a[0].tag == "long" else "num")

    # Druid's ceil/floor are Math.ceil/floor — double in, double out.
    # Spark's F.ceil/F.floor return LONG, silently clamping |x| > 2^63
    # to Long.MAX (fuzz-found: ceil(1.2e268) came back 9.2e18), so both
    # build on trunc-toward-zero via x - x % 1, which is exact at any
    # magnitude (x % 1 == 0 once doubles lose fractional precision).
    @staticmethod
    def _nonfinite(c: Column) -> Column:
        # Inf % 1.0 is NaN, so the trunc formula must pass NaN/±Inf
        # through unchanged (Math.ceil/floor do); null c makes this
        # null, which falls through to the formula and stays null.
        return F.isnan(c) | (F.abs(c) == F.lit(float("inf")))

    def _fn_ceil(self, a):
        _arity(a, 1, 1, "ceil")
        c = _num(a[0]).cast("double")
        t = c - (c % F.lit(1.0))
        out = F.when(self._nonfinite(c), c).otherwise(
            F.when(c > t, t + 1).otherwise(t)
        )
        return _Val(out, "num")

    def _fn_floor(self, a):
        _arity(a, 1, 1, "floor")
        c = _num(a[0]).cast("double")
        t = c - (c % F.lit(1.0))
        out = F.when(self._nonfinite(c), c).otherwise(
            F.when(c < t, t - 1).otherwise(t)
        )
        return _Val(out, "num")

    def _fn_exp(self, a):
        _arity(a, 1, 1, "exp")
        return _Val(F.exp(_num(a[0])), "num")

    def _fn_ln(self, a):
        _arity(a, 1, 1, "ln")
        return _Val(F.log(_num(a[0])), "num")

    def _fn_log10(self, a):
        _arity(a, 1, 1, "log10")
        return _Val(F.log10(_num(a[0])), "num")

    def _fn_sqrt(self, a):
        _arity(a, 1, 1, "sqrt")
        return _Val(F.sqrt(_num(a[0])), "num")

    def _fn_cbrt(self, a):
        _arity(a, 1, 1, "cbrt")
        return _Val(F.cbrt(_num(a[0])), "num")

    def _fn_sin(self, a):
        _arity(a, 1, 1, "sin")
        return _Val(F.sin(_num(a[0])), "num")

    def _fn_cos(self, a):
        _arity(a, 1, 1, "cos")
        return _Val(F.cos(_num(a[0])), "num")

    def _fn_tan(self, a):
        _arity(a, 1, 1, "tan")
        return _Val(F.tan(_num(a[0])), "num")

    def _fn_atan2(self, a):
        _arity(a, 2, 2, "atan2")
        return _Val(F.atan2(_num(a[0]), _num(a[1])), "num")

    def _fn_hypot(self, a):
        _arity(a, 2, 2, "hypot")
        return _Val(F.hypot(_num(a[0]), _num(a[1])), "num")

    def _fn_signum(self, a):
        _arity(a, 1, 1, "signum")
        return _Val(F.signum(_num(a[0])), "num")

    def _fn_pow(self, a):
        _arity(a, 2, 2, "pow")
        return _Val(F.pow(_num(a[0]), _num(a[1])), "num")

    def _fn_min(self, a):
        tag = "long" if all(x.tag in ("long", "bool") for x in a) else "num"
        return _Val(F.least(*[_num(x) for x in a]), tag)

    def _fn_max(self, a):
        tag = "long" if all(x.tag in ("long", "bool") for x in a) else "num"
        return _Val(F.greatest(*[_num(x) for x in a]), tag)

    def _fn_round(self, a):
        _arity(a, 1, 2, "round")
        d = int(_req_lit(a[1], "scale")) if len(a) > 1 else 0
        tag = a[0].tag if a[0].tag == "long" else "num"
        return _Val(F.round(_num(a[0]), d), tag)

    def _fn_div(self, a):
        _arity(a, 2, 2, "div")
        return _Val(F.call_function("div", _num(a[0]), _num(a[1])), "long")

    def _fn_pi(self, a):
        import math

        return _Val(F.lit(math.pi), "num", math.pi, True)


_TAG_FOR_DTYPE = {
    "byte": "long", "short": "long", "integer": "long", "long": "long",
    "float": "num", "double": "num",
    "string": "str",
    "timestamp": "time", "timestamp_ntz": "time",
    "boolean": "bool",
}


def tag_for_dtype(dtype) -> str:
    """Spark DataType → expression type tag (shared by the df-based
    resolver here and the join-dataSource resolver in engine.py)."""
    t = dtype.typeName()
    if t.startswith("decimal"):
        t = "double"
    return _TAG_FOR_DTYPE.get(t, "unknown")


# dotted-column-safe references (join dataSources' rightPrefix default
# is "r.") — single shared implementation in extraction.py
from coolplaydruid_spark.functions.extraction import safe_col as _safe_col  # noqa: E402


def _resolver(df: DataFrame | None):
    types = {}
    if df is not None:
        for f in df.schema.fields:
            types[f.name] = tag_for_dtype(f.dataType)

    def resolve(name: str) -> _Val:
        if df is not None and name not in types:
            raise DruidExprError(f"unknown column {name!r}")
        return _Val(_safe_col(name), types.get(name, "unknown"))

    return resolve


def compile_druid_expr(
    src: str, df: DataFrame | None = None, lookups=None, resolver=None
) -> Column:
    """Compile Druid expression source to a native Column. Comparisons /
    logical results surface as 1/0 longs (Druid's numeric booleans).
    ``df`` supplies column types for long-vs-double arithmetic; without
    it identifiers are typed 'unknown' (widening arithmetic to double).
    ``lookups`` is a callable name -> bounded {key: value} dict enabling
    the ``lookup()`` function. ``resolver`` (name -> _Val) overrides
    identifier resolution entirely — used by join dataSources to bind
    left/right-side columns. Raises DruidExprError for out-of-subset
    sources."""
    p = _Parser(_tokenize(src), resolver or _resolver(df), lookups=lookups)
    out = p.expr()
    if p.peek()[0] != "eof":
        raise DruidExprError(f"trailing tokens at {p.peek()[1]!r}")
    if out.tag == "bool":
        return out.col.cast("long")
    return out.col


def compile_druid_predicate(
    src: str, df: DataFrame | None = None, lookups=None, resolver=None
) -> Column:
    """Compile a Druid expression used AS A PREDICATE (filter, join
    condition) to a raw boolean Column — no 1/0-long materialization, so
    Catalyst still recognizes equi-conditions (hash joins) and pushes
    comparisons into the scan."""
    p = _Parser(_tokenize(src), resolver or _resolver(df), lookups=lookups)
    out = p.expr()
    if p.peek()[0] != "eof":
        raise DruidExprError(f"trailing tokens at {p.peek()[1]!r}")
    return _truthy(out)
