"""JavaScript-source compatibility for Druid's ``javascript`` filter,
extractionFn, and aggregator (reference scope: query/query-module-overview.md:45
declares the components; JS variants are public Druid v0.12 surface).

Druid 0.12 embeds Rhino and accepts arbitrary JS. Embedding a JS engine
in a Spark executor would put every row through a script boundary — the
exact anti-pattern this engine avoids. Instead, a ~300-line recursive-
descent front-end TRANSPILES the practical Druid-JS subset to native
Column expressions, so JS-source specs run inside whole-stage codegen
with zero per-row interpretation. Out-of-subset sources raise
``JsSubsetError`` and the caller's Python-callable fallback still works.

Supported subset (the shapes Druid docs/examples actually use):
 - ``function(a, b) { return <expr>; }`` with optional ``var x = <expr>;``
   declarations before the return;
 - ternary ``?:``, ``||``, ``&&``, ``!``, comparisons
   (``== != === !== < <= > >=``), arithmetic (``+ - * / %``, JS ``%``
   keeps the dividend sign — same as Spark), unary minus, parentheses;
 - literals: numbers, ``'...'``/``"..."`` strings, true/false/null;
 - string members: ``.length``, ``.substring(a[,b])``, ``.substr(a,l)``,
   ``.charAt(i)``, ``.indexOf(s)``, ``.toLowerCase()``, ``.toUpperCase()``,
   ``.concat(s)``, ``.replace(s, r)`` (FIRST occurrence — JS string
   semantics, not regex-global), ``.trim()``;
 - ``Math.min/max/abs/floor/ceil/sqrt/pow/round`` (``Math.round`` is
   compiled as ``floor(x + 0.5)`` — exact JS behavior incl. negatives),
   ``parseInt`` / ``parseFloat`` / ``Number`` / ``String``;
 - ``+`` is concatenation when either side is statically string-typed
   (literal, string method result, or String(...)), else numeric.

Semantics notes: SQL three-valued null handling applies inside the
expression (the engine already maps Druid's null≡"" onto dimension
columns before JS filters see them); ``==`` does not perform JS type
coercion beyond Spark's implicit casts.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


class JsSubsetError(NotImplementedError):
    """The JS source is outside the transpilable subset."""


_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>\d+\.\d*|\.\d+|\d+)"
    r"|(?P<str>'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\")"
    r"|(?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)"
    r"|(?P<op>===|!==|==|!=|<=|>=|&&|\|\||[-+*/%!<>?:;,.(){}\[\]=])"
    r")"
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            if src[pos:].strip() == "":
                break
            raise JsSubsetError(f"unexpected character at: {src[pos:pos+20]!r}")
        pos = m.end()
        for kind in ("num", "str", "ident", "op"):
            if m.group(kind) is not None:
                toks.append((kind, m.group(kind)))
                break
    toks.append(("eof", ""))
    return toks


class _Val:
    """A compiled expression: Column + static type tag
    ('num' | 'str' | 'bool' | 'unknown')."""

    __slots__ = ("col", "tag")

    def __init__(self, col: Column, tag: str):
        self.col = col
        self.tag = tag


def _lit(v) -> Column:
    return F.lit(v)


def _to_string(v: "_Val") -> Column:
    """JS number→string coercion: integer-valued doubles print without
    the trailing .0 (String(5) === '5'), everything else casts plainly."""
    if v.tag == "num":
        return F.when(
            v.col == F.floor(v.col), v.col.cast("long").cast("string")
        ).otherwise(v.col.cast("string"))
    return v.col.cast("string")


def _js_strip(col: Column) -> Column:
    """JS WhiteSpace strip for ToNumber/parseInt/parseFloat: JS strips
    tabs, newlines, form feeds etc., not just ASCII spaces — F.trim
    misses them, so Number('\\t') came out NaN where JS says 0 and
    parseInt('\\n12') NaN where JS says 12 (r12 advice). Beyond \\s,
    JS WhiteSpace/LineTerminator also cover the BOM, the Unicode
    line/paragraph separators, and ALL Zs space separators (NBSP, the
    en/em quads, thin/hair spaces, ideographic space \u2014 Java regex
    \\p{Zs}; review find: the first fix covered only NBSP)."""
    ws = r"[\s\p{Zs}\uFEFF\u2028\u2029]"
    return F.regexp_replace(col, f"^{ws}+|{ws}+$", "")


def _to_number(v: "_Val") -> Column:
    """JS ToNumber for a string operand: a malformed numeric string is
    NaN, not an error (fuzz find, seed 13597: under ANSI mode a plain
    cast THREW on the concat result '-0.5-0.5' reaching a numeric
    comparison — Rhino evaluates it to NaN). NULL input stays NULL (the
    module's documented SQL-null propagation). An empty or
    whitespace-only string is 0 (Number('') === 0 — r11 advice: Spark's
    try_cast nulls it, which misread as NaN here, so `"" == 0` came out
    false where Rhino says true), and an unsigned 0x-prefixed hex
    literal parses as hex (Number('0x10') === 16; a SIGNED '-0x10' is
    NaN in JS, and try_cast already nulls it into the NaN fallback)."""
    s = _js_strip(v.col)
    c = s.try_cast("double")
    hex_body = F.regexp_extract(s, r"^0[xX]([0-9a-fA-F]+)$", 1)
    return (
        F.when(v.col.isNull(), c)
        .when(s == "", F.lit(0.0))
        .when(hex_body != "", F.conv(hex_body, 16, 10).cast("double"))
        .when(c.isNull(), F.lit(float("nan")))
        .otherwise(c)
    )


def _parse_int_str(col: Column) -> Column:
    """JS parseInt on a string: trim, then PREFIX-parse — an optional
    sign, then either a 0x/0X hex body or decimal digits; whatever
    follows the numeric prefix is ignored ('12abc' → 12 — r11 advice:
    ToNumber yielded NaN there). No parsable prefix (incl. '' and
    'Infinity' — parseInt never accepts Infinity) → NaN; NULL → NULL."""
    s = _js_strip(col)
    neg = F.when(s.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))
    hex_body = F.regexp_extract(s, r"^[+-]?0[xX]([0-9a-fA-F]+)", 1)
    # A bare hex PREFIX with no hex digits ('0x', '-0x') is NaN in JS —
    # without this guard the decimal branch matched the leading '0' and
    # returned 0 (r12 advice). '00x10' does NOT match (its second char
    # is '0', not x), so it still decimal-parses to 0, as JS does.
    hex_stub = F.regexp_extract(s, r"^[+-]?0[xX]", 0)
    dec_body = F.regexp_extract(s, r"^([+-]?[0-9]+)", 1)
    return (
        F.when(col.isNull(), F.lit(None).cast("double"))
        .when(hex_body != "", neg * F.conv(hex_body, 16, 10).cast("double"))
        .when(hex_stub != "", F.lit(float("nan")))
        .when(dec_body != "", dec_body.cast("double"))
        .otherwise(F.lit(float("nan")))
    )


def _parse_float_str(col: Column) -> Column:
    """JS parseFloat on a string: trim, then PREFIX-parse the longest
    StrDecimalLiteral — sign, then Infinity | digits[.digits][exp] |
    .digits[exp] ('12e3abc' → 12000, '0x10' → 0 via the '0' prefix,
    '' → NaN — parseFloat does NOT share ToNumber's ''→0 or hex rules)."""
    s = _js_strip(col)
    body = F.regexp_extract(
        s,
        r"^([+-]?(?:Infinity|[0-9]+\.?[0-9]*(?:[eE][+-]?[0-9]+)?"
        r"|\.[0-9]+(?:[eE][+-]?[0-9]+)?))",
        1,
    )
    return (
        F.when(col.isNull(), F.lit(None).cast("double"))
        .when(body != "", body.cast("double"))
        .otherwise(F.lit(float("nan")))
    )


def _num_operand(v: "_Val") -> Column:
    """Operand of an arithmetic op: str-tagged values coerce via JS
    ToNumber (NaN on malformed instead of an ANSI cast error)."""
    return _to_number(v) if v.tag == "str" else v.col


def _coerce_cmp(left: "_Val", right: "_Val"):
    """JS comparison coercion. A string compared against a number or
    boolean converts via ToNumber; any NUMERIC comparison gets a NaN
    guard, because JS says NaN compares unequal to everything while
    Spark orders NaN greater than any double and NaN == NaN true — and
    ToNumber/sqrt(-1) can feed NaN into any numeric comparison.
    Returns (lcol, rcol, nan_guard); nan_guard is None when no numeric
    coercion applies (str-str and unknown comparisons keep Spark
    semantics). isnan(NULL) is false, so the guard never hijacks
    SQL-null propagation."""
    num_tags = ("num", "bool")
    if left.tag == "str" and right.tag in num_tags:
        lc, rc = _to_number(left), right.col.cast("double")
    elif right.tag == "str" and left.tag in num_tags:
        lc, rc = left.col.cast("double"), _to_number(right)
    elif left.tag in num_tags and right.tag in num_tags:
        lc, rc = left.col.cast("double"), right.col.cast("double")
    else:
        return left.col, right.col, None
    return lc, rc, F.isnan(lc) | F.isnan(rc)


class _Parser:
    def __init__(self, toks: list[tuple[str, str]], env: dict[str, _Val]):
        self.toks = toks
        self.i = 0
        self.env = env

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def eat(self, value: str):
        kind, v = self.next()
        if v != value:
            raise JsSubsetError(f"expected {value!r}, got {v!r}")

    def try_eat(self, value: str) -> bool:
        if self.peek()[1] == value:
            self.i += 1
            return True
        return False

    # --- expression grammar (precedence climbing) ---

    def expr(self) -> _Val:
        return self.ternary()

    def ternary(self) -> _Val:
        cond = self.logical_or()
        if self.try_eat("?"):
            then = self.expr()
            self.eat(":")
            other = self.expr()
            tag = then.tag if then.tag == other.tag else "unknown"
            return _Val(
                F.when(_truthy(cond), then.col).otherwise(other.col), tag
            )
        return cond

    def logical_or(self) -> _Val:
        left = self.logical_and()
        while self.try_eat("||"):
            right = self.logical_and()
            left = _Val(_truthy(left) | _truthy(right), "bool")
        return left

    def logical_and(self) -> _Val:
        left = self.equality()
        while self.try_eat("&&"):
            right = self.equality()
            left = _Val(_truthy(left) & _truthy(right), "bool")
        return left

    def equality(self) -> _Val:
        left = self.relational()
        while self.peek()[1] in ("==", "!=", "===", "!=="):
            op = self.next()[1]
            right = self.relational()
            prims = ("str", "num", "bool")
            if op in ("===", "!==") and (
                left.tag in prims and right.tag in prims
                and left.tag != right.tag
            ):
                # JS strict equality never coerces: ANY two differing
                # primitive types compare unequal regardless of value
                # ('5' === 5 false, (a > 1) === 1 false — r12 advice:
                # the r11 fix only covered str-vs-num/bool, so bool vs
                # num still fell through to _coerce_cmp's ToNumber).
                # SQL-null propagation preserved: NULL operand → NULL.
                col = F.when(
                    left.col.isNull() | right.col.isNull(),
                    F.lit(None).cast("boolean"),
                ).otherwise(F.lit(op == "!=="))
                left = _Val(col, "bool")
                continue
            lc, rc, nan = _coerce_cmp(left, right)
            col = lc == rc if op in ("==", "===") else lc != rc
            if nan is not None:
                # JS: NaN compares unequal to everything — == false,
                # != true (Spark's own NaN ordering says NaN == NaN).
                col = F.when(nan, F.lit(op in ("!=", "!=="))).otherwise(col)
            left = _Val(col, "bool")
        return left

    def relational(self) -> _Val:
        left = self.additive()
        while self.peek()[1] in ("<", "<=", ">", ">="):
            op = self.next()[1]
            right = self.additive()
            lc, rc, nan = _coerce_cmp(left, right)
            col = {
                "<": lc < rc,
                "<=": lc <= rc,
                ">": lc > rc,
                ">=": lc >= rc,
            }[op]
            if nan is not None:
                # JS: every relational with NaN is false (Spark sorts
                # NaN greater than any double).
                col = F.when(nan, F.lit(False)).otherwise(col)
            left = _Val(col, "bool")
        return left

    def additive(self) -> _Val:
        left = self.multiplicative()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            right = self.multiplicative()
            if op == "-":
                left = _Val(_num_operand(left) - _num_operand(right), "num")
            elif "str" in (left.tag, right.tag):
                left = _Val(F.concat(_to_string(left), _to_string(right)), "str")
            else:
                left = _Val(left.col + right.col, "num")
        return left

    def multiplicative(self) -> _Val:
        left = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            right = self.unary()
            lc, rc = _num_operand(left), _num_operand(right)
            col = {
                "*": lambda: lc * rc,
                "/": lambda: lc.cast("double") / rc,
                "%": lambda: lc % rc,
            }[op]()
            left = _Val(col, "num")
        return left

    def unary(self) -> _Val:
        if self.try_eat("!"):
            return _Val(~_truthy(self.unary()), "bool")
        if self.try_eat("-"):
            v = self.unary()
            return _Val(-_num_operand(v), "num")
        return self.postfix()

    def postfix(self) -> _Val:
        v = self.primary()
        while self.try_eat("."):
            kind, name = self.next()
            if kind != "ident":
                raise JsSubsetError(f"bad member {name!r}")
            if self.try_eat("("):
                args = self.args()
                v = self.method(v, name, args)
            else:
                if name == "length":
                    v = _Val(F.length(v.col).cast("double"), "num")
                else:
                    raise JsSubsetError(f"unsupported property .{name}")
        return v

    def args(self) -> list[_Val]:
        out = []
        if self.try_eat(")"):
            return out
        out.append(self.expr())
        while self.try_eat(","):
            out.append(self.expr())
        self.eat(")")
        return out

    def method(self, v: _Val, name: str, a: list[_Val]) -> _Val:
        s = v.col.cast("string")
        if name == "substring":
            # least/greatest SKIP nulls, so every branch guards with an
            # explicit isNull check to keep the module's SQL
            # three-valued semantics (a null index yields null, as the
            # pre-swap code did via arithmetic propagation)
            if len(a) == 1:
                start = F.greatest(a[0].col.cast("int"), F.lit(0))
                out = F.substring(s, start + 1, 2**30)
                return _Val(F.when(a[0].col.isNotNull(), out), "str")
            # JS substring SWAPS its arguments when start > end and
            # clamps negatives to 0 (fuzz-found: the old no-swap
            # shortcut returned '' for 'abc'.substring(2, 1))
            lo = F.greatest(
                F.least(a[0].col, a[1].col).cast("int"), F.lit(0))
            hi = F.greatest(
                F.greatest(a[0].col, a[1].col).cast("int"), F.lit(0))
            out = F.substring(s, lo + 1, hi - lo)
            return _Val(
                F.when(a[0].col.isNotNull() & a[1].col.isNotNull(), out),
                "str",
            )
        if name == "substr":
            return _Val(
                F.substring(s, (a[0].col + 1).cast("int"), a[1].col.cast("int")),
                "str",
            )
        if name == "charAt":
            return _Val(F.substring(s, (a[0].col + 1).cast("int"), 1), "str")
        if name == "indexOf":
            return _Val((_locate(a[0].col, s) - 1).cast("double"), "num")
        if name == "toLowerCase":
            return _Val(F.lower(s), "str")
        if name == "toUpperCase":
            return _Val(F.upper(s), "str")
        if name == "trim":
            return _Val(F.trim(s), "str")
        if name == "concat":
            return _Val(F.concat(s, *(_to_string(x) for x in a)), "str")
        if name == "replace":
            # JS string.replace(str, str) replaces the FIRST occurrence
            pat, rep = a[0].col.cast("string"), a[1].col.cast("string")
            pos = _locate(pat, s)
            return _Val(
                F.when(pos == 0, s).otherwise(
                    F.concat(
                        F.substring(s, 1, (pos - 1).cast("int")),
                        rep,
                        F.substring(s, (pos + F.length(pat)).cast("int"), 2**30),
                    )
                ),
                "str",
            )
        raise JsSubsetError(f"unsupported method .{name}()")

    def primary(self) -> _Val:
        kind, v = self.next()
        if kind == "num":
            return _Val(_lit(float(v)), "num")
        if kind == "str":
            body = v[1:-1]
            body = re.sub(r"\\(.)", lambda m: m.group(1), body)
            return _Val(_lit(body), "str")
        if v == "(":
            e = self.expr()
            self.eat(")")
            return e
        if kind == "ident":
            if v == "true":
                return _Val(_lit(True), "bool")
            if v == "false":
                return _Val(_lit(False), "bool")
            if v == "null":
                return _Val(_lit(None), "unknown")
            if v == "Math":
                self.eat(".")
                _, fn = self.next()
                self.eat("(")
                a = self.args()
                return self.math(fn, a)
            if v in ("parseInt", "parseFloat", "Number", "String"):
                self.eat("(")
                a = self.args()
                if v == "String":
                    return _Val(_to_string(a[0]), "str")
                if v == "parseInt" and a[0].tag == "str":
                    return _Val(_parse_int_str(a[0].col), "num")
                if v == "parseFloat" and a[0].tag == "str":
                    return _Val(_parse_float_str(a[0].col), "num")
                # Number: JS ToNumber — malformed strings are NaN,
                # never a cast error; '' is 0, unsigned 0x hex parses.
                d = _num_operand(a[0]) if a[0].tag == "str" \
                    else a[0].col.cast("double")
                if v == "parseInt":
                    # numeric input: truncation toward zero, like JS —
                    # except ±Infinity, where JS parseInt is NaN (r11
                    # advice: try_cast('long') turned Infinity into SQL
                    # NULL, breaking the NaN-vs-NULL distinction).
                    # |d| ≥ 2^63 is already integral as a double, so
                    # returning d IS the truncation (JS's further
                    # String(1e21)→'1e+21'→1 corner is out of subset).
                    big = F.abs(d) >= F.lit(9.223372036854776e18)
                    d = (
                        F.when(F.isnan(d) | d.isNull(), d)
                        .when(F.abs(d) == F.lit(float("inf")),
                              F.lit(float("nan")))
                        .when(big, d)
                        .otherwise(d.try_cast("long").cast("double"))
                    )
                return _Val(d, "num")
            if v in self.env:
                return self.env[v]
            raise JsSubsetError(f"unknown identifier {v!r}")
        raise JsSubsetError(f"unexpected token {v!r}")

    def math(self, fn: str, a: list[_Val]) -> _Val:
        cols = [x.col for x in a]
        if fn in ("min", "max"):
            # least/greatest SKIP nulls — neither JS (Rhino coerces
            # null to 0) nor this module's documented SQL three-valued
            # semantics. Propagate null like every other arithmetic op
            # here (fuzz-found: Math.min(nullcol, 10) returned 10).
            out = F.least(*cols) if fn == "min" else F.greatest(*cols)
            some_null = cols[0].isNull()
            for c in cols[1:]:
                some_null = some_null | c.isNull()
            return _Val(F.when(~some_null, out), "num")
        if fn == "abs":
            return _Val(F.abs(cols[0]), "num")
        if fn == "floor":
            return _Val(F.floor(cols[0]).cast("double"), "num")
        if fn == "ceil":
            return _Val(F.ceil(cols[0]).cast("double"), "num")
        if fn == "sqrt":
            return _Val(F.sqrt(cols[0]), "num")
        if fn == "pow":
            return _Val(F.pow(cols[0], cols[1]), "num")
        if fn == "round":
            # JS Math.round == floor(x + 0.5), including negatives
            return _Val(F.floor(cols[0] + 0.5).cast("double"), "num")
        raise JsSubsetError(f"unsupported Math.{fn}")


def _locate(needle: Column, haystack: Column) -> Column:
    """1-based first-occurrence position, 0 if absent (SQL ``locate``),
    with Column needles (F.locate only takes str literals)."""
    return F.call_function("locate", needle, haystack)


def _truthy(v: _Val) -> Column:
    if v.tag == "bool":
        return v.col
    if v.tag == "str":
        return v.col.isNotNull() & (v.col != "")
    if v.tag == "num":
        # JS: Boolean(NaN) is false (Spark's NaN != 0 is true)
        return (v.col.isNotNull()
                & ~F.isnan(v.col.cast("double"))
                & (v.col != 0))
    return F.coalesce(v.col.cast("boolean"), F.lit(False))


def _parse_function(src: str) -> tuple[list[str], _Parser]:
    toks = _tokenize(src)
    p = _Parser(toks, env={})
    p.eat("function")
    p.eat("(")
    params: list[str] = []
    if not p.try_eat(")"):
        while True:
            kind, name = p.next()
            if kind != "ident":
                raise JsSubsetError(f"bad parameter {name!r}")
            params.append(name)
            if p.try_eat(")"):
                break
            p.eat(",")
    p.eat("{")
    return params, p


def _compile_body(p: _Parser) -> _Val:
    # optional `var x = expr;` bindings, then `return expr;?`
    while p.peek()[1] == "var":
        p.next()
        kind, name = p.next()
        if kind != "ident":
            raise JsSubsetError(f"bad var name {name!r}")
        p.eat("=")
        p.env[name] = p.expr()
        p.eat(";")
    kw = p.next()
    if kw[1] != "return":
        raise JsSubsetError("body must be `var`s followed by a single return")
    out = p.expr()
    p.try_eat(";")
    p.eat("}")
    if p.peek()[0] != "eof":
        raise JsSubsetError("trailing tokens after function body")
    return out


def compile_scalar(src: str, arg_cols: list[Column],
                   kind: str | list[str] = "str") -> Column:
    """Compile JS function source to a Column over the given argument
    columns (one per declared parameter, by position).

    ``kind`` sets the JS type the parameters carry: dimension values
    arrive as strings in Druid's JS filter/extraction (so `a + b`
    concatenates), while post-aggregator fields are aggregate outputs —
    numbers (so `a + b` adds). A LIST gives each parameter its own kind
    (mixed string-dimension + numeric-field signatures)."""
    params, p = _parse_function(src)
    if len(arg_cols) < len(params):
        raise JsSubsetError(
            f"function declares {len(params)} params, got {len(arg_cols)} columns"
        )
    kinds = [kind] * len(params) if isinstance(kind, str) else list(kind)
    if len(kinds) < len(params):
        raise JsSubsetError(
            f"function declares {len(params)} params, got {len(kinds)} kinds")
    p.env = {name: _Val(col, k)
             for name, col, k in zip(params, arg_cols, kinds)}
    return _compile_body(p).col


def compile_predicate(src: str, arg_cols: list[Column]) -> Column:
    """Compile JS function source to a boolean predicate Column (JS
    truthiness applied to the returned value)."""
    params, p = _parse_function(src)
    if len(arg_cols) < len(params):
        raise JsSubsetError(
            f"function declares {len(params)} params, got {len(arg_cols)} columns"
        )
    p.env = {
        name: _Val(col, "str")
        for name, col in zip(params, arg_cols)
    }
    return _truthy(_compile_body(p))


def compile_additive_aggregator(src: str, field_cols: list[Column]) -> Column:
    """Compile a Druid JS ``fnAggregate`` of the additive-fold form
    ``function(current, a, b...) { return current + <expr(a, b...)>; }``
    to a native ``sum`` aggregate. The fold must be additive (the only
    JS-aggregator shape with a distributed equivalent that needs no
    per-row script): ``current`` appears exactly once, at the top level
    of a ``+``/``-`` chain."""
    params, p = _parse_function(src)
    if not params:
        raise JsSubsetError("fnAggregate needs (current, fields...) params")
    acc = params[0]
    # Structural additivity check on the raw token stream: the
    # accumulator must occur exactly once, as a top-level term of a +
    # chain (`return current + ...`, `return ... + current`). Any other
    # use (current * 2, Math.max(current, x), ...) has no distributed
    # sum equivalent and is rejected.
    body_toks = [v for k, v in _tokenize(src) if k in ("ident", "op")]
    occurrences = [i for i, v in enumerate(body_toks) if v == acc]
    # first occurrence is the parameter declaration itself
    if len(occurrences) != 2:
        raise JsSubsetError("javascript aggregator must use `current` exactly once")
    i = occurrences[1]
    prev, nxt = body_toks[i - 1], body_toks[i + 1]
    if not (prev in ("return", "+") and nxt in ("+", ";", "}")):
        raise JsSubsetError(
            "javascript aggregator must be an additive fold "
            "(`return current + <expr>`)"
        )
    # Bind the accumulator to 0 so the compiled body IS the per-row
    # increment (0 is the additive identity and Druid's fnReset seed);
    # metric fields are numeric.
    p.env = {acc: _Val(F.lit(0.0), "num")}
    for name, col in zip(params[1:], field_cols):
        p.env[name] = _Val(col, "num")
    increment = _compile_body(p).col
    return F.coalesce(F.sum(increment.cast("double")), F.lit(0.0))
