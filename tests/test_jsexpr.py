"""JS-source transpiler (functions/jsexpr.py): expression battery,
truthiness, the three integration points (filter / extractionFn /
aggregator), and subset rejection."""

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.functions import jsexpr
from coolplaydruid_spark.functions.jsexpr import JsSubsetError


def _eval_scalar(spark, src, value):
    df = spark.createDataFrame([(value,)], ["x"])
    out = df.select(jsexpr.compile_scalar(src, [F.col("x")]).alias("r"))
    return out.collect()[0]["r"]


@pytest.mark.parametrize(
    "src,value,expected",
    [
        ("function(x) { return x.substring(0, 3) }", "hello", "hel"),
        ("function(x) { return x.substring(2) }", "hello", "llo"),
        # JS substring swaps out-of-order args (fuzz-found regression)
        ("function(x) { return x.substring(3, 1) }", "hello", "el"),
        ("function(x) { return x.substr(1, 3) }", "hello", "ell"),
        ("function(x) { return x.charAt(1) }", "hello", "e"),
        ("function(x) { return x.toUpperCase() }", "hello", "HELLO"),
        ("function(x) { return x.trim() }", "  hi  ", "hi"),
        ("function(x) { return x.concat('!') }", "hi", "hi!"),
        # JS replace: FIRST occurrence only
        ("function(x) { return x.replace('l', 'L') }", "hello", "heLlo"),
        ("function(x) { return x.replace('zz', 'L') }", "hello", "hello"),
        ("function(x) { return x + '-suffix' }", "a", "a-suffix"),
        ("function(x) { return 'pre-' + x }", "a", "pre-a"),
        ("function(x) { return String(x.length) }", "hello", "5"),
        (
            "function(x) { var h = x.substring(0, 2); return h + ':' + h }",
            "hello",
            "he:he",
        ),
        (
            "function(x) { return x.indexOf('l') >= 0 ? 'has-l' : 'no-l' }",
            "hello",
            "has-l",
        ),
        (
            "function(x) { return x.indexOf('z') >= 0 ? 'has-z' : 'no-z' }",
            "hello",
            "no-z",
        ),
    ],
)
def test_scalar_string_exprs(spark, src, value, expected):
    assert _eval_scalar(spark, src, value) == expected


@pytest.mark.parametrize(
    "src,value,expected",
    [
        ("function(x) { return Number(x) * 2 + 1 }", "10", 21.0),
        ("function(x) { return parseInt(x) / 4 }", "10", 2.5),
        ("function(x) { return Math.min(Number(x), 5) }", "10", 5.0),
        ("function(x) { return Math.max(Number(x), 5) }", "3", 5.0),
        ("function(x) { return Math.abs(0 - Number(x)) }", "7", 7.0),
        ("function(x) { return Math.floor(Number(x) / 3) }", "10", 3.0),
        ("function(x) { return Math.ceil(Number(x) / 3) }", "10", 4.0),
        ("function(x) { return Math.pow(Number(x), 2) }", "3", 9.0),
        # JS Math.round(-2.5) == -2 (floor(x+0.5)), unlike SQL HALF_UP
        ("function(x) { return Math.round(Number(x)) }", "-2.5", -2.0),
        ("function(x) { return Math.round(Number(x)) }", "2.5", 3.0),
        ("function(x) { return Number(x) % 3 }", "10", 1.0),
        ("function(x) { return -Number(x) % 3 }", "10", -1.0),
        ("function(x) { return x.length * 1 }", "hello", 5.0),
    ],
)
def test_scalar_numeric_exprs(spark, src, value, expected):
    assert _eval_scalar(spark, src, value) == pytest.approx(expected)


def test_predicate_truthiness_and_filter_integration(spark):
    df = spark.createDataFrame(
        [("apple",), ("banana",), ("",), ("cherry",)], ["d"]
    )
    # boolean return
    p = jsexpr.compile_predicate(
        "function(d) { return d.indexOf('an') >= 0 }", [F.col("d")]
    )
    assert [r["d"] for r in df.where(p).collect()] == ["banana"]
    # string return -> truthy iff non-empty (JS semantics)
    p2 = jsexpr.compile_predicate("function(d) { return d }", [F.col("d")])
    assert sorted(r["d"] for r in df.where(p2).collect()) == [
        "apple", "banana", "cherry",
    ]
    # via the filter compiler with JS SOURCE (not a callable)
    from coolplaydruid_spark.functions.filters import compile_filter

    pred = compile_filter(
        {
            "type": "javascript",
            "dimension": "d",
            "function": "function(d) { return d.length > 5 }",
        }
    )
    assert sorted(r["d"] for r in df.where(pred).collect()) == ["banana", "cherry"]
    # plan stays JVM-side: no BatchEvalPython / pythonUDF in the plan
    plan = df.where(pred)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_extraction_fn_js_source(spark):
    from coolplaydruid_spark.functions.extraction import apply_extraction

    df = spark.createDataFrame([("click",), ("purchase",)], ["event_type"])
    col = apply_extraction(
        F.col("event_type"),
        {
            "type": "javascript",
            "function": "function(x) { return x.substring(0, 2).toUpperCase() }",
        },
    )
    assert [r["r"] for r in df.select(col.alias("r")).collect()] == ["CL", "PU"]


def test_js_aggregator_additive_fold(spark):
    from coolplaydruid_spark.functions.jsexpr import compile_additive_aggregator

    df = spark.createDataFrame(
        [(1, 2.0, 10.0), (1, 3.0, 20.0), (2, 4.0, 30.0)], ["k", "a", "b"]
    )
    agg = compile_additive_aggregator(
        "function(current, a, b) { return current + a * b }",
        [F.col("a"), F.col("b")],
    )
    got = {
        r["k"]: r["s"]
        for r in df.groupBy("k").agg(agg.alias("s")).collect()
    }
    assert got == {1: pytest.approx(80.0), 2: pytest.approx(120.0)}
    # engine-level: javascript aggregator with JS source strings
    from coolplaydruid_spark.functions.aggregators import compile_aggregators

    compiled = compile_aggregators(
        [
            {
                "type": "javascript",
                "name": "wsum",
                "fieldNames": ["a", "b"],
                "fnAggregate": "function(current, a, b) { return current + a * b }",
                "fnCombine": "function(pa, pb) { return pa + pb }",
                "fnReset": "function() { return 0 }",
            }
        ],
        {},
    )
    assert not compiled.py_exprs  # native, not pandas-UDF path
    row = df.agg(*compiled.exprs).collect()[0]
    assert row["wsum"] == pytest.approx(200.0)


@pytest.mark.parametrize(
    "src",
    [
        "function(current, a) { return current * a }",  # non-additive fold
        "function(x) { return x.split(',') }",  # unsupported method
        "function(x) { while(true) { } return x }",  # unsupported statement
        "function(x) { return y }",  # unknown identifier
    ],
)
def test_subset_rejection(src):
    with pytest.raises((JsSubsetError, NotImplementedError)):
        if "current" in src:
            jsexpr.compile_additive_aggregator(src, [F.lit(1.0)])
        else:
            jsexpr.compile_scalar(src, [F.lit("x")])


def test_strict_equality_never_coerces_bool_vs_num(spark):
    """r12 advice: JS strict equality compares ANY two differing
    primitive types unequal — the r11 fix covered str-vs-num/bool but
    bool-vs-num still fell through to ToNumber coercion, so
    (a > 1) === 1 came out true where JS says false."""
    df = spark.createDataFrame([("5",), ("0",)], ["x"])

    def run(src):
        return [r["r"] for r in df.select(
            jsexpr.compile_scalar(src, [F.col("x")], kind="str")
            .cast("boolean").alias("r")).collect()]

    # bool === num: always false (never true even when ToNumber agrees)
    assert run("function(x) { return (Number(x) > 1) === 1 }") == [False, False]
    assert run("function(x) { return 1 === (Number(x) > 1) }") == [False, False]
    assert run("function(x) { return (Number(x) > 1) !== 1 }") == [True, True]
    # loose equality still coerces: true == 1 is true in JS
    assert run("function(x) { return (Number(x) > 1) == 1 }") == [True, False]
    # same-tag strict comparisons unaffected
    assert run("function(x) { return Number(x) === 5 }") == [True, False]
    # SQL-null propagation preserved on the new no-coerce branch
    dfn = spark.createDataFrame([(None,)], "x string")
    out = dfn.select(jsexpr.compile_scalar(
        "function(x) { return (Number(x) > 1) === 1 }",
        [F.col("x")]).alias("r")).collect()[0]["r"]
    assert out is None


@pytest.mark.parametrize(
    "src,value,expected",
    [
        # JS WhiteSpace strip: \t/\n pad every numeric-string entry
        # point (r12 advice — F.trim only strips ASCII spaces)
        ("function(x) { return Number(x) }", "\t", 0.0),
        ("function(x) { return Number(x) }", "\t0x10\n", 16.0),
        ("function(x) { return parseInt(x) }", "\n12", 12.0),
        ("function(x) { return parseInt(x) }", "\t0x10", 16.0),
        ("function(x) { return parseFloat(x) }", "\t1.5x", 1.5),
        # beyond \s: NBSP and the BOM are JS WhiteSpace too
        ("function(x) { return Number(x) }", "\u00a042\ufeff", 42.0),
        ("function(x) { return parseInt(x) }", "\u20287", 7.0),
        # full Zs category (review find): EN QUAD, thin space
        ("function(x) { return Number(x) }", "\u200542\u2009", 42.0),
    ],
)
def test_js_whitespace_stripping(spark, src, value, expected):
    assert _eval_scalar(spark, src, value) == pytest.approx(expected)


@pytest.mark.parametrize(
    "src,value,expected",
    [
        # parseInt('0x') family: a bare hex prefix with no hex digits
        # is NaN in JS (r12 advice — the decimal branch matched the
        # leading '0' and returned 0)
        ("function(x) { return parseInt(x) }", "0x", float("nan")),
        ("function(x) { return parseInt(x) }", "-0x", float("nan")),
        ("function(x) { return parseInt(x) }", "+0x", float("nan")),
        # '00x10' is NOT a hex prefix (second char is '0'): decimal
        # prefix '00' parses to 0, and '12x' decimal-prefixes to 12
        ("function(x) { return parseInt(x) }", "00x10", 0.0),
        ("function(x) { return parseInt(x) }", "12x", 12.0),
        ("function(x) { return parseInt(x) }", "0x1F", 31.0),
    ],
)
def test_parse_int_hex_prefix_edge(spark, src, value, expected):
    import math

    got = _eval_scalar(spark, src, value)
    if math.isnan(expected):
        assert got is not None and math.isnan(got)
    else:
        assert got == pytest.approx(expected)


def test_null_index_propagates_through_substring_and_minmax(spark):
    """Review-driven: a null numeric argument must null the result
    (SQL three-valued semantics) — least/greatest-based rewrites of
    substring-swap and Math.min/max would otherwise SKIP the null."""
    df = spark.createDataFrame([("hello", None), ("hello", 1.0)],
                               "s string, n double")
    out = df.select(
        jsexpr.compile_scalar(
            "function(x, y) { return x.substring(y, 3) }",
            [F.col("s"), F.col("n")]).alias("two"),
        jsexpr.compile_scalar(
            "function(x, y) { return x.substring(y) }",
            [F.col("s"), F.col("n")]).alias("one"),
        jsexpr.compile_scalar(
            "function(x, y) { return Math.min(y, 5) }",
            [F.col("s"), F.col("n")], kind="num").alias("mn"),
    ).collect()
    assert out[0]["two"] is None and out[0]["one"] is None
    assert out[0]["mn"] is None
    assert out[1]["two"] == "el" and out[1]["one"] == "ello"
    assert out[1]["mn"] == 1.0
