"""Druid 0.12 null≡"" filter semantics and multi-value (ArrayType)
dimension filters — the two-valued-logic cases SQL three-valued logic gets
wrong (ADVICE r01: not-filter on null dims, filters on array dims)."""

from datetime import datetime

import pytest

from coolplaydruid_spark.catalog import Catalog
from coolplaydruid_spark.engine import DruidEngine

BASE = {
    "queryType": "timeseries",
    "dataSource": "t",
    "granularity": "all",
    "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
    "aggregations": [{"type": "count", "name": "rows"}],
    "context": {"skipEmptyBuckets": True},
}


@pytest.fixture(scope="module")
def nengine(spark):
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 1), "a", ["x", "y"]),
            (2, datetime(2024, 1, 2, 1), None, None),
            (3, datetime(2024, 1, 3, 1), "", []),
            (4, datetime(2024, 1, 4, 1), "b", ["y", "z"]),
        ],
        "id long, ts timestamp, d string, tags array<string>",
    )
    catalog = Catalog(spark)
    catalog.register("t", df=df, time_column="ts", as_view=False)
    return DruidEngine(spark, catalog)


def _count(nengine, dfilter) -> int:
    rows = nengine.execute(dict(BASE, filter=dfilter))
    return rows[0]["result"]["rows"] if rows else 0


# --- null ≡ "" on scalar dims -------------------------------------------

def test_extraction_null_matches_empty_satisfying_filters(nengine):
    """Review-driven: extraction fns yield null for out-of-range /
    non-matching input, and Druid treats that null as "" — so a
    bound/like/regex filter whose predicate accepts "" must match
    those rows (previously only non-extraction leaves got the isNull
    branch)."""
    sub2 = {"type": "substring", "index": 2}
    # substring(index=2) of "a"/""/null -> null; of "abc..." -> tail.
    # bound lower="" matches everything incl. "" ≡ extracted null.
    n = _count(nengine, {"type": "bound", "dimension": "d", "lower": "",
                         "extractionFn": sub2})
    assert n == 4  # every row
    # like '%' matches "" -> extracted nulls match too
    n = _count(nengine, {"type": "like", "dimension": "d", "pattern": "%",
                         "extractionFn": sub2})
    assert n == 4
    # but a filter "" does NOT satisfy keeps excluding extracted nulls
    n = _count(nengine, {"type": "like", "dimension": "d", "pattern": "x%",
                         "extractionFn": sub2})
    assert n == 0


def test_not_selector_matches_null_dims(nengine):
    # Druid: d null ≡ "", so not(d='a') matches rows 2 (null), 3 (""), 4 ('b')
    f = {"type": "not", "field": {"type": "selector", "dimension": "d", "value": "a"}}
    assert _count(nengine, f) == 3


def test_selector_empty_matches_null(nengine):
    assert _count(nengine, {"type": "selector", "dimension": "d", "value": ""}) == 2


def test_not_not_roundtrip(nengine):
    inner = {"type": "selector", "dimension": "d", "value": "a"}
    double_not = {"type": "not", "field": {"type": "not", "field": inner}}
    assert _count(nengine, double_not) == _count(nengine, inner) == 1


def test_like_all_wildcard_matches_null(nengine):
    # LIKE '%' matches "" in Druid, hence also null dims
    assert _count(nengine, {"type": "like", "dimension": "d", "pattern": "%"}) == 4
    assert _count(nengine, {"type": "like", "dimension": "d", "pattern": "a%"}) == 1


def test_regex_matching_empty_matches_null(nengine):
    assert _count(nengine, {"type": "regex", "dimension": "d", "pattern": "^$"}) == 2
    assert _count(nengine, {"type": "regex", "dimension": "d", "pattern": "^a"}) == 1


def test_bound_lower_unset_matches_null(nengine):
    # "" <= 'c' satisfies the bound, so null dims match too
    f = {"type": "bound", "dimension": "d", "upper": "c"}
    assert _count(nengine, f) == 4
    # a lower bound > "" excludes null/"" rows
    f = {"type": "bound", "dimension": "d", "lower": "a"}
    assert _count(nengine, f) == 2


def test_not_bound_matches_null(nengine):
    f = {"type": "not", "field": {"type": "bound", "dimension": "d", "lower": "a"}}
    assert _count(nengine, f) == 2  # null and ""


# --- multi-value (ArrayType) dims ---------------------------------------

def test_multivalue_selector_any_element(nengine):
    assert _count(nengine, {"type": "selector", "dimension": "tags", "value": "y"}) == 2
    assert _count(nengine, {"type": "selector", "dimension": "tags", "value": "x"}) == 1


def test_multivalue_selector_empty_matches_null_and_empty_array(nengine):
    assert _count(nengine, {"type": "selector", "dimension": "tags", "value": ""}) == 2


def test_multivalue_not_selector(nengine):
    f = {"type": "not", "field": {"type": "selector", "dimension": "tags", "value": "y"}}
    assert _count(nengine, f) == 2  # rows 2 (null) and 3 (empty)


def test_multivalue_in_filter(nengine):
    f = {"type": "in", "dimension": "tags", "values": ["x", "z"]}
    assert _count(nengine, f) == 2


def test_multivalue_bound_and_regex(nengine):
    f = {"type": "bound", "dimension": "tags", "lower": "y", "ordering": "lexicographic"}
    assert _count(nengine, f) == 2  # any element >= 'y': rows 1, 4
    f = {"type": "regex", "dimension": "tags", "pattern": "^z"}
    assert _count(nengine, f) == 1


def test_multivalue_extraction_evaluates_over_null_array(nengine):
    """ADVICE r07: a null/empty array is ONE null value, and the
    extractionFn runs over it — a lookup whose replaceMissingValueWith
    maps null to a matched value must match null/empty-array rows
    (exists() alone never evaluates the lambda for those)."""
    f = {
        "type": "selector", "dimension": "tags", "value": "MISSING",
        "extractionFn": {
            "type": "lookup",
            "lookup": {"type": "map", "map": {"x": "X"}},
            "replaceMissingValueWith": "MISSING",
        },
    }
    # rows 1,4 have a non-x element -> MISSING; rows 2 (null), 3 (empty)
    # match via extraction(null) = MISSING
    assert _count(nengine, f) == 4
    f2 = dict(f, value="X")
    assert _count(nengine, f2) == 1  # only row 1 has 'x'


def test_multivalue_groupby_filter_then_explode(nengine):
    """The ADVICE r01 scenario: filter on a multi-value dim (runs before
    the group-by explode) must use any-element semantics, not array==lit."""
    q = {
        "queryType": "groupBy",
        "dataSource": "t",
        "granularity": "all",
        "dimensions": ["tags"],
        "filter": {"type": "selector", "dimension": "tags", "value": "y"},
        "aggregations": [{"type": "count", "name": "rows"}],
        "intervals": BASE["intervals"],
    }
    rows = nengine.execute(q)
    by_tag = {r["event"]["tags"]: r["event"]["rows"] for r in rows}
    assert by_tag == {"x": 1, "y": 2, "z": 1}


def test_topn_multivalue_dimension(nengine):
    """topN over an ArrayType dimension groups once per element (same
    explode semantics as groupBy)."""
    rows = nengine.execute(
        {
            "queryType": "topN",
            "dataSource": "t",
            "granularity": "all",
            "dimension": "tags",
            "metric": "n",
            "threshold": 2,
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": BASE["intervals"],
        }
    )
    top = rows[0]["result"]
    # groups: y:2, null(+empty):2, x:1, z:1 — the two count-2 groups win
    assert {(r["tags"], r["n"]) for r in top} == {(None, 2), ("y", 2)}


def test_cardinality_by_row_false_union(nengine, spark):
    """cardinality byRow=false counts the UNION of the fields' value
    sets. Druid 0.12 ignores null dimension values in cardinality and
    treats "" as null — hll_sketch_agg's skip-null-and-empty behavior
    matches exactly."""
    rows = nengine.execute(
        {
            "queryType": "timeseries",
            "dataSource": "t",
            "granularity": "all",
            "aggregations": [
                {"type": "cardinality", "name": "u", "fields": ["d", "id"]}
            ],
            "intervals": BASE["intervals"],
            "context": {"skipEmptyBuckets": True},
        }
    )
    # union of d values {'a','b'} (null and ""≡null not counted) and
    # id strings {'1','2','3','4'} -> 6 distinct; HLL exact at this size
    assert rows[0]["result"]["u"] == 6


def test_filtered_aggregator_over_multivalue_dim(engine, spark):
    """Review-driven regression: a filtered AGGREGATOR whose filter hits
    an ArrayType dimension must get any-element-matches compilation
    (the schema threads through compile_aggregators), matching the same
    filter at the query level."""
    from pyspark.sql import functions as F

    from coolplaydruid_spark.catalog import Catalog
    from coolplaydruid_spark.engine import DruidEngine

    df = spark.createDataFrame(
        [(1, ["a", "b"], "2024-01-01T00:00:00"),
         (2, ["b", "c"], "2024-01-01T01:00:00"),
         (3, ["c"], "2024-01-01T02:00:00")],
        "id long, tags array<string>, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cat = Catalog(spark)
    cat.register("tagged", df=df, time_column="ts")
    eng = DruidEngine(spark, cat)
    out = eng.plan({
        "queryType": "timeseries", "dataSource": "tagged", "granularity": "all",
        "aggregations": [
            {"type": "count", "name": "n"},
            {"type": "filtered", "name": "with_b",
             "filter": {"type": "selector", "dimension": "tags", "value": "b"},
             "aggregator": {"type": "count", "name": "with_b"}},
            {"type": "filtered", "name": "b_users",
             "filter": {"type": "selector", "dimension": "tags", "value": "b"},
             "aggregator": {"type": "thetaSketch", "name": "b_users",
                            "fieldName": "id"}},
        ],
    }).collect()[0]
    assert out["n"] == 3 and out["with_b"] == 2 and out["b_users"] == 2


def test_list_filtered_dimension_spec(engine, spark):
    """listFiltered dimensionSpec: multi-value elements whitelisted /
    blacklisted before grouping (groupBy and topN)."""
    from pyspark.sql import functions as F

    from coolplaydruid_spark.catalog import Catalog
    from coolplaydruid_spark.engine import DruidEngine

    df = spark.createDataFrame(
        [(1, ["a", "b"], "2024-01-01T00:00:00"),
         (2, ["b", "c"], "2024-01-01T01:00:00"),
         (3, ["c", "d"], "2024-01-01T02:00:00")],
        "id long, tags array<string>, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cat = Catalog(spark)
    cat.register("lftags", df=df, time_column="ts")
    eng = DruidEngine(spark, cat)
    base = {
        "queryType": "groupBy", "dataSource": "lftags", "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}],
    }
    rows = {r["tag"]: r["n"] for r in eng.plan(dict(base, dimensions=[
        {"type": "listFiltered",
         "delegate": {"type": "default", "dimension": "tags", "outputName": "tag"},
         "values": ["b", "c"]}])).collect()}
    # whitelist keeps b/c elements; rows with no remaining element group null
    assert rows == {"b": 2, "c": 2, None: 0} or rows == {"b": 2, "c": 2}

    black = {r["tag"]: r["n"] for r in eng.plan(dict(base, dimensions=[
        {"type": "listFiltered",
         "delegate": {"type": "default", "dimension": "tags", "outputName": "tag"},
         "values": ["b", "c"], "isWhitelist": False}])).collect()}
    assert black.get("a") == 1 and black.get("d") == 1 and "b" not in black

    topn = eng.plan({
        "queryType": "topN", "dataSource": "lftags", "granularity": "all",
        "dimension": {"type": "listFiltered",
                      "delegate": {"type": "default", "dimension": "tags",
                                   "outputName": "tag"},
                      "values": ["b", "c"]},
        "metric": "n", "threshold": 2,
        "aggregations": [{"type": "count", "name": "n"}],
    }).collect()
    assert {r["tag"] for r in topn} <= {"b", "c", None}


def test_list_filtered_does_not_contaminate_aggregators(engine, spark):
    """Review-driven: listFiltered scopes to ITS dimension's output —
    a filtered aggregator over the same multi-value column still sees
    the row's real elements; blacklists keep null elements."""
    from pyspark.sql import functions as F

    from coolplaydruid_spark.catalog import Catalog
    from coolplaydruid_spark.engine import DruidEngine

    df = spark.createDataFrame(
        [(1, ["b", "c"], "2024-01-01T00:00:00"),
         (2, ["a", None, "b"], "2024-01-01T01:00:00")],
        "id long, tags array<string>, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    cat = Catalog(spark)
    cat.register("lf2", df=df, time_column="ts")
    eng = DruidEngine(spark, cat)
    rows = eng.plan({
        "queryType": "groupBy", "dataSource": "lf2", "granularity": "all",
        "dimensions": [{"type": "listFiltered",
                        "delegate": {"type": "default", "dimension": "tags",
                                     "outputName": "tag"},
                        "values": ["b"]}],
        "aggregations": [
            {"type": "count", "name": "n"},
            # filter on the SAME column's 'c' element — must still match
            # row 1 even though the dimension whitelists only 'b'
            {"type": "filtered", "name": "with_c",
             "filter": {"type": "selector", "dimension": "tags", "value": "c"},
             "aggregator": {"type": "count", "name": "with_c"}},
        ],
    }).collect()
    by_tag = {r["tag"]: r for r in rows}
    assert by_tag["b"]["n"] == 2
    assert by_tag["b"]["with_c"] == 1  # row 1's real tags include 'c'

    # blacklist keeps null elements (they are not in the list)
    black = eng.plan({
        "queryType": "groupBy", "dataSource": "lf2", "granularity": "all",
        "dimensions": [{"type": "listFiltered",
                        "delegate": {"type": "default", "dimension": "tags",
                                     "outputName": "tag"},
                        "values": ["a", "b"], "isWhitelist": False}],
        "aggregations": [{"type": "count", "name": "n"}],
    }).collect()
    tags = {r["tag"] for r in black}
    assert "c" in tags and None in tags and "a" not in tags
