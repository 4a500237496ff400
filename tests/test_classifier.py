"""Hashed linear classifier (operators/classifier.py): the inline
map-literal path and the broadcast-join path must agree exactly, and
the inline plan must stay shuffle-free."""

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.operators import classifier

WEIGHTS = {b: ((b * 11) % 13 - 6) / 6.0 for b in range(32)}


@pytest.fixture(scope="module")
def docs(catalog):
    return catalog.table("documents")


def test_inline_and_join_paths_agree(docs, spark):
    inline = classifier.hashed_linear_score(docs, WEIGHTS, n_buckets=32, bias=0.25)
    wdf = spark.createDataFrame(
        [(b, w) for b, w in WEIGHTS.items()], "bucket long, weight double"
    )
    joined = classifier.hashed_linear_score(docs, wdf, n_buckets=32, bias=0.25)
    a = {r["doc_id"]: r for r in inline.collect()}
    b = {r["doc_id"]: r for r in joined.collect()}
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        assert a[k]["n_toks"] == b[k]["n_toks"]
        assert a[k]["margin"] == pytest.approx(b[k]["margin"], abs=1e-9)
        assert a[k]["prob"] == pytest.approx(b[k]["prob"], abs=1e-9)


def test_empty_document_scores_bias(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "hello world")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           classifier.hashed_linear_score(df, WEIGHTS, 32, bias=0.5).collect()}
    assert out[1]["n_toks"] == 0 and out[1]["margin"] == pytest.approx(0.5)
    assert out[2]["n_toks"] == 0 and out[2]["margin"] == pytest.approx(0.5)
    assert out[3]["n_toks"] == 2
    assert 0.0 < out[3]["prob"] < 1.0


def test_inline_path_is_shuffle_free(docs):
    out = classifier.hashed_linear_score(docs, WEIGHTS, n_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
