"""BM25 retrieval (operators/retrieval.py) and DSIR importance weights
(operators/importance.py): fixture-oracle parity via the contract SQL,
semantic sanity on hand-built corpora, and plan-shape guards (one-row
broadcast stats / bounded-broadcast ratio table)."""

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark import contract
from coolplaydruid_spark.operators import importance, retrieval
from tests.conftest import assert_df_matches_duck


# ---------------------------------------------------------------------------
# oracle parity on the fixture corpus (same SQL the driver gate runs)
# ---------------------------------------------------------------------------

def test_bm25_matches_contract_oracle(spark, duck):
    from tests.conftest import SF_DIR

    df = contract.QUERIES["text_bm25_top20"](spark, SF_DIR)
    assert_df_matches_duck(df, duck, contract.ORACLES["text_bm25_top20"])


def test_dsir_matches_contract_oracle(spark, duck):
    from tests.conftest import SF_DIR

    df = contract.QUERIES["sampling_dsir_weights"](spark, SF_DIR)
    assert_df_matches_duck(df, duck, contract.ORACLES["sampling_dsir_weights"])


# ---------------------------------------------------------------------------
# BM25 semantics on a hand-built corpus
# ---------------------------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_tf_and_rarity(spark):
    docs = _docs(spark, [
        (1, "cat cat cat dog"),        # high tf for both terms
        (2, "cat mouse mouse mouse"),  # one term, once
        (3, "mouse mouse mouse"),      # no match -> excluded
        (4, None),                     # null text -> excluded
        (5, "dog"),                    # rare term only, short doc
    ])
    got = retrieval.bm25_topk(docs, "cat dog", top_k=10).collect()
    ids = [r.doc_id for r in got]
    assert set(ids) == {1, 2, 5}
    # doc 1 matches both terms with high tf -> best
    assert ids[0] == 1
    # scores strictly ordered, ties impossible here
    scores = [r.bm25 for r in got]
    assert scores == sorted(scores, reverse=True)
    # 'dog' (df=2) is rarer than 'cat' (df=2)? both df=2 here; doc 5 is
    # shorter than doc 2 (dl 1 vs 4), so its single-term score is higher
    assert ids[1] == 5


def test_bm25_unmatched_query_term_is_harmless(spark):
    docs = _docs(spark, [(1, "cat"), (2, "dog")])
    got = retrieval.bm25_topk(docs, "cat zzz_not_present", top_k=10).collect()
    assert [r.doc_id for r in got] == [1]
    assert got[0].bm25 > 0


def test_bm25_term_dedup_and_case(spark):
    docs = _docs(spark, [(1, "cat CAT Cat"), (2, "dog")])
    a = retrieval.bm25_topk(docs, "CAT cat", top_k=5).collect()
    b = retrieval.bm25_topk(docs, "cat", top_k=5).collect()
    assert [(r.doc_id, r.bm25) for r in a] == [(r.doc_id, r.bm25) for r in b]


def test_bm25_empty_query_raises(spark):
    docs = _docs(spark, [(1, "cat")])
    with pytest.raises(ValueError):
        retrieval.bm25_topk(docs, "   ")


def test_bm25_tie_break_by_id(spark):
    # identical documents -> identical scores -> id order decides the cut
    docs = _docs(spark, [(i, "cat dog") for i in range(10)])
    got = retrieval.bm25_topk(docs, "cat", top_k=3).collect()
    assert [r.doc_id for r in got] == [0, 1, 2]


def test_bm25_plan_shape(spark):
    docs = _docs(spark, [(1, "cat"), (2, "dog")])
    plan = retrieval.bm25_topk(docs, "cat", top_k=5)._jdf.queryExecution(
    ).executedPlan().toString()
    # stats join must be broadcast (one row), top-k must be a bounded
    # heap, and the per-doc tf must not explode tokens
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
    assert "Generate" not in plan  # no explode anywhere


# ---------------------------------------------------------------------------
# DSIR semantics on a hand-built corpus
# ---------------------------------------------------------------------------

def test_dsir_prefers_target_like_docs(spark):
    target = _docs(spark, [
        (100, "alpha beta gamma alpha beta"),
        (101, "alpha beta beta gamma"),
    ]).select("text")
    raw = _docs(spark, [
        (1, "alpha beta gamma"),        # on-target vocabulary
        (2, "delta epsilon zeta"),      # off-target vocabulary
        (3, "alpha delta"),             # mixed
        (4, ""),                        # zero tokens -> excluded
    ])
    got = {r.doc_id: r for r in importance.dsir_weights(
        raw, target, num_buckets=64).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].logratio_avg > got[3].logratio_avg > got[2].logratio_avg
    # on-target tokens are MORE likely under the target model
    assert got[1].logratio_sum > 0
    assert got[2].logratio_sum < 0
    assert got[1].n_tokens == 3 and got[3].n_tokens == 2


def test_bm25_batch_equals_single_query(spark):
    """Metamorphic identity: for any one query, the batch operator's
    per-query slice must equal bm25_topk exactly (same formula, two
    different plans — column folds vs term join)."""
    docs = _docs(spark, [
        (1, "cat cat dog bird"),
        (2, "cat mouse"),
        (3, "dog dog dog"),
        (4, "bird cat dog"),
        (5, "fish"),
    ])
    queries = spark.createDataFrame(
        [(10, "cat dog"), (11, "bird fish zzz")],
        "query_id long, query string")
    batch = retrieval.bm25_batch_topk(docs, queries, top_k=4).collect()
    for qid, qtext in [(10, "cat dog"), (11, "bird fish zzz")]:
        single = [(r.doc_id, r.bm25)
                  for r in retrieval.bm25_topk(docs, qtext, top_k=4).collect()]
        got = [(r.doc_id, r.bm25) for r in batch if r.query_id == qid]
        assert got == single, (qid, got, single)


def test_bigram_nll_penalizes_atypical_order(spark):
    from coolplaydruid_spark.operators import text as text_ops

    rows = [(i, "the cat sat here") for i in range(10)]
    rows += [(100, "the cat sat"),    # corpus-typical transitions
             (101, "sat cat the"),    # same unigrams, unseen pairs
             (102, "the")]            # < 2 tokens -> excluded
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in text_ops.bigram_logprob_score(
        docs, vocab_size=50, bigram_size=50).collect()}
    assert 102 not in got
    assert got[100].n_pairs == 2 and got[101].n_pairs == 2
    # identical unigram multiset, so the gap is pure word-order signal
    assert got[100].nll_per_pair < got[101].nll_per_pair


def test_tfidf_top_terms_semantics(spark, duck):
    from coolplaydruid_spark.operators import corpus

    rows = [
        (1, "alpha alpha shared", "s1"),
        (2, "alpha shared shared", "s1"),
        (3, "beta shared", "s2"),
        (4, "beta beta gamma shared", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    got = corpus.tfidf_top_terms(docs, group_col="src", k=2).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r.src, []).append((r.term, r.tf, r.tfidf))
    # 'alpha' (3x, only in s1) is s1's signature; 'shared' (everywhere)
    # scores exactly 0 and never outranks a distinctive term
    assert by_grp["s1"][0][0] == "alpha"
    assert by_grp["s2"][0][0] == "beta"
    import math
    assert by_grp["s1"][0][2] == round(3 * math.log(2), 6)
    for grp in by_grp.values():
        assert all(t[2] >= 0 for t in grp)
        assert len(grp) == 2


def test_tfidf_matches_contract_oracle(spark, duck):
    from tests.conftest import SF_DIR

    df = contract.QUERIES["corpus_tfidf_sources"](spark, SF_DIR)
    assert_df_matches_duck(df, duck, contract.ORACLES["corpus_tfidf_sources"])


def test_dsir_bucket_validation(spark):
    docs = _docs(spark, [(1, "cat")])
    with pytest.raises(ValueError):
        importance.dsir_weights(docs, docs, num_buckets=0)


def test_dsir_plan_shape(spark):
    docs = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
    plan = importance.dsir_weights(docs, docs, num_buckets=32)._jdf \
        .queryExecution().executedPlan().toString()
    # the ratio table join must be broadcast — the corpus-sized token
    # stream never reshuffles for it (the doc-keyed agg is the only
    # data-scaled exchange)
    assert "BroadcastExchange" in plan


def test_bm25_batch_oracle_builder_hardening():
    """r8 review finds: terms must be SQL-escaped, tokenization must be
    ASCII-whitespace (mirroring tokens()), and an all-empty query set
    must raise instead of emitting `VALUES )`."""
    import pytest as _pytest

    from coolplaydruid_spark.contract import _duck_bm25_batch

    sql = _duck_bm25_batch([(1, "o'brien estate")], 5)
    assert "'o''brien'" in sql
    # NBSP is NOT a separator for tokens() (Java ASCII \s) — the oracle
    # must keep it inside one term
    sql2 = _duck_bm25_batch([(1, "cat dog")], 5)
    assert "'cat dog'" in sql2 and "'cat'," not in sql2
    with _pytest.raises(ValueError):
        _duck_bm25_batch([(1, "   "), (2, "")], 5)


def test_bigram_lam_validation(spark):
    from coolplaydruid_spark.operators import text as text_ops

    docs = _docs(spark, [(1, "a b")])
    for bad in (1.0, -0.1, 2.0):
        with pytest.raises(ValueError):
            text_ops.bigram_logprob_score(docs, lam=bad)
    with pytest.raises(ValueError):
        text_ops.bigram_logprob_score(docs, vocab_size=0)


def test_constant_partition_null_safe(spark):
    """r9 review find: a NULL partition column rendered a NULL
    partition value, splitting the 'single-partition' window in two
    and double-assigning rank 1."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from coolplaydruid_spark.operators.util import constant_partition

    df = spark.createDataFrame(
        [(1, 9.0), (None, 8.0), (3, 7.0)], "doc_id long, bm25 double")
    w = Window.partitionBy(constant_partition("doc_id")).orderBy(
        F.col("bm25").desc())
    ranks = [r["rn"] for r in
             df.withColumn("rn", F.row_number().over(w))
             .orderBy(F.col("bm25").desc()).collect()]
    assert ranks == [1, 2, 3]
