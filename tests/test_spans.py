"""Cross-document duplicate-span detection/removal (operators/spans.py):
hand-computed expectations, rewrite invariants, plan shape, and the
within-corpus consistency between the stats and the rewrite forms."""

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.operators import spans


@pytest.fixture(scope="module")
def corpus(spark):
    boiler = "this content is provided as is without warranty of any kind"
    return spark.createDataFrame(
        [
            (1, f"alpha beta gamma {boiler} delta epsilon"),
            (2, f"zeta eta {boiler} theta"),
            (3, "completely unique text with no repeated spans anywhere at all ok"),
            (4, "short doc"),
            (5, None),
        ],
        "doc_id long, text string",
    )


def test_stats_hand_computed(corpus):
    st = {r["doc_id"]: r.asDict() for r in
          spans.duplicate_span_stats(corpus, window=8).collect()}
    # docs 1 and 2 share an 11-token boilerplate span -> its 8-token
    # sub-windows (4 of them) are cross-document duplicates
    assert st[1]["n_dup_windows"] == 4
    assert st[2]["n_dup_windows"] == 4
    assert st[1]["covered_tokens"] == 11
    assert st[2]["covered_tokens"] == 11
    assert st[1]["retained_tokens"] == st[1]["n_tokens"] - 11
    assert st[3]["n_dup_windows"] == 0
    assert st[3]["retained_tokens"] == st[3]["n_tokens"]
    assert st[4]["n_tokens"] == 2 and st[4]["n_dup_windows"] == 0  # < window
    assert st[5]["n_tokens"] == 0


def test_rewrite_removes_exactly_covered_tokens(corpus):
    out = {r["doc_id"]: r.asDict() for r in
           spans.remove_duplicate_spans(corpus, window=8).collect()}
    boiler = "this content is provided as is without warranty of any kind"
    assert out[1]["clean_text"] == "alpha beta gamma delta epsilon"
    assert out[2]["clean_text"] == "zeta eta theta"
    assert boiler not in out[1]["clean_text"] and boiler not in out[2]["clean_text"]
    # untouched docs keep their full normalized token stream
    assert out[3]["clean_text"] == (
        "completely unique text with no repeated spans anywhere at all ok"
    )
    assert out[3]["retained_tokens"] == out[3]["n_tokens"]
    assert out[4]["clean_text"] == "short doc"
    assert out[5]["clean_text"] == ""
    # stats and rewrite agree on retained counts
    st = {r["doc_id"]: r["retained_tokens"] for r in
          spans.duplicate_span_stats(corpus, window=8).collect()}
    assert {k: v["retained_tokens"] for k, v in out.items()} == st


def test_min_docs_and_window_knobs(corpus):
    # min_docs=3: the boilerplate appears in only 2 docs -> nothing marked
    st = spans.duplicate_span_stats(corpus, window=8, min_docs=3)
    assert st.where("n_dup_windows > 0").count() == 0
    # smaller window marks more sub-windows of the same span
    st4 = {r["doc_id"]: r["covered_tokens"] for r in
           spans.duplicate_span_stats(corpus, window=4).collect()}
    assert st4[1] >= 11


def test_plan_is_jvm_only(corpus):
    for df in (spans.duplicate_span_stats(corpus),
               spans.remove_duplicate_spans(corpus)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan


def test_cache_single_tokenize_and_same_results(spark, corpus):
    """cache=True must (a) change no results, (b) leave exactly ONE
    tokenize projection in the plan — everything downstream reads the
    persisted tokenized/window-hash frames (the r5 verdict's
    triple-scan finding)."""
    spark.catalog.clearCache()
    try:
        cached = spans.duplicate_span_stats(corpus, window=8, cache=True)
        plan = cached._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
        # tokens() lowercases + regexp-splits; outside the cached segment
        # the final plan must not re-tokenize
        assert "regexp" not in plan.lower().replace("inmemory", "")
        want = {r["doc_id"]: r.asDict() for r in
                spans.duplicate_span_stats(corpus, window=8).collect()}
        got = {r["doc_id"]: r.asDict() for r in cached.collect()}
        assert got == want
        rm = {r["doc_id"]: r.asDict() for r in
              spans.remove_duplicate_spans(corpus, window=8, cache=True).collect()}
        rm0 = {r["doc_id"]: r.asDict() for r in
               spans.remove_duplicate_spans(corpus, window=8).collect()}
        assert rm == rm0
    finally:
        spark.catalog.clearCache()


def test_hot_key_skew_corpus(spark):
    """A boilerplate span present in EVERY document makes its md5 one
    hot key in the mark join-back. With the dup side forced off
    broadcast (the 100 TB shape), AQE's skew-join machinery must be
    active on the sort-merge join and results must stay exact."""
    boiler = "all rights reserved unauthorized reproduction of this text is strictly prohibited"
    n = 400
    rows = [(i, f"doc {i} unique preamble token{i} {boiler} trailer{i}")
            for i in range(n)]
    # half the corpus is literally the boilerplate (50%-dup corpus)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    conf = spark.conf
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", None),
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        st = spans.duplicate_span_stats(df, window=8)
        got = {r["doc_id"]: r.asDict() for r in st.collect()}
        # every doc contains the 11-token boilerplate: 4 dup windows,
        # 11 covered tokens
        assert all(v["n_dup_windows"] == 4 for v in got.values())
        assert all(v["covered_tokens"] == 11 for v in got.values())
        plan = st._jdf.queryExecution().executedPlan().toString()
        # the corpus-scaled join must be a (skew-splittable) SMJ under
        # AQE, never a broadcast of the corpus side
        assert "SortMergeJoin" in plan
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_within_doc_repeats(spark):
    """within_doc=True marks spans repeated INSIDE one document even
    when no other document shares them."""
    df = spark.createDataFrame(
        [(1, " ".join(["la the same eight token phrase repeats here"] * 2)),
         (2, "nothing repeated in this one at all whatsoever today")],
        "doc_id long, text string",
    )
    cross_only = spans.duplicate_span_stats(df, window=8)
    assert cross_only.where("n_dup_windows > 0").count() == 0
    within = {r["doc_id"]: r.asDict() for r in
              spans.duplicate_span_stats(df, window=8, within_doc=True).collect()}
    assert within[1]["n_dup_windows"] > 0
    assert within[1]["covered_tokens"] == within[1]["n_tokens"]  # whole doc repeats
    assert within[2]["n_dup_windows"] == 0
    cleaned = {r["doc_id"]: r["clean_text"] for r in
               spans.remove_duplicate_spans(df, window=8, within_doc=True).collect()}
    assert cleaned[1] == "" and cleaned[2] != ""


def test_within_doc_respects_min_docs(spark):
    """Review-driven: within_doc checks PER-DOCUMENT repeats — a span
    seen once each in two docs must not be marked when min_docs > 2."""
    shared = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, f"start {shared} end"), (2, f"other {shared} tail")],
        "doc_id long, text string",
    )
    st = spans.duplicate_span_stats(df, window=8, min_docs=5, within_doc=True)
    assert st.where("n_dup_windows > 0").count() == 0
    # but a genuine intra-doc repeat IS marked under the same min_docs
    df2 = spark.createDataFrame(
        [(1, f"{shared} {shared}"), (2, "totally different words here now")],
        "doc_id long, text string",
    )
    st2 = {r["doc_id"]: r["n_dup_windows"] for r in
           spans.duplicate_span_stats(df2, window=8, min_docs=5,
                                      within_doc=True).collect()}
    assert st2[1] > 0 and st2[2] == 0
