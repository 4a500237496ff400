"""Connected components / dedup clustering (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.operators import graph

from tests.conftest import spark  # noqa: F401


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def test_chain_collapses_to_min_label(spark):
    # 1-2, 2-3, 3-4 chain plus an isolated 10-11 pair: transitive
    # closure must label the whole chain 1 even though (1,4) was never
    # a pair — exactly what apply_dedup_filter's star policy misses.
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        r["vertex"]: r["component"]
        for r in graph.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_direction_and_duplicates_irrelevant(spark):
    # Reversed edges, duplicate edges, and self-loops change nothing.
    pairs = _pairs(spark, [(5, 2), (2, 5), (2, 9), (9, 9), (5, 2)])
    got = {
        r["vertex"]: r["component"]
        for r in graph.connected_components(pairs).collect()
    }
    assert got == {2: 2, 5: 2, 9: 2}


def test_dedup_clusters_assigns_singletons_to_self(spark):
    docs = spark.range(1, 8).select(F.col("id").alias("doc_id"))
    pairs = _pairs(spark, [(2, 4), (4, 6)])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in graph.dedup_clusters(docs, pairs).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3, 4: 2, 5: 5, 6: 2, 7: 7}


def test_nonconvergence_raises(spark):
    # driver_max_edges=0 forces the distributed loop (the driver
    # union-find fast path always converges).
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(pairs, max_iterations=2,
                                   driver_max_edges=0)


def test_driver_fast_path_matches_loop(spark):
    """r14 focused gate for the bounded driver union-find: on the same
    graph — chains, a cycle, duplicate/reversed edges, an isolated pair
    — the fast path and the distributed loop must produce identical
    (vertex, component) labelings."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (9, 8), (8, 9),
             (20, 21), (21, 22), (30, 31)]
    pairs = _pairs(spark, edges)
    fast = {(r["vertex"], r["component"])
            for r in graph.connected_components(pairs).collect()}
    loop = {(r["vertex"], r["component"])
            for r in graph.connected_components(
                pairs, driver_max_edges=0).collect()}
    assert fast == loop and fast


def test_cluster_assignment_join_not_force_broadcast(spark):
    """The corpus-assignment join must NOT carry a forced broadcast
    hint: the component-label table scales with the corpus dup rate
    (corpus-scale at 100 TB), so strategy is left to AQE, which still
    broadcasts when runtime stats show the table is genuinely small."""
    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    analyzed = (
        graph.dedup_clusters(docs, pairs)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "ResolvedHint" not in analyzed


def test_dedup_keep_best_quality_and_ties(spark):
    """Highest quality survives per cluster; equal quality → smallest id;
    singletons always survive untouched."""
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0), (7, 0.0)],
        "doc_id long, q double",
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    kept = sorted(
        r["doc_id"] for r in graph.dedup_keep_best(docs, pairs, "q").collect()
    )
    assert kept == [2, 4, 7]  # 2 beats 3 on id at q=9.0; 1 loses on quality
    # original columns intact
    cols = graph.dedup_keep_best(docs, pairs, "q").columns
    assert cols == ["doc_id", "q"]
