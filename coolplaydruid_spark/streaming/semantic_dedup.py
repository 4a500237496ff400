"""Streaming SemDeDup: per-micro-batch semantic near-dup against an
accepted-cells store — the embedding modality's member of the streaming
dedup family (exact/fuzzy text: streaming/dedup.py; media:
streaming/media_dedup.py; same accept/replay discipline).

Each batch: (1) assign cells with the PINNED centroids (centroid
literals folded into the plan — cells from different centroid sets are
incomparable, so the centroid set is fixed per stream exactly as the
ingest-time `semantic_cells` signature store pins it per corpus),
(2) in-batch within-cell self-check, keep-first, (3) cross-check the
survivors against the accepted cells store, excluding this batch's own
partition so a replay never drops rows against its own partial output,
(4) overwrite batch=<id> with the surviving cell rows.

The accepted store holds (id, vector, __cell, __cell_cos) — the same
schema the ingest store materializes, so a stream-accepted corpus feeds
batch `semantic_dedup_pairs_incremental(corpus_cells=...)` directly
(via sources.batch.read_signatures(path) in the name-less streaming
layout), and an ingest-materialized store can seed a stream via
``corpus_cells=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.operators import dedup
from coolplaydruid_spark.streaming.dedup import _read_accepted

_STORE_COLS = ("__cell", "__cell_cos")


def streaming_semantic_dedup(
    stream: DataFrame,
    accepted_path: str,
    checkpoint: str,
    centroids,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_cells: DataFrame | None = None,
    impl: str = "jvm",
):
    """Start the streaming semantic dedup query; returns the
    StreamingQuery. Ids must be globally unique across the stream (the
    corpus invariant — replays overwrite their own partition, so a
    replay never collides with itself). ``corpus_cells``: an extra
    read-only assigned corpus every batch also cross-checks against —
    typically `read_signatures(spark, dest, "semantic_cells")` from an
    index task that pinned the SAME centroids. ``impl``: pairing
    implementation, forwarded to both pairing calls (see
    dedup.embedding_neardup — "arrow" = one gemm per cell)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_semantic_batch(
            batch_df, batch_id, accepted_path, centroids,
            threshold=threshold, vec_col=vec_col, id_col=id_col,
            corpus_cells=corpus_cells, impl=impl,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def process_semantic_batch(
    batch_df: DataFrame,
    batch_id: int,
    accepted_path: str,
    centroids,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    corpus_cells: DataFrame | None = None,
    impl: str = "jvm",
) -> None:
    """One micro-batch, exposed as a plain batch function so replay
    semantics are directly testable (same contract as
    streaming/dedup.process_batch and media_dedup.process_media_batch).

    ``impl``: pairing implementation for BOTH the in-batch self-check
    and the cross-check (dedup.embedding_neardup's knob — "arrow" runs
    one gemm per cell). The default stays the JVM expression path: an
    sf0.1/sf1 A/B of the replay loop measured jvm ≈ 7.4 s vs arrow
    ≈ 8.4 s steady-state at sf1 — micro-batch cells are small here, so
    per-batch Python-worker spin-up (3 batches × 2 pairings) outweighs
    the gemm; opt in when cells are large enough that per-pair folding
    dominates (the scaled batch entries' regime).

    ``centroids`` also accepts a registry ref ({"registry", "name",
    "version"?} — coolplaydruid_spark.centroids); the accepted store is
    stamped with the content-derived ``__centroid_version`` either way,
    and a stamped ``corpus_cells`` (an ingest signature store) is
    version-verified before the cross-check — a store assigned under
    different centroids fails loudly instead of pairing incomparable
    cells (r11 verdict #6)."""
    from coolplaydruid_spark import centroids as _cent

    pairs, ver = _cent.resolve_centroids(
        batch_df.sparkSession, centroids, vec_col=vec_col)
    cells = dedup.semantic_cells(
        batch_df, pairs, vec_col=vec_col, id_col=id_col,
    ).select(id_col, vec_col, *_STORE_COLS).withColumn(
        "__centroid_version", F.lit(ver)
    ).persist()
    self_surv = None
    try:
        self_pairs = dedup.embedding_neardup(
            cells, threshold=threshold, vec_col=vec_col, id_col=id_col,
            block_col="__cell", impl=impl,
        )
        drops = self_pairs.select(F.col("id_b").alias(id_col)).distinct()
        # Persist the self-check survivors (r15): they are consumed
        # TWICE below — as the cross-check's batch side AND as the left
        # side of the final anti-join — and unpersisted each consumer
        # re-ran the whole within-cell pairing fold (measured 15-30 s
        # per sf1 micro-batch vs ~4 s materialized once). Batch-scale
        # rows; released in the finally.
        self_surv = cells.join(drops, on=id_col, how="left_anti").persist()
        survivors = self_surv

        existing = _read_accepted(
            batch_df.sparkSession, accepted_path, exclude_batch=batch_id)
        for part, what in ((existing, "accepted store"),
                           (corpus_cells, "corpus_cells")):
            if part is not None:
                _cent.check_version(part, ver, what)
        corpus_parts = [
            part.select(id_col, vec_col, "__cell")
            for part in (existing, corpus_cells) if part is not None
        ]
        if corpus_parts:
            corpus = corpus_parts[0]
            for part in corpus_parts[1:]:
                corpus = corpus.unionByName(part)
            cross = dedup.semantic_dedup_pairs_incremental(
                None, pairs, corpus_cells=corpus,
                batch_cells=survivors, threshold=threshold,
                vec_col=vec_col, id_col=id_col, impl=impl,
            )
            cross_drops = cross.select(F.col("id_b").alias(id_col)).distinct()
            survivors = survivors.join(cross_drops, on=id_col, how="left_anti")

        # Overwrite the batch's OWN directory (not dynamic partition
        # overwrite): a replay whose survivor set shrank to zero must
        # still clear stale partial files — streaming/dedup.py's rule.
        survivors.write.mode("overwrite").parquet(
            f"{accepted_path}/batch={batch_id}")
    finally:
        cells.unpersist()
        if self_surv is not None:
            self_surv.unpersist()
