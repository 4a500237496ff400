"""Streaming fuzzy (near-duplicate) dedup: each micro-batch of incoming
documents is MinHash-LSH-checked first against itself, then against
everything already accepted, and only the survivors are appended to the
accepted corpus — Druid's realtime-ingest shape (arch/druid-arch.md:29-32,
events become queryable as their files land) applied to the
training-data-pipeline problem of keeping a growing corpus near-dup-free.

Why foreachBatch rather than a stateful streaming operator: LSH dedup is
a multi-join DAG (signatures → band self-join → exact-Jaccard verify)
over an unbounded, corpus-sized reference set. Structured Streaming's
stateful operators bound state per key; a corpus-scale shingle index
does not fit that contract, but it IS exactly what the batch engine
already does well — so each micro-batch runs the *batch* incremental
operator (operators/dedup.minhash_lsh_dedup_incremental) against the
accepted-corpus files. The accepted corpus is the sink itself: Spark's
own Parquet partition layout is the "index", and the streaming/batch
code path split disappears the same way the realtime/historical handoff
does (files appear per micro-batch).

Exactly-once: every batch writes to its own batch={id} partition with
dynamic partition overwrite, so a replayed batch overwrites its previous
(possibly partial) output instead of double-appending — the same
idempotent-sink contract as the realtime ingest sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from coolplaydruid_spark.operators import dedup


def streaming_minhash_dedup(
    stream: DataFrame,
    accepted_path: str,
    checkpoint: str,
    k: int = 3,
    num_hashes: int = dedup.DEFAULT_NUM_HASHES,
    bands: int = dedup.DEFAULT_BANDS,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the streaming dedup query. Returns the StreamingQuery.

    Per micro-batch: (1) exact + LSH self-dedup inside the batch
    (keep-first), (2) LSH check of the survivors against the accepted
    corpus at ``accepted_path``, (3) append what remains as
    ``batch=<id>`` partition. Ids must be globally unique across the
    stream (the corpus invariant).

    Scale: step 2 is the incremental operator — the accepted corpus
    never self-joins; its per-batch cost is batch-proportional. The
    corpus shingle pass re-reads the accepted files each batch; at
    production scale materialize the shingle/signature tables at accept
    time and pass them via corpus_shingles= in a custom batch fn."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            pairs = dedup.minhash_lsh_dedup(
                batch_df, k=k, num_hashes=num_hashes, bands=bands,
                threshold=threshold, text_col=text_col, id_col=id_col,
            )
            survivors = dedup.apply_dedup_filter(batch_df, pairs, id_col=id_col)
            existing = _read_accepted(spark, accepted_path)
            if existing is not None:
                cross = dedup.minhash_lsh_dedup_incremental(
                    survivors, existing, k=k, num_hashes=num_hashes,
                    bands=bands, threshold=threshold, text_col=text_col,
                    id_col=id_col,
                )
                drops = cross.select(F.col("doc_b").alias(id_col)).distinct()
                survivors = survivors.join(drops, on=id_col, how="left_anti")
            (
                survivors.withColumn("batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch")
                .parquet(accepted_path)
            )
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def _read_accepted(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        df = spark.read.parquet(path)
        return df if df.columns else None
    except Exception:  # noqa: BLE001 - first batch: no corpus yet
        return None
