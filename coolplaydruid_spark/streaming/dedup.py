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

Exactly-once: every batch overwrites its own batch={id} directory, so a
replayed batch replaces its previous (possibly partial) output instead
of double-appending — even when the replay's survivor set is empty —
and the corpus read excludes the replaying batch's own partition so
leftover partial files can never make a batch drop its own documents as
self-duplicates.
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
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_batch(
            batch_df, batch_id, accepted_path, k=k, num_hashes=num_hashes,
            bands=bands, threshold=threshold, text_col=text_col,
            id_col=id_col,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def process_batch(
    batch_df: DataFrame,
    batch_id: int,
    accepted_path: str,
    k: int = 3,
    num_hashes: int = dedup.DEFAULT_NUM_HASHES,
    bands: int = dedup.DEFAULT_BANDS,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the streaming dedup, exposed as a plain batch
    function so replay semantics are directly testable (and callable
    from a custom foreachBatch). Idempotent per (batch_df, batch_id):
    re-running it reproduces the same batch=<id> directory contents."""
    spark = batch_df.sparkSession
    batch_df = batch_df.persist()
    try:
        pairs = dedup.minhash_lsh_dedup(
            batch_df, k=k, num_hashes=num_hashes, bands=bands,
            threshold=threshold, text_col=text_col, id_col=id_col,
        )
        survivors = dedup.apply_dedup_filter(batch_df, pairs, id_col=id_col)
        # Exclude THIS batch's own partition from the corpus read: a
        # replayed batch whose previous (possibly partial) attempt
        # left visible files would otherwise self-match against them
        # and drop its own documents before overwriting the
        # partition — permanent loss on replay.
        existing = _read_accepted(spark, accepted_path, exclude_batch=batch_id)
        if existing is not None:
            cross = dedup.minhash_lsh_dedup_incremental(
                survivors, existing, k=k, num_hashes=num_hashes,
                bands=bands, threshold=threshold, text_col=text_col,
                id_col=id_col,
            )
            drops = cross.select(F.col("doc_b").alias(id_col)).distinct()
            survivors = survivors.join(drops, on=id_col, how="left_anti")
        # Overwrite the batch's OWN directory directly (not dynamic
        # partition overwrite of the parent): the replay of a batch
        # whose survivors shrank to zero must still CLEAR any stale
        # partial output from the failed attempt — a dynamic
        # overwrite with zero output partitions touches nothing.
        # The directory name carries the partition value, so parent
        # reads still see a `batch` column.
        survivors.write.mode("overwrite").parquet(
            f"{accepted_path}/batch={batch_id}"
        )
    finally:
        batch_df.unpersist()


def _read_accepted(spark: SparkSession, path: str,
                   exclude_batch: int | None = None) -> DataFrame | None:
    """Read the accepted corpus; None ONLY when the path does not exist
    yet (first batch). Any other read failure (transient FS error,
    corrupt footer, permissions) propagates — treating it as "no corpus"
    would silently skip cross-corpus dedup and admit duplicates."""
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if (
            "PATH_NOT_FOUND" in msg
            or "Path does not exist" in msg
            # every partition so far emitted zero survivors: directories
            # exist but hold no data files to infer a schema from
            or "UNABLE_TO_INFER_SCHEMA" in msg
        ):
            return None
        raise
    if not df.columns:
        return None
    if exclude_batch is not None and "batch" in df.columns:
        df = df.where(F.col("batch") != exclude_batch)
    return df
