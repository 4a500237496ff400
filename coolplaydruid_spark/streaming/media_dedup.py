"""Streaming media near-dup: each micro-batch of incoming media is
signature-hashed (image dHash or audio fingerprint), deduplicated against
itself, then against everything already accepted, and the SURVIVING
SIGNATURES are appended to the accepted store — the media counterpart of
streaming/dedup.py's text pipeline, with the same idempotent
batch=<id>-overwrite replay discipline.

The accepted store holds signatures, not media bytes: that IS the
production contract every incremental media operator documents
("signatures materialize once at accept time",
operators/multimodal.phash_neardup_incremental) — the corpus side of
every future batch's cross-check is a pure JVM banded join over stored
integers; media is decoded exactly once, in the micro-batch that first
saw it. The batch side is ingest-bounded, so per-batch cost is priced by
the batch; the corpus never re-pairs against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.operators import multimodal
from coolplaydruid_spark.streaming.dedup import _read_accepted

# kind -> (signature fn, self-pair fn, incremental-pair fn, default ham)
_KINDS = {
    "phash": (
        multimodal.phash_signatures,
        multimodal.phash_neardup,
        multimodal.phash_neardup_incremental,
        6,
    ),
    "audio_fingerprint": (
        multimodal.audio_fingerprint,
        multimodal.audio_neardup,
        multimodal.audio_neardup_incremental,
        3,
    ),
}


def streaming_media_dedup(
    stream: DataFrame,
    accepted_path: str,
    checkpoint: str,
    kind: str = "phash",
    max_hamming: int | None = None,
    media_col: str = "media",
    id_col: str = "media_id",
):
    """Start the streaming media dedup query. Returns the StreamingQuery.
    Ids must be globally unique across the stream (the corpus
    invariant — process_batch replays overwrite their own partition, so
    a replay never collides with itself)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_media_batch(
            batch_df, batch_id, accepted_path, kind=kind,
            max_hamming=max_hamming, media_col=media_col, id_col=id_col,
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def process_media_batch(
    batch_df: DataFrame,
    batch_id: int,
    accepted_path: str,
    kind: str = "phash",
    max_hamming: int | None = None,
    media_col: str = "media",
    id_col: str = "media_id",
) -> None:
    """One micro-batch, exposed as a plain batch function so replay
    semantics are directly testable (same contract as
    streaming/dedup.process_batch): (1) signature the batch's media,
    (2) in-batch near-dup self-check, keep-first, (3) banded cross-check
    of the survivors' signatures against the accepted signature store
    (excluding this batch's own partition, so a replayed batch never
    drops its documents against its own partial output), (4) overwrite
    batch=<id> with the surviving signatures."""
    if kind not in _KINDS:
        raise ValueError(f"unknown media kind {kind!r} (one of {sorted(_KINDS)})")
    sign, pair_self, pair_incr, default_ham = _KINDS[kind]
    ham = default_ham if max_hamming is None else int(max_hamming)

    sig = sign(batch_df, media_col=media_col, id_col=id_col).persist()
    try:
        self_pairs = pair_self(None, max_hamming=ham, id_col=id_col,
                               signatures=sig)
        drops = self_pairs.select(
            F.col("media_id_b").alias(id_col)).distinct()
        survivors = sig.join(drops, on=id_col, how="left_anti")

        existing = _read_accepted(
            batch_df.sparkSession, accepted_path, exclude_batch=batch_id)
        if existing is not None:
            cross = pair_incr(
                corpus_signatures=existing.select(*sig.columns),
                batch_signatures=survivors, max_hamming=ham, id_col=id_col,
            )
            cross_drops = cross.select(
                F.col("media_id_b").alias(id_col)).distinct()
            survivors = survivors.join(cross_drops, on=id_col, how="left_anti")

        # Overwrite the batch's OWN directory (not dynamic partition
        # overwrite): a replay whose survivor set shrank to zero must
        # still clear stale partial files — streaming/dedup.py's rule.
        survivors.write.mode("overwrite").parquet(
            f"{accepted_path}/batch={batch_id}")
    finally:
        sig.unpersist()
