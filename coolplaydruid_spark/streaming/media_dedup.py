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

# kind -> (signature fn, self-pair fn, incremental-pair fn,
#          threshold kwarg, default). phash/audio thresholds are integer
# max-Hamming distances over fixed-width signatures; the video kind's is
# a float Jaccard floor over distinct frame-hash sets (there is no
# Hamming distance between variable-size sets), so the knob NAME is part
# of the kind tuple rather than forcing max_hamming on everyone.
_KINDS = {
    "phash": (
        multimodal.phash_signatures,
        multimodal.phash_neardup,
        multimodal.phash_neardup_incremental,
        "max_hamming",
        6,
    ),
    "audio_fingerprint": (
        multimodal.audio_fingerprint,
        multimodal.audio_neardup,
        multimodal.audio_neardup_incremental,
        "max_hamming",
        3,
    ),
    "video_framehash": (
        multimodal.video_frame_signatures,
        multimodal.video_neardup,
        multimodal.video_neardup_incremental,
        "threshold",
        0.5,
    ),
}


def _resolve_knob(kind: str, max_hamming, threshold):
    """The kind's pairing kwarg ({name: value}), rejecting the knob that
    doesn't apply — silently coercing a Jaccard float into a Hamming int
    (or vice versa) would change semantics without a trace."""
    sign, pair_self, pair_incr, knob, default = _KINDS[kind]
    if knob == "max_hamming":
        if threshold is not None:
            raise ValueError(
                f"kind {kind!r} takes max_hamming= (integer Hamming "
                "distance), not threshold=")
        value = default if max_hamming is None else int(max_hamming)
    else:
        if max_hamming is not None:
            raise ValueError(
                f"kind {kind!r} takes threshold= (float Jaccard floor "
                "over frame-hash sets), not max_hamming=")
        value = default if threshold is None else float(threshold)
    return sign, pair_self, pair_incr, {knob: value}


def streaming_media_dedup(
    stream: DataFrame,
    accepted_path: str,
    checkpoint: str,
    kind: str = "phash",
    max_hamming: int | None = None,
    threshold: float | None = None,
    media_col: str = "media",
    id_col: str = "media_id",
    corpus_signatures: DataFrame | None = None,
):
    """Start the streaming media dedup query. Returns the StreamingQuery.
    Ids must be globally unique across the stream (the corpus
    invariant — process_batch replays overwrite their own partition, so
    a replay never collides with itself). ``max_hamming`` applies to the
    phash/audio kinds, ``threshold`` (Jaccard floor) to video_framehash.

    ``corpus_signatures``: an extra read-only signature corpus every
    batch also cross-checks against — typically an ingest-materialized
    store (``sources.batch.read_signatures(spark, dest, kind)``), so a
    stream can continue dedup against a corpus built by index_task
    without converting either store's layout."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_media_batch(
            batch_df, batch_id, accepted_path, kind=kind,
            max_hamming=max_hamming, threshold=threshold,
            media_col=media_col, id_col=id_col,
            corpus_signatures=corpus_signatures,
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
    threshold: float | None = None,
    media_col: str = "media",
    id_col: str = "media_id",
    corpus_signatures: DataFrame | None = None,
) -> None:
    """One micro-batch, exposed as a plain batch function so replay
    semantics are directly testable (same contract as
    streaming/dedup.process_batch): (1) signature the batch's media,
    (2) in-batch near-dup self-check, keep-first, (3) banded cross-check
    of the survivors' signatures against the accepted signature store
    (excluding this batch's own partition, so a replayed batch never
    drops its documents against its own partial output), (4) overwrite
    batch=<id> with the surviving signatures. For the video kind a
    "signature" is the set of sampled frame-hash rows — many rows per
    id — and the cross-check is a set-Jaccard, but the accept/replay
    discipline is identical."""
    if kind not in _KINDS:
        raise ValueError(f"unknown media kind {kind!r} (one of {sorted(_KINDS)})")
    sign, pair_self, pair_incr, knob = _resolve_knob(kind, max_hamming, threshold)

    sig = sign(batch_df, media_col=media_col, id_col=id_col).persist()
    try:
        self_pairs = pair_self(None, id_col=id_col, signatures=sig, **knob)
        drops = self_pairs.select(
            F.col("media_id_b").alias(id_col)).distinct()
        survivors = sig.join(drops, on=id_col, how="left_anti")

        existing = _read_accepted(
            batch_df.sparkSession, accepted_path, exclude_batch=batch_id)
        corpus_parts = [
            part.select(*sig.columns)
            for part in (existing, corpus_signatures) if part is not None
        ]
        if corpus_parts:
            corpus = corpus_parts[0]
            for part in corpus_parts[1:]:
                corpus = corpus.unionByName(part)
            cross = pair_incr(
                corpus_signatures=corpus,
                batch_signatures=survivors, id_col=id_col, **knob,
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
