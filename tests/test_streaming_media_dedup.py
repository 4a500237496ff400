"""Streaming media near-dup (streaming/media_dedup.py): micro-batches
signature-checked against themselves and the growing accepted signature
store, with the r9-verdict parity contract — the streamed accept set must
equal a batch replay of the incremental operator over the same shards."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from coolplaydruid_spark.operators import multimodal
from coolplaydruid_spark.streaming import media_dedup as smedia

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media", T.BinaryType()),
])


def _png(text: str) -> bytes:
    data = text.encode()
    return multimodal.png_encode(
        bytes(data[i % len(data)] for i in range(192)), 8, 8, 3)


BASE = "the quick brown fox jumps over the lazy dog again and again ok"
OTHER = "a completely different body of pixels here entirely unlike it"
THIRD = "yet another unrelated image payload with its very own content"


def _batch(spark, rows):
    return spark.createDataFrame(
        [(i, _png(t)) for i, t in rows], "media_id long, media binary")


def test_streamed_accepts_match_batch_incremental_replay(spark, tmp_path):
    """Parity: process_media_batch over shards b0, b1 produces exactly
    the accept set of a hand-rolled batch replay with
    phash_neardup_incremental over the same shards."""
    accepted = str(tmp_path / "acc")
    b0 = _batch(spark, [(1, BASE), (2, OTHER), (3, BASE)])  # 3 dups 1
    b1 = _batch(spark, [(10, BASE), (11, THIRD)])  # 10 dups accepted 1

    smedia.process_media_batch(b0, 0, accepted)
    smedia.process_media_batch(b1, 1, accepted)
    streamed = spark.read.parquet(accepted)
    got = {r.media_id for r in streamed.collect()}

    # batch replay of the same shards with the batch operators
    sig0 = multimodal.phash_signatures(b0)
    p0 = multimodal.phash_neardup(None, max_hamming=6, signatures=sig0)
    drop0 = {r.media_id_b for r in p0.collect()}
    acc0 = sig0.where(~F.col("media_id").isin(list(drop0) or [-1]))
    sig1 = multimodal.phash_signatures(b1)
    p1 = multimodal.phash_neardup(None, max_hamming=6, signatures=sig1)
    drop1 = {r.media_id_b for r in p1.collect()}
    surv1 = sig1.where(~F.col("media_id").isin(list(drop1) or [-1]))
    cross = multimodal.phash_neardup_incremental(
        corpus_signatures=acc0, batch_signatures=surv1, max_hamming=6)
    cross_drop = {r.media_id_b for r in cross.collect()}
    want = {r.media_id for r in acc0.collect()} | (
        {r.media_id for r in surv1.collect()} - cross_drop)

    assert got == want == {1, 2, 11}
    # the store holds SIGNATURES (decode-once contract), not media bytes
    assert set(streamed.columns) == {"media_id", "phash_hi", "phash_lo", "batch"}
    # and the stored signatures are the true hashes of the accepted media
    all_sig = {(r.media_id, r.phash_hi, r.phash_lo)
               for r in sig0.union(sig1).collect()}
    assert {(r.media_id, r.phash_hi, r.phash_lo)
            for r in streamed.collect()} <= all_sig


def test_media_replay_is_idempotent(spark, tmp_path):
    accepted = str(tmp_path / "acc")
    b0 = _batch(spark, [(1, BASE), (2, OTHER)])
    smedia.process_media_batch(b0, 0, accepted)
    b1 = _batch(spark, [(10, BASE), (11, THIRD)])
    smedia.process_media_batch(b1, 1, accepted)
    first = sorted(r.media_id for r in spark.read.parquet(accepted).collect())
    assert first == [1, 2, 11]
    # replay batch 1: 11 must NOT be dropped against its own prior output
    smedia.process_media_batch(b1, 1, accepted)
    assert sorted(r.media_id
                  for r in spark.read.parquet(accepted).collect()) == first


def _vid_batch(spark, rows):
    """(media_id, media, duration_ms) "video" rows — the payload bytes
    are a pure function of the text (frame_sample_stub slices them), so
    equal texts share every sampled frame hash and distinct texts share
    none."""
    return spark.createDataFrame(
        [(i, (t * 40).encode()[:600], 5000) for i, t in rows],
        "media_id long, media binary, duration_ms long")


def test_streamed_video_accepts_match_batch_incremental_replay(spark, tmp_path):
    """r10-verdict task: the video kind threads a float Jaccard floor
    (not max_hamming) and its streamed accept set equals a batch replay
    with video_neardup_incremental over the same shards."""
    accepted = str(tmp_path / "acc")
    b0 = _vid_batch(spark, [(1, BASE), (2, OTHER), (3, BASE)])
    b1 = _vid_batch(spark, [(10, BASE), (11, THIRD)])

    smedia.process_media_batch(b0, 0, accepted, kind="video_framehash",
                               threshold=0.5)
    smedia.process_media_batch(b1, 1, accepted, kind="video_framehash",
                               threshold=0.5)
    streamed = spark.read.parquet(accepted)
    got = {r.media_id for r in streamed.collect()}

    # batch replay with the batch operators over the same shards
    sig0 = multimodal.video_frame_signatures(b0)
    p0 = multimodal.video_neardup(None, threshold=0.5, signatures=sig0)
    drop0 = {r.media_id_b for r in p0.collect()}
    acc0 = sig0.where(~F.col("media_id").isin(list(drop0) or [-1]))
    sig1 = multimodal.video_frame_signatures(b1)
    p1 = multimodal.video_neardup(None, threshold=0.5, signatures=sig1)
    drop1 = {r.media_id_b for r in p1.collect()}
    surv1 = sig1.where(~F.col("media_id").isin(list(drop1) or [-1]))
    cross = multimodal.video_neardup_incremental(
        corpus_signatures=acc0, batch_signatures=surv1, threshold=0.5)
    cross_drop = {r.media_id_b for r in cross.collect()}
    want = {r.media_id for r in acc0.collect()} | (
        {r.media_id for r in surv1.collect()} - cross_drop)

    assert got == want == {1, 2, 11}
    # the store holds frame-hash SIGNATURE rows (many per id), not media
    assert set(streamed.columns) == {"media_id", "frame_ts_ms",
                                     "frame_hash", "batch"}
    all_sig = {(r.media_id, r.frame_ts_ms, r.frame_hash)
               for r in sig0.union(sig1).collect()}
    assert {(r.media_id, r.frame_ts_ms, r.frame_hash)
            for r in streamed.collect()} <= all_sig

    # replay batch 1: survivors must not drop against their own output
    smedia.process_media_batch(b1, 1, accepted, kind="video_framehash")
    assert {r.media_id
            for r in spark.read.parquet(accepted).collect()} == got


def test_media_kind_threshold_knobs_are_mutually_exclusive(spark, tmp_path):
    import pytest

    b = _vid_batch(spark, [(1, BASE)])
    with pytest.raises(ValueError, match="threshold="):
        smedia.process_media_batch(b, 0, str(tmp_path / "a"),
                                   kind="video_framehash", max_hamming=6)
    img = _batch(spark, [(1, BASE)])
    with pytest.raises(ValueError, match="max_hamming="):
        smedia.process_media_batch(img, 0, str(tmp_path / "b"),
                                   kind="phash", threshold=0.5)


def test_read_signatures_reads_stream_accepted_store(spark, tmp_path):
    """r10-verdict task 6 (forward direction): a stream-accepted store is
    readable through sources.batch.read_signatures (name omitted), and a
    batch incremental over it is value-identical to one over the
    streaming-internal reader."""
    from coolplaydruid_spark.sources import batch as sbatch
    from coolplaydruid_spark.streaming.dedup import _read_accepted

    accepted = str(tmp_path / "acc")
    smedia.process_media_batch(_batch(spark, [(1, BASE), (2, OTHER)]), 0, accepted)
    smedia.process_media_batch(_batch(spark, [(10, THIRD)]), 1, accepted)

    via_batch = sbatch.read_signatures(spark, accepted)
    via_stream = _read_accepted(spark, accepted)
    cols = ["media_id", "phash_hi", "phash_lo"]
    assert {tuple(r) for r in via_batch.select(*cols).collect()} == \
        {tuple(r) for r in via_stream.select(*cols).collect()}

    newcomers = multimodal.phash_signatures(_batch(spark, [(20, BASE), (21, "zz unrelated pixels beyond any of the other fixture payloads")]))
    got = multimodal.phash_neardup_incremental(
        corpus_signatures=via_batch.select(*cols),
        batch_signatures=newcomers, max_hamming=6)
    want = multimodal.phash_neardup_incremental(
        corpus_signatures=via_stream.select(*cols),
        batch_signatures=newcomers, max_hamming=6)
    assert {(r.media_id_a, r.media_id_b) for r in got.collect()} == \
        {(r.media_id_a, r.media_id_b) for r in want.collect()} == {(1, 20)}

    # an empty/missing accepted store must fail loudly, not read as an
    # empty corpus
    import pytest
    with pytest.raises(ValueError, match="accepted store"):
        sbatch.read_signatures(spark, str(tmp_path / "nowhere"))


def test_stream_cross_checks_ingest_materialized_corpus(spark, tmp_path):
    """r10-verdict task 6 (reverse direction): a stream deduplicates
    against a corpus whose signatures were materialized by index_task,
    via corpus_signatures=read_signatures(...) — no layout conversion."""
    from coolplaydruid_spark.sources import batch as sbatch

    corpus = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", _png(BASE)),
         (101, "2024-01-01 00:00:00", _png(OTHER))],
        "media_id long, ts string, media binary")
    dest = str(tmp_path / "tbl")
    sbatch.index_task(spark, {"format": "dataframe", "df": corpus}, dest,
                      time_column="ts", signatures=[{"type": "phash"}])
    store = sbatch.read_signatures(spark, dest, "phash")

    accepted = str(tmp_path / "acc")
    # batch 0: id 1 duplicates ingest corpus id 100 (BASE) → dropped;
    # id 2 is new (THIRD) → accepted
    smedia.process_media_batch(
        _batch(spark, [(1, BASE), (2, THIRD)]), 0, accepted,
        corpus_signatures=store.select("media_id", "phash_hi", "phash_lo"))
    assert {r.media_id
            for r in spark.read.parquet(accepted).collect()} == {2}


def test_streaming_media_dedup_end_to_end(spark, tmp_path):
    """The actual readStream → foreachBatch wiring, audio kind."""
    src = tmp_path / "src"
    src.mkdir()
    accepted = str(tmp_path / "acc")
    ckpt = str(tmp_path / "ckpt")

    def wav_b64(text):
        import base64
        return base64.b64encode(multimodal.wav_encode(text.encode())).decode()

    (src / "b1.json").write_text("\n".join(
        json.dumps({"media_id": i, "media": wav_b64(t)})
        for i, t in [(1, BASE), (2, OTHER), (3, BASE)]))

    stream = (
        spark.readStream.schema(
            "media_id long, media string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .select("media_id", F.unbase64(F.col("media")).alias("media"))
    )
    q = smedia.streaming_media_dedup(stream, accepted, ckpt,
                                     kind="audio_fingerprint")
    try:
        q.processAllAvailable()
        got1 = {r.media_id for r in spark.read.parquet(accepted).collect()}
        assert got1 == {1, 2}
        (src / "b2.json").write_text("\n".join(
            json.dumps({"media_id": i, "media": wav_b64(t)})
            for i, t in [(10, BASE), (11, THIRD)]))
        q.processAllAvailable()
        out = spark.read.parquet(accepted)
        got2 = {r.media_id for r in out.collect()}
        assert 10 not in got2 and {1, 2, 11} == got2
        assert "afp" in out.columns
    finally:
        q.stop()
