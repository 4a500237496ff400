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
