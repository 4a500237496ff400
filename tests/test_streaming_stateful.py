"""Custom stateful streaming operator (applyInPandasWithState): per-key
reservoir sample. Verifies (a) bounded state with exact seen-counts,
(b) state carried across micro-batches via the checkpointed state store
(two availableNow runs over the same checkpoint), (c) deterministic
reservoir contents."""

import json

from pyspark.sql import types as T

from coolplaydruid_spark.streaming import realtime
from coolplaydruid_spark.streaming.stateful import streaming_reservoir_sample

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("lang", T.StringType()),
    T.StructField("text", T.StringType()),
])


def _write_batch(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def _run_once(spark, src, ckpt):
    """One availableNow pass; returns the emitted rows (foreachBatch —
    the memory sink refuses checkpoint recovery)."""
    stream = realtime.file_stream(spark, str(src), DOC_SCHEMA, fmt="json")
    sampled = streaming_reservoir_sample(stream, ["lang"], "doc_id", k=5)
    collected = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    q = (
        sampled.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["lang"]: r for r in collected}


def test_reservoir_sample_state_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_batch(src, "b1.json", [
        {"doc_id": i, "lang": "en" if i % 3 else "de", "text": f"t{i}"}
        for i in range(30)
    ])
    first = _run_once(spark, src, ckpt)
    assert first["en"]["n_seen"] == 20
    assert first["de"]["n_seen"] == 10
    assert len(first["en"]["sample"]) == 5  # bounded at k
    assert len(first["de"]["sample"]) == 5
    assert set(first["en"]["sample"]) <= {str(i) for i in range(30) if i % 3}

    # second batch: state must resume from the checkpoint, counts add up
    _write_batch(src, "b2.json", [
        {"doc_id": 100 + i, "lang": "en", "text": f"u{i}"} for i in range(10)
    ])
    second = _run_once(spark, src, ckpt)
    # only the updated key is re-emitted in update mode
    assert second["en"]["n_seen"] == 30
    assert len(second["en"]["sample"]) == 5

    # determinism: same inputs -> identical reservoir (fresh checkpoint)
    third = _run_once(spark, src, tmp_path / "ckpt2")
    assert third["en"]["n_seen"] == 30
    assert third["de"]["sample"] == first["de"]["sample"]


def test_reservoir_sample_typed_keys_and_nulls(spark, tmp_path):
    """Non-string key columns keep their type in the output schema; null
    values are skipped entirely."""
    import json as jsonlib

    src = tmp_path / "src_typed"
    src.mkdir()
    rows = [{"doc_id": 7, "lang": "en", "text": f"t{i}"} for i in range(4)]
    rows.append({"doc_id": 7, "lang": "en", "text": None})
    (src / "b.json").write_text("\n".join(jsonlib.dumps(r) for r in rows))
    stream = realtime.file_stream(spark, str(src), DOC_SCHEMA, fmt="json")
    sampled = streaming_reservoir_sample(stream, ["doc_id"], "text", k=10)
    assert sampled.schema["doc_id"].dataType.typeName() == "long"
    out = []
    q = (
        sampled.writeStream.foreachBatch(lambda b, _: out.extend(b.collect()))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck_typed"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(out) == 1 and out[0]["doc_id"] == 7
    assert out[0]["n_seen"] == 4  # the null row neither counted nor sampled
    assert sorted(out[0]["sample"]) == ["t0", "t1", "t2", "t3"]


def _run_dedup_once(spark, src, ckpt):
    from coolplaydruid_spark.streaming.stateful import streaming_exact_dedup

    stream = realtime.file_stream(spark, str(src), DOC_SCHEMA, fmt="json")
    deduped = streaming_exact_dedup(stream)
    collected = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    q = (
        deduped.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return collected


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """First occurrence passes, duplicates are suppressed — including
    duplicates arriving in a LATER micro-batch (digest set survives in
    the checkpointed state store)."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"

    _write_batch(src, "b1.json", [
        {"doc_id": 1, "lang": "en", "text": "alpha beta"},
        {"doc_id": 2, "lang": "en", "text": "gamma delta"},
        {"doc_id": 3, "lang": "en", "text": "alpha beta"},   # dup of 1, same batch
    ])
    first = _run_dedup_once(spark, src, ckpt)
    assert {r["doc_id"] for r in first} == {1, 2}

    _write_batch(src, "b2.json", [
        {"doc_id": 4, "lang": "en", "text": "gamma delta"},  # dup of 2, later batch
        {"doc_id": 5, "lang": "en", "text": "epsilon zeta"},
    ])
    second = _run_dedup_once(spark, src, ckpt)
    assert {r["doc_id"] for r in second} == {5}

    digests = {r["digest"] for r in first + second}
    assert len(digests) == 3  # three distinct texts total
