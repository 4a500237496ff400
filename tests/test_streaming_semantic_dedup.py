"""Streaming SemDeDup (streaming/semantic_dedup.py): micro-batches
cell-assigned with pinned centroids, self-checked within cells, and
cross-checked against the growing accepted-cells store — with the same
parity contract as the media family: streamed accepts ≡ a batch replay
with semantic_dedup_pairs_incremental over the same shards."""

from pyspark.sql import functions as F

from coolplaydruid_spark.operators import dedup
from coolplaydruid_spark.streaming import semantic_dedup as ssem

CENTS = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]


def _batch(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_streamed_semantic_accepts_match_batch_incremental_replay(spark, tmp_path):
    accepted = str(tmp_path / "acc")
    # b0: 1↔2 near-dups in cell 0 (keep 1: 2 is id_b); 3 in cell 1
    b0 = _batch(spark, [(1, [1.0, 0.0]), (2, [0.98, 0.05]), (3, [0.0, 1.0])])
    # b1: 10 dups accepted 1 (same cell, cos ≈ 1); 11 is cell-1 but far
    # from 3; 12 is near 3 → dropped against the accepted store
    b1 = _batch(spark, [(10, [0.99, 0.02]), (11, [-0.6, 0.8]),
                        (12, [0.02, 0.99])])

    ssem.process_semantic_batch(b0, 0, accepted, CENTS, threshold=0.9)
    ssem.process_semantic_batch(b1, 1, accepted, CENTS, threshold=0.9)
    streamed = spark.read.parquet(accepted)
    got = {r["vec_id"] for r in streamed.collect()}

    # batch replay with the batch operators over the same shards
    c0 = dedup.semantic_cells(b0, CENTS)
    p0 = dedup.embedding_neardup(c0, threshold=0.9, block_col="__cell")
    drop0 = {r["id_b"] for r in p0.collect()}
    acc0 = c0.where(~F.col("vec_id").isin(list(drop0) or [-1]))
    c1 = dedup.semantic_cells(b1, CENTS)
    p1 = dedup.embedding_neardup(c1, threshold=0.9, block_col="__cell")
    drop1 = {r["id_b"] for r in p1.collect()}
    surv1 = c1.where(~F.col("vec_id").isin(list(drop1) or [-1]))
    cross = dedup.semantic_dedup_pairs_incremental(
        None, CENTS, corpus_cells=acc0.select("vec_id", "embedding", "__cell"),
        batch_cells=surv1.select("vec_id", "embedding", "__cell"),
        threshold=0.9)
    cross_drop = {r["id_b"] for r in cross.collect()}
    want = {r["vec_id"] for r in acc0.collect()} | (
        {r["vec_id"] for r in surv1.collect()} - cross_drop)

    assert got == want == {1, 3, 11}
    # the store holds the ingest-store cell schema (+ batch), so it can
    # seed batch incremental dedup via read_signatures' streaming layout
    # (+ the r12 __centroid_version stamp both layouts now carry)
    assert set(streamed.columns) == {"vec_id", "embedding", "__cell",
                                     "__cell_cos", "batch",
                                     "__centroid_version"}
    from coolplaydruid_spark.sources import batch as _batchmod

    via_reader = _batchmod.read_signatures(spark, accepted)
    assert {r["vec_id"] for r in via_reader.collect()} == got


def test_semantic_replay_is_idempotent(spark, tmp_path):
    accepted = str(tmp_path / "acc")
    b0 = _batch(spark, [(1, [1.0, 0.0]), (3, [0.0, 1.0])])
    ssem.process_semantic_batch(b0, 0, accepted, CENTS, threshold=0.9)
    b1 = _batch(spark, [(11, [-0.6, 0.8])])
    ssem.process_semantic_batch(b1, 1, accepted, CENTS, threshold=0.9)
    first = sorted(r["vec_id"] for r in spark.read.parquet(accepted).collect())
    assert first == [1, 3, 11]
    # replay batch 1: 11 must NOT drop against its own prior output
    ssem.process_semantic_batch(b1, 1, accepted, CENTS, threshold=0.9)
    assert sorted(r["vec_id"]
                  for r in spark.read.parquet(accepted).collect()) == first


def test_streaming_semantic_dedup_end_to_end(spark, tmp_path):
    """The actual writeStream path: a file-source stream of vectors is
    deduped into the accepted store with the pinned centroids."""
    import json

    src = tmp_path / "src"
    src.mkdir()
    rows = [{"vec_id": 1, "embedding": [1.0, 0.0]},
            {"vec_id": 2, "embedding": [0.98, 0.05]},
            {"vec_id": 3, "embedding": [0.0, 1.0]}]
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(str(src))
    )
    q = ssem.streaming_semantic_dedup(
        stream, str(tmp_path / "acc"), str(tmp_path / "ckpt"), CENTS,
        threshold=0.9)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["vec_id"]
           for r in spark.read.parquet(str(tmp_path / "acc")).collect()}
    assert got == {1, 3}
