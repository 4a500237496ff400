"""Named/versioned centroid sets shared across the three semantic-dedup
surfaces (coolplaydruid_spark/centroids.py — r11 verdict #6): a re-fit
must never silently orphan a store's cell assignments."""

import random

import pytest

from coolplaydruid_spark import centroids as cent
from coolplaydruid_spark.operators import dedup
from coolplaydruid_spark.sources import batch as srcbatch
from coolplaydruid_spark.streaming import semantic_dedup as ssem

CENTS_A = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
CENTS_B = [(0, [0.0, 0.0, 1.0, 0.0]), (1, [0.0, 0.0, 0.0, 1.0])]


def test_registry_basics(spark, tmp_path):
    reg = str(tmp_path / "reg")
    v1 = cent.register_centroids(spark, reg, "prod", CENTS_A)
    assert v1 == cent.centroid_version(CENTS_A) == cent.current_version(reg, "prod")
    # idempotent per content; order does not change the version
    assert cent.register_centroids(spark, reg, "prod", CENTS_A[::-1]) == v1
    pairs, ver = cent.load_centroids(spark, reg, "prod")
    assert ver == v1 and [(c, v) for c, v in pairs] == CENTS_A
    # cid TYPE is part of the identity (it decides the __cell type)
    str_cids = [(str(c), v) for c, v in CENTS_A]
    assert cent.centroid_version(str_cids) != v1
    # a re-registration with different vectors moves CURRENT, old
    # versions stay loadable
    v2 = cent.register_centroids(spark, reg, "prod", CENTS_B)
    assert v2 != v1 and cent.current_version(reg, "prod") == v2
    assert cent.load_centroids(spark, reg, "prod", v1)[1] == v1
    with pytest.raises(ValueError, match="not registered"):
        cent.current_version(reg, "nope")
    with pytest.raises(ValueError, match="not found"):
        cent.load_centroids(spark, reg, "prod", "deadbeef0000")
    with pytest.raises(ValueError, match="invalid"):
        cent.register_centroids(spark, reg, "../oops", CENTS_A)


def test_registry_tamper_check(spark, tmp_path):
    reg = str(tmp_path / "reg")
    v1 = cent.register_centroids(spark, reg, "prod", CENTS_A)
    # overwrite the stored vectors in place: the content no longer
    # hashes to the version directory's name
    vdir = tmp_path / "reg" / "prod" / v1 / "vectors.parquet"
    spark.createDataFrame(
        [(0, [9.0, 0.0, 0.0, 0.0])], "centroid_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(str(vdir))
    with pytest.raises(ValueError, match="modified after registration"):
        cent.load_centroids(spark, reg, "prod", v1)


def test_centroid_roundtrip_across_surfaces(spark, tmp_path):
    """The verdict's done-criterion: ingest with named centroids →
    stream against them → batch incremental reads both stores,
    version-checked — and a re-fit under the same name makes every
    stale-store consumer fail loudly instead of pairing incomparable
    cells."""
    reg = str(tmp_path / "reg")
    cent.register_centroids(spark, reg, "prod", CENTS_A)
    ref = {"registry": reg, "name": "prod"}

    rng = random.Random(5)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(4)],
             "2024-01-01 00:00:00") for i in range(30)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, ts string")

    # surface 1: ingest store pinned to the named set
    dest = str(tmp_path / "tbl")
    status = srcbatch.index_task(
        spark, {"format": "dataframe", "df": df.where("vec_id < 20")},
        dest, time_column="ts",
        signatures=[{"type": "semantic_cells", "centroids": ref}])
    assert status.status == "SUCCESS"
    stored = srcbatch.read_signatures(spark, dest, "semantic_cells")
    ver = cent.centroid_version(CENTS_A)
    assert {r["__centroid_version"] for r in stored.collect()} == {ver}

    # surface 2: a stream seeded from the ingest store, same named set
    acc = str(tmp_path / "acc")
    ssem.process_semantic_batch(
        df.where("vec_id >= 20 and vec_id < 25").drop("ts"), 0, acc, ref,
        threshold=0.99,
        corpus_cells=stored.select("vec_id", "embedding", "__cell",
                                   "__centroid_version"))
    streamed = srcbatch.read_signatures(spark, acc)
    assert {r["__centroid_version"] for r in streamed.collect()} == {ver}

    # surface 3: batch incremental reads BOTH stores under the ref
    both = stored.select("vec_id", "embedding", "__cell",
                         "__centroid_version").unionByName(
        streamed.select("vec_id", "embedding", "__cell",
                        "__centroid_version"))
    pairs = dedup.semantic_dedup_pairs_incremental(
        df.where("vec_id >= 25").drop("ts"), ref,
        corpus_cells=both, threshold=0.0)
    assert pairs.count() > 0  # τ=0: every co-cell pair qualifies

    # the re-fit: CURRENT moves to different vectors → every consumer
    # still holding the OLD stores now fails the version check
    cent.register_centroids(spark, reg, "prod", CENTS_B)
    with pytest.raises(ValueError, match="incomparable"):
        dedup.semantic_dedup_pairs_incremental(
            df.where("vec_id >= 25").drop("ts"), ref,
            corpus_cells=both, threshold=0.0).collect()
    # pinning the original version in the ref keeps working
    pinned = dict(ref, version=ver)
    assert dedup.semantic_dedup_pairs_incremental(
        df.where("vec_id >= 25").drop("ts"), pinned,
        corpus_cells=both, threshold=0.0).count() > 0
    # and a stream replayed against the stale store fails too
    with pytest.raises(ValueError, match="incomparable|MULTIPLE"):
        ssem.process_semantic_batch(
            df.where("vec_id >= 25").drop("ts"), 1, acc, ref,
            threshold=0.99)


def test_ivf_registry_roundtrip(spark, tmp_path):
    """r12 verdict #3: ivf_topk accepts the same registry ref as the
    semantic-dedup family — register → ivf_cells (stamped store) →
    store-backed probes ≡ inline assignment; a re-fit under the same
    name makes the stale store fail loudly; a pinned version keeps
    working; a full probe over explicit centroids still equals brute
    force."""
    from pyspark.sql import functions as F

    from coolplaydruid_spark.operators import similarity as sim

    reg = str(tmp_path / "reg")
    rng = random.Random(11)
    cents4 = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(4)]
    v1 = cent.register_centroids(spark, reg, "ivf", cents4)
    ref = {"registry": reg, "name": "ivf"}

    corpus = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)],
        "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(3)],
        "query_id long, embedding array<double>")

    # materialize the store: every row stamped with the version
    cells = sim.ivf_cells(corpus, ref)
    got = cells.collect()
    assert {r["__centroid_version"] for r in got} == {v1}
    assert {r["__cell"] for r in got} <= {0, 1, 2, 3}

    def key(rows):
        return {(r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
                for r in rows}

    inline = sim.ivf_topk(corpus, queries, k=3, n_probe=2, centroids=ref)
    stored = sim.ivf_topk(corpus, queries, k=3, n_probe=2, centroids=ref,
                          corpus_cells=cells)
    assert key(inline.collect()) == key(stored.collect())

    # full probe over explicit centroids ≡ brute force (exact cosines)
    full = sim.ivf_topk(corpus, queries, k=3, n_probe=4, centroids=ref)
    brute = sim.brute_force_topk(corpus, queries, k=3)
    assert key(full.collect()) == key(brute.collect())

    # corpus_cells without centroids is ambiguous — fail loudly
    with pytest.raises(ValueError, match="requires explicit centroids"):
        sim.ivf_topk(corpus, queries, corpus_cells=cells)
    with pytest.raises(ValueError, match="lacks a __cell"):
        sim.ivf_topk(corpus, queries, centroids=ref,
                     corpus_cells=cells.drop("__cell"))

    # the re-fit: CURRENT moves → the stale store fails the version
    # check; pinning v1 keeps it working
    cents_b = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(4)]
    cent.register_centroids(spark, reg, "ivf", cents_b)
    with pytest.raises(ValueError, match="incomparable"):
        sim.ivf_topk(corpus, queries, centroids=ref, corpus_cells=cells)
    pinned = sim.ivf_topk(corpus, queries, k=3, n_probe=2,
                          centroids=dict(ref, version=v1),
                          corpus_cells=cells)
    assert key(pinned.collect()) == key(stored.collect())
    # an unstamped (legacy) store passes the no-op check under any set
    legacy = cells.drop("__centroid_version")
    assert sim.ivf_topk(corpus, queries, k=3, n_probe=2,
                        centroids=dict(ref, version=v1),
                        corpus_cells=legacy).count() > 0
    # degenerate centroid sets fail loudly at both entry points
    with pytest.raises(ValueError, match="at least one centroid"):
        sim.ivf_cells(corpus, [])


def test_mixed_version_store_detected(spark, tmp_path):
    """A store appended under two centroid sets is itself an error —
    some of its cells are incomparable with ANY single set in hand."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    a = dedup.semantic_cells(df.where("vec_id = 1"), CENTS_A).withColumn(
        "__centroid_version", F.lit(cent.centroid_version(CENTS_A)))
    b = dedup.semantic_cells(df.where("vec_id = 2"), CENTS_B).withColumn(
        "__centroid_version", F.lit(cent.centroid_version(CENTS_B)))
    with pytest.raises(ValueError, match="MULTIPLE centroid versions"):
        dedup.semantic_dedup_pairs_incremental(
            df, CENTS_A, corpus_cells=a.unionByName(b),
            threshold=0.0).collect()


def test_mixed_version_detected_under_null_stamps(spark):
    """r12 advice: NULL stamps (pre-registry rows) must not mask a
    mixed-version store — check_version's bounded distinct().limit(2)
    probe could previously satisfy itself with {NULL, v1} and miss v2,
    so the mixed-version error silently never fired on the natural
    pre-registry-store-appended-under-two-re-fits state."""
    from pyspark.sql import functions as F

    va, vb = cent.centroid_version(CENTS_A), cent.centroid_version(CENTS_B)
    base = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 0)], "vec_id long, __cell long")
    store = (
        # NULL stamp first so a naive limit(2) would grab it
        base.where("vec_id = 1").withColumn(
            "__centroid_version", F.lit(None).cast("string"))
        .unionByName(base.where("vec_id = 2").withColumn(
            "__centroid_version", F.lit(va)))
        .unionByName(base.where("vec_id = 3").withColumn(
            "__centroid_version", F.lit(vb)))
    ).coalesce(1)
    with pytest.raises(ValueError, match="MULTIPLE centroid versions"):
        cent.check_version(store, va)
    # NULL + one matching version still passes (pre-registry rows are
    # tolerated); NULL + one MISMATCHED version still fails
    ok = base.where("vec_id = 1").withColumn(
        "__centroid_version", F.lit(None).cast("string")
    ).unionByName(base.where("vec_id = 2").withColumn(
        "__centroid_version", F.lit(va)))
    cent.check_version(ok, va)
    with pytest.raises(ValueError, match="incomparable"):
        cent.check_version(ok, vb)
