"""Stage-order / threshold metamorphics for the composed media dedup
pipeline (r9 verdict #2): pairs at a tighter Hamming threshold are a
subset of pairs at a looser one, so the tighter clustering REFINES the
looser one (every ham≤3 cluster sits inside exactly one ham≤6 cluster)
and retention can only keep more items at the tighter threshold."""

from pyspark.sql import functions as F

from coolplaydruid_spark.operators import graph, multimodal


def _media(spark, texts, quality=None):
    rows = []
    for i, t in enumerate(texts):
        data = t.encode()
        png = multimodal.png_encode(
            bytes(data[j % len(data)] for j in range(192)), 8, 8, 3)
        rows.append((i, png, quality[i] if quality else len(t)))
    return spark.createDataFrame(rows, "media_id long, media binary, q long")


def test_threshold_monotonicity_pairs_clusters_survivors(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = (
        [base, base, base + "!", base.replace("dog", "cat"),
         "a completely different body of pixels here entirely",
         "another unrelated image text payload with other bytes"]
        + [f"unique filler image number {i} with its own content {i * 7}"
           for i in range(6)]
    )
    media = _media(spark, texts)

    def pairs_at(h):
        return {
            (r.media_id_a, r.media_id_b)
            for r in multimodal.phash_neardup(media, max_hamming=h).collect()
        }

    p3, p6 = pairs_at(3), pairs_at(6)
    assert p3 <= p6
    assert p6  # the fixture must actually produce near-dups

    def comps_at(pair_set):
        if not pair_set:
            return {}
        pdf = spark.createDataFrame(
            sorted(pair_set), "media_id_a long, media_id_b long")
        return {
            r.vertex: r.component
            for r in graph.connected_components(
                pdf, src_col="media_id_a", dst_col="media_id_b").collect()
        }

    c3, c6 = comps_at(p3), comps_at(p6)
    # refinement: two vertices in one ham<=3 cluster share a ham<=6 cluster
    by3: dict[int, list[int]] = {}
    for v, c in c3.items():
        by3.setdefault(c, []).append(v)
    for members in by3.values():
        assert len({c6[v] for v in members}) == 1

    def survivors_at(h):
        pdf = multimodal.phash_neardup(media, max_hamming=h)
        return {
            r.media_id
            for r in graph.dedup_keep_best(
                media.select("media_id", "q"), pdf, quality_col="q",
                id_col="media_id", src_col="media_id_a",
                dst_col="media_id_b").collect()
        }

    s3, s6 = survivors_at(3), survivors_at(6)
    # looser threshold merges clusters -> can only DROP more
    assert s6 <= s3
    # every item not in any pair survives both
    paired6 = {v for p in p6 for v in p}
    singletons = set(range(len(texts))) - paired6
    assert singletons <= s6


def test_keep_best_keeps_highest_quality_per_cluster(spark):
    # identical pixels (Hamming 0 cluster {0,1,2}) with quality assigned
    # INDEPENDENTLY of the media bytes — retention must pick the highest
    # q, not an id-order accident; 3 is a singleton and always survives
    base = "shared boilerplate pixels for every near duplicate copy here"
    media = _media(spark, [base, base, base,
                           "totally different content entirely"],
                   quality=[1, 9, 4, 2])
    pairs = multimodal.phash_neardup(media, max_hamming=6)
    assert pairs.count() >= 3  # the 3 exact-dup pairs of cluster {0,1,2}
    kept = {
        r.media_id
        for r in graph.dedup_keep_best(
            media.select("media_id", "q"), pairs, quality_col="q",
            id_col="media_id", src_col="media_id_a",
            dst_col="media_id_b").collect()
    }
    assert kept == {1, 3}


def _vf_sigs(spark, rows):
    return spark.createDataFrame(rows, "media_id long, frame_hash long")


def test_video_incremental_cap_is_symmetric(spark):
    """r10 review find: the stop-frame cap must drop corpus-hot frames
    from BOTH sides — a one-sided drop deflates the batch denominator
    and silently misses exact duplicates. Hot frame 99 appears in 5
    corpus videos (> cap 3); batch video 100 is an exact copy of corpus
    video 1 ({99, 11}); after the symmetric drop both residual sets are
    {11} → jaccard 1.0 (a one-sided cap would score 0.5)."""
    corpus = _vf_sigs(spark, [(c, 99) for c in range(1, 6)]
                      + [(c, 10 + c) for c in range(1, 6)])
    batch = _vf_sigs(spark, [(100, 99), (100, 11)])
    out = multimodal.video_neardup_incremental(
        corpus_signatures=corpus, batch_signatures=batch,
        threshold=0.8, max_frame_freq=3).collect()
    assert [(r.media_id_a, r.media_id_b, r.jaccard) for r in out] \
        == [(1, 100, 1.0)]


def test_video_incremental_check_disjoint(spark):
    import pytest

    sig = _vf_sigs(spark, [(1, 7), (2, 8)])
    with pytest.raises(ValueError, match="BOTH sides"):
        multimodal.video_neardup_incremental(
            corpus_signatures=sig, batch_signatures=sig,
            check_disjoint=True)


def test_video_neardup_requires_input(spark):
    import pytest

    with pytest.raises(ValueError, match="need df or signatures"):
        multimodal.video_neardup(threshold=0.5)
