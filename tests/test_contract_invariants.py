"""The two documented-but-previously-unenforced incremental-operator
contracts, now load-bearing (r9 verdict #3):

 (a) source_overlap_incremental's pre-materialized corpus_group_shingles
     is deduplicated by the operator itself — a non-distinct table used
     to silently inflate n_shared and every Jaccard;
 (b) banded_hamming_pairs(sig_right=) verifies ids-unique-across-sides
     when asked (check_disjoint=True) — colliding ids otherwise emit
     Hamming-0 self-pairs, which is pinned here as the documented
     failure mode so the guard's value is demonstrable.
"""

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.operators import corpus, dedup, multimodal


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_overlap_incremental_dedupes_corpus_shingle_table(spark):
    """A corpus_group_shingles table with duplicated (group, shingle)
    rows must yield EXACTLY the result of the distinct table — the
    operator now applies .distinct() instead of trusting the caller."""
    corpus_docs = _docs(spark, [
        (1, "cc", "alpha beta gamma delta epsilon zeta"),
        (2, "web", "alpha beta gamma delta other words here"),
    ])
    batch = _docs(spark, [
        (10, "books", "alpha beta gamma delta epsilon something"),
    ])
    clean = (
        dedup.shingles(corpus_docs, k=3, extra_cols=["source"])
        .select("source", "shingle")
        .distinct()
    )
    # triplicate every row — the shape an accidental re-append produces
    dirty = clean.union(clean).union(clean)
    want = sorted(
        tuple(r) for r in corpus.source_overlap_incremental(
            batch, corpus_group_shingles=clean).collect()
    )
    got = sorted(
        tuple(r) for r in corpus.source_overlap_incremental(
            batch, corpus_group_shingles=dirty).collect()
    )
    assert want and got == want


def test_minhash_incremental_dedupes_corpus_shingle_table(spark):
    """Review find (r10): a corpus_shingles table with duplicated
    (doc_id, shingle) rows — a re-appended store partition — used to
    inflate n_shingles AND corrupt the seen-twice intersection count,
    falsely dropping batch docs. The operator now applies .distinct()
    to the supplied table; results must equal the clean-table run."""
    corpus_docs = _docs(spark, [
        (1, "cc", "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "web", "alpha beta gamma delta unrelated trailing words here"),
    ])
    batch = _docs(spark, [
        (10, "books", "alpha beta gamma delta epsilon zeta eta iota"),
    ])
    clean = dedup.shingles(corpus_docs, k=3, as_hash=True)
    dirty = clean.union(clean).union(clean)
    want = sorted(
        tuple(r) for r in dedup.minhash_lsh_dedup_incremental(
            batch, corpus_shingles=clean, threshold=0.3).collect())
    got = sorted(
        tuple(r) for r in dedup.minhash_lsh_dedup_incremental(
            batch, corpus_shingles=dirty, threshold=0.3).collect())
    assert want and got == want


def _phash_sigs(spark, rows):
    return spark.createDataFrame(rows, "media_id long, phash_hi long, phash_lo long")


def test_banded_hamming_colliding_ids_emit_self_pairs(spark):
    """The documented failure: an id on both sides self-pairs at
    Hamming 0 and would be 'deduplicated' against itself."""
    sig = _phash_sigs(spark, [(1, 0xAAAA, 0x5555), (2, 0x1234, 0x4321)])
    out = multimodal.phash_neardup_incremental(
        corpus_signatures=sig, batch_signatures=sig, max_hamming=6
    ).collect()
    self_pairs = {(r.media_id_a, r.media_id_b, r.hamming) for r in out}
    assert (1, 1, 0) in self_pairs and (2, 2, 0) in self_pairs


def test_banded_hamming_check_disjoint_raises_on_collision(spark):
    sig = _phash_sigs(spark, [(1, 0xAAAA, 0x5555), (2, 0x1234, 0x4321)])
    batch = _phash_sigs(spark, [(2, 0x1234, 0x4321), (7, 0xFFFF, 0x0000)])
    with pytest.raises(ValueError, match="BOTH sides"):
        multimodal.phash_neardup_incremental(
            corpus_signatures=sig, batch_signatures=batch,
            max_hamming=6, check_disjoint=True)


def test_banded_hamming_check_disjoint_passes_on_disjoint_sides(spark):
    corpus_sig = _phash_sigs(spark, [(1, 0xAAAA, 0x5555)])
    batch_sig = _phash_sigs(spark, [(7, 0xAAAA, 0x5555)])
    out = multimodal.phash_neardup_incremental(
        corpus_signatures=corpus_sig, batch_signatures=batch_sig,
        max_hamming=6, check_disjoint=True).collect()
    assert [(r.media_id_a, r.media_id_b, r.hamming) for r in out] == [(1, 7, 0)]


def test_audio_incremental_check_disjoint(spark):
    sig = spark.createDataFrame([(3, 0x0F0F)], "media_id long, afp long")
    with pytest.raises(ValueError, match="BOTH sides"):
        multimodal.audio_neardup_incremental(
            corpus_signatures=sig, batch_signatures=sig,
            max_hamming=3, check_disjoint=True)
