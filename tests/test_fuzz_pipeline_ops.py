"""Differential fuzzer for the round-8 pipeline operators: BM25
retrieval (operators/retrieval.py), DSIR importance weights
(operators/importance.py), and per-group tf-idf
(operators/corpus.tfidf_top_terms).

A seeded generator draws random parameterizations — query term sets
(present + absent vocabulary), k1/b BM25 constants, top-k cuts, DSIR
bucket counts and target predicates (including EMPTY targets, which
must degrade to the smoothing floor identically on both engines), and
tf-idf group columns — and derives the DuckDB oracle from the SAME
draw (the BM25 oracle builder is shared with contract.py, so the fuzz
surface and the driver gate can never drift apart). Scores round to 6
decimals before any ordering cut on both sides, so top-k boundaries
are engine-deterministic.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import os
import random

from conftest import assert_df_matches_duck

from coolplaydruid_spark import contract
from coolplaydruid_spark.contract import (
    DUCK_TOKS,
    _duck_bm25,
    _duck_bm25_batch,
)
from coolplaydruid_spark.operators import corpus, importance, retrieval, text

N_SPECS = int(os.environ.get("FUZZ_N", "60"))
SEED = int(os.environ.get("FUZZ_SEED", "20260814"))

# fixture-corpus vocabulary + guaranteed-absent terms (df = 0 exercises
# the always-positive idf branch and the no-match filter)
VOCAB = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "merge", "batch", "window", "spark", "order",
         "data", "column", "join", "small", "line", "customer", "query",
         "filter", "group", "the", "a",
         "zzzabsent", "qqqmissing"]


def _docs(spark, sf_dir):
    return contract.engine_for(spark, sf_dir).catalog.table("documents")


def test_fuzz_bm25(spark, duck):
    from conftest import SF_DIR

    rng = random.Random(SEED + 81)
    for _ in range(max(10, N_SPECS // 3)):
        terms = rng.sample(VOCAB, rng.randint(1, 4))
        k1 = rng.choice([0.9, 1.2, 1.5, 2.0])
        b = rng.choice([0.0, 0.4, 0.75, 1.0])
        top_k = rng.randint(3, 30)
        got = retrieval.bm25_topk(
            _docs(spark, SF_DIR), terms, top_k=top_k, k1=k1, b=b)
        assert_df_matches_duck(
            got, duck, _duck_bm25(terms, top_k, k1, b))


def test_fuzz_bm25_batch(spark, duck):
    """Batch BM25 shares the single-query formula but takes the term-
    join plan — the fuzzer draws random query BATCHES so both plans
    stay pinned to one oracle builder."""
    from conftest import SF_DIR

    rng = random.Random(SEED + 84)
    for _ in range(max(5, N_SPECS // 8)):
        n_q = rng.randint(1, 3)
        queries = [
            (qid, " ".join(rng.sample(VOCAB, rng.randint(1, 4))))
            for qid in range(1, n_q + 1)
        ]
        k1 = rng.choice([0.9, 1.2, 2.0])
        b = rng.choice([0.0, 0.4, 0.75])
        top_k = rng.randint(2, 12)
        qdf = spark.createDataFrame(queries, "query_id long, query string")
        got = retrieval.bm25_batch_topk(
            _docs(spark, SF_DIR), qdf, top_k=top_k, k1=k1, b=b)
        assert_df_matches_duck(
            got, duck, _duck_bm25_batch(queries, top_k, k1=k1, b=b))


def _duck_bigram(vocab: int, bigrams: int, lam: float) -> str:
    return f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKS} AS t FROM documents),
    pairs AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)),
                         i -> array_to_string(list_slice(t, i, i + 1), ' '))
                    ELSE CAST([] AS VARCHAR[]) END) AS pair,
             unnest(CASE WHEN len(t) >= 2 THEN list_slice(t, 2, len(t))
                    ELSE CAST([] AS VARCHAR[]) END) AS tok
      FROM toks
    ),
    pc AS (SELECT pair, count(*) AS cbi FROM pairs GROUP BY 1),
    prevc AS (
      SELECT split_part(pair, ' ', 1) AS prev, count(*) AS cprev
      FROM pairs GROUP BY 1
    ),
    pmodel AS (
      SELECT pair, CAST(cbi AS DOUBLE) / CAST(cprev AS DOUBLE) AS pbi
      FROM pc JOIN prevc ON split_part(pc.pair, ' ', 1) = prevc.prev
      ORDER BY cbi DESC, pair ASC LIMIT {bigrams}
    ),
    uc AS (
      SELECT tok, count(*) AS c
      FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS T FROM uc),
    vocab AS (SELECT tok, c FROM uc ORDER BY c DESC, tok ASC LIMIT {vocab})
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(-log2(
             {lam} * coalesce(pbi, 0.0)
             + (1.0 - {lam}) * (coalesce(v.c, 1) * 1.0 / T)
           )), 6) AS nll_per_pair
    FROM pairs
    LEFT JOIN pmodel USING (pair)
    LEFT JOIN vocab v USING (tok)
    CROSS JOIN tot
    GROUP BY doc_id
    """


def test_fuzz_bigram_nll(spark, duck):
    from conftest import SF_DIR

    rng = random.Random(SEED + 85)
    for _ in range(max(4, N_SPECS // 10)):
        v = rng.choice([20, 50, 100, 200])
        bsz = rng.choice([50, 100, 300])
        lam = rng.choice([0.3, 0.5, 0.7, 0.9])
        got = text.bigram_logprob_score(
            _docs(spark, SF_DIR), vocab_size=v, bigram_size=bsz, lam=lam)
        assert_df_matches_duck(got, duck, _duck_bigram(v, bsz, lam))


def _duck_dsir(tgt_where: str, buckets: int) -> str:
    bucket = (f"CAST(('0x' || substring(md5(tok), 1, 6)) AS BIGINT) "
              f"% {buckets}")
    return f"""
    WITH tgt_b AS (
      SELECT {bucket} AS bucket
      FROM (SELECT unnest({DUCK_TOKS}) AS tok FROM documents
            WHERE {tgt_where})
    ), tgt_c AS (SELECT bucket, count(*) AS c FROM tgt_b GROUP BY 1),
    tgt_t AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM tgt_b),
    raw_b AS (
      SELECT {bucket} AS bucket
      FROM (SELECT unnest({DUCK_TOKS}) AS tok FROM documents)
    ), raw_c AS (SELECT bucket, count(*) AS c FROM raw_b GROUP BY 1),
    raw_t AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM raw_b),
    spine AS (SELECT range AS bucket FROM range({buckets})),
    ratio AS (
      SELECT spine.bucket,
             ln(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / (tt.T + {buckets}))
           - ln(CAST(coalesce(rc.c, 0) + 1 AS DOUBLE) / (rt.T + {buckets}))
             AS lr
      FROM spine
      LEFT JOIN tgt_c tc ON spine.bucket = tc.bucket
      LEFT JOIN raw_c rc ON spine.bucket = rc.bucket
      CROSS JOIN tgt_t tt CROSS JOIN raw_t rt
    ), doc_b AS (
      SELECT doc_id, {bucket} AS bucket
      FROM (SELECT doc_id, unnest({DUCK_TOKS}) AS tok FROM documents)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(lr), 6) AS logratio_sum,
           round(avg(lr), 6) AS logratio_avg
    FROM doc_b JOIN ratio ON doc_b.bucket = ratio.bucket
    GROUP BY doc_id
    """


def test_fuzz_dsir(spark, duck):
    from pyspark.sql import functions as F

    from conftest import SF_DIR

    rng = random.Random(SEED + 82)
    targets = [
        ("lang = 'en'", F.col("lang") == "en"),
        ("lang = 'de'", F.col("lang") == "de"),
        ("lang IN ('fr', 'es')", F.col("lang").isin("fr", "es")),
        ("source = 'src1'", F.col("source") == "src1"),
        # empty target: the model degrades to the uniform smoothing
        # floor — both engines must agree
        ("lang = 'zzz_nolang'", F.col("lang") == "zzz_nolang"),
        ("n_chars > 300", F.col("n_chars") > 300),
    ]
    for _ in range(max(6, N_SPECS // 5)):
        tgt_sql, tgt_col = rng.choice(targets)
        buckets = rng.choice([32, 64, 128, 512])
        docs = _docs(spark, SF_DIR)
        got = importance.dsir_weights(
            docs, docs.where(tgt_col), num_buckets=buckets)
        assert_df_matches_duck(got, duck, _duck_dsir(tgt_sql, buckets))


def _duck_tfidf(group: str, k: int) -> str:
    return f"""
    WITH toks AS (
      SELECT {group} AS grp, unnest({DUCK_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT grp, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS dfq FROM tf GROUP BY 1
    ), g AS (
      SELECT CAST(count(DISTINCT grp) AS DOUBLE) AS G FROM tf
    ), scored AS (
      SELECT grp, term, tf,
             round(CAST(tf AS DOUBLE) * ln(G / dfq), 6) AS tfidf,
             row_number() OVER (
               PARTITION BY grp
               ORDER BY round(CAST(tf AS DOUBLE) * ln(G / dfq), 6) DESC,
                        term ASC
             ) AS rn
      FROM tf JOIN dfreq USING (term) CROSS JOIN g
    )
    SELECT grp AS {group}, term, tf, tfidf FROM scored WHERE rn <= {k}
    """


def test_fuzz_tfidf(spark, duck):
    from conftest import SF_DIR

    rng = random.Random(SEED + 83)
    for _ in range(max(6, N_SPECS // 6)):
        group = rng.choice(["source", "lang"])
        k = rng.randint(2, 8)
        got = corpus.tfidf_top_terms(
            _docs(spark, SF_DIR), group_col=group, k=k)
        assert_df_matches_duck(got, duck, _duck_tfidf(group, k))


def test_fuzz_dup_ngram(spark, duck):
    """dup_ngram_stats at random n-gram orders (the Spark fold and the
    relational oracle share contract._duck_dup_ngram)."""
    from coolplaydruid_spark.contract import _duck_dup_ngram

    from conftest import SF_DIR

    rng = random.Random(SEED + 86)
    for _ in range(max(5, N_SPECS // 8)):
        ns = tuple(sorted(rng.sample([1, 2, 3, 4, 5], rng.randint(1, 3))))
        got = text.dup_ngram_stats(_docs(spark, SF_DIR), ns=ns)
        assert_df_matches_duck(got, duck, _duck_dup_ngram(ns))


def test_fuzz_gopher_filter(spark, duck):
    """Gopher rule filter at random thresholds — pass/fail boundaries
    move across the corpus, the fixed-order fail-reason strings must
    match exactly."""
    from coolplaydruid_spark.contract import _duck_gopher

    from conftest import SF_DIR

    rng = random.Random(SEED + 87)
    for _ in range(max(6, N_SPECS // 6)):
        p = dict(
            min_words=rng.randint(0, 70),
            max_words=rng.randint(55, 120),
            min_mean=rng.choice([0.0, 3.0, 4.2, 4.5]),
            max_mean=rng.choice([4.4, 4.6, 5.0, 10.0]),
            max_symbol=rng.choice([0.0, 0.1]),
            min_alpha=rng.choice([0.0, 0.5, 0.8, 1.0]),
            min_stop=rng.randint(0, 3),
        )
        got = text.gopher_quality_filter(
            _docs(spark, SF_DIR),
            min_words=p["min_words"], max_words=p["max_words"],
            min_mean_word_len=p["min_mean"], max_mean_word_len=p["max_mean"],
            max_symbol_word_ratio=p["max_symbol"],
            min_alpha_word_frac=p["min_alpha"], min_stop_hits=p["min_stop"],
        )
        assert_df_matches_duck(got, duck, _duck_gopher(**p))


def test_fuzz_nearest_centroid(spark, duck):
    """IVF assignment pass at random centroid counts (centroids = the
    first n corpus vectors, so the oracle can name them)."""
    from pyspark.sql import functions as F

    from coolplaydruid_spark.contract import _duck_nearest_centroid, engine_for
    from coolplaydruid_spark.operators import similarity

    from conftest import SF_DIR

    rng = random.Random(SEED + 88)
    emb = engine_for(spark, SF_DIR).catalog.table("embeddings")
    for _ in range(max(4, N_SPECS // 10)):
        n = rng.randint(2, 32)
        cent = emb.where(F.col("vec_id") < n).select(
            F.col("vec_id").alias("centroid_id"), "embedding"
        )
        got = similarity.nearest_centroid(emb.where(F.col("vec_id") >= n), cent)
        assert_df_matches_duck(got, duck, _duck_nearest_centroid(n))


def test_fuzz_hybrid_rrf(spark, duck):
    """RRF fusion at random term sets, query ids, pool depths, rrf_k
    constants, and BM25 parameters — both legs and the fused cut pinned
    to contract._duck_hybrid_rrf."""
    from coolplaydruid_spark.contract import _duck_hybrid_rrf, engine_for

    from conftest import SF_DIR

    rng = random.Random(SEED + 89)
    eng = engine_for(spark, SF_DIR)
    for _ in range(max(4, N_SPECS // 10)):
        terms = rng.sample(VOCAB, rng.randint(1, 3))
        qid = rng.randint(0, 20)
        pool = rng.randint(10, 80)
        rrf_k = rng.choice([10, 60, 100])
        top_k = rng.randint(5, 25)
        k1 = rng.choice([0.9, 1.2, 2.0])
        b = rng.choice([0.0, 0.75])
        got = retrieval.hybrid_rrf_topk(
            eng.catalog.table("documents"), eng.catalog.table("embeddings"),
            terms, query_id=qid, top_k=top_k, pool=pool, rrf_k=rrf_k,
            k1=k1, b=b,
        )
        assert_df_matches_duck(
            got, duck,
            _duck_hybrid_rrf(terms, query_id=qid, top_k=top_k, pool=pool,
                             rrf_k=rrf_k, k1=k1, b=b),
        )


def test_fuzz_perplexity_buckets(spark, duck):
    """CCNet bucketing at random vocabulary caps — the exact-percentile
    thresholds must stay bit-identical between engines for every model
    size."""
    from coolplaydruid_spark.contract import _duck_perplexity_buckets

    from conftest import SF_DIR

    rng = random.Random(SEED + 90)
    for _ in range(max(3, N_SPECS // 15)):
        v = rng.choice([20, 50, 100, 200, 400])
        got = text.perplexity_buckets(_docs(spark, SF_DIR), vocab_size=v)
        assert_df_matches_duck(got, duck, _duck_perplexity_buckets(v))


def test_fuzz_quality_mixture(spark, duck):
    """Quality-weighted thinning at random per-bucket rates and model
    sizes — the bucket labelling AND the md5 gate must agree."""
    from coolplaydruid_spark.contract import _duck_quality_mixture
    from coolplaydruid_spark.operators import sampling

    from conftest import SF_DIR

    rng = random.Random(SEED + 91)
    for _ in range(max(3, N_SPECS // 15)):
        rates = {
            "head": rng.choice([1.0, 0.9, 0.5]),
            "middle": rng.choice([0.5, 0.25, 0.0]),
            "tail": rng.choice([0.1, 0.01, 0.0]),
        }
        v = rng.choice([50, 100, 200])
        got = sampling.quality_mixture(
            _docs(spark, SF_DIR), rates=rates, vocab_size=v)
        assert_df_matches_duck(got, duck, _duck_quality_mixture(rates, v))


def test_fuzz_pmi(spark, duck):
    """PMI collocations at random k / min-count floors."""
    from coolplaydruid_spark.contract import _duck_pmi

    from conftest import SF_DIR

    rng = random.Random(SEED + 92)
    for _ in range(max(3, N_SPECS // 15)):
        k = rng.randint(5, 60)
        m = rng.randint(1, 10)
        got = corpus.pmi_top_pairs(_docs(spark, SF_DIR), k=k, min_count=m)
        assert_df_matches_duck(got, duck, _duck_pmi(k, m))


def test_fuzz_quality_pipeline_end_to_end(spark, duck):
    """The COMPOSED v2 cleaning pipeline at random stage knobs (Gopher
    thresholds x dup-bigram cut x per-bucket rates x vocabulary) —
    the stages are individually fuzzed, this pins their composition
    (survivor-set handoff, NLL retrained on the filtered corpus)
    against one end-to-end oracle shared with the contract entry."""
    from coolplaydruid_spark.contract import (
        _duck_quality_pipeline,
        _spark_quality_pipeline,
    )

    from conftest import SF_DIR

    rng = random.Random(SEED + 93)
    for _ in range(max(3, N_SPECS // 20)):
        gp = dict(
            min_words=rng.randint(0, 60),
            max_words=rng.randint(60, 120),
            min_mean=rng.choice([0.0, 3.0, 4.4]),
            max_mean=rng.choice([4.5, 5.0, 10.0]),
            max_symbol=0.1,
            min_alpha=rng.choice([0.0, 0.8]),
            min_stop=rng.randint(0, 2),
        )
        dup_cut = rng.choice([0.3, 0.5, 0.7, 1.0])
        rates = {
            "head": rng.choice([1.0, 0.8]),
            "middle": rng.choice([0.5, 0.2]),
            "tail": rng.choice([0.1, 0.0]),
        }
        v = rng.choice([50, 100, 200])
        got = _spark_quality_pipeline(_docs(spark, SF_DIR), gp, dup_cut, rates, v)
        assert_df_matches_duck(
            got, duck, _duck_quality_pipeline(gp, dup_cut, rates, v))


def test_fuzz_llm_corpus_end_to_end(spark, duck):
    """The COMPOSED r13 corpus build at random stage knobs (minhash τ ×
    Gopher thresholds × semantic τ / hot-cell cap × contamination cut ×
    mixture rates / vocabulary) — seven stages whose handoffs are the
    thing under test: each draw re-derives the DuckDB oracle from the
    SAME knobs through _duck_llm_corpus, the builder the contract entry
    pins, so the fuzz surface and the driver gate can never drift."""
    from coolplaydruid_spark.contract import (
        _duck_llm_corpus,
        _spark_llm_corpus_stages,
    )

    from conftest import SF_DIR

    rng = random.Random(SEED + 131)
    for _ in range(max(2, N_SPECS // 30)):
        kw = dict(
            minhash_tau=rng.choice([0.4, 0.5, 0.7]),
            # 1/2/3 genuinely bind at gate scale (1 even changes the
            # final kept set — the standing capped contract entry),
            # exercising the hot-bucket exclusion through the composed
            # chain; None and the production default 100 leave the
            # pairing uncapped here (r13 verdict #4)
            minhash_cap=rng.choice([None, 1, 2, 3, 100]),
            gopher_params=dict(
                min_words=rng.randint(0, 50),
                max_words=rng.randint(60, 120),
                min_mean=rng.choice([0.0, 3.0]),
                max_mean=rng.choice([4.6, 10.0]),
                max_symbol=0.1,
                min_alpha=rng.choice([0.0, 0.8]),
                min_stop=rng.randint(0, 2),
            ),
            sem_tau=rng.choice([0.2, 0.3, 0.4]),
            max_cell=rng.choice([60, 250]),
            cont_cut=rng.choice([0.03, 0.05, 0.1]),
            rates={
                "head": rng.choice([1.0, 0.8]),
                "middle": rng.choice([0.5, 0.2]),
                "tail": rng.choice([0.1, 0.0]),
            },
            vocab_size=rng.choice([50, 100]),
        )
        got = _spark_llm_corpus_stages(spark, SF_DIR, **kw)["kept"]
        assert_df_matches_duck(got, duck, _duck_llm_corpus(**kw))


def test_fuzz_overlap_matrix(spark, duck):
    """Cross-group overlap matrix at random group columns and shingle
    widths."""
    from coolplaydruid_spark.contract import _duck_overlap_matrix

    from conftest import SF_DIR

    rng = random.Random(SEED + 94)
    for _ in range(max(3, N_SPECS // 20)):
        group = rng.choice(["source", "lang"])
        k = rng.randint(2, 4)
        got = corpus.source_overlap_matrix(
            _docs(spark, SF_DIR), group_col=group, k=k)
        assert_df_matches_duck(got, duck, _duck_overlap_matrix(group, k))


def test_fuzz_overlap_incremental(spark, duck):
    """Batch × corpus overlap at random group columns, shingle widths
    and batch splits (including the degenerate all-batch/all-corpus
    splits, where one side's shingle set is empty and the result must
    be empty on both engines). The pre-materialized corpus_group_shingles
    path must agree with the corpus_df path on the same draw."""
    from pyspark.sql import functions as F

    from coolplaydruid_spark.contract import _duck_overlap_incremental
    from coolplaydruid_spark.operators.dedup import shingles

    from conftest import SF_DIR

    rng = random.Random(SEED + 95)
    for i in range(max(3, N_SPECS // 20)):
        group = rng.choice(["source", "lang"])
        k = rng.randint(2, 4)
        mod = rng.choice([2, 3, 5, 7])
        rem = rng.randrange(mod) if rng.random() < 0.8 else mod  # mod → empty batch
        docs = _docs(spark, SF_DIR)
        batch = docs.where(F.col("doc_id") % mod == rem)
        rest = docs.where(F.col("doc_id") % mod != rem)
        got = corpus.source_overlap_incremental(
            batch, corpus_df=rest, group_col=group, k=k)
        oracle = _duck_overlap_incremental(
            group, k, f"doc_id % {mod} = {rem}")
        assert_df_matches_duck(got, duck, oracle)
        if i == 0:
            # materialized corpus-shingle path ≡ corpus_df path
            pre = (
                shingles(rest, k=k, extra_cols=[group])
                .select(group, "shingle").distinct()
            )
            got2 = corpus.source_overlap_incremental(
                batch, corpus_group_shingles=pre, group_col=group, k=k)
            assert_df_matches_duck(got2, duck, oracle)


def test_fuzz_image_phash(spark, duck):
    """Perceptual image dedup at random Hamming thresholds, sharing the
    contract's oracle builder (all-pairs ≡ banded join for every
    threshold the engine accepts, by the 8-band pigeonhole). Also pins
    the pre-computed-signatures path against the decode path."""
    from coolplaydruid_spark.contract import (
        _docs_as_media,
        _duck_phash_pairs,
        engine_for,
    )
    from coolplaydruid_spark.operators import multimodal

    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from coolplaydruid_spark.contract import _duck_phash_pairs_incremental

    rng = random.Random(SEED + 96)
    eng = engine_for(spark, SF_DIR)
    media = _docs_as_media(eng, "png")
    sig = multimodal.phash_signatures(media)
    for i in range(max(3, N_SPECS // 20)):
        max_h = rng.randint(0, 7)
        got = multimodal.phash_neardup(media, max_hamming=max_h)
        assert_df_matches_duck(got, duck, _duck_phash_pairs(max_h))
        if i == 0:
            got2 = multimodal.phash_neardup(
                media, max_hamming=max_h, signatures=sig)
            assert_df_matches_duck(got2, duck, _duck_phash_pairs(max_h))
        # incremental batch × corpus split ≡ all cross pairs, through
        # both the decode path and the pre-materialized-signature path
        mod = rng.choice([3, 5, 7])
        rem = rng.randrange(mod)
        inc = multimodal.phash_neardup_incremental(
            media.where(F.col("media_id") % mod == rem),
            corpus_df=media.where(F.col("media_id") % mod != rem),
            max_hamming=max_h)
        assert_df_matches_duck(
            inc, duck, _duck_phash_pairs_incremental(max_h, mod, rem))
        if i == 0:
            inc2 = multimodal.phash_neardup_incremental(
                batch_signatures=sig.where(F.col("media_id") % mod == rem),
                corpus_signatures=sig.where(F.col("media_id") % mod != rem),
                max_hamming=max_h)
            assert_df_matches_duck(
                inc2, duck, _duck_phash_pairs_incremental(max_h, mod, rem))


def test_fuzz_quality_pipeline_stage_metamorphics(spark):
    """Stage-boundary invariants of the composed pipeline (r8 verdict
    #5) — engine-only metamorphics, one per boundary, at fuzzed knobs:

    1. filter commutativity: gopher-first vs dup-cut-first join order
       yields the identical bucket report (both are pure predicates on
       the ORIGINAL documents);
    2. neutral dup stage: dup_cut=1.0 ≡ the pipeline without the dup
       stage (the duplicated-char fraction never exceeds 1);
    3. retrain accounting: with all rates 1.0 the thinning gate is
       open, so Σ n_docs over buckets == the survivor count — the
       terciles partition exactly the filtered set they were retrained
       on;
    4. nested thinning: lowering one bucket's rate keeps a SUBSET of
       that bucket's documents (the md5 gate is monotone in the rate),
       and the other buckets' kept sets are untouched.
    """
    from pyspark.sql import functions as F

    from coolplaydruid_spark.contract import (
        _spark_gopher,
        _spark_quality_pipeline,
        engine_for,
    )
    from coolplaydruid_spark.operators import sampling

    from conftest import SF_DIR

    rng = random.Random(SEED + 97)
    docs = _docs(spark, SF_DIR)
    engine_for(spark, SF_DIR)  # session confs

    def report(df):
        return {r["bucket"]: (r["n_docs"], r["total_tokens"])
                for r in df.collect()}

    for _ in range(max(2, N_SPECS // 30)):
        gp = dict(
            min_words=rng.randint(0, 40),
            max_words=rng.randint(60, 120),
            min_mean=rng.choice([0.0, 3.0]),
            max_mean=rng.choice([5.0, 10.0]),
            max_symbol=0.1,
            min_alpha=rng.choice([0.0, 0.8]),
            min_stop=rng.randint(0, 2),
        )
        dup_cut = rng.choice([0.3, 0.5, 0.7])
        rates = {"head": 1.0, "middle": rng.choice([0.5, 0.2]),
                 "tail": rng.choice([0.1, 0.0])}
        v = rng.choice([50, 100])

        base = report(_spark_quality_pipeline(docs, gp, dup_cut, rates, v))

        # 1. swap the filter joins
        g = _spark_gopher(docs, gp).where("passes").select("doc_id")
        d2 = (
            text.dup_ngram_stats(docs, ns=(2,))
            .where(F.col("dup_2gram_char_frac") <= dup_cut)
            .select("doc_id")
        )
        keep_swapped = docs.join(d2, on="doc_id").join(g, on="doc_id")
        mix = sampling.quality_mixture(keep_swapped, rates=dict(rates),
                                       vocab_size=v)
        swapped = report(mix.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        ))
        assert swapped == base, (swapped, base)

        # 2. dup_cut = 1.0 ≡ gopher-only
        full_cut = report(_spark_quality_pipeline(docs, gp, 1.0, rates, v))
        keep_g = docs.join(g, on="doc_id")
        mix_g = sampling.quality_mixture(keep_g, rates=dict(rates),
                                         vocab_size=v)
        gopher_only = report(mix_g.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        ))
        assert full_cut == gopher_only, (full_cut, gopher_only)

        # 3. open gate accounts for every survivor
        keep = docs.join(g, on="doc_id").join(d2, on="doc_id")
        open_rates = {"head": 1.0, "middle": 1.0, "tail": 1.0}
        opened = report(_spark_quality_pipeline(docs, gp, dup_cut,
                                                open_rates, v))
        n_survivors = keep.count()
        assert sum(n for n, _ in opened.values()) == n_survivors, (
            opened, n_survivors)

        # 4. nested thinning on one bucket; other buckets untouched
        full_ids = {
            (r["bucket"], r["doc_id"])
            for r in sampling.quality_mixture(
                keep, rates=open_rates, vocab_size=v).collect()
        }
        half_rates = dict(open_rates, middle=0.5)
        half_ids = {
            (r["bucket"], r["doc_id"])
            for r in sampling.quality_mixture(
                keep, rates=half_rates, vocab_size=v).collect()
        }
        assert half_ids <= full_ids
        for b in ("head", "tail"):
            assert {i for bb, i in half_ids if bb == b} == \
                   {i for bb, i in full_ids if bb == b}


def test_fuzz_audio_fingerprint(spark, duck):
    """Audio near-dup at random Hamming thresholds, sharing the
    contract's oracle builder (all-pairs ≡ 4-band blocked join for
    every accepted threshold); also pins the pre-computed-signatures
    path against the decode path."""
    from coolplaydruid_spark.contract import (
        _docs_as_media,
        _duck_afp_pairs,
        engine_for,
    )
    from coolplaydruid_spark.operators import multimodal

    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from coolplaydruid_spark.contract import _duck_afp_pairs_incremental

    rng = random.Random(SEED + 98)
    eng = engine_for(spark, SF_DIR)
    media = _docs_as_media(eng, "wav")
    sig = multimodal.audio_fingerprint(media)
    for i in range(max(3, N_SPECS // 20)):
        max_h = rng.randint(0, 3)
        got = multimodal.audio_neardup(media, max_hamming=max_h)
        assert_df_matches_duck(got, duck, _duck_afp_pairs(max_h))
        if i == 0:
            got2 = multimodal.audio_neardup(
                media, max_hamming=max_h, signatures=sig)
            assert_df_matches_duck(got2, duck, _duck_afp_pairs(max_h))
        mod = rng.choice([3, 5, 7])
        rem = rng.randrange(mod)
        inc = multimodal.audio_neardup_incremental(
            media.where(F.col("media_id") % mod == rem),
            corpus_df=media.where(F.col("media_id") % mod != rem),
            max_hamming=max_h)
        assert_df_matches_duck(
            inc, duck, _duck_afp_pairs_incremental(max_h, mod, rem))


def test_fuzz_media_pipeline(spark, duck):
    """The composed media dedup pipeline (decode → signatures → banded
    pairs → connected components → keep-best) at random Hamming
    thresholds, sharing the contract's recursive-CTE oracle builder
    (r10). Also asserts the subset metamorphic inline: survivors at a
    looser threshold ⊆ survivors at a tighter one."""
    from conftest import SF_DIR

    from coolplaydruid_spark.contract import (
        _duck_media_pipeline,
        _spark_media_pipeline,
        engine_for,
    )

    rng = random.Random(SEED + 99)
    eng = engine_for(spark, SF_DIR)
    prev_h, prev_ids = None, None
    for max_h in sorted(rng.sample(range(0, 8), k=3), reverse=True):
        got = _spark_media_pipeline(eng, max_h)
        assert_df_matches_duck(got, duck, _duck_media_pipeline(max_h))
        ids = {r["media_id"] for r in got.collect()}
        if prev_ids is not None and max_h < prev_h:
            assert prev_ids <= ids, (
                f"looser ham {prev_h} kept items tighter ham {max_h} dropped")
        prev_h, prev_ids = max_h, ids


def test_fuzz_video_framehash(spark, duck):
    """Video frame-hash near-dup at random sampling intervals and
    Jaccard thresholds, sharing the contract's oracle builder; pins the
    pre-computed-signatures path and the incremental batch × corpus
    split (r10)."""
    from conftest import SF_DIR

    from pyspark.sql import functions as F

    from coolplaydruid_spark.contract import (
        _docs_as_video,
        _duck_video_pairs,
        engine_for,
    )
    from coolplaydruid_spark.operators import multimodal

    rng = random.Random(SEED + 100)
    eng = engine_for(spark, SF_DIR)
    media = _docs_as_video(eng)
    for i in range(max(3, N_SPECS // 20)):
        every_ms = rng.choice([100, 200, 500])
        thr = rng.choice([0.3, 0.5, 0.8])
        got = multimodal.video_neardup(media, threshold=thr,
                                       every_ms=every_ms)
        assert_df_matches_duck(got, duck, _duck_video_pairs(thr, every_ms))
        if i == 0:
            sig = multimodal.video_frame_signatures(media, every_ms=every_ms)
            got2 = multimodal.video_neardup(threshold=thr, signatures=sig)
            assert_df_matches_duck(got2, duck, _duck_video_pairs(thr, every_ms))
        mod = rng.choice([3, 5, 7])
        rem = rng.randrange(mod)
        inc = multimodal.video_neardup_incremental(
            media.where(F.col("media_id") % mod == rem),
            corpus_df=media.where(F.col("media_id") % mod != rem),
            threshold=thr, every_ms=every_ms)
        assert_df_matches_duck(
            inc, duck, _duck_video_pairs(thr, every_ms, mod, rem))


def test_fuzz_semantic_pairs(spark, duck):
    """SemDeDup pairing at random centroid counts, thresholds, and
    batch/corpus splits — self and incremental forms both pinned to
    contract._duck_semantic_pairs (shared with the driver gate)."""
    from pyspark.sql import functions as F

    from coolplaydruid_spark.contract import _duck_semantic_pairs, engine_for
    from coolplaydruid_spark.operators import dedup

    from conftest import SF_DIR

    rng = random.Random(SEED + 93)
    emb = engine_for(spark, SF_DIR).catalog.table("embeddings")
    for _ in range(max(4, N_SPECS // 10)):
        n = rng.randint(2, 16)
        tau = rng.choice([0.2, 0.3, 0.4, 0.5])
        # hot-cell cap at a random bite: None (off) or a size that
        # plausibly drops some cells at sf0.01 (~500 vectors / n cells)
        cap = rng.choice([None, 20, 40, 65, 120])
        cent = emb.where(F.col("vec_id") < n).select(
            F.col("vec_id").alias("centroid_id"), "embedding")
        if rng.random() < 0.5:
            got = dedup.semantic_dedup_pairs(emb, cent, threshold=tau,
                                             max_cell_size=cap)
            assert_df_matches_duck(
                got, duck, _duck_semantic_pairs(n, tau, max_cell=cap))
        else:
            mod = rng.randint(3, 7)
            rem = rng.randrange(mod)
            got = dedup.semantic_dedup_pairs_incremental(
                emb.where(F.col("vec_id") % mod == rem), cent,
                corpus_df=emb.where(F.col("vec_id") % mod != rem),
                threshold=tau, max_cell_size=cap)
            assert_df_matches_duck(
                got, duck, _duck_semantic_pairs(n, tau, mod, rem,
                                                max_cell=cap))
