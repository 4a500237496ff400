"""BM25 keyword retrieval over a document table — the lexical ranking
primitive of a training-data pipeline (mining topical subsets, grading
query relevance for retrieval-augmented eval sets, keyword-probing a
crawl before a full embedding pass).

Why it belongs next to the similarity operators: `similarity.py` ranks
by embedding cosine; this ranks by exact term statistics (Robertson's
BM25, the Lucene-default scoring function) — no model, no embeddings,
mirrorable in exact SQL so the DuckDB oracle can verify it.

Scale shape (the 100 TB argument):
 - Pass 1 reduces the corpus to ONE row of global statistics (N, avgdl,
   per-term document frequencies) via partial aggregation — each
   executor emits one partial row, the exchange carries
   executor-count rows.
 - Pass 2 scores map-only against that broadcast one-row frame; only
   the final top-k heads cross the wire (TakeOrderedAndProject keeps a
   k-row heap per partition — no global sort).
 - Per-term tf is a fold over the token array (`F.size(F.filter(...))`)
   — whole-stage codegen, no explode, no per-token shuffle.
The corpus is scanned twice (stats + score); both scans are map-only
and column-pruned to the text + id columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from coolplaydruid_spark.operators.text import tokens
from coolplaydruid_spark.operators.util import spread


def _query_terms(query: str | list[str]) -> list[str]:
    """Lowercased, de-duplicated query terms in first-seen order (order
    only affects floating-point summation order, which both engines
    replicate left-to-right)."""
    raw = query.split() if isinstance(query, str) else list(query)
    seen: dict[str, None] = {}
    for t in raw:
        t = t.strip().lower()
        if t:
            seen.setdefault(t, None)
    if not seen:
        raise ValueError("BM25 query must contain at least one term")
    return list(seen)


def bm25_topk(
    df: DataFrame,
    query: str | list[str],
    top_k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``top_k`` documents by BM25 score for ``query``.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))   (Lucene's
    always-positive variant). |d| is the whitespace token count, avgdl
    its corpus mean, df(t) the number of documents containing t.

    Only documents matching ≥ 1 term are candidates. Scores are rounded
    to 6 decimals BEFORE ordering, with ``id_col`` as the tie-break, so
    the returned top-k set is deterministic and engine-independent.
    Returns (id, bm25) ordered best-first.
    """
    terms = _query_terms(query)
    toks = tokens(F.col(text_col))

    def _tf(term: str):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    from coolplaydruid_spark.operators.dedup import _pin_cache

    # r14: pin the per-doc term-frequency table — it feeds BOTH the
    # stats aggregation and the scoring pass, which otherwise each
    # re-tokenize the corpus (and the matched>0 filter, pushed below
    # the projection, re-tokenized a third time inside the Filter —
    # plans/r14/retrieval_hybrid_rrf_before.txt nodes 2/4). One row of
    # id + len(terms)+1 ints per doc: doc-scaled, pin-friendly.
    base = _pin_cache(spread(df, by=id_col).select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        *[_tf(t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    ))
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__N"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).cast("double").alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )

    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        dfreq = F.col(f"__df{i}")
        idf = F.log(1.0 + (F.col("__N") - dfreq + 0.5) / (dfreq + 0.5))
        norm = tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        score = score + idf * tf * (k1 + 1.0) / norm
    matched = sum((F.col(f"__tf{i}") for i in range(len(terms))), F.lit(0))

    return (
        base.crossJoin(F.broadcast(stats))
        .where(matched > 0)
        .select(F.col(id_col), F.round(score, 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(int(top_k))
    )


def bm25_batch_topk(
    docs: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
) -> DataFrame:
    """Top-``top_k`` documents per query for a whole BATCH of queries —
    the production retrieval shape (mining topical subsets for many
    topics, building retrieval-augmented eval sets) where per-query
    column folds (bm25_topk) stop scaling past a handful of terms.

    Same scoring formula as bm25_topk; the score accumulates over a
    (query, term) JOIN instead of per-term columns, term by term in the
    aggregation, so term count is unbounded. Returns (query_id, id,
    bm25) ordered (query_id, score DESC, id) — scores round to 6
    decimals before ranking, ties break on the document id, so the
    per-query cut is engine-deterministic.

    100 TB shape: the query-term set is broadcast everywhere it meets
    data. One corpus pass computes document lengths + matched-term tf
    via an exploded-token inner join against the broadcast terms — only
    MATCHING tokens survive the explode into the (doc, term) partial
    aggregation, so the one data-scaled shuffle carries the match
    stream, not the corpus token stream. Document frequencies re-derive
    from that (doc, term)-distinct table (term-keyed, vocabulary-
    bounded); N and avgdl are a one-row broadcast from a second
    map-only pass; the final per-(query, doc) window runs over matched
    candidates only.
    """
    terms = (
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.explode(
                F.array_distinct(tokens(F.col(query_text_col)))
            ).alias("term"),
        )
        .distinct()
    )
    uniq_terms = terms.select("term").distinct()

    # corpus stats: N + avgdl (one row), map-only partial agg
    nd = docs.select(F.size(tokens(F.col(text_col))).alias("__dl")).agg(
        F.count(F.lit(1)).cast("double").alias("__N"),
        F.avg("__dl").alias("__avgdl"),
    )
    # (doc, term) tf over ONLY the queried terms: the broadcast inner
    # join discards non-matching tokens before the shuffle
    from coolplaydruid_spark.operators.dedup import _pin_cache

    # r14: pin the matched (doc, term) table — it feeds the df(t)
    # aggregation AND the final scoring join, which otherwise each
    # re-run the corpus explode + broadcast term match. Row count is
    # bounded by matches (queried vocabulary × matching docs), never
    # the corpus token stream.
    doc_terms = _pin_cache(
        spread(docs, by=id_col)
        .select(
            F.col(id_col),
            F.size(tokens(F.col(text_col))).alias("__dl"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .join(F.broadcast(uniq_terms), on="term")
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__tf"),
            F.first("__dl").alias("__dl"),
        )
    )
    # df(t): matched (doc, term) rows are distinct by construction
    dfreq = doc_terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    idf = F.log(1.0 + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
    term_score = (
        idf * F.col("__tf") * (k1 + 1.0)
        / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("__qid").orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        doc_terms.join(F.broadcast(dfreq), on="term")
        .join(F.broadcast(terms), on="term")
        .crossJoin(F.broadcast(nd))
        .groupBy("__qid", id_col)
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= int(top_k))
        .select(
            F.col("__qid").alias(query_id_col), F.col(id_col), F.col("bm25")
        )
        .orderBy(query_id_col, F.col("bm25").desc(), F.col(id_col))
    )

def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_text: str | list[str],
    query_id: int,
    top_k: int = 10,
    pool: int = 50,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid lexical+dense retrieval with reciprocal-rank fusion
    (Cormack et al. 2009) — the production RAG shape: BM25 ranks the
    corpus by ``query_text``, cosine ranks it by the query embedding
    (the ``embeddings`` row with id ``query_id``; the document/embedding
    tables share ids), and the two rankings fuse as

        rrf(d) = Σ_rankings 1/(rrf_k + rank(d))

    over each ranking's top-``pool`` candidates, a document missing
    from a ranking contributing 0. The query's own document is
    excluded from both sides. Returns the top-``top_k`` by
    (rrf_score DESC, id) as (id, rrf_score, bm25_rank, cosine_rank)
    with NULL for a side that did not retrieve the document. Ranks are
    integers, so every rrf term is the same IEEE double in any engine;
    the fused score rounds to 6 decimals before the cut.

    100 TB shape: both legs are the already-scale-shaped operators
    (bm25_topk: one-row broadcast stats + TakeOrderedAndProject;
    brute_force_topk: broadcast query, corpus never shuffles); the
    fusion join touches only 2×pool rows."""
    from coolplaydruid_spark.operators.similarity import brute_force_topk

    bm = bm25_topk(
        docs.where(F.col(id_col) != query_id), query_text, top_k=pool,
        k1=k1, b=b, text_col=text_col, id_col=id_col,
    )
    # ranking runs over the pool-bounded BM25 head (≤ pool rows), so a
    # single partition is correct — constant_partition keeps a partition
    # spec so the global-window warning can't bury real ones
    from coolplaydruid_spark.operators.util import constant_partition

    w_bm = Window.partitionBy(constant_partition(id_col)).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc())
    bm_ranked = bm.select(
        F.col(id_col), F.row_number().over(w_bm).alias("bm25_rank")
    )
    cos = brute_force_topk(
        embeddings.where(F.col(emb_id_col) != query_id),
        embeddings.where(F.col(emb_id_col) == query_id).select(
            F.col(emb_id_col).alias("query_id"), F.col(vec_col)
        ),
        k=pool, vec_col=vec_col, id_col=emb_id_col,
    ).select(F.col("neighbor_id").alias(id_col), F.col("rank").alias("cosine_rank"))

    fused = bm_ranked.join(cos, on=id_col, how="full_outer")
    term = lambda rank: F.coalesce(  # noqa: E731
        1.0 / (F.lit(float(rrf_k)) + F.col(rank)), F.lit(0.0)
    )
    return (
        fused.select(
            F.col(id_col),
            F.round(term("bm25_rank") + term("cosine_rank"), 6).alias("rrf_score"),
            F.col("bm25_rank").cast("int").alias("bm25_rank"),
            F.col("cosine_rank").cast("int").alias("cosine_rank"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(int(top_k))
    )
