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

from pyspark.sql import DataFrame
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

    base = spread(df, by=id_col).select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        *[_tf(t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    )
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
