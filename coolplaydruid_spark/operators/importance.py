"""Hashed-n-gram importance weighting for data selection (DSIR-style):
score every document in a raw pool by how much more likely its tokens
are under a TARGET corpus distribution than under the pool's own —
the published recipe for selecting pretraining data that matches a
high-quality target domain (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling").

Model: unigrams hashed into ``num_buckets`` buckets; each corpus's
bucket distribution is estimated with add-1 smoothing
(p(b) = (count(b)+1) / (total+B)); a document's weight is the sum over
its token occurrences of log p_target(bucket) − log p_raw(bucket)
(equivalently its log importance ratio under the hashed unigram LM).
High-weight documents look like the target; selection is then
top-weight or weight-thresholded sampling.

The hash is the repo-wide md5 idiom (first 6 hex digits → integer, mod
B) — deterministic, engine-independent, mirrored exactly by the DuckDB
oracle as ``CAST(('0x' || substring(md5(tok),1,6)) AS BIGINT) % B``.

Scale shape (the 100 TB argument):
 - Both distribution estimates aggregate on a key space bounded by
   ``num_buckets``, not the corpus: map-side combine collapses each
   executor's tokens to ≤ B partial rows before the exchange.
 - The log-ratio table is B rows, built on a `spark.range(B)` spine
   (buckets with zero counts still get their smoothed mass) and
   BROADCAST — bounded by the B parameter, never by data.
 - Scoring explodes tokens map-side, joins the broadcast ratio table,
   and aggregates per document — the doc-keyed aggregation is the only
   data-scaled shuffle, with partial sum/count combine.
 - The raw pool is scanned twice (distribution pass + scoring pass),
   both map-only before their aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.operators.text import tokens
from coolplaydruid_spark.operators.util import md5_bucket

DEFAULT_NUM_BUCKETS = 512


def _token_buckets(df: DataFrame, num_buckets: int, text_col: str,
                   keep: list[str] | None = None) -> DataFrame:
    """Explode whitespace tokens and hash each into [0, num_buckets)."""
    bucket = md5_bucket(F.col("__tok"), num_buckets).alias("bucket")
    return df.select(
        *[F.col(c) for c in (keep or [])],
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).select(*[F.col(c) for c in (keep or [])], bucket)


def _bucket_log_probs(df: DataFrame, num_buckets: int, text_col: str,
                      out_col: str) -> DataFrame:
    """(bucket, out_col): add-1-smoothed log probability of every bucket
    in [0, num_buckets) under ``df``'s hashed unigram distribution.
    Exactly ``num_buckets`` rows — buckets absent from the corpus carry
    the smoothing floor log(1 / (total+B))."""
    b = int(num_buckets)
    counts = (
        _token_buckets(df, b, text_col)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    total = counts.agg(F.sum("__c").cast("double").alias("__T"))
    spine = df.sparkSession.range(b).select(F.col("id").alias("bucket"))
    return (
        spine.join(counts, on="bucket", how="left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.log(
                (F.coalesce(F.col("__c"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("__T"), F.lit(0.0)) + b)
            ).alias(out_col),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document log importance weights of ``raw`` documents toward
    the ``target`` distribution. Returns (id, n_tokens, logratio_sum,
    logratio_avg) for documents with ≥ 1 token — logratio_sum is the
    document's DSIR log weight; logratio_avg the length-normalized
    variant (rank by it when document lengths vary widely, so long
    off-target documents cannot out-sum short on-target ones).

    ``target`` needs only a ``text_col`` column; it is typically a
    small curated corpus (the distribution pass reduces it to ≤ B
    rows either way).
    """
    b = int(num_buckets)
    if b <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    ratio = (
        _bucket_log_probs(target, b, text_col, "__lp_t")
        .join(_bucket_log_probs(raw, b, text_col, "__lp_r"), on="bucket")
        .select("bucket", (F.col("__lp_t") - F.col("__lp_r")).alias("__lr"))
    )
    doc_buckets = _token_buckets(raw, b, text_col, keep=[id_col])
    return (
        doc_buckets.join(F.broadcast(ratio), on="bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("__lr"), 6).alias("logratio_sum"),
            F.round(F.avg("__lr"), 6).alias("logratio_avg"),
        )
    )
