"""Hashed-n-gram linear text classifier scoring (fastText-style).

The standard production quality/toxicity/language filter for LLM
training corpora is a linear model over hashed bag-of-words features
(fastText architecture): tokens hash into B buckets, the document's
score is ``sigmoid(bias + mean(w[h(token)]))``. Training happens
offline; what the 100 TB pipeline needs is SCORING every document with
a fixed weight vector — a map-only projection.

Two execution paths, chosen by model size:

- **Inline path** (vocab ≤ ``INLINE_WEIGHT_CAP`` buckets): weights
  become a Spark map literal; the per-token lookup + mean runs inside
  ``F.transform``/``F.aggregate`` in whole-stage codegen. ZERO
  shuffles, zero Python — the scan streams through.
- **Join path** (large models): tokens explode, hash to buckets, and
  left-join the broadcast weight table; per-document partial sums
  collapse map-side before the one ``groupBy(id)`` shuffle. The weight
  table broadcasts (a 2^20-bucket float table is ~12 MB).

The token hash is the repo-wide cross-engine convention (md5 hex →
integer, operators/dedup.py): DuckDB replicates it exactly, so scores
are oracle-testable to the last ulp-rounded digit.

Reference scope: the north-star training-data operators
(/root/repo/BASELINE.json); tokenization shared with operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.operators.text import tokens

# Above this many entries a map literal bloats the plan tree; switch to
# the broadcast-join path.
INLINE_WEIGHT_CAP = 4096


def token_bucket(token: Column, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets) from the first 8 md5 hex
    chars — DuckDB: CAST(('0x' || substring(md5(t),1,8)) AS BIGINT) % B."""
    from coolplaydruid_spark.operators.util import md5_bucket

    return md5_bucket(token, n_buckets, hex_chars=8)


def hashed_linear_score(
    df: DataFrame,
    weights,
    n_buckets: int,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score each document with a hashed linear model. ``weights`` is a
    ``dict[bucket -> weight]`` (inline path when small) or a two-column
    DataFrame ``(bucket, weight)`` (broadcast-join path). Returns
    ``(id_col, n_toks, margin, prob)`` where ``margin = bias +
    mean(weight)`` (0 mean for empty documents) and ``prob =
    sigmoid(margin)``."""
    toks = tokens(F.col(text_col))

    if isinstance(weights, dict) and len(weights) <= INLINE_WEIGHT_CAP:
        pairs: list[Column] = []
        for b, w in sorted(weights.items()):
            pairs.extend([F.lit(int(b)), F.lit(float(w))])
        wmap = F.create_map(*pairs)
        per_tok = F.transform(
            toks,
            lambda t: F.coalesce(
                F.element_at(wmap, token_bucket(t, n_buckets)), F.lit(0.0)
            ),
        )
        n = F.size(toks)
        wsum = F.aggregate(per_tok, F.lit(0.0), lambda acc, x: acc + x)
        margin = F.lit(float(bias)) + wsum / F.greatest(n, F.lit(1))
        return df.select(
            F.col(id_col),
            n.cast("long").alias("n_toks"),
            margin.alias("margin"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("prob"),
        )

    if isinstance(weights, dict):
        spark = df.sparkSession
        wdf = spark.createDataFrame(
            [(int(b), float(w)) for b, w in sorted(weights.items())],
            "bucket long, weight double",
        )
    else:
        wdf = weights.toDF("bucket", "weight")

    exploded = df.select(
        F.col(id_col), F.explode_outer(toks).alias("__tok")
    ).withColumn("bucket", token_bucket(F.col("__tok"), n_buckets))
    joined = exploded.join(F.broadcast(wdf), on="bucket", how="left")
    agg = joined.groupBy(id_col).agg(
        F.count(F.col("__tok")).cast("long").alias("n_toks"),
        F.coalesce(F.sum("weight"), F.lit(0.0)).alias("__wsum"),
    )
    margin = F.lit(float(bias)) + F.col("__wsum") / F.greatest(
        F.col("n_toks"), F.lit(1)
    )
    return agg.select(
        F.col(id_col),
        F.col("n_toks"),
        margin.alias("margin"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("prob"),
    )
