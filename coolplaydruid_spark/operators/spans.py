"""Cross-document duplicate-SPAN detection and removal — substring-level
dedup, the training-data step popularized by "Deduplicating Training
Data Makes Language Models Better" (Lee et al., 2022): near-identical
SPANS (boilerplate, licenses, templates) recur across otherwise-distinct
documents, and span-level removal recovers quality that document-level
dedup (operators/dedup.py) cannot.

Spark-first design — no suffix arrays, no Python:

  1. Per document, hash every ``window``-token sliding window
     (``transform`` over an index ``sequence`` + ``slice`` + ``md5`` —
     one higher-order projection, whole-stage codegen).
  2. ``posexplode`` to (doc, pos, hash) rows — ~one row per token, the
     same scale as the shingle pass the MinHash pipeline already pays.
  3. groupBy(hash) marking hashes seen in ≥ ``min_docs`` DISTINCT
     documents (map-side partial aggregation collapses per-partition
     repeats before the shuffle; the exchange is keyed by uniformly
     distributed md5 — no skew).
  4. Join the marks back; per document, the duplicated windows' covered
     token positions come from exploding each window's ``sequence`` of
     offsets (bounded by #duplicated windows × window, not corpus size).
  5. ``remove_duplicate_spans`` rewrites the text by index-filtering the
     token array against the covered-position set (again a single
     higher-order projection).

At 100 TB this is two shuffles (window-hash groupBy + the mark join,
both md5-keyed) over ~token-count rows — the same exchange profile as
MinHash-LSH, with no pairwise joins anywhere.

The fingerprint is the md5 of the space-joined window — EXACT matching
of normalized token spans (no hash-collision verification needed at
md5 widths), mirrored verbatim by the DuckDB oracle in contract.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from coolplaydruid_spark.operators.text import tokens
from coolplaydruid_spark.operators.util import spread

DEFAULT_WINDOW = 8


def _window_hashes(df: DataFrame, window: int, text_col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, pos, h): one row per sliding window."""
    toks = tokens(F.col(text_col))
    wins = F.when(
        F.size(toks) >= window,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - window),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, window))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = spread(df, by=id_col).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        wins.alias("__wins"),
    )
    return base.select(
        id_col, "n_tokens", F.posexplode_outer("__wins").alias("pos", "h")
    )


def duplicate_span_positions(
    df: DataFrame,
    window: int = DEFAULT_WINDOW,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos) for every window start whose ``window``-token span also
    appears in at least ``min_docs`` distinct documents (including this
    one)."""
    w = _window_hashes(df, window, text_col, id_col).where(F.col("h").isNotNull())
    dup = (
        w.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("h")
    )
    return w.join(dup, on="h").select(id_col, "pos")


def duplicate_span_stats(
    df: DataFrame,
    window: int = DEFAULT_WINDOW,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: n_tokens, n_dup_windows (window starts whose span
    recurs cross-document), covered_tokens (tokens inside ANY such
    span), retained_tokens. The thresholdable signal for span-level
    cleaning — every row keeps its document even with zero duplication.
    """
    dpos = duplicate_span_positions(df, window, min_docs, text_col, id_col)
    nd = dpos.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_windows"))
    cov = (
        dpos.select(
            id_col,
            F.explode(F.sequence(F.col("pos"), F.col("pos") + window - 1)).alias("__p"),
        )
        .groupBy(id_col)
        .agg(F.count_distinct("__p").alias("covered_tokens"))
    )
    base = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens")
    )
    out = base.join(nd, on=id_col, how="left").join(cov, on=id_col, how="left")
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
        (F.col("n_tokens") - F.coalesce("covered_tokens", F.lit(0)))
        .cast("long")
        .alias("retained_tokens"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    window: int = DEFAULT_WINDOW,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rewrite each document with its cross-document duplicated spans
    REMOVED: tokens inside any duplicated window are dropped, the rest
    re-join with single spaces (tokenization is the normalized
    whitespace form, like every text operator here). Documents with no
    duplicated spans keep their full normalized token stream."""
    dpos = duplicate_span_positions(df, window, min_docs, text_col, id_col)
    covered = (
        dpos.select(
            F.col(id_col),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + window - 1)).alias("__p"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__p").alias("__covered"))
    )
    toks = tokens(F.col(text_col))
    joined = df.join(covered, on=id_col, how="left")
    kept = F.filter(
        toks,
        lambda x, i: ~F.coalesce(
            F.array_contains(F.col("__covered"), i), F.lit(False)
        ),
    )
    return joined.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("retained_tokens"),
        F.concat_ws(" ", kept).alias("clean_text"),
    )
