"""Document chunking: split long documents into overlapping token
windows — the standard context-window preparation step upstream of
sequence packing (operators/packing.py) in a training-data pipeline.

Map-only and JVM-side end to end: whitespace tokens via split, window
starts via sequence, slices via transform, one posexplode. No shuffle,
no Python; row fan-out is ~n_tokens/stride per document, which scales
linearly with executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    window: int = 100,
    stride: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_index, chunk_text, n_tokens): token windows of
    ``window`` whitespace tokens starting every ``stride`` tokens.

    Tail semantics: a start is kept when it is the first, or when the
    previous window did not already reach the document's end — so the
    final (possibly short) tail is emitted exactly once and no fully
    redundant sub-tail windows appear. Empty documents yield no rows.
    Case is preserved (chunks feed training, unlike the lowercased
    dedup shingles)."""
    if window <= 0 or stride <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    toks = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    base = df.select(F.col(id_col), toks.alias("__toks")).where(
        F.size("__toks") > 0
    )
    n = F.size("__toks")
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
        lambda s: (s == 0) | (s - stride + window < n),
    )
    exploded = base.select(
        F.col(id_col), F.col("__toks"), F.posexplode(starts).alias("chunk_index", "__s")
    )
    chunk = F.slice(F.col("__toks"), F.col("__s") + 1, window)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_index"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def duplicate_chunk_ratio(
    df: DataFrame,
    window: int = 100,
    stride: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: bool = False,
) -> DataFrame:
    """Per-document chunk-level duplication (sub-document dedup signal,
    the boilerplate detector doc-level dedup misses): the fraction of a
    document's token chunks whose exact text occurs more than once in
    the corpus-wide chunk multiset. Returns (id, n_chunks, dup_ratio);
    docs with no tokens yield no row (they have no chunks).

    Scale: chunks reduce to 16-byte md5 digests before any shuffle —
    the occurrence count groupBy and the count-back join move digests
    and ids only, never chunk text. The join back is digest-keyed
    (uniform by construction); AQE handles the (rare) viral-chunk skew
    with skew-join splitting. Two digest-keyed shuffles total, both
    ~n_chunks × 24 bytes regardless of document size. The digest
    projection feeds both the counts groupBy and the join probe side —
    two chunking passes per action; ``cache=True`` persists the
    (id, digest) rows to make it one when memory beats the re-chunk."""
    chunks = chunk_documents(
        df, window=window, stride=stride, text_col=text_col, id_col=id_col
    )
    digests = chunks.select(
        F.col(id_col), F.md5(F.col("chunk_text")).alias("__digest")
    )
    if cache:
        digests = digests.persist()
    counts = digests.groupBy("__digest").agg(F.count(F.lit(1)).alias("__n_occ"))
    return (
        digests.join(counts, on="__digest")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.round(
                F.avg((F.col("__n_occ") > 1).cast("double")), 6
            ).alias("dup_ratio"),
        )
    )
