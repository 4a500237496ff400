"""Z-order (Morton) clustering for segment writes.

Druid segments carry per-dimension bitmap inverted indexes so selective
filters skip rows regardless of which dimension they hit
(reference: TOC.md:39-40 Bitmap / Inverted Index). Parquet's analogue is
row-group min/max stats — but stats only prune when values are clustered,
and a single-column sort clusters ONE column. Z-ordering interleaves the
bits of several columns' bucket ranks so a within-partition sort gives
every participating column locality; filters on ANY of them then skip row
groups (the standard lakehouse substitute for secondary indexes).

Everything is JVM expressions:
 - per-column bucket ids come from approxQuantile boundaries (computed
   once, driver-side, on a relative-error sketch — no global sort, no
   shuffle) evaluated as a fold over a boundary-array literal;
 - bit interleaving is shiftleft/bitwise-OR arithmetic;
 - the final clustering is sortWithinPartitions(z) — a local sort, no
   exchange beyond the __dt repartition the write already does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COLUMN = "__z"


def bucket_id(col: Column, boundaries: list[float]) -> Column:
    """0-based bucket rank of `col` among quantile boundaries — a fold
    counting boundaries ≤ value (codegen'd; len(boundaries) comparisons
    per row). Nulls land in bucket 0."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    c = F.coalesce(col.cast("double"), F.lit(float("-inf")))
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(c >= b, F.lit(1)).otherwise(F.lit(0)),
    )


def interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * ncols + j. All shiftleft/bitwise arithmetic — stays in codegen."""
    n = len(bucket_cols)
    z = F.lit(0).cast("long")
    for j, b in enumerate(bucket_cols):
        bl = b.cast("long")
        for i in range(bits):
            bit = F.shiftright(bl, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_value(df: DataFrame, cols: list[str], bits: int = 6,
                 relative_error: float = 0.01) -> Column:
    """Z-value Column for `cols` (numeric/castable-to-double). Quantile
    boundaries are estimated once per column with approxQuantile (a
    driver-side Greenwald-Khanna sketch pass — sampling cost, not a
    sort); 2^bits buckets per column."""
    nb = (1 << bits) - 1
    probs = [(i + 1) / (nb + 1) for i in range(nb)]
    buckets = []
    for c in cols:
        boundaries = df.stat.approxQuantile(c, probs, relative_error)
        # de-dup boundaries (skewed cols can repeat quantiles); fold
        # counts <=, so duplicates only waste comparisons, not wrongness
        buckets.append(bucket_id(F.col(c), boundaries))
    return interleave_bits(buckets, bits)
