"""Deterministic sampling — the data-mixing primitive of a training
pipeline (hold out eval slices, hit per-source mixture ratios, thin a
crawl to a token budget).

Everything is HASH-based, not RNG-based: a row is kept iff
``md5(salt|id) mod DENOM < rate * DENOM``. That makes sampling

 - deterministic and retry-safe (a recomputed partition keeps the same
   rows — Spark's ``sample()`` with a seed only guarantees this per
   partitioning, and resamples under AQE re-planning);
 - mirrorable in exact SQL (the correctness oracle runs the same md5
   arithmetic in DuckDB);
 - stable across engines and runs: downstream incremental jobs see a
   frozen sample as the corpus grows (rows never flip in/out when other
   rows appear);
 - map-only: no shuffle, no state, whole-stage codegen.

The salt decorrelates independent samples: two samples with different
salts over the same corpus overlap proportionally (P(both) = r1*r2),
while the SAME salt at growing rates gives NESTED samples (the 1% set is
a subset of the 10% set) — both properties training pipelines rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^24 buckets: rate granularity ~6e-8, and the 6-hex-digit slice stays
# exact in every engine's integer arithmetic.
_DENOM = 1 << 24


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 2^24) from md5(salt|id) — the first 6 hex
    digits of the digest parsed as an int. JVM-side, deterministic."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("long")


def hash_sample(df: DataFrame, rate: float, id_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Keep ~rate of rows, deterministically by id hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(hash_bucket(F.col(id_col), salt) < int(rate * _DENOM))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      id_col: str = "doc_id", salt: str = "",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — mixture ratios by source/
    language/quality-band. ``fractions`` maps stratum value → keep rate;
    strata not listed keep ``default_fraction``.

    The rate lookup compiles to a CASE chain over the (small) fractions
    dict — no join, no shuffle; the filter is map-only like hash_sample.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    rate = F.lit(int(default_fraction * _DENOM))
    for k, v in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == F.lit(k), F.lit(int(v * _DENOM))).otherwise(rate)
    return df.where(hash_bucket(F.col(id_col), salt) < rate)


def cap_per_group(df: DataFrame, group_col: str, cap: int,
                  id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Keep at most ``cap`` rows per group — the per-domain/per-source
    cap every crawl pipeline applies so one prolific site cannot
    dominate the corpus. Selection is by md5-hash order (ties broken by
    id), so which rows survive is deterministic, uniform within the
    group, and engine-mirrorable — not "first cap rows Spark happened to
    scan".

    Scale: one shuffle keyed on the group column; the per-group
    row_number is a partial sort within each group's partition. A
    pathologically hot group (one domain = billions of rows) serializes
    its own sort; the standing refinement for that regime is a first
    map-only pass gating on hash < (cap/n_group + ε)·2^24 (from a
    group-count aggregate) to shrink the ranked set to ~cap rows per
    group, then this exact rank over the survivors. At cap ≪ group size
    the pre-gate removes ~everything, so the window sorts thousands of
    rows, not billions."""
    from pyspark.sql import Window

    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def sample_to_mixture(df: DataFrame, category_col: str,
                      targets: dict[str, float],
                      id_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Downsample-only resampling to target mixture proportions: the
    largest corpus satisfying ``targets`` exactly is the one where the
    scarcest category (relative to its weight) is kept whole — T =
    min(n_c / w_c); every category then keeps w_c·T rows via the same
    deterministic md5 gate as hash_sample. Weights are ratio-invariant
    (only relative sizes matter), categories without a target drop.

    A target category ABSENT from the data makes the requested mixture
    infeasible by downsampling; the unique exact answer is the empty
    corpus (T = min includes n=0), which is what this returns — loudly
    correct rather than a silently skewed mixture that ignores the
    missing category.

    Fully declarative: per-category counts are one map-side-combined
    aggregation (category-cardinality rows), the water-level min is a
    global window over that tiny table, and the corpus-side rate join is
    AQE-broadcast. No collect, no RNG, retry-safe, nested across rates
    like every sampler in this module."""
    from pyspark.sql import Window

    for k, v in targets.items():
        if v <= 0:
            raise ValueError(f"target weight for {k!r} must be > 0, got {v}")
    import pandas as pd

    spark = df.sparkSession
    tgt = spark.createDataFrame(
        pd.DataFrame({category_col: list(targets), "__w": [float(targets[k]) for k in targets]}),
        f"{category_col} string, __w double",
    )
    counts = df.groupBy(category_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    # LEFT join from targets: a target category with zero rows keeps a
    # row with n=0, pulling the water level to 0 (see docstring).
    j = tgt.join(counts, on=category_col, how="left").withColumn(
        "__n", F.coalesce(F.col("__n"), F.lit(0.0))
    )
    # pmod(w, w) is 0 on every row (weights are validated > 0) but not
    # constant-foldable, so Spark keeps a partition spec and doesn't
    # emit the "No Partition Defined" WindowExec warning meant for
    # accidental global windows over raw data — this window's input is
    # the category-cardinality target table (corpus.py:131 pattern).
    level = F.min(F.col("__n") / F.col("__w")).over(
        Window.partitionBy(F.pmod(F.col("__w"), F.col("__w")))
    )
    rates = j.select(
        F.col(category_col),
        F.when(  # n=0 (missing target category) → ANSI-safe gate of 0
            F.col("__n") > 0,
            # round, not floor: the scarcest category's rate is exactly 1
            # in real arithmetic but computes as 1 - few_ulps in FP
            # (w*(n/w)/n); floor would shave its gate to _DENOM-1 and
            # silently drop ~2^-24 of the category the algorithm promises
            # to keep whole. The FP error is orders of magnitude inside
            # round's half-ulp-of-2^-24 tolerance; the oracle mirrors
            # round identically.
            F.round(F.col("__w") * level / F.col("__n") * _DENOM, 0),
        ).otherwise(F.lit(0))
        .cast("long")
        .alias("__gate"),
    )
    return (
        df.join(rates, on=category_col)
        .where(hash_bucket(F.col(id_col), salt) < F.col("__gate"))
        .drop("__gate")
    )


def quality_mixture(
    df: DataFrame,
    rates: dict[str, float] | None = None,
    vocab_size: int | None = 100,
    salt: str = "",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-weighted corpus thinning — the CCNet recipe end-to-end:
    label every document head/middle/tail by perplexity tercile
    (text.perplexity_bucket_labels), then keep each bucket at its own
    deterministic hash rate (default: all of head, half of middle, a
    tenth of tail). The standard 'sample more of the good stuff' pass
    between cleaning and tokenization.

    Returns the KEPT documents as (id, bucket, n_tokens). The gate is
    the same md5 arithmetic as hash_sample, so kept sets are
    deterministic, engine-mirrorable, nested across rates, and stable
    as the corpus grows.

    Scale: the labelling pass is perplexity_bucket_labels' shape
    (bounded-vocab broadcast + one threshold row); the gate is map-only
    on top of it. Nothing here shuffles beyond the NLL scoring
    itself."""
    from coolplaydruid_spark.operators.text import perplexity_bucket_labels

    if rates is None:
        rates = {"head": 1.0, "middle": 0.5, "tail": 0.1}
    for k, v in rates.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"rate for {k!r} must be in [0, 1], got {v}")
    # Every bucket needs an EXPLICIT rate — a missing key silently
    # dropping a third of the corpus is exactly the kind of quiet data
    # loss a thinning pass must not allow.
    expected = {"head", "middle", "tail"}
    if set(rates) != expected:
        raise ValueError(
            f"rates must name exactly {sorted(expected)}; "
            f"got {sorted(rates)}"
        )
    labeled = perplexity_bucket_labels(
        df, vocab_size=vocab_size, text_col=text_col, id_col=id_col
    )
    rate = F.lit(0)
    for k, v in sorted(rates.items()):
        rate = F.when(F.col("bucket") == F.lit(k), F.lit(int(v * _DENOM))).otherwise(rate)
    return labeled.where(hash_bucket(F.col(id_col), salt) < rate).select(
        F.col(id_col), F.col("bucket"), F.col("n_tokens")
    )
