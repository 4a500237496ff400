"""Token-budget sequence packing — group documents into training
sequences of at most ``budget`` tokens (the pretraining dataloader's
bin-packing step, run as a batch job so the trainer streams prepacked
rows).

Scale shape: packing is embarrassingly parallel ACROSS bins but
inherently sequential WITHIN a packing decision, so the operator packs
per partition: documents are hash-distributed (deterministic — same
doc set → same partition → same bins), each partition runs first-fit-
decreasing over its own documents (an O(n log n) greedy with a
worst-case 11/9·OPT+1 bin bound — the textbook FFD guarantee), and bin
ids are globally unique via (partition, local index). No shuffle beyond
the initial hash distribution; state per partition is the open-bin list,
bounded by the partition's bin count.

A global FFD would need a full sort plus a sequential pass — at 100 TB
that is one machine's problem forever. Per-partition packing costs at
most one extra partially-filled bin per partition (the only waste vs
global), which is noise once partitions hold thousands of documents.

No SQL oracle: bin assignment is order-dependent (rows-only driver
check); the pytest asserts the invariants instead — exact cover, budget
respected, FFD density.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "seq_id long, doc_ids array<long>, n_docs int, total_tokens long"

# bins per partition namespace; collisions impossible below 2^40 bins
_SEQ_STRIDE = 1 << 40


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str = "ws_tokens",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, token_count) rows → (seq_id, doc_ids, n_docs, total_tokens)
    bins with sum(tokens) ≤ budget. A single document larger than the
    budget gets its own (oversized) bin — truncation/splitting is the
    tokenizer's decision, not the packer's."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_col).cast("long").alias("__tokens"),
    )
    n = num_partitions or base.sparkSession.sparkContext.defaultParallelism
    base = base.repartition(n, F.col("doc_id"))

    def pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        docs: list[tuple[int, int]] = []
        for pdf in it:
            docs.extend(zip(pdf["doc_id"].astype(int), pdf["__tokens"].astype(int)))
        if not docs:
            return
        # Bin-id namespace from the partition's content (min doc id) —
        # globally unique because hash partitions hold disjoint doc sets,
        # and stable across retries/replans.
        ns = min(d for d, _ in docs)
        # first-fit-decreasing, deterministic: sort by (tokens desc, id)
        docs.sort(key=lambda t: (-t[1], t[0]))
        bins: list[list[tuple[int, int]]] = []
        space: list[int] = []
        for doc, tok in docs:
            placed = False
            for i in range(len(bins)):
                if space[i] >= tok:
                    bins[i].append((doc, tok))
                    space[i] -= tok
                    placed = True
                    break
            if not placed:
                bins.append([(doc, tok)])
                space.append(max(budget - tok, 0))
        yield pd.DataFrame(
            {
                "seq_id": [ns * _SEQ_STRIDE + i for i in range(len(bins))],
                "doc_ids": [sorted(d for d, _ in b) for b in bins],
                "n_docs": [len(b) for b in bins],
                "total_tokens": [sum(t for _, t in b) for b in bins],
            }
        )

    return base.mapInPandas(pack, PACK_SCHEMA)


def write_training_shards(
    df: DataFrame,
    dest_path: str,
    n_shards: int,
    shard_key: str = "seq_id",
    order_within_shard: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Export packed sequences (or any training table) as exactly
    ``n_shards`` parquet shard files under ``dest_path/shard=K/``.

    Shard assignment is DETERMINISTIC — ``pmod(xxhash64(key), n)`` —
    so a re-run (or a resumed failed export) writes identical shards:
    the property a dataloader checkpoint depends on. Spark's own
    ``repartition(n)`` round-robin would not give this.

    Scale shape: one range-partitioned shuffle on the shard id.
    repartitionByRange (not hash repartition) maps the n distinct shard
    values ~1:1 onto n tasks — hash repartitioning would re-hash the
    already-uniform shard id and leave ~1/e of the tasks empty while
    others carry two shards (birthday collisions). Each task then writes
    its shard's single file. Optional ``order_within_shard`` sorts
    inside each shard only (sortWithinPartitions — no global sort) for
    curriculum / length-bucketed loading.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    out = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(shard_key)), F.lit(n_shards)).cast("int")
    )
    out = out.repartitionByRange(n_shards, F.col("shard"))
    if order_within_shard is not None:
        out = out.sortWithinPartitions("shard", order_within_shard)
    (
        out.write.mode(mode)
        .partitionBy("shard")
        .parquet(dest_path)
    )


def materialize_sequences(
    bins: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    separator: str = "\n\n",
) -> DataFrame:
    """Join packed bins back to document text and concatenate each bin's
    documents (ascending doc id — the order ``doc_ids`` already carries)
    into one training sequence string. Returns (seq_id, seq_text,
    n_docs, total_tokens).

    Scale shape: explode the bin→doc mapping (one row per packed doc —
    same cardinality as the corpus), join to the documents table on the
    doc id (one shuffle each side, or broadcast when bins are small),
    then groupBy seq_id with a sort-inside-collect: collect_list is
    order-nondeterministic under parallel merge, so the (id, text)
    structs are array_sort'ed per bin before concat — deterministic
    output for any execution order. Bin membership is tiny (≤ docs per
    budget), so the per-group array work is bounded."""
    pairs = bins.select(
        "seq_id", "n_docs", "total_tokens", F.explode("doc_ids").alias(id_col)
    )
    joined = pairs.join(
        docs.select(F.col(id_col), F.col(text_col)), on=id_col
    )
    packed = (
        joined.groupBy("seq_id")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.first("total_tokens").alias("total_tokens"),
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col(text_col).alias("t")))
            ).alias("__parts"),
        )
        .select(
            "seq_id",
            F.array_join(F.transform("__parts", lambda s: s["t"]), separator)
            .alias("seq_text"),
            "n_docs",
            "total_tokens",
        )
    )
    return packed
