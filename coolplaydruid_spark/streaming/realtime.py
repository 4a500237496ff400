"""Realtime ingestion — Druid's realtime nodes / Kafka Indexing Service on
Structured Streaming.

Reference semantics implemented (arch/druid-arch.md:13,29-32;
data-ingest/kis.md; TOC.md:42 LSM in-memory index):
 - stream → in-memory incremental state → immutable segment files:
   readStream → withWatermark → writeStream into the same
   __dt-partitioned Parquet layout batch ingest writes. "Handoff"
   dissolves: each micro-batch's files are immediately visible to batch
   queries over the sink table (staleness ≤ one trigger interval,
   SURVEY §7.5.6).
 - windowPeriod late-event dropping → watermark + optional hard filter:
   Druid 0.12 rejects events outside the task window; a watermark alone
   only bounds *aggregation* state, so append-mode ingest accepts an
   optional ``late_threshold`` that drops events older than the wall
   clock minus the threshold at batch time (Druid's windowPeriod is
   likewise wall-clock-based). Without it, raw append keeps late events.
 - Kafka exactly-once (KIS goal) → source offsets in the checkpoint +
   idempotent file sink — built into Structured Streaming.

Scale: the sink is partitioned by __dt; per-micro-batch file counts are
bounded by trigger interval × parallelism — run sources/batch.merge_task
periodically as the compaction story (Druid's own merge task, I5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from coolplaydruid_spark.sources.batch import DT_COLUMN


def file_stream(spark: SparkSession, source_path: str, schema,
                fmt: str = "json") -> DataFrame:
    """File-based stream source (the test-harness stand-in for Kafka; same
    downstream graph)."""
    reader = spark.readStream.schema(schema)
    if fmt == "json":
        return reader.json(source_path)
    if fmt == "parquet":
        return reader.parquet(source_path)
    if fmt == "csv":
        return reader.option("header", "true").csv(source_path)
    raise ValueError(f"unsupported stream format {fmt!r}")


def decode_kafka_values(records: DataFrame, value_schema) -> DataFrame:
    """Decode Kafka-shaped records (binary ``value`` column, as the Kafka
    source emits: key/value/topic/partition/offset/timestamp) into typed
    rows via from_json. Split out from kafka_stream so the decode path is
    exercised in CI without a broker (tests feed it a Kafka-schema batch
    frame; the projection is identical either way)."""
    return records.select(
        F.from_json(F.col("value").cast("string"), value_schema).alias("v")
    ).select("v.*")


def kafka_stream(spark: SparkSession, brokers: str, topic: str,
                 value_schema, starting_offsets: str = "earliest",
                 source_format: str = "kafka") -> DataFrame:
    """Kafka source (KIS analogue, I4). With the default format this
    requires the spark-sql-kafka package on the classpath. For CI without
    a broker, ``source_format="kafka_mock"`` swaps in the Python
    streaming data source from streaming/kafka_mock.py, which emits the
    exact Kafka record schema — every line downstream of .load() (the
    decode projection, watermarking, the __dt sink) is the production
    graph either way."""
    raw = (
        spark.readStream.format(source_format)
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_kafka_values(raw, value_schema)


def realtime_index(
    stream: DataFrame,
    dest_path: str,
    checkpoint_path: str,
    time_column: str,
    watermark: str = "10 minutes",
    rollup: dict | None = None,
    trigger_seconds: int | None = None,
    query_name: str = "realtime_index",
    late_threshold: str | None = None,
) -> StreamingQuery:
    """The `index_realtime` task (I3): stream → (optional rollup agg with
    watermarked windows) → append-only __dt-partitioned Parquet.

    Without rollup: append raw rows (late rows beyond the watermark are
    still appended — matching Druid's "query-time granularity" model where
    raw ingest keeps everything inside the task window). Pass
    ``late_threshold`` (e.g. "1 hour") to emulate Druid's windowPeriod
    rejection: events with event time older than wall clock minus the
    threshold are dropped at batch time.
    With rollup: {"window": "1 hour", "dimensions": [...], "aggregations":
    [(name, spark-agg-column)]} — watermarked tumbling-window aggregation;
    the watermark closes windows and drops late events exactly like
    Druid's windowPeriod rejection.
    """
    ts = F.col(time_column).cast("timestamp")
    stream = stream.withColumn(time_column, ts).withWatermark(time_column, watermark)
    if rollup:
        win = F.window(F.col(time_column), rollup.get("window", "1 hour"))
        dims = [F.col(d) for d in rollup.get("dimensions", [])]
        aggs = [col.alias(name) for name, col in rollup["aggregations"]]
        out = (
            stream.groupBy(win.alias("__window"), *dims)
            .agg(*aggs)
            .select(
                F.col("__window.start").alias(time_column),
                *[F.col(d) for d in rollup.get("dimensions", [])],
                *[F.col(name) for name, _ in rollup["aggregations"]],
            )
        )
        output_mode = "append"  # closed windows only — immutable segments
    else:
        out = stream
        if late_threshold:
            # windowPeriod rejection: current_timestamp() re-evaluates per
            # micro-batch, so this is "not older than threshold at batch
            # time" — a plain filter, no state.
            out = out.filter(
                F.col(time_column)
                >= F.current_timestamp() - F.expr(f"INTERVAL {late_threshold}")
            )
        output_mode = "append"
    out = out.withColumn(DT_COLUMN, F.to_date(F.col(time_column)).cast("string"))
    writer = (
        out.writeStream.queryName(query_name)
        .format("parquet")
        .option("path", dest_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode(output_mode)
        .partitionBy(DT_COLUMN)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
