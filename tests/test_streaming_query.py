"""The realtime loop closed end-to-end (SURVEY §3.3): stream → partitioned
sink → registered as a dataSource → Druid queries over it, matching the
same query over the equivalent batch data. Plus remaining aggregator/
post-agg coverage (longMin/Max, stringFirst/Last, greatest/least,
hyperUnique)."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from coolplaydruid_spark.engine import DruidEngine
from coolplaydruid_spark.catalog import Catalog
from coolplaydruid_spark.streaming import realtime

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def test_query_streaming_sink_as_datasource(spark, tmp_path):
    """Druid 'realtime node serves queries on in-flight data'
    (arch/druid-arch.md:32): after each micro-batch the sink table answers
    native queries — staleness bounded by the trigger interval."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"event_id": i, "ts": f"2024-05-01T{i % 24:02d}:30:00", "event_type":
         ["click", "view"][i % 2], "value": float(i)}
        for i in range(48)
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))

    stream = realtime.file_stream(spark, str(src), EVENT_SCHEMA, fmt="json")
    q = realtime.realtime_index(
        stream, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), time_column="ts"
    )
    q.awaitTermination(120)

    catalog = Catalog(spark)
    catalog.register("rt_events", path=str(tmp_path / "tbl"), time_column="ts")
    engine = DruidEngine(spark, catalog)

    out = engine.execute(
        {
            "queryType": "timeseries",
            "dataSource": "rt_events",
            "granularity": "hour",
            "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "total", "fieldName": "value"},
            ],
            "intervals": ["2024-05-01T00:00:00/2024-05-01T06:00:00"],
            "context": {"skipEmptyBuckets": True},
        }
    )
    # clicks are even event_ids: hours 0,2,4 have 2 clicks each (i, i+24)
    assert {r["timestamp"][:13] for r in out} == {
        "2024-05-01T00", "2024-05-01T02", "2024-05-01T04"
    }
    assert all(r["result"]["n"] == 2 for r in out)

    # next micro-batch arrives -> the same dataSource reflects it
    (src / "b2.json").write_text(json.dumps(
        {"event_id": 100, "ts": "2024-05-01T00:45:00", "event_type": "click",
         "value": 5.0}))
    q2 = realtime.realtime_index(
        realtime.file_stream(spark, str(src), EVENT_SCHEMA, fmt="json"),
        str(tmp_path / "tbl"), str(tmp_path / "ckpt"), time_column="ts"
    )
    q2.awaitTermination(120)
    catalog2 = Catalog(spark)
    catalog2.register("rt_events2", path=str(tmp_path / "tbl"), time_column="ts")
    out2 = DruidEngine(spark, catalog2).execute(
        {
            "queryType": "timeBoundary",
            "dataSource": "rt_events2",
        }
    )
    assert out2[0]["result"]["maxTime"].startswith("2024-05-01T23")
    n = DruidEngine(spark, catalog2).execute(
        {"queryType": "timeseries", "dataSource": "rt_events2", "granularity": "all",
         "aggregations": [{"type": "count", "name": "n"}],
         "intervals": ["2024-05-01T00:00:00/2024-05-02T00:00:00"]}
    )
    assert n[0]["result"]["n"] == 49


def test_remaining_aggregators(engine, duck):
    from tests.conftest import assert_df_matches_duck

    q = {
        "queryType": "groupBy",
        "dataSource": "events",
        "granularity": "all",
        "dimensions": ["event_type"],
        "aggregations": [
            {"type": "longMin", "name": "id_min", "fieldName": "event_id"},
            {"type": "longMax", "name": "id_max", "fieldName": "event_id"},
            {"type": "stringFirst", "name": "first_props", "fieldName": "props"},
            {"type": "stringLast", "name": "last_props", "fieldName": "props"},
            {"type": "floatSum", "name": "fsum", "fieldName": "value"},
        ],
        "postAggregations": [
            {"type": "doubleGreatest", "name": "g",
             "fields": [{"type": "fieldAccess", "fieldName": "id_min"},
                        {"type": "constant", "value": 500}]},
            {"type": "doubleLeast", "name": "l",
             "fields": [{"type": "fieldAccess", "fieldName": "id_max"},
                        {"type": "constant", "value": 500}]},
        ],
        "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
    }
    from pyspark.sql import functions as F

    df = engine.plan(q).drop("ts_bucket").withColumn("fsum", F.round("fsum", 4))
    sql = """
    SELECT event_type,
           CAST(min(event_id) AS BIGINT) AS id_min,
           CAST(max(event_id) AS BIGINT) AS id_max,
           arg_min(props, ts) AS first_props,
           arg_max(props, ts) AS last_props,
           round(sum(value), 4) AS fsum,
           greatest(CAST(min(event_id) AS DOUBLE), 500) AS g,
           least(CAST(max(event_id) AS DOUBLE), 500) AS l
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
    GROUP BY 1
    """
    assert_df_matches_duck(df, duck, sql)


def test_hyperunique_close_to_exact(engine):
    q = {
        "queryType": "timeseries",
        "dataSource": "events",
        "granularity": "all",
        "aggregations": [{"type": "hyperUnique", "name": "u", "fieldName": "user_id"}],
        "intervals": ["2024-01-01T00:00:00/2024-02-01T00:00:00"],
    }
    approx = engine.execute(q)[0]["result"]["u"]
    exact = engine.execute(
        dict(q, context={"useExactCountDistinct": True})
    )[0]["result"]["u"]
    assert abs(approx - exact) / max(exact, 1) < 0.1  # HLL++ within 10%


def test_priority_pool_plumbed(engine):
    out = engine.execute(
        {
            "queryType": "timeBoundary",
            "dataSource": "events",
            "context": {"priority": 10},
        }
    )
    assert out and out[0]["result"]["minTime"]


def test_kafka_value_decode_projection(spark, tmp_path):
    """KIS decode path (I4) without a broker: feed Kafka-shaped records
    (binary key/value + topic/partition/offset/timestamp) through the
    same projection kafka_stream applies, as a file-backed STREAM, and
    check the typed rows land in the realtime sink layout."""
    import json as _json
    from datetime import datetime, timezone

    events = [
        {"ts": "2024-01-01T00:00:05", "event_type": "click", "value": 1.5},
        {"ts": "2024-01-01T01:00:05", "event_type": "view", "value": 2.0},
        {"ts": "2024-01-02T00:00:05", "event_type": "click", "value": 3.0},
    ]
    kafka_shaped = spark.createDataFrame(
        [
            (None, _json.dumps(e).encode(), "events", 0, i,
             datetime(2024, 1, 1, tzinfo=timezone.utc))
            for i, e in enumerate(events)
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    src = str(tmp_path / "kafka_records")
    kafka_shaped.write.parquet(src)

    stream = realtime.file_stream(
        spark, src, kafka_shaped.schema, fmt="parquet"
    )
    decoded = realtime.decode_kafka_values(
        stream, "ts timestamp, event_type string, value double"
    )
    assert decoded.isStreaming
    dest = str(tmp_path / "sink")
    q = realtime.realtime_index(
        decoded, dest, str(tmp_path / "ckpt"), time_column="ts"
    )
    q.awaitTermination(120)
    out = spark.read.parquet(dest)
    assert out.count() == 3
    assert {r["event_type"] for r in out.collect()} == {"click", "view"}
    assert dict(out.dtypes)["value"] == "double"
    assert out.select(realtime.DT_COLUMN).distinct().count() == 2


def test_kafka_stream_end_to_end_via_mock_source(spark, tmp_path):
    """I4 smoke: kafka_stream executes its full production graph —
    source.load() → decode_kafka_values → realtime_index checkpointed
    __dt sink — against the Kafka-schema Python data source
    (streaming/kafka_mock.py). Only the format name differs from a real
    broker run."""
    from coolplaydruid_spark.streaming.kafka_mock import register_kafka_mock

    register_kafka_mock(spark)
    stream = realtime.kafka_stream(
        spark,
        brokers="mock:9092",
        topic="events",
        value_schema=EVENT_SCHEMA,
        source_format="kafka_mock",
    )
    q = realtime.realtime_index(
        stream,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        time_column="ts",
        trigger_seconds=1,
        query_name="kis_smoke",
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            got = spark.read.parquet(str(tmp_path / "tbl"))
            if got.count() >= 20:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    got = spark.read.parquet(str(tmp_path / "tbl"))
    assert got.count() == 20  # numrecords default — exactly-once, no dupes
    assert "__dt" in got.columns  # segment layout matches batch ingest
    types = {r["event_type"] for r in got.select("event_type").distinct().collect()}
    assert types == {"click", "view", "purchase"}
    # decode really parsed the binary JSON values into typed columns
    assert dict(got.dtypes)["value"] == "double"
    assert dict(got.dtypes)["ts"] == "timestamp"


def test_kafka_mock_rollup_windows(spark, tmp_path):
    """KIS + ingest-time rollup: the Kafka-schema source feeding the
    watermarked tumbling-window aggregation path (Druid's rollup
    segments). Append mode emits only CLOSED windows — immutable
    segments — so counts per hour must equal the generator's schedule
    (one record every 30s → 120/hour) for every fully-closed window."""
    from pyspark.sql import functions as F

    from coolplaydruid_spark.streaming.kafka_mock import register_kafka_mock

    register_kafka_mock(spark)
    stream = (
        spark.readStream.format("kafka_mock")
        .option("subscribe", "events")
        .option("numrecords", "300")  # 30s apart → 2.5 hours of event time
        .option("batchsize", "64")
        .load()
    )
    decoded = realtime.decode_kafka_values(stream, EVENT_SCHEMA)
    q = realtime.realtime_index(
        decoded,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        time_column="ts",
        watermark="1 minute",
        rollup={
            "window": "1 hour",
            "dimensions": ["event_type"],
            "aggregations": [
                ("n", F.count(F.lit(1))),
                ("total", F.sum("value")),
            ],
        },
        trigger_seconds=1,
        query_name="kis_rollup_smoke",
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            import glob

            if glob.glob(str(tmp_path / "tbl" / "__dt=*/*.parquet")):
                got = spark.read.parquet(str(tmp_path / "tbl"))
                if got.count() >= 6:  # 2 closed hours x 3 event types
                    break
            time.sleep(0.5)
    finally:
        q.stop()

    got = spark.read.parquet(str(tmp_path / "tbl"))
    per_hour = {
        (r["ts"].isoformat(), r["event_type"]): r["n"]
        for r in got.collect()
    }
    # hours 0 and 1 are fully closed by the watermark (events reach 2.5h);
    # every closed (hour, type) cell holds 40 records (120/hour / 3 types)
    for h in ("2024-01-01T00:00:00", "2024-01-01T01:00:00"):
        for et in ("click", "view", "purchase"):
            assert per_hour.get((h, et)) == 40, (h, et, per_hour)


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="KAFKA_BOOTSTRAP not set — no broker in this environment; "
    "the mock-source test above is the standing CI gate",
)
def test_kafka_stream_against_real_broker(spark, tmp_path):
    """I4 opt-in: the same kafka_stream production graph against a LIVE
    broker (set KAFKA_BOOTSTRAP=host:port and optionally KAFKA_TOPIC).
    Publishes via Spark's batch Kafka sink, consumes via
    format('kafka'), lands a __dt-partitioned table — the one code path
    kafka_mock cannot prove. Requires spark-sql-kafka on the classpath
    wherever a broker exists."""
    import json as _json
    import time
    import uuid

    from coolplaydruid_spark.streaming import realtime

    brokers = os.environ["KAFKA_BOOTSTRAP"]
    topic = os.environ.get("KAFKA_TOPIC", f"cpd-spark-test-{uuid.uuid4().hex[:8]}")
    rows = [
        ("2024-01-01T00:00:05", "click", 1.5),
        ("2024-01-01T00:30:05", "view", 2.5),
        ("2024-01-01T01:00:05", "purchase", 3.5),
    ]
    payload = spark.createDataFrame(
        [(None, _json.dumps({"ts": ts, "event_type": et, "value": v}))
         for ts, et, v in rows],
        "key string, value string",
    )
    (payload.write.format("kafka")
     .option("kafka.bootstrap.servers", brokers)
     .option("topic", topic).save())

    stream = realtime.kafka_stream(
        spark, brokers, topic,
        "ts string, event_type string, value double",
        starting_offsets="earliest",
    )
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    q = realtime.realtime_index(
        stream, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
        time_column="ts", trigger_seconds=1,
        query_name="kafka_real_broker",
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            import glob

            if glob.glob(str(tmp_path / "tbl" / "__dt=*/*.parquet")):
                got = spark.read.parquet(str(tmp_path / "tbl"))
                if got.count() >= len(rows):
                    break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "tbl"))
    assert got.count() == len(rows)
    assert {r["event_type"] for r in got.collect()} == {"click", "view", "purchase"}


def test_map_only_quality_ops_run_in_streaming(spark, tmp_path):
    """The map-only pipeline signals (Gopher rules, dup-n-gram
    fractions) are pure projections, so the SAME operator code runs
    unchanged inside a Structured Streaming query — the cleaning half
    of a realtime ingest pipeline. Stream results must equal the batch
    run over the same rows."""
    import json as _json

    from coolplaydruid_spark.operators import text as text_ops

    src = tmp_path / "docs_src"
    src.mkdir()
    rows = [
        {"doc_id": i, "text": f"the quick value {'dup dup ' * (i % 3)}row {i}"}
        for i in range(20)
    ]
    (src / "b1.json").write_text("\n".join(_json.dumps(r) for r in rows))
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema).format("json").load(str(src))
    )

    def transform(df):
        g = text_ops.gopher_quality_filter(df, min_words=4, min_stop_hits=1)
        d = text_ops.dup_ngram_stats(df, ns=(2,))
        return g.join(d, on="doc_id")

    out = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("quality_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert out.awaitTermination(120), "streaming batch did not finish in 120s"

    batch_df = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows], schema
    )
    expected = {tuple(r) for r in transform(batch_df).collect()}
    got = {tuple(r) for r in spark.sql("SELECT * FROM quality_stream").collect()}
    assert got == expected and len(got) == 20


def test_map_only_media_fingerprints_run_in_streaming(spark, tmp_path):
    """The media near-dup SIGNATURE stages (image dHash, audio
    fingerprint) are map-only Arrow mapInPandas projections, so the
    same operator code runs unchanged inside a Structured Streaming
    query — the signature half of a realtime media-ingest pipeline
    (pairing then runs against the materialized signature table, the
    incremental shape). Stream results must equal the batch run."""
    from coolplaydruid_spark.operators import multimodal as mm

    rows = []
    for i in range(12):
        px = bytes((i * 31 + j * 7) % 256 for j in range(8 * 8 * 3))
        rows.append((i, mm.png_encode(px, 8, 8, 3),
                     mm.wav_encode(bytes((i * 13 + j) % 256
                                         for j in range(50 + i)))))
    schema = "media_id long, png binary, wav binary"
    src = tmp_path / "media_src"
    spark.createDataFrame(rows, schema).write.parquet(str(src))
    stream = spark.readStream.schema(schema).format("parquet").load(str(src))

    for name, col, op in [
        ("phash_stream", "png", mm.phash_signatures),
        ("afp_stream", "wav", mm.audio_fingerprint),
    ]:
        out = (
            op(stream.select("media_id", F.col(col).alias("media")))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert out.awaitTermination(120), f"{name} did not finish in 120s"
        batch = op(
            spark.createDataFrame(rows, schema)
            .select("media_id", F.col(col).alias("media"))
        )
        expected = {tuple(r) for r in batch.collect()}
        got = {tuple(r) for r in
               spark.sql(f"SELECT * FROM {name}").collect()}
        assert got == expected and len(got) == 12, name
