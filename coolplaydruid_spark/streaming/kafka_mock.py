"""Broker-free Kafka stand-in: a Python streaming data source (PySpark 4
``pyspark.sql.datasource`` API) that emits records with the EXACT schema
of Spark's Kafka source — key/value binary, topic/partition/offset,
timestamp, timestampType — so the Kafka Indexing Service path
(data-ingest/kis.md:1-3, I4) can execute source → checkpoint → __dt sink
end-to-end in CI.

This is a test harness, not a Kafka client: records are deterministic
JSON events generated from the subscribed topic name. Offset tracking is
real, though — the reader hands Structured Streaming monotonic offsets
and replays ranges on request, which is precisely the contract the real
Kafka source implements (exactly-once = offsets in the checkpoint +
idempotent sink), so checkpoint/recovery semantics are exercised
faithfully.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The schema Spark's Kafka source emits, field for field.
KAFKA_RECORD_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)

EVENT_TYPES = ["click", "view", "purchase"]
BASE_TS = datetime(2024, 1, 1, 0, 0, 0)


def _record(topic: str, offset: int):
    """Deterministic Kafka-shaped record #offset for a topic."""
    ts = BASE_TS + timedelta(seconds=30 * offset)
    payload = {
        "event_id": offset,
        "ts": ts.strftime("%Y-%m-%d %H:%M:%S"),
        "event_type": EVENT_TYPES[offset % len(EVENT_TYPES)],
        "value": round(0.5 + (offset % 7) * 1.25, 2),
    }
    return (
        str(offset % 4).encode(),  # key: a 4-way entity id
        json.dumps(payload).encode(),
        topic,
        0,
        offset,
        ts,
        0,  # TimestampType.CREATE_TIME
    )


class _MockKafkaReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.topic = options.get("subscribe", "events")
        self.total = int(options.get("numrecords", 20))
        self.batch = int(options.get("batchsize", 8))

    def initialOffset(self) -> dict:  # noqa: N802 - API name
        return {"offset": 0}

    def read(self, start: dict):
        lo = start["offset"]
        hi = min(lo + self.batch, self.total)
        return (
            iter([_record(self.topic, o) for o in range(lo, hi)]),
            {"offset": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        # Replay for recovery — same deterministic records.
        return iter(
            [_record(self.topic, o) for o in range(start["offset"], end["offset"])]
        )


class KafkaMockDataSource(DataSource):
    """``spark.readStream.format("kafka_mock")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "kafka_mock"

    def schema(self):
        return KAFKA_RECORD_SCHEMA

    def simpleStreamReader(self, schema):  # noqa: N802 - API name
        return _MockKafkaReader(self.options)


def register_kafka_mock(spark) -> None:
    spark.dataSource.register(KafkaMockDataSource)
