"""Streaming sessionization via native session_window: sessions close
when the watermark passes their end (append mode), batch/streaming run
the same operator code, and merged sessions count all their events."""

import json

from pyspark.sql import types as T

from coolplaydruid_spark.operators.sessions import session_window_stats
from coolplaydruid_spark.streaming import realtime

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def _rows(pairs):
    return "\n".join(
        json.dumps({"user_id": u, "ts": f"2024-06-01T{t}"}) for u, t in pairs
    )


def test_streaming_sessions_close_on_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # user 1: two events 5 min apart (one session), then nothing.
    (src / "b1.json").write_text(
        _rows([(1, "10:00:00"), (1, "10:05:00"), (2, "10:00:00")])
    )
    # a later batch advances the watermark far past user 1's session end,
    # forcing those sessions to close and emit.
    (src / "b2.json").write_text(_rows([(9, "13:00:00")]))

    stream = realtime.file_stream(spark, str(src), SCHEMA, fmt="json")
    sessions = session_window_stats(
        stream, gap="30 minutes", watermark="10 minutes"
    )
    collected = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    q = (
        sessions.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    by_user = {r.user_id: r for r in collected}
    assert 1 in by_user and 2 in by_user
    assert 9 not in by_user  # its session is still open (watermark hasn't passed)
    assert by_user[1].n_events == 2
    assert by_user[1].session_start.strftime("%H:%M") == "10:00"
    assert by_user[1].session_end.strftime("%H:%M") == "10:35"  # last event + gap
    assert by_user[2].n_events == 1


def test_session_window_batch_matches_streaming_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [
            (1, t0),
            (1, t0 + dt.timedelta(minutes=5)),
            (1, t0 + dt.timedelta(minutes=50)),  # > gap after 10:05+30 → new session
            (2, t0),
        ],
        "user_id long, ts timestamp",
    )
    out = session_window_stats(df, gap="30 minutes").orderBy("user_id", "session_start")
    got = [(r.user_id, r.n_events) for r in out.collect()]
    assert got == [(1, 2), (1, 1), (2, 1)]
