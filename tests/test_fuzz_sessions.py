"""Fuzzer for sequence analytics (operators/sessions.py): sessionize
with random gap thresholds (session boundaries are exactly the
gap >= threshold points — off-by-one-second bugs live here) and
ordered funnels with random step sequences and conversion windows,
each vs DuckDB oracles built on the contract's proven patterns.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import functions as F

from conftest import assert_df_matches_duck
from coolplaydruid_spark.operators import sessions

SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
N_SPECS = int(os.environ.get("FUZZ_N", "24"))

STEPS_POOL = ["click", "view", "purchase", "signup", "error"]


def test_fuzz_sessionize_gaps(spark, duck):
    rng = random.Random(SEED)
    df = spark.read.parquet(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                       "/root/testdata/sf0.001") + "/events.parquet")
    for _ in range(max(8, N_SPECS // 3)):
        gap = rng.choice([60, 300, 600, 1777, 3600, 7200, 43200])
        out = (
            sessions.sessionize(df, gap_seconds=gap)
            .groupBy("user_id", "session_seq")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
        )
        sql = f"""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                           >= {gap}::BIGINT * 1000000
                      THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
        ), numbered AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id
                      ORDER BY epoch_us(ts)
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_seq
          FROM marked
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               CAST(count(*) AS BIGINT) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM numbered GROUP BY 1, 2
        """
        assert_df_matches_duck(
            out.select("user_id", "session_seq", "n_events",
                       "session_start", "session_end"),
            duck, sql,
        )


def test_fuzz_funnel_conversion(spark, duck):
    rng = random.Random(SEED + 1)
    df = spark.read.parquet(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                       "/root/testdata/sf0.001") + "/events.parquet")
    for _ in range(max(8, N_SPECS // 3)):
        k = rng.randint(2, 3)
        steps = rng.sample(STEPS_POOL, k)
        within = rng.choice([None, 3600, 6 * 3600, 86400, 7 * 86400])
        out = sessions.funnel_conversion(df, steps,
                                         within_seconds=within)
        ctes = [
            f"s0 AS (SELECT user_id, min(ts) AS t0 FROM events "
            f"WHERE event_type = '{steps[0]}' GROUP BY 1)"
        ]
        for i in range(1, k):
            wcond = (
                f" AND epoch_us(e.ts) - epoch_us(s{i-1}.t0) "
                f"<= {within}::BIGINT * 1000000" if within is not None else ""
            )
            prev_t = f"s{i-1}.t{i-1}"
            carry_t0 = "s0.t0" if i == 1 else f"s{i-1}.t0"
            ctes.append(
                f"s{i} AS (SELECT e.user_id, {carry_t0} AS t0, "
                f"min(e.ts) AS t{i} FROM events e "
                f"JOIN s{i-1} ON e.user_id = s{i-1}.user_id "
                f"WHERE e.event_type = '{steps[i]}' "
                f"AND e.ts > {prev_t}{wcond} GROUP BY 1, 2)"
            )
        selects = [
            f"SELECT CAST({i} AS BIGINT) AS step_index, "
            f"'{steps[i]}' AS step, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM s{i}) AS n_users"
            for i in range(k)
        ]
        sql = "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(selects)
        assert_df_matches_duck(
            out.select("step_index", "step", "n_users"), duck, sql)
