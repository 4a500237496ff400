"""movingAverage fuzzer (plans/moving_average.py): random averager
type × inner aggregator × window size × granularity × optional
dimension, each paired at generation time with a DuckDB oracle built
from the contract's proven pattern (warm-up-expanded spine, zero-fill
for count/sum metrics, NULL-skip for min/max metrics, window function,
QUALIFY back to the requested interval).

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import os
import random

from conftest import assert_df_matches_duck

SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
N_SPECS = int(os.environ.get("FUZZ_N", "40"))

GRANS = {
    "day": ("1 DAY", 86400),
    "hour": ("1 HOUR", 3600),
}

# inner aggregator: (spec, inner_sql, fill_sql or None, bigint)
AGGS = [
    ({"type": "count", "name": "m"}, "CAST(count(*) AS BIGINT)", "0", True),
    ({"type": "doubleSum", "name": "m", "fieldName": "value"},
     "sum(value)", "0.0", False),
    ({"type": "longSum", "name": "m", "fieldName": "user_id"},
     "CAST(sum(user_id) AS BIGINT)", "0", True),
    ({"type": "doubleMax", "name": "m", "fieldName": "value"},
     "max(value)", None, False),
]

AVERAGERS = {
    "doubleMean": "avg",
    "doubleSum": "sum",
    "doubleMax": "max",
    "doubleMin": "min",
}


def gen_movavg(rng: random.Random):
    gname = rng.choice(list(GRANS))
    step_sql, step_s = GRANS[gname]
    agg_spec, agg_sql, fill, big = rng.choice(AGGS)
    av_type = rng.choice(list(AVERAGERS))
    b = rng.randint(2, 6)
    by_dim = rng.random() < 0.5
    d1 = rng.randint(3, 10)
    d2 = rng.randint(d1 + 4, 24)
    start = f"2024-01-{d1:02d} 00:00:00"
    end = f"2024-01-{d2:02d} 00:00:00"
    q = {
        "queryType": "movingAverage",
        "dataSource": "events",
        "granularity": gname,
        "aggregations": [agg_spec],
        "averagers": [{"type": av_type, "name": "av", "fieldName": "m",
                       "buckets": b}],
        "intervals": [f"2024-01-{d1:02d}T00:00:00/2024-01-{d2:02d}T00:00:00"],
    }
    if by_dim:
        q["dimensions"] = ["event_type"]

    warm = (b - 1) * step_s
    exp_start = f"TIMESTAMP '{start}' - INTERVAL {warm} SECOND"
    m_out = f"CAST(m AS BIGINT) AS m" if big else "m"
    fill_expr = f"COALESCE(m, {fill})" if fill is not None else "m"
    win_fn = AVERAGERS[av_type]
    if by_dim:
        sql = f"""
        WITH spine AS (
          SELECT unnest(generate_series({exp_start},
              TIMESTAMP '{end}' - INTERVAL {step_sql},
              INTERVAL {step_sql})) AS ts_bucket
        ), agg AS (
          SELECT CAST(date_trunc('{gname}', ts) AS TIMESTAMP) AS ts_bucket,
                 event_type, {agg_sql} AS m
          FROM events
          WHERE ts >= {exp_start} AND ts < TIMESTAMP '{end}'
          GROUP BY 1, 2
        ), grid AS (
          SELECT s.ts_bucket, t.event_type
          FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM agg) t
        ), filled AS (
          SELECT grid.ts_bucket, grid.event_type, {fill_expr} AS m
          FROM grid LEFT JOIN agg ON grid.ts_bucket = agg.ts_bucket
                                 AND grid.event_type = agg.event_type
        )
        SELECT ts_bucket, event_type, {m_out},
               CAST({win_fn}(m) OVER (PARTITION BY event_type
                    ORDER BY ts_bucket
                    ROWS BETWEEN {b - 1} PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS av
        FROM filled
        QUALIFY ts_bucket >= TIMESTAMP '{start}'
        """
        cols = ["ts_bucket", "event_type", "m", "av"]
    else:
        sql = f"""
        WITH spine AS (
          SELECT unnest(generate_series({exp_start},
              TIMESTAMP '{end}' - INTERVAL {step_sql},
              INTERVAL {step_sql})) AS ts_bucket
        ), agg AS (
          SELECT CAST(date_trunc('{gname}', ts) AS TIMESTAMP) AS ts_bucket,
                 {agg_sql} AS m
          FROM events
          WHERE ts >= {exp_start} AND ts < TIMESTAMP '{end}'
          GROUP BY 1
        ), filled AS (
          SELECT spine.ts_bucket, {fill_expr} AS m
          FROM spine LEFT JOIN agg USING (ts_bucket)
        )
        SELECT ts_bucket, {m_out},
               CAST({win_fn}(m) OVER (ORDER BY ts_bucket
                    ROWS BETWEEN {b - 1} PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS av
        FROM filled
        QUALIFY ts_bucket >= TIMESTAMP '{start}'
        """
        cols = ["ts_bucket", "m", "av"]
    return q, sql, cols


def test_fuzz_moving_average(engine, duck):
    import json

    rng = random.Random(SEED)
    failures = []
    for idx in range(N_SPECS):
        q, sql, cols = gen_movavg(rng)
        try:
            df = engine.plan(json.loads(json.dumps(q))).select(*cols)
            assert_df_matches_duck(df, duck, sql)
        except AssertionError as e:
            failures.append((idx, q, sql, str(e)))
        except Exception as e:  # noqa: BLE001
            failures.append((idx, q, sql, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{N_SPECS} movingAverage specs failed "
               f"(seed={SEED}); first 3:"]
        for idx, q, sql, err in failures[:3]:
            msg.append(f"--- #{idx} ---\n{json.dumps(q, indent=1)}\n"
                       f"--- oracle ---\n{sql}\n {err[:1500]}")
        raise AssertionError("\n".join(msg))
