"""Theta-sketch set-op fuzzer (functions/theta.py, exact mode): random
filtered thetaSketch aggregators over user_id × random nested
UNION/INTERSECT/NOT trees (incl. estimates nested inside arithmetic
post-aggs — the r5 bug class), against DuckDB oracles that compute the
same set algebra with per-user bool_or flags. Exact mode makes the
comparison equality, not a tolerance band.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import json
import os
import random

from conftest import assert_df_matches_duck

SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
N_SPECS = int(os.environ.get("FUZZ_N", "40"))

TIME_WHERE = ("ts >= TIMESTAMP '2024-01-01' AND "
              "ts < TIMESTAMP '2024-01-15'")
IV = ["2024-01-01T00:00:00/2024-01-15T00:00:00"]

# paired (druid_filter, sql_pred) pools for the sketch filters
PREDS = [
    ({"type": "selector", "dimension": "event_type", "value": "click"},
     "event_type = 'click'"),
    ({"type": "selector", "dimension": "event_type", "value": "view"},
     "event_type = 'view'"),
    ({"type": "in", "dimension": "event_type",
      "values": ["purchase", "signup"]},
     "event_type IN ('purchase', 'signup')"),
    ({"type": "bound", "dimension": "value", "lower": "100",
      "ordering": "numeric"}, "value >= 100"),
    ({"type": "bound", "dimension": "value", "upper": "50",
      "upperStrict": True, "ordering": "numeric"}, "value < 50"),
]


def gen_setop(rng: random.Random, leaves: list[tuple[str, str]],
              depth: int = 0):
    """(postagg_field_spec, bool_sql_over_flags)."""
    if depth >= 2 or (depth > 0 and rng.random() < 0.45):
        nm, flag = rng.choice(leaves)
        return {"type": "fieldAccess", "fieldName": nm}, flag
    op = rng.choice(["UNION", "INTERSECT", "NOT"])
    n = 2 if op == "NOT" else rng.randint(2, 3)
    subs = [gen_setop(rng, leaves, depth + 1) for _ in range(n)]
    spec = {"type": "thetaSketchSetOp", "func": op,
            "fields": [s[0] for s in subs]}
    if op == "UNION":
        sql = "(" + " OR ".join(s[1] for s in subs) + ")"
    elif op == "INTERSECT":
        sql = "(" + " AND ".join(s[1] for s in subs) + ")"
    else:
        sql = f"({subs[0][1]} AND NOT {subs[1][1]})"
    return spec, sql


def gen_theta(rng: random.Random):
    k = rng.randint(2, 3)
    chosen = rng.sample(PREDS, k)
    aggs, flag_sqls, leaves = [], [], []
    for i, (filt, psql) in enumerate(chosen):
        nm = f"t{i}"
        aggs.append({
            "type": "filtered", "name": nm, "filter": filt,
            "aggregator": {"type": "thetaSketch", "name": nm,
                           "fieldName": "user_id"},
        })
        flag_sqls.append(f"bool_or({psql}) AS f{i}")
        leaves.append((nm, f"f{i}"))
    tree, tree_sql = gen_setop(rng, leaves)
    post = [{"type": "thetaSketchEstimate", "name": "est", "field": tree}]
    est_sqls = [
        ("est", f"CAST(sum(CASE WHEN {tree_sql} THEN 1 ELSE 0 END) "
                "AS BIGINT)")]
    # leaf estimates so every sketch is observable
    for nm, flag in leaves:
        post.append({"type": "thetaSketchEstimate", "name": f"n_{nm}",
                     "field": {"type": "fieldAccess", "fieldName": nm}})
        est_sqls.append(
            (f"n_{nm}",
             f"CAST(sum(CASE WHEN {flag} THEN 1 ELSE 0 END) AS BIGINT)"))
    # estimate nested inside an arithmetic post-agg (r5 bug class)
    with_ratio = rng.random() < 0.5
    if with_ratio:
        denom_nm, denom_flag = leaves[0]
        post.append({
            "type": "arithmetic", "name": "ratio", "fn": "/",
            "fields": [
                {"type": "thetaSketchEstimate", "field": tree},
                {"type": "thetaSketchEstimate",
                 "field": {"type": "fieldAccess", "fieldName": denom_nm}},
            ],
        })
        est_sqls.append(
            ("ratio",
             f"round(CASE WHEN sum(CASE WHEN {denom_flag} THEN 1 ELSE 0 "
             f"END) = 0 THEN 0.0 ELSE sum(CASE WHEN {tree_sql} THEN 1 "
             f"ELSE 0 END) * 1.0 / sum(CASE WHEN {denom_flag} THEN 1 "
             "ELSE 0 END) END, 6)"))

    gran_day = rng.random() < 0.5
    q = {
        "queryType": "timeseries",
        "dataSource": "events",
        "granularity": "day" if gran_day else "all",
        "aggregations": aggs,
        "postAggregations": post,
        "intervals": IV,
        "context": {"skipEmptyBuckets": True},
    }
    sel = ", ".join(f"{s} AS {n}" for n, s in est_sqls)
    if gran_day:
        sql = f"""
        WITH flags AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ts_bucket,
                 user_id, {', '.join(flag_sqls)}
          FROM events WHERE {TIME_WHERE} GROUP BY 1, 2
        )
        SELECT ts_bucket, {sel} FROM flags GROUP BY 1
        """
        cols = ["ts_bucket"] + [n for n, _ in est_sqls]
    else:
        sql = f"""
        WITH flags AS (
          SELECT user_id, {', '.join(flag_sqls)}
          FROM events WHERE {TIME_WHERE} GROUP BY 1
        )
        SELECT {sel} FROM flags
        """
        cols = [n for n, _ in est_sqls]
    return q, sql, cols


def test_fuzz_theta_setops(engine, duck):
    rng = random.Random(SEED)
    failures = []
    for idx in range(N_SPECS):
        q, sql, cols = gen_theta(rng)
        try:
            df = engine.plan(json.loads(json.dumps(q)))
            if "ratio" in cols:
                from pyspark.sql import functions as F

                df = df.withColumn("ratio", F.round("ratio", 6))
            assert_df_matches_duck(df.select(*cols), duck, sql)
        except AssertionError as e:
            failures.append((idx, q, sql, str(e)))
        except Exception as e:  # noqa: BLE001
            failures.append((idx, q, sql, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{N_SPECS} theta specs failed "
               f"(seed={SEED}); first 3:"]
        for idx, q, sql, err in failures[:3]:
            msg.append(f"--- #{idx} ---\n{json.dumps(q, indent=1)}\n"
                       f"--- oracle ---\n{sql}\n {err[:1500]}")
        raise AssertionError("\n".join(msg))
