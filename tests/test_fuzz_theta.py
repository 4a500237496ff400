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


# ---- approx mode (context.useApproxTheta) under the same fuzzer ------
# The HLL plan supports set-op trees whose INTERSECT/NOT operands are
# union-representable (fieldAccess or UNION subtrees); estimates come
# from sketch unions + inclusion-exclusion. Oracle = the EXACT engine
# result (itself DuckDB-verified above): approx must land within the
# sketch error band of exact for every bucket and every estimate.

def _gen_operand(rng: random.Random, leaves):
    """fieldAccess leaf or a UNION of leaves — the union-representable
    operand shapes the approx plan accepts."""
    if rng.random() < 0.5 or len(leaves) < 2:
        nm, _ = rng.choice(leaves)
        return {"type": "fieldAccess", "fieldName": nm}
    subs = rng.sample(leaves, rng.randint(2, min(3, len(leaves))))
    return {"type": "thetaSketchSetOp", "func": "UNION",
            "fields": [{"type": "fieldAccess", "fieldName": nm}
                       for nm, _ in subs]}


def gen_theta_approx(rng: random.Random):
    k = rng.randint(2, 3)
    chosen = rng.sample(PREDS, k)
    aggs, leaves = [], []
    for i, (filt, _) in enumerate(chosen):
        nm = f"t{i}"
        aggs.append({
            "type": "filtered", "name": nm, "filter": filt,
            "aggregator": {"type": "thetaSketch", "name": nm,
                           "fieldName": "user_id"},
        })
        leaves.append((nm, None))
    func = rng.choice(["UNION", "INTERSECT", "NOT"])
    n_ops = 2 if func == "NOT" else rng.randint(2, 3)
    tree = {"type": "thetaSketchSetOp", "func": func,
            "fields": [_gen_operand(rng, leaves) for _ in range(n_ops)]}
    post = [{"type": "thetaSketchEstimate", "name": "est", "field": tree}]
    for nm, _ in leaves:
        post.append({"type": "thetaSketchEstimate", "name": f"n_{nm}",
                     "field": {"type": "fieldAccess", "fieldName": nm}})
    q = {
        "queryType": "timeseries",
        "dataSource": "events",
        "granularity": "day" if rng.random() < 0.5 else "all",
        "aggregations": aggs,
        "postAggregations": post,
        "intervals": IV,
        "context": {"skipEmptyBuckets": True},
    }
    ests = ["est"] + [f"n_{nm}" for nm, _ in leaves]
    return q, ests


def test_fuzz_theta_approx_mode(engine):
    rng = random.Random(SEED + 53)
    failures = []
    checked_plan = False
    for idx in range(max(20, N_SPECS // 2)):
        q, ests = gen_theta_approx(rng)
        try:
            exact = {r[0]: r.asDict()
                     for r in engine.plan(json.loads(json.dumps(q)))
                     .collect()}
            qa = json.loads(json.dumps(q))
            qa["context"]["useApproxTheta"] = True
            adf = engine.plan(qa)
            if not checked_plan:
                plan = adf._jdf.queryExecution().executedPlan().toString()
                assert "hll_sketch_agg" in plan.lower(), plan
                checked_plan = True
            approx = {r[0]: r.asDict() for r in adf.collect()}
            assert set(exact) == set(approx), "bucket sets differ"
            for b, e in exact.items():
                a = approx[b]
                # upper bound on any union magnitude in this bucket =
                # sum of exact leaf estimates; lgK=12 3σ ≈ 5%, with
                # inclusion-exclusion summing ≤7 correlated union
                # terms — 15% of that bound + 3 absolute holds with
                # wide margin unless the sketch algebra is wrong
                # (which errs at O(U))
                u_bound = sum(e[k] for k in ests if k != "est")
                tol = max(3.0, 0.15 * max(u_bound, 1))
                for k in ests:
                    assert abs(a[k] - e[k]) <= tol, (b, k, e[k], a[k], tol)
        except AssertionError as err:
            failures.append((idx, q, str(err)))
        except Exception as err:  # noqa: BLE001
            failures.append((idx, q, f"{type(err).__name__}: {err}"))
    if failures:
        msg = [f"{len(failures)} approx-theta specs failed "
               f"(seed={SEED + 53}); first 3:"]
        for idx, q, err in failures[:3]:
            msg.append(f"--- #{idx} ---\n{json.dumps(q, indent=1)}\n"
                       f" {err[:1500]}")
        raise AssertionError("\n".join(msg))


def test_fuzz_theta_approx_rejects_nested_intersections(engine):
    """Trees whose INTERSECT/NOT operands are not union-representable
    must fail loudly in approx mode (documented exact-mode boundary) —
    for every draw, not just the one fixed case in test_theta.py."""
    import pytest as _pytest

    rng = random.Random(SEED + 54)
    for _ in range(10):
        inner = {"type": "thetaSketchSetOp",
                 "func": rng.choice(["INTERSECT", "NOT"]),
                 "fields": [{"type": "fieldAccess", "fieldName": "t0"},
                            {"type": "fieldAccess", "fieldName": "t1"}]}
        outer = {"type": "thetaSketchSetOp",
                 "func": rng.choice(["INTERSECT", "NOT"]),
                 "fields": [inner,
                            {"type": "fieldAccess", "fieldName": "t1"}]}
        q = {
            "queryType": "timeseries", "dataSource": "events",
            "granularity": "all", "intervals": IV,
            "context": {"useApproxTheta": True},
            "aggregations": [
                {"type": "filtered", "name": nm, "filter": filt,
                 "aggregator": {"type": "thetaSketch", "name": nm,
                                "fieldName": "user_id"}}
                for nm, (filt, _) in zip(["t0", "t1"], PREDS[:2])
            ],
            "postAggregations": [
                {"type": "thetaSketchEstimate", "name": "x",
                 "field": outer}],
        }
        with _pytest.raises(ValueError, match="exact mode"):
            engine.plan(q).collect()
