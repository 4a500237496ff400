"""Pin the minhash verify-join's SHUFFLE-FALLBACK cost model (r13
verdict #2): the 100 TB claim for minhash_lsh_dedup must hold in BOTH
plan outcomes AQE can pick for the candidate-side joins.

Normal outcome: AQE broadcasts the (tiny) candidate/member tables and
only band buckets + candidate streams shuffle. Fallback outcome: AQE
declines the broadcast (stats too large / conservative) and every join
runs as a shuffle join — then the shingle table crosses the wire a
bounded number of times, i.e. the cost is LINEAR in corpus shingles
plus the candidate-member shingle stream, and categorically never
O(candidates × shingles). r13 measured exactly this flip in the wild:
84,294 vs 607,172 shuffle records for the same query, same data, same
256 output pairs — both linear, 7× apart, which is why the scale gate
now ratios candidate volume (evidence.py) and this test pins the
fallback's record bound instead.

The test forces the fallback deterministically (static AND adaptive
broadcast thresholds = -1, so no join can broadcast) in a subprocess
session with the stage-metrics UI enabled, then asserts

    total shuffle_write_records <= K * (sh + banded + stream + pairs)

with K = 6 covering the enumerated exchanges (shingle distinct,
signature groupBy, band self-join x2 sides, candidate distinct, member
distinct, semi-join reduction, pair-member join, seen-twice groupBy,
sizes attach) — generous for linear noise, ~10x below the quadratic
class at this scale (candidates x shingles). A subprocess because the
suite session pins spark.ui.enabled=false (not runtime-settable) and
the forced thresholds must not leak into other tests.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# sf0.01 gives real shingle volume (~25k rows) while staying fast; the
# default suite fixture sf0.001 would make the linear terms so small
# that constant overheads dominate the bound.
COST_SF_DIR = os.environ.get("SPARK_GRAFT_COST_SF_DIR", "/root/testdata/sf0.01")

_SCRIPT = r"""
import json, sys
sys.path.insert(0, %(root)r)
from pyspark.sql import functions as F
from coolplaydruid_spark.session import get_spark
from coolplaydruid_spark.operators import dedup
from coolplaydruid_spark import evidence
import bench

spark = get_spark(
    app_name="fallback_cost", master="local[8]", shuffle_partitions=8,
    extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "100000",
        # Force the shuffle-fallback path for EVERY join: neither the
        # static planner nor AQE's runtime re-plan may broadcast.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    },
)
docs = spark.read.parquet(%(sf)r + "/documents.parquet")

with evidence.capture() as sink:
    pairs_df = dedup.minhash_lsh_dedup(docs, threshold=0.5, cache=True)
stats = evidence.candidate_stats(sink)

plan = pairs_df._jdf.queryExecution().executedPlan().toString()

before = bench._stage_totals(spark)
n_out = pairs_df.count()
after = bench._stage_totals(spark)
shuffled = after["shuffle_write_records"] - before["shuffle_write_records"]

# Deterministic linear terms of the cost model, from the data itself:
sh = dedup.shingles(docs, as_hash=True)
sh_rows = sh.count()
banded_rows = stats["blocked_rows"]
cand = stats["candidate_pairs"]
# candidate-member shingle stream: sum over verified pairs' members of
# their shingle-set sizes (what the seen-twice groupBy actually carries)
sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
raw_pairs = dedup.minhash_lsh_dedup(docs, threshold=-1.0, cache=True)
stream = (
    raw_pairs.select(F.explode(F.array("doc_a", "doc_b")).alias("doc_id"))
    .join(sizes, on="doc_id")
    .agg(F.sum("n"))
    .collect()[0][0]
    or 0
)
print(json.dumps({
    "plan_has_broadcast": "BroadcastHashJoin" in plan
                          or "BroadcastNestedLoopJoin" in plan,
    "plan_has_shuffle_join": "SortMergeJoin" in plan
                             or "ShuffledHashJoin" in plan,
    "shuffled": shuffled, "sh_rows": sh_rows, "banded_rows": banded_rows,
    "candidates": cand, "stream": int(stream), "n_out": n_out,
}))
"""


def test_minhash_verify_fallback_is_linear_in_shingles():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"root": ROOT, "sf": COST_SF_DIR}],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])

    # The fallback path is actually pinned: no broadcast join anywhere,
    # and the shuffle-join form is present.
    assert not out["plan_has_broadcast"], out
    assert out["plan_has_shuffle_join"], out
    assert out["n_out"] > 0, "vacuous: no near-dup pairs at this SF"

    linear_budget = 6 * (out["sh_rows"] + out["banded_rows"]
                         + out["stream"] + out["candidates"])
    quadratic_floor = out["candidates"] * out["sh_rows"]
    assert out["shuffled"] <= linear_budget, (
        f"fallback shuffled {out['shuffled']} records — exceeds the "
        f"linear cost model {linear_budget} "
        f"(sh={out['sh_rows']}, banded={out['banded_rows']}, "
        f"stream={out['stream']}, cand={out['candidates']}); "
        "the verify join is no longer shingle-linear in the fallback")
    # the model itself must discriminate: the budget sits far below the
    # pairs x shingles quadratic class at this scale
    assert linear_budget < quadratic_floor / 2, (
        "cost model lost discrimination at this SF "
        f"(budget={linear_budget}, quadratic={quadratic_floor})")
