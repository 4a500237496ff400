"""Metamorphic fuzzer for rollup routing (rollup.py): for ANY
aggregation query, an engine with a registered rollup must return
exactly what the raw-table engine returns — whether or not it chose to
route — and across a random query population some queries must route
(coarser aligned granularities, preserved dims) while others must fall
back (finer/unaligned granularity, dropped dims, non-rollup fields,
unaligned intervals). Routing correctness is the property the
hand-written tests sample; this sweeps the decision surface.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import math
import os
import random

import pytest

from coolplaydruid_spark.rollup import RollupSpec
from coolplaydruid_spark.sources import batch

SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
N_SPECS = int(os.environ.get("FUZZ_N", "60"))

ROLLUP_AGGS = [
    {"type": "count", "name": "cnt"},
    {"type": "doubleSum", "name": "sum_value", "fieldName": "value"},
    {"type": "doubleMax", "name": "max_value", "fieldName": "value"},
    {"type": "doubleMin", "name": "min_value", "fieldName": "value"},
]


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    """(routed_engine, raw_engine) over the same fixtures; the routed
    one carries an hourly events rollup with dims={event_type}."""
    from coolplaydruid_spark.catalog import register_fixtures
    from coolplaydruid_spark.engine import DruidEngine

    import conftest as cf

    dest = str(tmp_path_factory.mktemp("rollup_fuzz") / "events_hourly_fz")
    batch.index_task(
        spark,
        {"type": "table", "path": f"{cf.SF_DIR}/events.parquet"},
        dest,
        time_column="ts",
        rollup={
            "granularity": "hour",
            "dimensions": ["event_type"],
            "aggregations": ROLLUP_AGGS,
        },
    )
    catalog = register_fixtures(spark, cf.SF_DIR)
    batch.register_ingested(catalog, "events_hourly_fz", dest,
                            time_column="ts")
    routed = DruidEngine(spark, catalog)
    routed.register_rollup(RollupSpec(
        base="events",
        table="events_hourly_fz",
        granularity="hour",
        dimensions={"event_type"},
        aggregations=ROLLUP_AGGS,
    ))
    raw = DruidEngine(spark, register_fixtures(spark, cf.SF_DIR))
    return routed, raw


def gen_query(rng: random.Random):
    gran = rng.choice([
        "hour", "day", "week", "month",          # routable (aligned)
        "minute", "fifteen_minute",              # finer -> fallback
        {"type": "duration", "duration": 7200000},   # 2h: routable
        {"type": "duration", "duration": 5400000},   # 1.5h -> fallback
        "all",
    ])
    aggs = []
    pool = [
        ({"type": "count", "name": "rows"}, True),
        ({"type": "doubleSum", "name": "total", "fieldName": "value"}, True),
        ({"type": "doubleMax", "name": "vmax", "fieldName": "value"}, True),
        ({"type": "doubleMin", "name": "vmin", "fieldName": "value"}, True),
        # not materialized in the rollup -> must fall back to raw
        ({"type": "longSum", "name": "uid_sum", "fieldName": "user_id"},
         False),
    ]
    for spec, _ in rng.sample(pool, rng.randint(1, 3)):
        aggs.append(spec)
    q = {
        "queryType": rng.choice(["timeseries", "groupBy"]),
        "dataSource": "events",
        "granularity": gran,
        "aggregations": aggs,
        "context": {"skipEmptyBuckets": True},
    }
    # intervals: mostly day-aligned (routable), sometimes half-hour
    # offset (unaligned -> fallback)
    if rng.random() < 0.8:
        d1 = rng.randint(1, 10)
        d2 = rng.randint(d1 + 2, 28)
        q["intervals"] = [f"2024-01-{d1:02d}T00:00:00/2024-01-{d2:02d}T00:00:00"]
    else:
        q["intervals"] = ["2024-01-03T00:30:00/2024-01-20T00:30:00"]
    if q["queryType"] == "groupBy":
        q["dimensions"] = [{"type": "default", "dimension": "event_type",
                           "outputName": "et"}]
    # filters: preserved dim (routable) or dropped dim (fallback)
    r = rng.random()
    if r < 0.4:
        q["filter"] = {"type": "in", "dimension": "event_type",
                       "values": rng.sample(
                           ["click", "view", "purchase", "error"], 2)}
    elif r < 0.55:
        q["filter"] = {"type": "bound", "dimension": "user_id",
                       "lower": "5", "ordering": "numeric"}
    return q


def _rows(engine, q):
    """(sorted rows, DataFrame) — one plan() per query."""
    df = engine.plan(q)
    out = []
    for row in df.collect():
        out.append(tuple(row[c] for c in sorted(df.columns)))
    return sorted(out, key=lambda t: tuple(map(str, t))), df


def _row_eq(a, b) -> bool:
    # routed sums re-aggregate hourly partials, so float addition order
    # differs from the raw path — isclose, not rounded equality
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6):
                return False
        elif x != y:
            return False
    return True


def test_fuzz_rollup_routing_metamorphic(engines):
    routed_eng, raw_eng = engines
    rng = random.Random(SEED)
    n_routed = n_raw = 0
    failures = []
    for idx in range(N_SPECS):
        q = gen_query(rng)
        try:
            a, adf = _rows(routed_eng, q)
            b, _ = _rows(raw_eng, q)
            if len(a) != len(b) or not all(
                _row_eq(x, y) for x, y in zip(a, b)
            ):
                bad = (next(((x, y) for x, y in zip(a, b)
                             if not _row_eq(x, y)), None)
                       if len(a) == len(b)
                       else ("rowcount", (len(a), len(b))))
                failures.append((idx, q, f"mismatch: {bad}"))
                continue
            plan = adf._jdf.queryExecution().executedPlan().toString()
            if "events_hourly_fz" in plan:
                n_routed += 1
            else:
                n_raw += 1
        except Exception as e:  # noqa: BLE001
            failures.append((idx, q, f"{type(e).__name__}: {e}"))
    if failures:
        import json

        msg = [f"{len(failures)}/{N_SPECS} rollup-metamorphic specs "
               f"failed (seed={SEED}); first 3:"]
        for idx, q, err in failures[:3]:
            msg.append(f"--- #{idx} ---\n{json.dumps(q, indent=1)}\n {err}")
        raise AssertionError("\n".join(msg))
    # the population must exercise BOTH routing outcomes
    assert n_routed >= 5, f"only {n_routed} queries routed"
    assert n_raw >= 5, f"only {n_raw} queries fell back"
