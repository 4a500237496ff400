"""Approx-mode error bands across synthetic distributions (round-5
verdict item #7): useApproxQuantile (percentile_approx) and the
approximate cardinality/hyperUnique paths were tolerance-gated at ONE
fixture only — here each runs over several deterministic synthetic
distributions (uniform, zipf-skewed keys, heavy-tail values, tiny-n) so
the sketch error claims hold beyond the fixture shape.

Data is generated JVM-side from spark.range + murmur hash (fixed seed in
Spark), so every run sees byte-identical tables with no Python loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.catalog import Catalog
from coolplaydruid_spark.engine import DruidEngine

IV = ["2024-01-01T00:00:00/2024-02-01T00:00:00"]

# name -> (n_rows, key_expr, value_expr) — u in [0,1) derives from the
# deterministic murmur hash of the row id
DISTS = {
    # high-cardinality uniform keys, uniform values
    "uniform": (20000, "CAST(u * 5000 AS BIGINT)", "u * 1000.0"),
    # zipf-ish: u^4 concentrates mass on few small keys (hot keys), but
    # the tail still reaches ~3000 distinct
    "zipf": (20000, "CAST(pow(u, 4) * 3000 AS BIGINT)", "u * 100.0"),
    # heavy-tail values: exp(8u) spans 1..~3000 with a long right tail
    "heavy_tail": (20000, "CAST(u * 800 AS BIGINT)", "exp(8.0 * u)"),
    # tiny-n: sketches must not blow up on nearly-empty input
    "tiny": (30, "CAST(u * 10 AS BIGINT)", "u * 10.0"),
}


@pytest.fixture(scope="module")
def approx_engine(spark):
    catalog = Catalog(spark)
    for name, (n, key_expr, val_expr) in DISTS.items():
        u = "(pmod(hash(id), 100000) / 100000.0)"
        df = spark.range(n).selectExpr(
            "id",
            "timestamp '2024-01-10 00:00:00' + make_dt_interval(0, 0, 0, id % 86400) AS ts",
            f"{key_expr.replace('u', u)} AS k",
            f"{val_expr.replace('u', u)} AS v",
        )
        catalog.register(f"dist_{name}", df=df, time_column="ts",
                         as_view=False)
    return DruidEngine(spark, catalog)


def _one(engine, source, aggs, context=None):
    spec = {
        "queryType": "timeseries",
        "dataSource": source,
        "granularity": "all",
        "intervals": IV,
        "aggregations": aggs,
        "context": context or {},
    }
    return engine.plan(spec).collect()[0].asDict()


@pytest.mark.parametrize("dist", list(DISTS))
def test_approx_quantile_band(approx_engine, dist):
    """percentile with context.useApproxQuantile must land between the
    exact quantiles at p ± 0.01 — percentile_approx's default accuracy
    is 10000 (rank error 1e-4), so a 1e-2 rank band is 100x slack, and
    rank bands stay meaningful on heavy-tail value scales where a fixed
    value tolerance would not."""
    src = f"dist_{dist}"
    n = DISTS[dist][0]
    for p in (0.1, 0.5, 0.99):
        # percentile_approx returns a nearest-rank DATA value (no
        # interpolation), so at tiny n one row is 1/n of rank — the
        # band must cover at least ±1.5 rows
        eps = max(0.01, 1.5 / n)
        lo_p, hi_p = max(0.0, p - eps), min(1.0, p + eps)
        exact = _one(approx_engine, src, [
            {"type": "percentile", "name": "lo", "fieldName": "v",
             "probability": lo_p},
            {"type": "percentile", "name": "hi", "fieldName": "v",
             "probability": hi_p},
        ])
        approx = _one(approx_engine, src, [
            {"type": "percentile", "name": "q", "fieldName": "v",
             "probability": p},
        ], context={"useApproxQuantile": True})
        q = approx["q"]
        slack = max(1e-6, 1e-9 * abs(exact["hi"]))
        assert exact["lo"] - slack <= q <= exact["hi"] + slack, (
            dist, p, exact, q)


@pytest.mark.parametrize("dist", list(DISTS))
def test_approx_cardinality_band(approx_engine, dist):
    """cardinality/hyperUnique without useExactCountDistinct run
    approx_count_distinct (HLL++, rsd 5%) — estimates must land within
    3 standard deviations (15%) + a small absolute floor of exact, on
    every distribution shape."""
    src = f"dist_{dist}"
    exact = _one(approx_engine, src, [
        {"type": "cardinality", "name": "card", "fields": ["k"]},
        {"type": "hyperUnique", "name": "hll", "fieldName": "k"},
    ], context={"useExactCountDistinct": True})
    approx = _one(approx_engine, src, [
        {"type": "cardinality", "name": "card", "fields": ["k"]},
        {"type": "hyperUnique", "name": "hll", "fieldName": "k"},
    ])
    for key in ("card", "hll"):
        tol = max(3, 0.15 * exact["card"])
        assert abs(approx[key] - exact["card"]) <= tol, (
            dist, key, exact["card"], approx[key])


@pytest.mark.parametrize("dist", ["uniform", "zipf", "tiny"])
def test_approx_quantile_grouped_band(approx_engine, dist):
    """Grouped approx quantiles (the mergeable, 100 TB-relevant form):
    per-group estimates obey the same rank band as the global ones."""
    src = f"dist_{dist}"
    # 5 groups -> per-group n is DISTS[n]/5; nearest-rank band scales
    # with the per-group row count (see test_approx_quantile_band).
    # Below ~10 rows per group one order statistic spans > 0.15 of rank,
    # so the only meaningful band is the group's full [min, max] range.
    per_group = DISTS[dist][0] / 5
    eps = 0.5 if per_group < 10 else max(0.05, 1.5 / per_group)
    spec = {
        "queryType": "groupBy",
        "dataSource": src,
        "granularity": "all",
        "dimensions": [{"type": "default", "dimension": "g",
                        "outputName": "g"}],
        "virtualColumns": [{"type": "expression", "name": "g",
                            "expression": "k % 5"}],
        "intervals": IV,
        "aggregations": [
            {"type": "percentile", "name": "lo", "fieldName": "v",
             "probability": max(0.0, 0.5 - eps)},
            {"type": "percentile", "name": "hi", "fieldName": "v",
             "probability": min(1.0, 0.5 + eps)},
        ],
    }
    exact = {r["g"]: r.asDict()
             for r in approx_engine.plan(spec).collect()}
    aspec = dict(
        spec,
        aggregations=[{"type": "percentile", "name": "q", "fieldName": "v",
                       "probability": 0.5}],
        context={"useApproxQuantile": True},
    )
    approx = {r["g"]: r.asDict()
              for r in approx_engine.plan(aspec).collect()}
    assert set(exact) == set(approx)
    for g, e in exact.items():
        q = approx[g]["q"]
        slack = max(1e-6, 1e-9 * abs(e["hi"]))
        assert e["lo"] - slack <= q <= e["hi"] + slack, (dist, g, e, q)
