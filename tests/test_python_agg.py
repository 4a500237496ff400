"""Python-callable custom aggregator (Druid's `javascript` aggregator
extension point A9, with Python in place of JS — SURVEY §2.9). Runs as an
Arrow-batched GROUPED_AGG pandas UDF in a parallel groupBy joined back on
the group keys."""

import math

INTERVAL = ["2024-01-01T00:00:00/2024-02-01T00:00:00"]


def _make_log_mean():
    # Defined in a closure so cloudpickle serializes it by value — a
    # module-level test function would pickle by reference to a module
    # Spark executors can't import.
    import numpy as np
    import pandas as pd

    def log_mean(s: pd.Series) -> float:
        return float(np.log(s.clip(lower=0.001)).mean())

    return log_mean


def test_python_agg_with_jvm_aggs(engine, duck):
    _log_mean = _make_log_mean()
    q = {
        "queryType": "groupBy",
        "dataSource": "events",
        "granularity": "all",
        "dimensions": ["event_type"],
        "aggregations": [
            {"type": "javascript", "name": "log_mean", "fieldName": "value",
             "fn": _log_mean},
            {"type": "doubleSum", "name": "total", "fieldName": "value"},
        ],
        "intervals": INTERVAL,
    }
    rows = {r["event_type"]: r for r in engine.plan(q).collect()}
    oracle = duck.execute(
        """
        SELECT event_type, avg(ln(greatest(value, 0.001))) AS log_mean,
               sum(value) AS total
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-02-01'
        GROUP BY 1
        """
    ).fetchall()
    for etype, lm, total in oracle:
        assert math.isclose(rows[etype]["log_mean"], lm, rel_tol=1e-9)
        assert math.isclose(rows[etype]["total"], total, rel_tol=1e-9)


def test_python_agg_only_timeseries(engine):
    _log_mean = _make_log_mean()
    q = {
        "queryType": "timeseries",
        "dataSource": "events",
        "granularity": "day",
        "aggregations": [
            {"type": "javascript", "name": "log_mean", "fieldName": "value",
             "fn": _log_mean}
        ],
        "intervals": ["2024-01-01T00:00:00/2024-01-04T00:00:00"],
    }
    rows = engine.execute(q)
    assert len(rows) == 3
    assert all(isinstance(r["result"]["log_mean"], float) for r in rows)
