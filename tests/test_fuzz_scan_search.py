"""Fuzzer for the row-delivery query types: scan (order/limit/
projection/virtualColumns) and search (contains/fragment queries over
searchDimensions), paired with DuckDB oracles. Fixture ts values are
unique, so a time-ordered LIMIT selects a deterministic row set.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import json
import os
import random

from conftest import assert_df_matches_duck

SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
N_SPECS = int(os.environ.get("FUZZ_N", "60"))


def _iso(day: int) -> str:
    return f"2024-01-{day:02d}T00:00:00"


def _sqlts(day: int) -> str:
    return f"TIMESTAMP '2024-01-{day:02d} 00:00:00'"


FILTERS = [
    (None, None),
    ({"type": "selector", "dimension": "event_type", "value": "click"},
     "event_type = 'click'"),
    ({"type": "bound", "dimension": "value", "lower": "50",
      "ordering": "numeric"}, "value >= 50"),
    ({"type": "in", "dimension": "event_type",
      "values": ["view", "error"]}, "event_type IN ('view', 'error')"),
]


def gen_scan(rng: random.Random):
    d1 = rng.randint(1, 15)
    d2 = rng.randint(d1 + 2, 28)
    filt, fsql = rng.choice(FILTERS)
    where = f"ts >= {_sqlts(d1)} AND ts < {_sqlts(d2)}"
    if fsql:
        where += f" AND {fsql}"
    cols = rng.sample(["event_id", "user_id", "event_type", "value"],
                      rng.randint(1, 3))
    q = {
        "queryType": "scan",
        "dataSource": "events",
        "columns": cols + ["ts"],
        "intervals": [f"{_iso(d1)}/{_iso(d2)}"],
    }
    if filt:
        q["filter"] = filt
    order = rng.choice(["none", "ascending", "descending"])
    sel = ", ".join(cols + ["ts"])
    if order == "none":
        sql = f"SELECT {sel} FROM events WHERE {where}"
    else:
        limit = rng.randint(3, 40)
        q["order"] = order
        q["limit"] = limit
        direction = "ASC" if order == "ascending" else "DESC"
        sql = (f"SELECT {sel} FROM events WHERE {where} "
               f"ORDER BY ts {direction} LIMIT {limit}")
    return q, sql, cols + ["ts"]


def gen_search(rng: random.Random):
    d1 = rng.randint(1, 10)
    d2 = rng.randint(d1 + 3, 28)
    where = f"ts >= {_sqlts(d1)} AND ts < {_sqlts(d2)}"
    kind = rng.randrange(3)
    if kind == 0:
        v = rng.choice(["i", "ic", "ur", "ro", "VIE"])
        qspec = {"type": "insensitive_contains", "value": v}
        pred = f"contains(lower(event_type), '{v.lower()}')"
    elif kind == 1:
        v = rng.choice(["ick", "err", "sign"])
        qspec = {"type": "contains", "value": v, "caseSensitive": True}
        pred = f"contains(event_type, '{v}')"
    else:
        vals = rng.sample(["c", "i", "e", "r"], 2)
        qspec = {"type": "fragment", "values": vals,
                 "caseSensitive": True}
        pred = " AND ".join(f"contains(event_type, '{v}')" for v in vals)
    filt, fsql = rng.choice(FILTERS)
    q = {
        "queryType": "search",
        "dataSource": "events",
        "searchDimensions": ["event_type"],
        "query": qspec,
        "intervals": [f"{_iso(d1)}/{_iso(d2)}"],
    }
    if filt:
        q["filter"] = filt
        where += f" AND {fsql}"
    sql = (
        "SELECT 'event_type' AS dimension, event_type AS value, "
        "CAST(count(*) AS BIGINT) AS count "
        f"FROM events WHERE {where} AND {pred} GROUP BY 2"
    )
    return q, sql, ["dimension", "value", "count"]


def test_fuzz_scan_and_search(engine, duck):
    rng = random.Random(SEED)
    failures = []
    for idx in range(N_SPECS):
        q, sql, cols = (gen_scan(rng) if rng.random() < 0.6
                        else gen_search(rng))
        try:
            df = engine.plan(json.loads(json.dumps(q))).select(*cols)
            assert_df_matches_duck(df, duck, sql)
        except AssertionError as e:
            failures.append((idx, q, sql, str(e)))
        except Exception as e:  # noqa: BLE001
            failures.append((idx, q, sql, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{N_SPECS} scan/search specs failed "
               f"(seed={SEED}); first 3:"]
        for idx, q, sql, err in failures[:3]:
            msg.append(f"--- #{idx} ---\n{json.dumps(q, indent=1)}\n"
                       f"--- oracle ---\n{sql}\n {err[:1200]}")
        raise AssertionError("\n".join(msg))
