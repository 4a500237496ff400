"""Differential fuzzer for the join/lookup/inline dataSource surface
(engine.py _resolve_join — r6 verdict's least-fuzzed nontrivial compile
path).

A seeded generator draws random join dataSources — right-side kind
(inline / lookup / registered table / nested query) × joinType
(INNER/LEFT) × Druid-expression equi-conditions (plain, expression-
keyed, compound &&) × rightPrefix spelling — and derives the DuckDB
oracle JOIN from the SAME draw, at generation time, independent of the
engine's compile path (the inline/lookup right side becomes a VALUES
subquery built from the drawn rows). Each spec runs as a groupBy or
timeseries over the join and compares order-insensitively.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import os
import random

import pytest

from conftest import assert_df_matches_duck

N_SPECS = int(os.environ.get("FUZZ_N", "120"))
SEED = int(os.environ.get("FUZZ_SEED", "20260814"))

IV = ["2024-01-01T00:00:00/2024-02-01T00:00:00"]
IV_SQL = ("ts >= TIMESTAMP '2024-01-01 00:00:00' "
          "AND ts < TIMESTAMP '2024-02-01 00:00:00'")

# Fixture facts: events.event_type in {click, purchase, error, signup,
# view}; user_id long 0..14; value double; ts spans January 2024.
ET = ["click", "purchase", "error", "signup", "view"]
EXTRA = ["nope", "refund"]  # never-matching keys exercise LEFT semantics


def _values_sub(cols: list[str], rows: list[tuple], quote) -> str:
    """A DuckDB VALUES subquery mirroring an inline/lookup right side."""
    body = ", ".join(
        "(" + ", ".join(quote(v) for v in r) + ")" for r in rows
    )
    return f"(SELECT * FROM (VALUES {body}) AS t({', '.join(cols)}))"


def _q(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def gen_join(rng: random.Random):
    """One draw → (druid_query, oracle_sql)."""
    prefix = rng.choice(["r.", "x_", "j$", "rr_"])
    jt = rng.choice(["INNER", "LEFT"])
    kind = rng.choice(["inline_str", "inline_num", "lookup", "table",
                       "query", "compound"])

    if kind == "lookup":
        # registered lookup → two-column (k, v) frame
        keys = rng.sample(ET + EXTRA, rng.randint(2, 5))
        mapping = {k: f"g{rng.randint(0, 2)}" for k in keys}
        right = {"type": "lookup", "lookup": "__fuzz_lk"}
        right_sql = _values_sub(
            ["k", "v"], sorted(mapping.items()), _q)
        cond = f'event_type == "{prefix}k"'
        cond_sql = f"e.event_type = r.k"
        dim = f"{prefix}v"
        dim_sql = "r.v"
        lookup_map = mapping
    elif kind == "inline_str":
        keys = rng.sample(ET + EXTRA, rng.randint(1, 4))
        rows = [(k, f"w{rng.randint(1, 9)}") for k in keys]
        right = {"type": "inline", "columnNames": ["etype", "grp"],
                 "rows": [list(r) for r in rows]}
        right_sql = _values_sub(["etype", "grp"], rows, _q)
        if rng.random() < 0.3:
            # expression-keyed condition (left side is a Druid expr)
            cond = f'concat(event_type, \'!\') == "{prefix}etype"'
            cond_sql = "e.event_type || '!' = r.etype"
            rows2 = [(k + "!", g) for k, g in rows]
            right["rows"] = [list(r) for r in rows2]
            right_sql = _values_sub(["etype", "grp"], rows2, _q)
        else:
            cond = f'event_type == "{prefix}etype"'
            cond_sql = "e.event_type = r.etype"
        dim = f"{prefix}grp"
        dim_sql = "r.grp"
        lookup_map = None
    elif kind == "inline_num":
        uids = rng.sample(range(0, 20), rng.randint(2, 6))
        rows = [(u, f"band{u % 3}") for u in uids]
        right = {"type": "inline", "columnNames": ["uid", "band"],
                 "rows": [list(r) for r in rows]}
        right_sql = _values_sub(["uid", "band"], rows, _q)
        cond = f'user_id == "{prefix}uid"'
        cond_sql = "e.user_id = r.uid"
        dim = f"{prefix}band"
        dim_sql = "r.band"
        lookup_map = None
    elif kind == "table":
        # nation: n_nationkey 0..24 overlaps user_id 0..14
        right = "nation"
        right_sql = "(SELECT * FROM nation)"
        cond = f'user_id == "{prefix}n_nationkey"'
        cond_sql = "e.user_id = r.n_nationkey"
        dim = f"{prefix}n_name"
        dim_sql = "r.n_name"
        lookup_map = None
    elif kind == "query":
        # right = per-type aggregate of events itself
        right = {
            "type": "query",
            "query": {
                "queryType": "groupBy", "dataSource": "events",
                "granularity": "all", "dimensions": ["event_type"],
                "intervals": IV,
                "aggregations": [{"type": "count", "name": "tn"}],
            },
        }
        right_sql = ("(SELECT event_type, count(*) AS tn FROM events "
                     f"WHERE {IV_SQL} GROUP BY event_type)")
        cond = f'event_type == "{prefix}event_type"'
        cond_sql = "e.event_type = r.event_type"
        dim = f"{prefix}event_type"
        dim_sql = "r.event_type"
        lookup_map = None
    else:  # compound && condition over an inline right
        keys = rng.sample(ET, rng.randint(2, 4))
        rows = [(k, rng.randint(0, 14), f"c{rng.randint(0, 2)}")
                for k in keys]
        right = {"type": "inline", "columnNames": ["etype", "uid", "tag"],
                 "rows": [list(r) for r in rows]}
        right_sql = _values_sub(["etype", "uid", "tag"], rows, _q)
        cond = (f'event_type == "{prefix}etype" && '
                f'user_id == "{prefix}uid"')
        cond_sql = "e.event_type = r.etype AND e.user_id = r.uid"
        dim = f"{prefix}tag"
        dim_sql = "r.tag"
        lookup_map = None

    ds = {"type": "join", "left": "events", "right": right,
          "rightPrefix": prefix, "condition": cond, "joinType": jt}
    how = "JOIN" if jt == "INNER" else "LEFT JOIN"

    shape = rng.random()
    if shape < 0.18:
        # timeseries count over the join (no dimension)
        q = {
            "queryType": "timeseries", "dataSource": ds,
            "granularity": "all", "intervals": IV,
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "sv", "fieldName": "value"},
            ],
        }
        sql = (f"SELECT count(*) AS n, "
               # Druid 0.12 doubleSum over zero rows is 0.0, not NULL
               f"COALESCE(sum(e.value), 0.0) AS sv "
               f"FROM events e {how} {right_sql} r ON {cond_sql} "
               f"WHERE {IV_SQL}")
        cols = ["n", "sv"]
    elif shape < 0.33:
        # daily timeseries over the join (bucketed aggregation)
        q = {
            "queryType": "timeseries", "dataSource": ds,
            "granularity": "day", "intervals": IV,
            "aggregations": [{"type": "count", "name": "n"}],
            "context": {"skipEmptyBuckets": True},
        }
        sql = (f"SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, "
               f"count(*) AS n "
               f"FROM events e {how} {right_sql} r ON {cond_sql} "
               f"WHERE {IV_SQL} GROUP BY 1")
        cols = ["ts_bucket", "n"]
    elif shape < 0.45:
        # scan over the join: raw joined rows, projected
        q = {
            "queryType": "scan", "dataSource": ds,
            "intervals": IV, "columns": ["event_id", dim],
        }
        sql = (f"SELECT e.event_id AS event_id, {dim_sql} AS d "
               f"FROM events e {how} {right_sql} r ON {cond_sql} "
               f"WHERE {IV_SQL}")
        cols = ["event_id", dim]
    else:
        q = {
            "queryType": "groupBy", "dataSource": ds,
            "granularity": "all", "dimensions": [dim], "intervals": IV,
            "aggregations": [
                {"type": "count", "name": "n"},
                {"type": "doubleSum", "name": "sv", "fieldName": "value"},
            ],
        }
        sql = (f"SELECT {dim_sql} AS d, count(*) AS n, "
               f"sum(e.value) AS sv "
               f"FROM events e {how} {right_sql} r ON {cond_sql} "
               f"WHERE {IV_SQL} GROUP BY {dim_sql}")
        cols = [dim, "n", "sv"]
    return q, sql, cols, lookup_map


def _run_one(engine, duck, q, sql, cols, lookup_map):
    if lookup_map is not None:
        engine.catalog.register_lookup("__fuzz_lk", lookup_map)
    df = engine.plan(q).select(*[f"`{c}`" for c in cols])
    assert_df_matches_duck(df, duck, sql)


def test_fuzz_join_datasources(engine, duck):
    rng = random.Random(SEED)
    for i in range(N_SPECS):
        q, sql, cols, lk = gen_join(rng)
        try:
            _run_one(engine, duck, q, sql, cols, lk)
        except AssertionError:
            import json

            print(f"\nFAILING JOIN SPEC #{i} (seed={SEED}):\n"
                  f"{json.dumps(q, indent=1)}\nORACLE: {sql}")
            raise


def test_join_error_shapes(engine):
    """Degenerate draws fail loudly, never silently wrong."""
    base = {
        "queryType": "timeseries", "granularity": "all", "intervals": IV,
        "aggregations": [{"type": "count", "name": "n"}],
    }
    # empty rightPrefix
    with pytest.raises(ValueError, match="rightPrefix"):
        engine.plan({**base, "dataSource": {
            "type": "join", "left": "events",
            "right": {"type": "inline", "columnNames": ["k"],
                      "rows": [["click"]]},
            "rightPrefix": "", "condition": 'event_type == "k"',
        }})
    # prefix collision: prefixed right column shadows a left column name
    # — Spark's resolver sees an ambiguous reference; must raise, not
    # pick a side silently
    with pytest.raises(Exception):
        engine.plan({**base, "dataSource": {
            "type": "join", "left": "events",
            "right": {"type": "inline", "columnNames": ["type"],
                      "rows": [["click"]]},
            "rightPrefix": "event_",
            "condition": 'event_type == "event_type"',
        }}).collect()
    # unknown joinType
    with pytest.raises(ValueError, match="joinType"):
        engine.plan({**base, "dataSource": {
            "type": "join", "left": "events",
            "right": {"type": "inline", "columnNames": ["k"],
                      "rows": [["click"]]},
            "rightPrefix": "r.", "condition": 'event_type == "r.k"',
            "joinType": "FULL",
        }})


# Bugs found by this fuzzer get pinned here as (query, sql, cols) specs.
PINNED: list = []


def test_pinned_join_regressions(engine, duck):
    for q, sql, cols in PINNED:
        _run_one(engine, duck, q, sql, cols, None)
