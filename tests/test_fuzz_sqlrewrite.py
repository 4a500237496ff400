"""Differential fuzzer for the Druid-SQL rewrite layer
(sqlcompat.rewrite_druid_sql — r7 verdict #4): aggregate renames
(EARLIEST_BY/LATEST_BY → min_by/max_by, BITWISE_*_AGG → bit_*,
APPROX_COUNT_DISTINCT_DS_* → approx_count_distinct, APPROX_QUANTILE →
percentile_approx), the APPROX_QUANTILE 3-arg loud rejection (incl. its
string-literal skip), metadata-table renames and EXPLAIN PLAN FOR.

A seeded generator composes random Druid-SQL statements — random
aggregate mixes at random CASE spellings and whitespace, placed in the
SELECT list / HAVING / ORDER BY, over random grouping sets and interval
filters — and derives the DuckDB oracle from the SAME draw using native
DuckDB spellings (min_by/max_by/bit_and/bit_or/bit_xor/
count(DISTINCT)). Each statement runs through engine.sql, the entry a
real Druid SQL client hits, so shim registration + rewrite + execution
are exercised end-to-end. Approximate aggregates are drawn only in
regimes where they are exact (APPROX_COUNT_DISTINCT on ≤~100-value
dims, where Spark's HLL++ sparse mode is exact; APPROX_QUANTILE at
probabilities 0/1 ≡ min/max), so the oracle can hash-match.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import os
import random

import pytest

from conftest import assert_df_matches_duck

N_SPECS = int(os.environ.get("FUZZ_N", "100"))
SEED = int(os.environ.get("FUZZ_SEED", "20260814"))

WHERE = ("ts >= TIMESTAMP '2024-01-05 00:00:00' "
         "AND ts < TIMESTAMP '2024-01-25 00:00:00'")


def _spell(rng: random.Random, name: str) -> str:
    """Random case + optional whitespace before the paren — the rewrite
    regex is case-insensitive with \\s*, so every spelling must work."""
    case = rng.choice([str.upper, str.lower, str.title])
    return case(name) + rng.choice(["", " ", "  "])


def gen_agg(rng: random.Random, i: int):
    """One aggregate draw → (druid_sql_term, duck_sql_term, alias)."""
    alias = f"a{i}"
    kind = rng.choice(["earliest", "latest", "band", "bor", "bxor",
                       "acd", "aq"])
    if kind in ("earliest", "latest"):
        expr = rng.choice(["value", "user_id", "event_type",
                           "value * 2 + 1", "user_id + value"])
        fn = "EARLIEST_BY" if kind == "earliest" else "LATEST_BY"
        duck_fn = "min_by" if kind == "earliest" else "max_by"
        # event_id is unique → tie-free ordering on both engines
        return (f"{_spell(rng, fn)}({expr}, event_id) AS {alias}",
                f"{duck_fn}({expr}, event_id) AS {alias}", alias)
    if kind in ("band", "bor", "bxor"):
        expr = rng.choice(["user_id", "user_id + 5", "event_id % 255"])
        fn = {"band": "BITWISE_AND_AGG", "bor": "BITWISE_OR_AGG",
              "bxor": "BITWISE_XOR_AGG"}[kind]
        duck_fn = {"band": "bit_and", "bor": "bit_or",
                   "bxor": "bit_xor"}[kind]
        return (f"{_spell(rng, fn)}({expr}) AS {alias}",
                f"CAST({duck_fn}({expr}) AS BIGINT) AS {alias}", alias)
    if kind == "acd":
        expr = rng.choice(["event_type", "user_id", "user_id % 7"])
        fn = rng.choice(["APPROX_COUNT_DISTINCT_DS_HLL",
                         "APPROX_COUNT_DISTINCT_DS_THETA"])
        return (f"{_spell(rng, fn)}({expr}) AS {alias}",
                f"CAST(count(DISTINCT {expr}) AS BIGINT) AS {alias}",
                alias)
    # APPROX_QUANTILE at p ∈ {0, 1} ≡ exact min/max
    p = rng.choice([0, 1])
    fn = rng.choice(["APPROX_QUANTILE", "APPROX_QUANTILE_DS"])
    duck_fn = "min" if p == 0 else "max"
    return (f"{_spell(rng, fn)}(value, {p}) AS {alias}",
            f"{duck_fn}(value) AS {alias}", alias)


def gen_statement(rng: random.Random):
    """→ (druid_sql, duck_sql, select_cols)."""
    n_aggs = rng.randint(1, 4)
    terms = [gen_agg(rng, i) for i in range(n_aggs)]
    group = rng.choice([None, ["event_type"],
                        ["event_type", "user_id % 3"]])
    gcols, galiases = [], []
    if group:
        for gi, g in enumerate(group):
            galiases.append(f"g{gi}")
            gcols.append(f"{g} AS g{gi}")
    sel_d = ", ".join(gcols + [t[0] for t in terms])
    sel_k = ", ".join(gcols + [t[1] for t in terms])
    gb = f" GROUP BY {', '.join(galiases)}" if group else ""
    having = ""
    having_k = ""
    if group and rng.random() < 0.3:
        # a rename inside HAVING — text-level rewrite must reach it
        having = f" HAVING {_spell(rng, 'BITWISE_OR_AGG')}(user_id) > 2"
        having_k = " HAVING bit_or(user_id) > 2"
    # (an aggregate spelled directly in ORDER BY is not resolvable in
    # Spark above the HAVING projection — order by alias instead; the
    # HAVING branch already covers rewrites outside the SELECT list)
    order = ""
    order_k = ""
    if group and rng.random() < 0.3:
        order = " ORDER BY a0 DESC"
        order_k = " ORDER BY a0 DESC"
    d = (f"SELECT {sel_d} FROM events WHERE {WHERE}{gb}{having}{order}")
    k = (f"SELECT {sel_k} FROM events WHERE {WHERE}{gb}{having_k}"
         f"{order_k}")
    cols = galiases + [t[2] for t in terms]
    return d, k, cols


def test_fuzz_sqlrewrite(engine, duck):
    rng = random.Random(SEED + 47)
    failures = []
    for idx in range(N_SPECS):
        d, k, cols = gen_statement(rng)
        try:
            df = engine.sql(d).select(*cols)
            assert_df_matches_duck(df, duck, k)
        except AssertionError as e:
            failures.append((idx, d, k, str(e)))
        except Exception as e:
            failures.append((idx, d, k, f"{type(e).__name__}: {e}"))
    if failures:
        msg = [f"{len(failures)}/{N_SPECS} rewrite statements failed "
               f"(seed={SEED + 47}); first 3:"]
        for idx, d, k, err in failures[:3]:
            msg.append(f"--- druid sql #{idx} ---\n{d}\n"
                       f"--- oracle ---\n{k}\n--- error ---\n{err[:2000]}")
        raise AssertionError("\n".join(msg))


def test_fuzz_approx_quantile_guard(engine):
    """The 3-arg APPROX_QUANTILE rejection must fire for every spelling
    and arg shape — Druid's third parameter is a resolution/sketch
    size, not Spark's accuracy — but NEVER for a 3-arg shape inside a
    string literal."""
    rng = random.Random(SEED + 48)
    for _ in range(25):
        fn = rng.choice(["APPROX_QUANTILE", "APPROX_QUANTILE_DS"])
        third = rng.choice(["50", "128", "k", "(1+2)", "'txt'"])
        stmt = (f"SELECT {_spell(rng, fn)}(value, 0.5, {third}) AS q "
                f"FROM events WHERE {WHERE}")
        with pytest.raises(Exception, match="third argument"):
            engine.sql(stmt)
        # the same shape inside a literal must not trip the guard
        lit = stmt.replace("'", "''")
        ok = engine.sql(
            f"SELECT '{lit}' AS s, count(*) AS n FROM events "
            f"WHERE {WHERE}"
        ).collect()
        assert ok[0]["n"] > 0


def test_meta_renames_and_explain(engine):
    """Dotted metadata tables and EXPLAIN PLAN FOR run through the same
    rewrite; sanity-assert they execute (values are checked by
    tests/test_scan_meta.py)."""
    assert engine.sql(
        "SELECT count(*) AS n FROM INFORMATION_SCHEMA.TABLES"
    ).collect()[0]["n"] > 0
    rows = engine.sql(
        "EXPLAIN PLAN FOR SELECT count(*) AS n FROM events"
    ).collect()
    assert rows, "EXPLAIN PLAN FOR returned no rows"
    assert "plan" in rows[0][0].lower(), rows[0][0]
