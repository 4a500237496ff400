"""Paging-consistency fuzzer for the two stateful pagination surfaces
— select's pagingSpec (offset/threshold over the stable total order)
and topN's dimension-metric previousStop — which the fixed contract
queries exercise at exactly one page each.

Select: for random (filter, threshold, descending) draws, walk ALL
pages to exhaustion and assert (a) the concatenated pages are exactly
the DuckDB row multiset for the same filter, (b) no row is lost or
duplicated across page boundaries, (c) __time is monotone in the page
order across the whole walk, (d) every page but the last is exactly
`threshold` rows. The oracle is cross-engine (DuckDB multiset), not the
engine's own full-scan, so an ordering bug can't self-certify.

TopN previousStop: walk the full dimension range page by page (each
page's previousStop = last value of the previous page) and assert the
concatenation reproduces DuckDB's fully-ordered aggregate table —
values, aggregates, order and page boundaries.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import os
import random

from conftest import assert_df_matches_duck  # noqa: F401  (shape parity)

N_SPECS = int(os.environ.get("FUZZ_N", "10"))
SEED = int(os.environ.get("FUZZ_SEED", "20260814"))

IV = ["2024-01-01T00:00:00/2024-02-01T00:00:00"]
IV_SQL = ("ts >= TIMESTAMP '2024-01-01 00:00:00' "
          "AND ts < TIMESTAMP '2024-02-01 00:00:00'")

FILTERS = [
    (None, "TRUE"),
    ({"type": "selector", "dimension": "event_type", "value": "click"},
     "event_type = 'click'"),
    ({"type": "in", "dimension": "event_type",
      "values": ["purchase", "signup"]},
     "event_type IN ('purchase', 'signup')"),
    ({"type": "bound", "dimension": "value", "lower": "200",
      "ordering": "numeric"}, "value >= 200"),
]


def test_fuzz_select_paging_walk(engine, duck):
    rng = random.Random(SEED + 61)
    for _ in range(N_SPECS):
        filt, fsql = rng.choice(FILTERS)
        threshold = rng.randint(29, 80)
        descending = rng.random() < 0.5
        q = {
            "queryType": "select",
            "dataSource": "events",
            "intervals": IV,
            "columns": ["event_id", "event_type", "value"],
            "descending": descending,
            "pagingSpec": {"threshold": threshold, "offset": 0},
        }
        if filt:
            q["filter"] = filt
        pages, offset = [], 0
        for _page in range(200):
            q["pagingSpec"]["offset"] = offset
            rows = engine.plan(dict(q)).collect()
            if not rows:
                break
            pages.append(rows)
            offset += len(rows)
        else:
            raise AssertionError("paging never exhausted")
        # every page but the last is exactly `threshold` rows
        for p in pages[:-1]:
            assert len(p) == threshold, (len(p), threshold)
        flat = [r for p in pages for r in p]
        # no row lost or duplicated: event_id is unique in the fixture
        ids = [r["event_id"] for r in flat]
        assert len(ids) == len(set(ids)), "duplicate rows across pages"
        oracle_ids = {r[0] for r in duck.execute(
            f"SELECT event_id FROM events WHERE {IV_SQL} AND {fsql}"
        ).fetchall()}
        assert set(ids) == oracle_ids, (
            f"paged multiset != oracle ({len(ids)} vs {len(oracle_ids)} "
            f"rows; filter {fsql})")
        # __time monotone across the WHOLE walk (not just within pages)
        times = [r["__time"] for r in flat]
        ordered = sorted(times, reverse=descending)
        assert times == ordered, "page concatenation broke time order"


def test_fuzz_topn_previousstop_walk(engine, duck):
    rng = random.Random(SEED + 62)
    for _ in range(N_SPECS):
        dim = rng.choice(["event_type", "user_id"])
        threshold = rng.randint(2, 4)
        filt, fsql = rng.choice(FILTERS)
        agg = rng.choice([
            ({"type": "count", "name": "n"},
             "CAST(count(*) AS BIGINT)"),
            ({"type": "doubleSum", "name": "n", "fieldName": "value"},
             "round(sum(value), 6)"),
        ])
        oracle = duck.execute(
            f"SELECT CAST({dim} AS VARCHAR) AS d, {agg[1]} AS n "
            f"FROM events WHERE {IV_SQL} AND {fsql} "
            "GROUP BY 1 ORDER BY 1"
        ).fetchall()
        walked, prev = [], None
        for _page in range(50):
            metric = {"type": "dimension", "ordering": "lexicographic"}
            if prev is not None:
                metric["previousStop"] = prev
            q = {
                "queryType": "topN", "dataSource": "events",
                "granularity": "all", "dimension": dim,
                "metric": metric, "threshold": threshold,
                "aggregations": [agg[0]], "intervals": IV,
            }
            if filt:
                q["filter"] = filt
            rows = engine.plan(q).drop("ts_bucket").collect()
            if not rows:
                break
            assert len(rows) <= threshold
            walked.extend((str(r[dim]), round(float(r["n"]), 6))
                          for r in rows)
            prev = str(rows[-1][dim])
            if len(rows) < threshold:
                break
        else:
            raise AssertionError("previousStop walk never exhausted")
        expect = [(d, round(float(n), 6)) for d, n in oracle]
        assert walked == expect, (
            f"dim={dim} threshold={threshold} filter={fsql}\n"
            f"walked={walked}\noracle={expect}")


def test_fuzz_limitspec_dimension_order(engine, duck):
    """groupBy limitSpec dimensionOrder semantics over BOTH column
    types: explicit 'lexicographic' must byte-compare numeric dims
    ('10' < '2'), 'numeric' must number-compare, 'strlen' must sort
    shorter-first with lexicographic ties — ordered comparison against
    DuckDB applying the same comparator, same bug class as the topN
    lexicographic find."""
    rng = random.Random(SEED + 63)
    for _ in range(max(10, N_SPECS)):
        dim, dorder = rng.choice([
            ("user_id", "lexicographic"), ("user_id", "numeric"),
            ("user_id", "strlen"), ("event_type", "lexicographic"),
            ("event_type", "strlen"),
        ])
        descending = rng.random() < 0.5
        d = "DESC" if descending else "ASC"
        limit = rng.randint(3, 8)
        q = {
            "queryType": "groupBy", "dataSource": "events",
            "granularity": "all", "dimensions": [dim],
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": IV,
            "limitSpec": {
                "type": "default", "limit": limit,
                "columns": [{"dimension": dim, "dimensionOrder": dorder,
                             "direction": "descending" if descending
                             else "ascending"}],
            },
        }
        got = [(str(r[dim]), r["n"])
               for r in engine.plan(q).select(dim, "n").collect()]
        if dorder == "lexicographic":
            keys = f"CAST({dim} AS VARCHAR) {d}"
        elif dorder == "numeric":
            keys = f"CAST({dim} AS DOUBLE) {d}"
        else:
            keys = (f"length(CAST({dim} AS VARCHAR)) {d}, "
                    f"CAST({dim} AS VARCHAR) {d}")
        expect = [(str(a), b) for a, b in duck.execute(
            f"SELECT {dim}, CAST(count(*) AS BIGINT) "
            f"FROM events WHERE {IV_SQL} GROUP BY 1 "
            f"ORDER BY {keys} LIMIT {limit}"
        ).fetchall()]
        assert got == expect, (
            f"dim={dim} order={dorder} {d} limit={limit}\n"
            f"got={got}\nexpect={expect}")
