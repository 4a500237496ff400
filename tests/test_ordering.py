"""Druid alphanumeric StringComparator (functions/ordering.py): the
order-preserving padded key must reproduce the real chunk-by-chunk
comparator — verified against an INDEPENDENT Python implementation of
the comparator itself (digit chunks by numeric value with leading-zero
ties, other chunks byte-wise), then end-to-end through topN /
limitSpec / search."""

from __future__ import annotations

import functools
import re

import pytest

from coolplaydruid_spark.functions.ordering import (
    alphanumeric_key,
    alphanumeric_key_py,
)

_CHUNKS = re.compile(r"[0-9]+|[^0-9]+")

VALUES = [
    "file2", "file10", "file1", "file100", "a007", "a7", "a07b", "a7a",
    "2", "10", "007", "7", "abc", "", "A1", "1a2b", "1a10b", "x99y100",
    "x99y9", "!bang", "z", "0", "00", "9seq", "10seq", "seq9", "seq10",
    "a0", "a!",  # hypothesis find: chunk-boundary vs byte-order (r8)
    # review finds (r8): Unicode digits ('²'.isdigit() is True in Python
    # but the chunk split is ASCII-only — must stay a text chunk on BOTH
    # twins) and digit runs past the old 20-char pad cap (the
    # length-prefixed encoding compares them exactly)
    "1²", "x²3", "٣x",
    "99999999999999999999", "123456789012345678901",
    "123456789012345678909", "100000000000000000000",
]


def _is_ascii_digits(c: str) -> bool:
    # NOT str.isdigit(): the chunk regex splits on ASCII [0-9] only, so
    # a '²' chunk is text even though '²'.isdigit() (int('²') raises)
    return c[0] in "0123456789"


def _alnum_cmp(a: str, b: str) -> int:
    """Reference chunk comparator (public Druid 0.12 semantics)."""
    ca, cb = _CHUNKS.findall(a), _CHUNKS.findall(b)
    for x, y in zip(ca, cb):
        if x == y:
            continue
        if _is_ascii_digits(x) and _is_ascii_digits(y):
            if int(x) != int(y):
                return -1 if int(x) < int(y) else 1
            continue  # leading-zero tie on value → next chunk decides
        return -1 if x < y else 1
    return (len(ca) > len(cb)) - (len(ca) < len(cb))


def test_key_reproduces_chunk_comparator():
    by_cmp = sorted(VALUES, key=functools.cmp_to_key(_alnum_cmp))
    by_key = sorted(VALUES, key=lambda v: (alphanumeric_key_py(v), ))
    # keys may tie where the comparator ties ('007' vs '7' before a
    # common suffix) — compare the induced ORDER of key values
    assert [alphanumeric_key_py(v) for v in by_key] == sorted(
        alphanumeric_key_py(v) for v in VALUES)
    for i in range(len(by_cmp) - 1):
        assert _alnum_cmp(by_cmp[i], by_cmp[i + 1]) <= 0
        assert (alphanumeric_key_py(by_cmp[i])
                <= alphanumeric_key_py(by_cmp[i + 1])), (
            by_cmp[i], by_cmp[i + 1])


def test_spark_key_matches_python_key(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "v string")
    got = {r["v"]: r["k"] for r in
           df.select("v", alphanumeric_key(df.v).alias("k")).collect()}
    for v in VALUES:
        assert got[v] == alphanumeric_key_py(v), (v, got[v])


@pytest.fixture(scope="module")
def alnum_engine(spark):
    from coolplaydruid_spark.catalog import Catalog
    from coolplaydruid_spark.engine import DruidEngine
    from datetime import datetime

    names = ["file2", "file10", "file1", "seq9", "seq10", "seq2"]
    rows = [(i, datetime(2024, 1, 1 + i % 3), names[i % len(names)], float(i))
            for i in range(60)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, name string, value double")
    catalog = Catalog(spark)
    catalog.register("alnum", df=df, time_column="ts", as_view=False)
    return DruidEngine(spark, catalog)


IV = ["2024-01-01T00:00:00/2024-02-01T00:00:00"]
ALNUM_ORDER = ["file1", "file2", "file10", "seq2", "seq9", "seq10"]


def test_topn_alphanumeric_with_previousstop(alnum_engine):
    base = {
        "queryType": "topN", "dataSource": "alnum", "granularity": "all",
        "dimension": "name", "threshold": 3,
        "aggregations": [{"type": "count", "name": "n"}],
        "intervals": IV,
    }
    q1 = dict(base, metric={"type": "dimension", "ordering": "alphanumeric"})
    p1 = [r["name"] for r in alnum_engine.plan(q1).collect()]
    assert p1 == ALNUM_ORDER[:3]
    q2 = dict(base, metric={"type": "dimension", "ordering": "alphanumeric",
                            "previousStop": p1[-1]})
    p2 = [r["name"] for r in alnum_engine.plan(q2).collect()]
    assert p2 == ALNUM_ORDER[3:]


def test_limitspec_alphanumeric(alnum_engine):
    q = {
        "queryType": "groupBy", "dataSource": "alnum",
        "granularity": "all", "dimensions": ["name"],
        "aggregations": [{"type": "count", "name": "n"}],
        "intervals": IV,
        "limitSpec": {"type": "default", "limit": 4,
                      "columns": [{"dimension": "name",
                                   "dimensionOrder": "alphanumeric"}]},
    }
    got = [r["name"] for r in alnum_engine.plan(q).collect()]
    assert got == ALNUM_ORDER[:4]


def test_search_alphanumeric_sort(alnum_engine):
    q = {
        "queryType": "search", "dataSource": "alnum",
        "searchDimensions": ["name"],
        "query": {"type": "insensitive_contains", "value": "e"},
        "sort": {"type": "alphanumeric"},
        "intervals": IV,
    }
    got = [r["value"] for r in alnum_engine.plan(q).collect()]
    assert got == ALNUM_ORDER


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # '²' keeps the Unicode-digit twin divergence (r8 review find)
    # under continuous property fuzz
    @given(st.lists(st.text(alphabet="ab09z17!²", max_size=12),
                    min_size=2, max_size=8))
    @settings(max_examples=200, deadline=None)
    def test_property_key_order_equals_cmp_order(values):
        """For ANY pair, the padded key compares exactly like the chunk
        comparator (signs match; ties only where the comparator ties)."""
        for a in values:
            for b in values:
                c = _alnum_cmp(a, b)
                ka, kb = alphanumeric_key_py(a), alphanumeric_key_py(b)
                k = (ka > kb) - (ka < kb)
                assert c == k, (a, b, c, k)
except ImportError:  # pragma: no cover
    pass


def test_topn_alphanumeric_previousstop_key_ties(spark):
    """Review find (r8): distinct values whose keys TIE ('007' ≡ '7' by
    numeric chunk value) must all survive a previousStop walk — the stop
    predicate compares (key, raw byte order), matching the tie-broken
    sort, not the key alone."""
    from datetime import datetime

    from coolplaydruid_spark.catalog import Catalog
    from coolplaydruid_spark.engine import DruidEngine

    names = ["007", "7", "070", "70", "a"]
    rows = [(i, datetime(2024, 1, 1), names[i % len(names)], float(i))
            for i in range(20)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, name string, value double")
    catalog = Catalog(spark)
    catalog.register("alnumtie", df=df, time_column="ts", as_view=False)
    eng = DruidEngine(spark, catalog)

    walked, prev = [], None
    for _page in range(10):
        metric = {"type": "dimension", "ordering": "alphanumeric"}
        if prev is not None:
            metric["previousStop"] = prev
        q = {
            "queryType": "topN", "dataSource": "alnumtie",
            "granularity": "all", "dimension": "name", "threshold": 2,
            "aggregations": [{"type": "count", "name": "n"}],
            "intervals": IV, "metric": metric,
        }
        rows_out = eng.plan(q).collect()
        if not rows_out:
            break
        walked.extend(r["name"] for r in rows_out)
        prev = rows_out[-1]["name"]
        if len(rows_out) < 2:
            break
    assert walked == ["007", "7", "070", "70", "a"], walked


def test_bound_filter_alphanumeric(alnum_engine):
    """Bound filter with the alphanumeric comparator: lower='file2'
    strict admits file10 (numeric chunk 10 > 2) but not file1/file2 —
    a lexicographic bound would wrongly exclude file10."""
    q = {
        "queryType": "groupBy", "dataSource": "alnum",
        "granularity": "all", "dimensions": ["name"],
        "aggregations": [{"type": "count", "name": "n"}],
        "intervals": IV,
        "filter": {"type": "bound", "dimension": "name",
                   "lower": "file2", "lowerStrict": True,
                   "ordering": "alphanumeric"},
    }
    got = sorted(r["name"] for r in alnum_engine.plan(q).collect())
    assert got == ["file10", "seq10", "seq2", "seq9"], got
    # sanity: the lexicographic spelling of the same bound excludes
    # file10 ('file10' < 'file2' byte-wise)
    q["filter"]["ordering"] = "lexicographic"
    got2 = sorted(r["name"] for r in alnum_engine.plan(q).collect())
    assert got2 == ["seq10", "seq2", "seq9"], got2
