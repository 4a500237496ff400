"""Registered-lookup resolution — rewrite lookup extractionFns that name a
catalog-registered lookup into broadcast joins.

Reference: Druid's DimensionSpecs component includes registered/namespaced
lookups (query/query-module-overview.md:45, TOC.md:32) — cluster-wide
key→value maps replicated to every node and applied at query time. The
Spark-native form is a BROADCAST left join against the lookup DataFrame:
the lookup ships once per executor (like Druid's replicated map), the fact
side never shuffles, and the joined value column feeds the normal
extraction pipeline. Inline ``{"type": "map"}`` lookups keep the
create_map literal path (functions/extraction.py), which stays inside
whole-stage codegen for small maps.

Accepted spec shapes (public Druid surface):
  {"type": "registeredLookup", "lookup": "name", ...}
  {"type": "lookup", "lookup": "name", ...}          (string, not a map)
"""

from __future__ import annotations

import copy

from pyspark.sql import functions as F


def registered_lookup_name(ex: dict | None) -> str | None:
    if not isinstance(ex, dict):
        return None
    if ex.get("type") == "registeredLookup":
        return ex.get("lookup")
    if ex.get("type") == "lookup" and isinstance(ex.get("lookup"), str):
        return ex.get("lookup")
    return None


def _find(node, found: list) -> None:
    """Collect (enclosing-spec, extractionFn, dimension) triples for every
    registered-lookup extraction in the query tree."""
    if isinstance(node, dict):
        ex = node.get("extractionFn")
        dim = node.get("dimension")
        if isinstance(dim, str) and registered_lookup_name(ex):
            found.append((node, ex, dim))
        if isinstance(ex, dict) and ex.get("type") == "cascade":
            for sub in ex.get("extractionFns", []):
                if registered_lookup_name(sub):
                    raise ValueError(
                        "registered lookup inside a cascade extractionFn is "
                        "unsupported — apply the lookup as the outer extraction"
                    )
        for v in node.values():
            _find(v, found)
    elif isinstance(node, (list, tuple)):
        for v in node:
            _find(v, found)


def resolve_registered_lookups(engine, query: dict) -> dict:
    """If the query references registered lookups, return a rewritten copy:
    the dataSource becomes the base frame broadcast-left-joined with each
    (lookup, dimension) pair, and every matching extractionFn becomes an
    internal ``_joinedLookup`` spec pointing at the joined value column.
    Queries without registered lookups are returned untouched (zero cost).
    """
    probe: list = []
    _find(query, probe)
    if not probe:
        return query
    query = copy.deepcopy(query)
    found: list = []
    _find(query, found)
    df = engine.resolve_datasource(query["dataSource"])
    joined: dict[tuple[str, str], str] = {}
    for node, ex, dim in found:
        name = registered_lookup_name(ex)
        out = joined.get((name, dim))
        if out is None:
            out = f"__lkp_{name}_{dim}"
            lk = engine.catalog.lookup(name)
            key = f"__lkp_key_{out}"
            lk = lk.select(F.col("key").alias(key), F.col("value").alias(out))
            df = df.join(
                F.broadcast(lk), F.col(dim).cast("string") == F.col(key), "left"
            ).drop(key)
            joined[(name, dim)] = out
        node["extractionFn"] = {
            "type": "_joinedLookup",
            "column": out,
            "retainMissingValue": ex.get("retainMissingValue"),
            "replaceMissingValueWith": ex.get("replaceMissingValueWith"),
        }
    query["dataSource"] = df
    return query
