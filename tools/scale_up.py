"""Synthesize a larger benchmark fixture from /root/testdata/sf0.1 by
replicating each table FACTOR× with foreign-key-consistent id offsets —
used for the sf1 bench run (no sf1 fixture ships with the driver, and
/root/testdata is read-only).

Scaling rules keep per-row work representative:
 - fact/dimension ids shift by (domain max + 1) * copy, with the SAME base
   per key domain on both sides of every join (custkey offsets agree
   between customer and orders, etc.) — joins stay 1:N, never N:M blowup;
 - nation/region stay single-copy (true dimensions);
 - document text is word-shuffled per copy (seeded, deterministic), so
   copies are NOT near-dups of each other and dedup candidate density
   scales ~linearly (plain replication would make every doc 9 exact
   dups — and a rotation is no better: cyclic shifts preserve almost
   every n-gram — quadratically distorting the LSH verify stage);
 - events keep their timestamps (10× rows per time bucket, same span) —
   the schema (timestamp[ns]) is preserved exactly via pyarrow so the
   engine's nanos shim path is exercised identically.

Usage: python tools/scale_up.py [factor] [dest_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")

# key domain -> (owning table, column) for the offset base
DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}
# table -> {column: domain}
OFFSET_COLS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
}
SINGLE_COPY = ["nation", "region"]


def _permute_text(col: pa.ChunkedArray, copy_idx: int) -> pa.Array:
    import random

    out = []
    for row, text in enumerate(col.to_pylist()):
        if text:
            w = text.split(" ")
            random.Random((copy_idx << 32) | row).shuffle(w)
            out.append(" ".join(w))
        else:
            out.append(text)
    return pa.array(out, type=pa.string())


def scale_table(name: str, factor: int, bases: dict[str, int]) -> pa.Table:
    src = pq.read_table(SRC / f"{name}.parquet")
    copies = [src]
    for i in range(1, factor):
        t = src
        for col, domain in OFFSET_COLS.get(name, {}).items():
            idx = t.schema.get_field_index(col)
            shifted = pc.add(t.column(col), bases[domain] * i)
            t = t.set_column(idx, t.schema.field(col), shifted.cast(t.schema.field(col).type))
        if name == "documents":
            idx = t.schema.get_field_index("text")
            t = t.set_column(idx, t.schema.field("text"),
                             _permute_text(t.column("text"), i))
        copies.append(t)
    return pa.concat_tables(copies)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dest = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.benchdata/sf1")
    dest.mkdir(parents=True, exist_ok=True)
    bases = {
        domain: pc.max(pq.read_table(SRC / f"{tbl}.parquet", columns=[col])[col]).as_py() + 1
        for domain, (tbl, col) in DOMAINS.items()
    }
    for name in SINGLE_COPY:
        pq.write_table(pq.read_table(SRC / f"{name}.parquet"), dest / f"{name}.parquet")
        print(f"{name}: single copy")
    for name in OFFSET_COLS:
        t = scale_table(name, factor, bases)
        pq.write_table(t, dest / f"{name}.parquet")
        print(f"{name}: {t.num_rows} rows")


if __name__ == "__main__":
    main()
