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
 - embedding vectors get one seeded orthogonal transform (signed
   coordinate permutation) per copy — same rationale: exact vector
   copies are cosine-1.0 near-dups, quadratically distorting pairwise
   embedding operators; the transform preserves each copy's internal
   cosine structure exactly while decorrelating cross-copy cosines;
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

# Bumped whenever the synthesis rules change; written as a sentinel file
# beside the tables so consumers (bench.py) re-synthesize instead of
# reusing a fixture built under older rules. v2: embedding copies get a
# per-copy orthogonal transform (exact-copy vectors quadratically
# distorted pairwise embedding operators). v3: the transform is derived
# per (copy, dim) and maps null elements through (r11 advice: a null
# element or ragged dim in the fixture broke synthesis).
SYNTH_VERSION = 3

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


def _rotate_embeddings(col: pa.ChunkedArray, copy_idx: int,
                       field_type: pa.DataType) -> pa.Array:
    """Apply ONE seeded orthogonal transform (signed coordinate
    permutation) to every vector of a copy — the embedding analog of
    _permute_text: plain replication makes every vector 9 exact dups
    (cosine 1.0), which quadratically distorts any pairwise embedding
    operator (45 spurious pairs per 10-copy group); an orthogonal map
    preserves each copy's INTERNAL pairwise-cosine structure exactly
    (cos(Px, Py) = cos(x, y)) while decorrelating cross-copy cosines,
    so near-dup density scales ~linearly like the text side."""
    import random

    rng = random.Random((0xE5 << 32) | copy_idx)
    vecs = col.to_pylist()
    # One permutation per DIM actually present: the operators support
    # ragged and null-element vectors, so the fixture may carry them
    # (r11 advice: deriving one perm from the first vector raised
    # IndexError on shorter vectors and TypeError on null elements).
    perms: dict[int, tuple[list[int], list[float]]] = {}

    def _perm_for(dim: int):
        if dim not in perms:
            # seeded per (copy, dim) so equal-dim vectors share one map
            r = random.Random((0xE5 << 40) | (copy_idx << 16) | dim)
            p = list(range(dim))
            r.shuffle(p)
            perms[dim] = (p, [r.choice((1.0, -1.0)) for _ in range(dim)])
        return perms[dim]

    out = []
    for v in vecs:
        if v is None:
            out.append(None)
            continue
        perm, signs = _perm_for(len(v))
        out.append([
            signs[j] * v[perm[j]] if v[perm[j]] is not None else None
            for j in range(len(v))
        ])
    return pa.array(out, type=field_type)


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
        if name == "embeddings":
            idx = t.schema.get_field_index("embedding")
            t = t.set_column(idx, t.schema.field("embedding"),
                             _rotate_embeddings(t.column("embedding"), i,
                                                t.schema.field("embedding").type))
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
    (dest / "SYNTH_VERSION").write_text(str(SYNTH_VERSION))


if __name__ == "__main__":
    main()
