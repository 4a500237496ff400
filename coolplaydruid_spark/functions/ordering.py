"""Druid 0.12 StringComparators as Spark ordering expressions.

lexicographic / numeric / strlen are compiled inline where used
(plans/topn.py, plans/groupby.py, plans/search.py, functions/filters.py
_bound). This module adds the remaining public comparator —
``alphanumeric`` (public Druid 0.12 StringComparators.ALPHANUMERIC:
digit runs compare by numeric value, other runs byte-wise, chunk by
chunk) — as an ORDER-PRESERVING KEY so Spark's plain string ordering
reproduces the comparator inside whole-stage codegen (no UDF):

    key("file10") = "file" NUL lpad("10", 20, "0")
    key("file2")  = "file" NUL lpad("2", 20, "0")    → file2 < file10

Digit runs are left-padded to 20 chars, so numeric comparison holds for
runs up to 20 digits (~1e20; beyond that the padded prefix decides —
documented cap, far past any realistic dimension value). Leading-zero
values tie on their numeric value ('007' ≡ '7'), matching the numeric-
value chunk comparison. Chunks are joined with NUL (sorts below every
content character) so chunk-BOUNDARY comparisons match the chunk
algorithm — 'a0' < 'a!' because chunk 'a' is a strict prefix of chunk
'a!', even though '0' > '!' byte-wise (hypothesis-found). Input values
containing literal NULs would collide with the delimiter — out of
scope for dimension values.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PAD = 20
_CHUNK_RE = re.compile(r"[0-9]+|[^0-9]+")


def alphanumeric_key(col: Column) -> Column:
    """Order-preserving key column for the alphanumeric comparator."""
    chunks = F.regexp_extract_all(col.cast("string"), F.lit("([0-9]+|[^0-9]+)"), 1)
    norm = F.transform(
        chunks,
        lambda c: F.when(c.rlike("^[0-9]+$"), F.lpad(c, _PAD, "0")).otherwise(c),
    )
    return F.array_join(norm, "\x00")


def alphanumeric_key_py(s: str) -> str:
    """Python twin of alphanumeric_key — used to normalize driver-side
    literals (topN previousStop) and as the independent test oracle."""
    return "\x00".join(
        m.group(0).rjust(_PAD, "0") if m.group(0).isdigit() else m.group(0)
        for m in _CHUNK_RE.finditer(s)
    )
