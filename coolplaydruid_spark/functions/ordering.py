"""Druid 0.12 StringComparators as Spark ordering expressions.

lexicographic / numeric / strlen are compiled inline where used
(plans/topn.py, plans/groupby.py, plans/search.py, functions/filters.py
_bound). This module adds the remaining public comparator —
``alphanumeric`` (public Druid 0.12 StringComparators.ALPHANUMERIC:
digit runs compare by numeric value, other runs byte-wise, chunk by
chunk) — as an ORDER-PRESERVING KEY so Spark's plain string ordering
reproduces the comparator inside whole-stage codegen (no UDF).

Digit runs are encoded LENGTH-PREFIXED after stripping leading zeros —
``lpad(len(digits), 4, '0') || digits`` — so numeric comparison is
exact for runs of ANY length (a longer significant-digit run is a
bigger number; equal lengths compare digit-wise = numerically):

    key("file10") = "file" NUL "0002" "10"
    key("file2")  = "file" NUL "0001" "2"     → file2 < file10

Leading-zero values tie on their numeric value ('007' ≡ '7' — both
encode "00017"), matching the numeric-value chunk comparison. Chunks
are joined with NUL (sorts below every content character) so
chunk-BOUNDARY comparisons match the chunk algorithm — 'a0' < 'a!'
because chunk 'a' is a strict prefix of chunk 'a!', even though
'0' > '!' byte-wise (hypothesis-found). Mixed digit-vs-text chunk
comparisons stay byte-consistent because a digit-run key always starts
with an ASCII digit and a text chunk never does. Caps: digit runs
longer than 9999 significant digits overflow the 4-char length field
(the truncated prefix decides); values containing literal NULs collide
with the delimiter — both out of scope for dimension values.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_LEN_PAD = 4
_CHUNK_RE = re.compile(r"[0-9]+|[^0-9]+")
_ASCII_DIGITS = set("0123456789")


def alphanumeric_key(col: Column) -> Column:
    """Order-preserving key column for the alphanumeric comparator."""
    chunks = F.regexp_extract_all(col.cast("string"), F.lit("([0-9]+|[^0-9]+)"), 1)

    def _norm(c: Column) -> Column:
        digits = F.regexp_replace(c, "^0+", "")
        return F.when(
            c.rlike("^[0-9]+$"),
            F.concat(
                F.lpad(F.length(digits).cast("string"), _LEN_PAD, "0"), digits
            ),
        ).otherwise(c)

    return F.array_join(F.transform(chunks, _norm), "\x00")


def alphanumeric_key_py(s: str) -> str:
    """Python twin of alphanumeric_key — used to normalize driver-side
    literals (topN previousStop, bound filter values) and as the
    independent test oracle. Chunk classification is ASCII-only on both
    sides (the chunk regex splits on [0-9]; ``str.isdigit`` would also
    claim Unicode digits like '²' that the Spark key leaves as text),
    and the length prefix mirrors ``F.lpad`` exactly, including its
    truncate-when-longer behavior."""
    out = []
    for m in _CHUNK_RE.finditer(s):
        c = m.group(0)
        if c[0] in _ASCII_DIGITS:
            digits = c.lstrip("0")
            out.append(str(len(digits))[:_LEN_PAD].rjust(_LEN_PAD, "0") + digits)
        else:
            out.append(c)
    return "\x00".join(out)
