"""Druid 0.12 StringComparators as Spark ordering expressions.

lexicographic / numeric / strlen are compiled inline where used
(plans/topn.py, plans/groupby.py, plans/search.py, functions/filters.py
_bound). This module adds the remaining public comparator —
``alphanumeric`` (public Druid 0.12 ``StringComparators.ALPHANUMERIC``,
derived from the java-alphanum comparator) — as an ORDER-PRESERVING KEY
so Spark's plain string ordering reproduces the comparator inside
whole-stage codegen (no UDF).

The upstream algorithm (transcribed in tests/test_ordering.py as the
independent oracle) walks both strings run by run:

 - ``isDigit`` covers ASCII 0-9 PLUS the Arabic-Indic (U+0660-0669),
   Extended Arabic-Indic (U+06F0-06F9), Devanagari (U+0966-096F) and
   Fullwidth (U+FF10-FF19) digit ranges.
 - A digit run sorts BEFORE any non-digit run ('a5' < 'a!').
 - Digit runs: leading ASCII '0's are stripped (counted); the remaining
   significant digits compare by run LENGTH first (a longer run is a
   bigger number), then position-wise by char code; an equal value
   resolves IMMEDIATELY by leading-zero count, MORE zeroes first
   ('a007z' < 'a7b' — not deferred to later chunks).
 - Non-digit runs compare as plain strings (Java compareTo); a string
   exhausting first sorts first.

Key encoding, chunks joined with NUL (sorts below every content char, so
prefix-chunk boundaries resolve like the run-by-run walk):

    digit run → '\\x01' ++ lpad(len(sig), 4, '0') ++ sig
                       ++ lpad(9999 − zeroes, 4, '0')
    text  run → '\\x02' ++ run

where ``sig`` is the run minus leading ASCII zeroes and ``zeroes`` their
count (inverted so more zeroes sorts first). The '\\x01'/'\\x02' type
markers give digit-before-text at every chunk boundary.

    key("file10") = "file" NUL \\x01 "0002" "10" "9999"
    key("file2")  = "file" NUL \\x01 "0001" "2"  "9999"   → file2 < file10
    key("a007z")  = … \\x01 "0001" "7" "9997" …           → before a7b

Out-of-scope caps (documented divergences, not reachable by normal
dimension values): >9999 significant digits or leading zeroes overflow
the 4-char fields (the truncated prefix decides); values containing
literal NUL/\\x01/\\x02 collide with the markers; non-BMP characters in
text runs compare in code-point order (Spark UTF-8 bytes) where Java's
compareTo uses UTF-16 code units."""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_LEN_PAD = 4
_ZPAD_MAX = 9999
# Druid's isDigit ranges, verbatim (ASCII, Arabic-Indic, Extended
# Arabic-Indic, Devanagari, Fullwidth).
_DIGIT_CLASS = "0-9\u0660-\u0669\u06f0-\u06f9\u0966-\u096f\uff10-\uff19"
_CHUNK_PATTERN = f"([{_DIGIT_CLASS}]+|[^{_DIGIT_CLASS}]+)"
_CHUNK_RE = re.compile(f"[{_DIGIT_CLASS}]+|[^{_DIGIT_CLASS}]+")
_DIGIT_SET = set("0123456789") \
    | {chr(c) for c in range(0x0660, 0x066A)} \
    | {chr(c) for c in range(0x06F0, 0x06FA)} \
    | {chr(c) for c in range(0x0966, 0x0970)} \
    | {chr(c) for c in range(0xFF10, 0xFF1A)}


def alphanumeric_key(col: Column) -> Column:
    """Order-preserving key column for the alphanumeric comparator."""
    chunks = F.regexp_extract_all(col.cast("string"), F.lit(_CHUNK_PATTERN), 1)

    def _norm(c: Column) -> Column:
        # Only ASCII '0' counts as a strippable leading zero (upstream
        # checks charAt == '0'); other scripts' zeroes are significant.
        sig = F.regexp_replace(c, "^0+", "")
        zeroes = F.length(c) - F.length(sig)
        digit_key = F.concat(
            F.lit("\x01"),
            F.lpad(F.length(sig).cast("string"), _LEN_PAD, "0"),
            sig,
            F.lpad(
                F.greatest(F.lit(0), F.lit(_ZPAD_MAX) - zeroes).cast("string"),
                _LEN_PAD, "0",
            ),
        )
        return F.when(
            c.rlike(f"^[{_DIGIT_CLASS}]"), digit_key
        ).otherwise(F.concat(F.lit("\x02"), c))

    return F.array_join(F.transform(chunks, _norm), "\x00")


def alphanumeric_key_py(s: str) -> str:
    """Python twin of alphanumeric_key — used to normalize driver-side
    literals (topN previousStop, bound filter values) and compared
    against the Spark key in tests. The length/zero prefixes mirror
    ``F.lpad`` exactly, including its truncate-when-longer behavior."""
    out = []
    for m in _CHUNK_RE.finditer(s):
        c = m.group(0)
        if c[0] in _DIGIT_SET:
            sig = c.lstrip("0")
            zeroes = len(c) - len(sig)
            out.append(
                "\x01"
                + str(len(sig))[:_LEN_PAD].rjust(_LEN_PAD, "0")
                + sig
                + str(max(0, _ZPAD_MAX - zeroes))[:_LEN_PAD].rjust(_LEN_PAD, "0")
            )
        else:
            out.append("\x02" + c)
    return "\x00".join(out)
