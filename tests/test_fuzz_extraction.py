"""Extraction-fn fuzzer (functions/extraction.py): random extractionFn
specs — substring/strlen/bucket/lower/upper/regex/timeFormat/partial/
stringFormat/lookup and 2-3-deep cascades of them — applied via
apply_extraction over string/numeric/timestamp columns with nulls, and
checked against pure-Python oracles of the Druid-documented semantics.
The r5 review's outputType-coercion bug lived here; cascades are
exactly the interaction class hand-written tests under-sample.

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import random
import re

import pytest
from pyspark.sql import functions as F

from coolplaydruid_spark.functions.extraction import apply_extraction

SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
N_SPECS = int(os.environ.get("FUZZ_N", "160"))
BATCH = 40

ROWS = [
    (0, 7, 2.5, "hello world", dt.datetime(2024, 3, 15, 13, 47, 21)),
    (1, -3, 0.25, "", dt.datetime(2024, 1, 1, 0, 0, 0)),
    (2, 0, -1.75, "Click", dt.datetime(2024, 3, 10, 6, 30, 0)),
    (3, 12, 327.53, "purchase", dt.datetime(2024, 11, 3, 5, 30, 0)),
    (4, None, None, None, dt.datetime(2024, 6, 15, 23, 59, 59)),
    (5, 100, 3.14159, "a,b,c", dt.datetime(2024, 1, 31, 12, 0, 0)),
    (6, -14, -0.5, "zebra", dt.datetime(2024, 2, 29, 8, 15, 0)),
    (7, 2, 123456.789, "MiXeD", dt.datetime(2024, 7, 4, 4, 5, 6)),
    (8, 5, 0.0, "42", dt.datetime(2024, 12, 31, 23, 0, 0)),
    (9, 63, 9.99, "hello", dt.datetime(2024, 3, 15, 0, 0, 0)),
]


@pytest.fixture(scope="module")
def ex_frame(spark):
    return spark.createDataFrame(
        ROWS, "id long, n long, d double, s string, t timestamp"
    )


# ---------------------------------------------------------------------------
# python oracles (value -> extracted value), mirroring Druid semantics
# ---------------------------------------------------------------------------

def _render_num(b: float):
    return str(int(b)) if b == int(b) and abs(b) < 2**62 else str(b)


def py_apply(spec, v):
    et = spec["type"]
    if et == "substring":
        if v is None:
            return None
        i = int(spec.get("index", 0))
        if i >= len(v):
            # Druid: out-of-range (incl. the empty string) -> null
            return None
        ln = spec.get("length")
        return v[i:] if ln is None else v[i:i + int(ln)]
    if et == "strlen":
        return None if v is None else str(len(v))
    if et == "bucket":
        try:
            x = float(v)
        except (TypeError, ValueError):
            return None
        if v is None or (isinstance(x, float) and math.isnan(x)):
            return None
        size = float(spec.get("size", 1))
        offset = float(spec.get("offset", 0))
        b = math.floor((x - offset) / size) * size + offset
        return _render_num(b)
    if et == "lower":
        return None if v is None else v.lower()
    if et == "upper":
        return None if v is None else v.upper()
    if et == "regex":
        if v is None:
            return None
        m = re.search(spec["expr"], v)
        idx = int(spec.get("index", 1))
        got = m.group(idx) if m else None
        if got:
            return got
        if spec.get("replaceMissingValue"):
            return spec.get("replaceMissingValueWith")
        return None
    if et == "timeFormat":
        if v is None:
            return None
        fmt = spec.get("_pyfmt")
        tz = spec.get("timeZone")
        if tz:
            from zoneinfo import ZoneInfo

            v = v.replace(tzinfo=dt.timezone.utc).astimezone(
                ZoneInfo(tz)).replace(tzinfo=None)
        return v.strftime(fmt)
    if et == "partial":
        if v is None:
            return None
        return v if re.search(spec["expr"], v) else None
    if et == "stringFormat":
        handling = (spec.get("nullHandling") or "NULLSTRING").upper()
        if v is None:
            if handling == "RETURNNULL":
                return None
            v = "null" if handling == "NULLSTRING" else ""
        return spec["format"].replace("%s", str(v))
    if et == "lookup":
        mapping = spec["lookup"]["map"]
        got = mapping.get(v) if v is not None else None
        if got is not None:
            return got
        if spec.get("retainMissingValue"):
            return v
        return spec.get("replaceMissingValueWith")
    if et == "cascade":
        for sub in spec["extractionFns"]:
            v = py_apply(sub, v)
        return v
    raise AssertionError(et)


# ---------------------------------------------------------------------------
# generators: (spec, input_col_name)
# ---------------------------------------------------------------------------

def gen_string_fn(rng: random.Random):
    k = rng.choice(["substring", "strlen", "lower", "upper", "regex",
                    "partial", "stringFormat", "lookup"])
    if k == "substring":
        spec = {"type": "substring", "index": rng.randint(0, 6)}
        if rng.random() < 0.7:
            spec["length"] = rng.randint(1, 5)
        return spec
    if k == "regex":
        spec = {"type": "regex",
                "expr": rng.choice(["(l+)", "([aeiou].)", "^(..)",
                                    "(z.*)"]),
                "index": 1}
        if rng.random() < 0.4:
            spec["replaceMissingValue"] = True
            spec["replaceMissingValueWith"] = rng.choice(["MISSING", None])
        return spec
    if k == "partial":
        return {"type": "partial",
                "expr": rng.choice(["l", "^h", "[0-9]+", "z"])}
    if k == "stringFormat":
        return {"type": "stringFormat",
                "format": rng.choice(["[%s]", "x-%s", "%s!"]),
                "nullHandling": rng.choice(["NULLSTRING", "EMPTYSTRING",
                                            "RETURNNULL"])}
    if k == "lookup":
        spec = {"type": "lookup",
                "lookup": {"type": "map",
                           "map": {"hello world": "greeting",
                                   "Click": "ui", "42": "answer",
                                   "zebra": "animal"}}}
        mode = rng.randrange(3)
        if mode == 1:
            spec["retainMissingValue"] = True
        elif mode == 2:
            spec["replaceMissingValueWith"] = "other"
        return spec
    return {"type": k}


def gen_extraction(rng: random.Random):
    r = rng.random()
    if r < 0.15:
        size = rng.choice([0.5, 1, 2, 10, 25])
        spec = {"type": "bucket", "size": size,
                "offset": rng.choice([0, 1, 2.5])}
        return spec, rng.choice(["n", "d", "s"])
    if r < 0.30:
        fmt, pyfmt = rng.choice([
            ("yyyy-MM-dd", "%Y-%m-%d"), ("HH:mm", "%H:%M"),
            ("yyyy-MM", "%Y-%m"), ("dd", "%d"),
        ])
        spec = {"type": "timeFormat", "format": fmt, "_pyfmt": pyfmt}
        if rng.random() < 0.4:
            spec["timeZone"] = rng.choice(["America/New_York",
                                           "Asia/Tokyo"])
        return spec, "t"
    if r < 0.75:
        return gen_string_fn(rng), "s"
    # cascade of 2-3 string fns
    fns = [gen_string_fn(rng) for _ in range(rng.randint(2, 3))]
    return {"type": "cascade", "extractionFns": fns}, "s"


def _strip(spec):
    """Remove oracle-only keys before handing the spec to the engine."""
    import json

    out = json.loads(json.dumps({k: v for k, v in spec.items()
                                 if not k.startswith("_")}))
    if out.get("type") == "cascade":
        out["extractionFns"] = [
            {k: v for k, v in s.items() if not k.startswith("_")}
            for s in out["extractionFns"]]
    return out


def test_fuzz_extraction(ex_frame):
    rng = random.Random(SEED)
    cases = [gen_extraction(rng) for _ in range(N_SPECS)]
    rows = [dict(zip(["id", "n", "d", "s", "t"], r)) for r in ROWS]
    failures = []
    for start in range(0, len(cases), BATCH):
        batch = cases[start:start + BATCH]
        cols = []
        for j, (spec, src) in enumerate(batch):
            cols.append(
                apply_extraction(F.col(src), _strip(spec))
                .cast("string").alias(f"e{j}"))
        out = ex_frame.select("id", *cols).orderBy("id").collect()
        for srow in out:
            r = rows[srow["id"]]
            for j, (spec, src) in enumerate(batch):
                got = srow[f"e{j}"]
                want = py_apply(spec, r[src])
                if want is not None:
                    want = str(want)
                if got != want:
                    failures.append(
                        (start + j, spec, src,
                         f"row id={r['id']} in={r[src]!r}: "
                         f"spark={got!r} expected={want!r}"))
    if failures:
        seen = {}
        for idx, spec, src, err in failures:
            seen.setdefault(idx, (spec, src, err))
        msg = [f"{len(seen)}/{N_SPECS} extraction specs diverged "
               f"(seed={SEED}); first 5:"]
        for idx, (spec, src, err) in list(seen.items())[:5]:
            msg.append(f"--- #{idx} {spec!r} on {src} ---\n {err}")
        raise AssertionError("\n".join(msg))
