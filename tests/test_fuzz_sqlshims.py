"""Differential fuzzer for the Druid SQL scalar-function shims
(sqlcompat.py _DEFS): TIME_* (periods, origins, timezones/DST), MV_*,
IPV4_*, TRUNCATE/STRPOS/TEXTCAT/BITWISE_*/SAFE_DIVIDE/
DECODE_BASE64_UTF8/TIME_IN_INTERVAL.

Oracle = PYTHON reimplementations of the Druid-documented semantics
(zoneinfo for timezone math, ipaddress for IPv4, base64, calendar month
arithmetic with day clamping) evaluated over a fixed 10-row table —
fully independent of both Spark and DuckDB, so a shim bug can't be
masked by a matching bug in a second SQL engine. Expressions evaluate
in ~40-column batches through engine.sql (the same entry real Druid SQL
clients hit, so the shim registration path is exercised too).

Reproduce: FUZZ_SEED=<seed> FUZZ_N=<n> pytest <this file>.
"""

from __future__ import annotations

import base64
import calendar
import datetime as dt
import ipaddress
import math
import os
import random
import re
from zoneinfo import ZoneInfo

import pytest

N_EXPRS = int(os.environ.get("FUZZ_N", "200"))
SEED = int(os.environ.get("FUZZ_SEED", "20260814"))
BATCH = 40
UTC = ZoneInfo("UTC")

ROWS = [
    (0, 7, 2.5, "hello world", dt.datetime(2024, 3, 15, 13, 47, 21)),
    (1, -3, 0.25, "", dt.datetime(2024, 1, 1, 0, 0, 0)),
    (2, 0, -1.75, "Click", dt.datetime(2024, 3, 10, 6, 30, 0)),  # DST fwd
    (3, 12, 327.53, "purchase", dt.datetime(2024, 11, 3, 5, 30, 0)),  # back
    (4, None, None, None, dt.datetime(2024, 6, 15, 23, 59, 59)),
    (5, 100, 3.14159, "a,b,c", dt.datetime(2024, 1, 31, 12, 0, 0)),
    (6, -14, -0.5, "zebra stripe", dt.datetime(2024, 2, 29, 8, 15, 0)),
    (7, 2, 123456.789, "MiXeD case", dt.datetime(2024, 7, 4, 4, 5, 6)),
    (8, 5, 0.0, "x", dt.datetime(2024, 12, 31, 23, 0, 0)),
    (9, 63, 9.99, "hello", dt.datetime(2024, 3, 15, 0, 0, 0)),
]

CAL_PERIODS = {"PT1S": "second", "PT1M": "minute", "PT1H": "hour",
               "P1D": "day", "P1M": "month", "P3M": "quarter",
               "P1Y": "year"}
FIXED_SECS = {"PT30S": 30, "PT15M": 900, "PT6H": 21600, "P2D": 172800,
              "P1W": 604800}
TZS = ["America/New_York", "America/Los_Angeles", "Asia/Tokyo",
       "Europe/Berlin"]


@pytest.fixture(scope="module")
def shim_view(spark):
    df = spark.createDataFrame(
        ROWS, "id long, n long, d double, s string, t timestamp"
    ).selectExpr("id", "n", "d", "s", "t", "split(s, ' ') AS arr")
    df.createOrReplaceTempView("fuzz_shim")
    return "fuzz_shim"


# ---------------------------------------------------------------------------
# python oracles for the Druid-documented semantics
# ---------------------------------------------------------------------------

def _cal_floor(t: dt.datetime, unit: str) -> dt.datetime:
    if unit == "second":
        return t.replace(microsecond=0)
    if unit == "minute":
        return t.replace(second=0, microsecond=0)
    if unit == "hour":
        return t.replace(minute=0, second=0, microsecond=0)
    if unit == "day":
        return t.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "month":
        return t.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "quarter":
        return t.replace(month=((t.month - 1) // 3) * 3 + 1, day=1,
                         hour=0, minute=0, second=0, microsecond=0)
    return t.replace(month=1, day=1, hour=0, minute=0, second=0,
                     microsecond=0)


def _epoch(t: dt.datetime) -> int:
    return int(t.replace(tzinfo=UTC).timestamp())


def _from_epoch(e: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(e, UTC).replace(tzinfo=None)


def _to_wall(t: dt.datetime, tz: str) -> dt.datetime:
    return t.replace(tzinfo=UTC).astimezone(ZoneInfo(tz)).replace(
        tzinfo=None)


def _from_wall(w: dt.datetime, tz: str) -> dt.datetime:
    # fold=0 = earlier offset at DST-ambiguous wall times (what
    # java.time ZonedDateTime.of picks too)
    return w.replace(tzinfo=ZoneInfo(tz), fold=0).astimezone(UTC).replace(
        tzinfo=None)


_PRECISE_SECS = {"PT1S": 1, "PT1M": 60, "PT1H": 3600}


def _utc_off_s(t: dt.datetime, tz: str) -> int:
    return int(
        t.replace(tzinfo=UTC).astimezone(ZoneInfo(tz))
        .utcoffset().total_seconds()
    )


def _is_time_only(p: str) -> bool:
    return bool(re.fullmatch(r"PT\d+[SMH]", p))


def py_time_floor(t, p, tz=None, origin=None):
    if t is None:
        return None
    if origin is not None:
        if tz is not None and re.fullmatch(r"P\d+[DW]", p):
            # day/week periods with origin+tz anchor at the ORIGIN'S
            # local wall phase (granularity.py wallduration)
            s = FIXED_SECS.get(p) or {"P1D": 86400}[p]
            w = int((_to_wall(t, tz) - dt.datetime(1970, 1, 1))
                    .total_seconds())
            ow = int((_to_wall(origin, tz) - dt.datetime(1970, 1, 1))
                     .total_seconds())
            return _from_wall(
                dt.datetime(1970, 1, 1)
                + dt.timedelta(seconds=ow + ((w - ow) // s) * s), tz)
        ms = FIXED_SECS.get(p) or {"PT1S": 1, "PT1M": 60, "PT1H": 3600,
                                   "P1D": 86400}[p]
        e, o = _epoch(t), _epoch(origin)
        return _from_epoch(o + ((e - o) // ms) * ms)
    if tz is not None:
        # Time-only periods are precise fields (Joda): PT1S/M/H truncate
        # offset-preservingly by the instant's own offset; multi-unit
        # PT{n}X are fixed durations anchored at 1970-01-01T00:00 LOCAL
        # in tz, both on the instant timeline — a wall-clock round trip
        # would collapse the DST repeated hour.
        if p in _PRECISE_SECS:
            off, s = _utc_off_s(t, tz), _PRECISE_SECS[p]
            lm = _epoch(t) + off
            return _from_epoch(lm - (lm % s) - off)
        if _is_time_only(p):
            o = int(dt.datetime(1970, 1, 1, tzinfo=ZoneInfo(tz)).timestamp())
            s, e = FIXED_SECS[p], _epoch(t)
            return _from_epoch(o + ((e - o) // s) * s)
        if p in FIXED_SECS:  # P2D / P1W: wall-clock duration @ wall-1970
            w = _to_wall(t, tz)
            e_w = int((w - dt.datetime(1970, 1, 1)).total_seconds())
            return _from_wall(
                dt.datetime(1970, 1, 1)
                + dt.timedelta(seconds=e_w - e_w % FIXED_SECS[p]), tz)
        return _from_wall(_cal_floor(_to_wall(t, tz), CAL_PERIODS[p]), tz)
    if p in CAL_PERIODS:
        return _cal_floor(t, CAL_PERIODS[p])
    s = FIXED_SECS[p]
    return _from_epoch((_epoch(t) // s) * s)


def py_add_months(t: dt.datetime, months: int) -> dt.datetime:
    m = t.month - 1 + months
    y = t.year + m // 12
    m = m % 12 + 1
    day = min(t.day, calendar.monthrange(y, m)[1])
    return t.replace(year=y, month=m, day=day)


def py_time_shift(t, p, n, tz=None):
    if t is None:
        return None
    if tz is not None:
        if _is_time_only(p):  # precise fields: instant-timeline, tz moot
            return py_time_shift(t, p, n)
        return _from_wall(py_time_shift(_to_wall(t, tz), p, n), tz)
    mm = re.fullmatch(r"P(\d+)M", p)
    if mm:
        return py_add_months(t, n * int(mm.group(1)))
    if re.fullmatch(r"P(\d+)Y", p):
        return py_add_months(t, n * 12 * int(p[1:-1]))
    if p in CAL_PERIODS and p in ("P1M", "P1Y"):  # unreachable; safety
        raise AssertionError
    secs = FIXED_SECS.get(p) or {"PT1S": 1, "PT1M": 60, "PT1H": 3600,
                                 "P1D": 86400}[p]
    return _from_epoch(_epoch(t) + n * secs)


def py_time_ceil(t, p, tz=None, origin=None):
    if t is None:
        return None
    if origin is not None:
        fl = py_time_floor(t, p, tz=tz, origin=origin)
        return t if fl == t else py_time_shift(fl, p, 1, tz=tz)
    if tz is not None:
        if _is_time_only(p):  # precise: instant floor + fixed step
            fl = py_time_floor(t, p, tz=tz)
            return t if fl == t else py_time_shift(fl, p, 1)
        w = _to_wall(t, tz)
        fl = _cal_floor(w, CAL_PERIODS[p])
        if _from_wall(fl, tz) == t:
            return t
        return _from_wall(py_time_shift(fl, p, 1), tz)
    fl = py_time_floor(t, p)
    return t if fl == t else py_time_shift(fl, p, 1)


def py_time_extract(t, unit, tz=None):
    if t is None:
        return None
    if unit == "EPOCH":
        return _epoch(t)
    if unit == "MILLIS":
        return _epoch(t) * 1000
    w = _to_wall(t, tz) if tz else t
    return {
        "SECOND": w.second, "MINUTE": w.minute, "HOUR": w.hour,
        "DAY": w.day, "DOW": w.isoweekday(), "DOY": w.timetuple().tm_yday,
        "WEEK": w.isocalendar()[1], "MONTH": w.month,
        "QUARTER": (w.month - 1) // 3 + 1, "YEAR": w.year,
    }[unit]


def py_truncate(x, d=0):
    if x is None:
        return None
    f = 10.0 ** d
    return (math.floor(x * f) / f) if x >= 0 else (math.ceil(x * f) / f)


def py_ipv4_parse(s):
    try:
        return int(ipaddress.IPv4Address(s))
    except Exception:
        return None


def py_ipv4_match(addr, subnet):
    a = py_ipv4_parse(addr)
    try:
        prefix, bits = subnet.split("/")
        p, b = py_ipv4_parse(prefix), int(bits)
        if a is None or p is None:
            return False
        return (a >> (32 - b)) == (p >> (32 - b))
    except Exception:
        return False


# ---------------------------------------------------------------------------
# generators: (sql_expr, oracle_fn(row) -> expected)
# row = dict(id, n, d, s, t, arr)
# ---------------------------------------------------------------------------

def gen_shim(rng: random.Random):
    k = rng.choice([
        "floor", "floor_tz", "floor_origin", "floor_origin_tz",
        "ceil", "ceil_tz", "ceil_origin_tz", "shift",
        "shift_tz", "extract", "extract_tz", "millis_rt", "format",
        "truncate", "strpos", "textcat", "bitwise", "bitshift",
        "safe_divide", "b64", "ipv4_parse", "ipv4_stringify",
        "ipv4_match", "mv_len", "mv_contains", "mv_offset", "mv_ordinal",
        "mv_to_string", "string_to_mv", "mv_append", "mv_concat",
        "mv_filter", "time_in_interval", "time_parse",
    ])
    if k == "floor":
        p = rng.choice(list(CAL_PERIODS) + list(FIXED_SECS))
        return (f"TIME_FLOOR(t, '{p}')",
                lambda r, p=p: py_time_floor(r["t"], p))
    if k == "floor_tz":
        # incl. precise periods (PT1M/PT1H/PT15M/PT6H): offset-preserving
        # / local-1970-anchored instant-timeline flooring — the DST
        # repeated-hour rows (ROWS[2], ROWS[3]) exercise the divergence
        # from a wall-clock round trip.
        p = rng.choice(["P1D", "PT1H", "P1M", "P1Y", "PT1M", "PT15M",
                        "PT6H", "P2D", "P1W"])
        tz = rng.choice(TZS)
        return (f"TIME_FLOOR(t, '{p}', NULL, '{tz}')",
                lambda r, p=p, tz=tz: py_time_floor(r["t"], p, tz=tz))
    if k == "floor_origin":
        p = rng.choice(list(FIXED_SECS))
        o = dt.datetime(2024, 1, 1, rng.randint(0, 5), 17, 0)
        return (
            f"TIME_FLOOR(t, '{p}', TIMESTAMP '{o}')",
            lambda r, p=p, o=o: py_time_floor(r["t"], p, origin=o),
        )
    if k == "floor_origin_tz":
        # r07 review-found corner: origin+tz day/week periods anchor at
        # the origin's LOCAL wall phase; time-only stay instant-anchored
        p = rng.choice(["P1D", "P2D", "P1W", "PT15M", "PT6H"])
        o = dt.datetime(2024, 1, 1, rng.randint(0, 5), 0, 0)
        tz = rng.choice(TZS)
        return (
            f"TIME_FLOOR(t, '{p}', TIMESTAMP '{o}', '{tz}')",
            lambda r, p=p, o=o, tz=tz: py_time_floor(
                r["t"], p, tz=tz, origin=o),
        )
    if k == "ceil_origin_tz":
        p = rng.choice(["P1D", "P2D", "PT15M"])
        o = dt.datetime(2024, 1, 1, rng.randint(0, 5), 0, 0)
        tz = rng.choice(TZS + [None])
        if tz is None:
            return (
                f"TIME_CEIL(t, '{p}', TIMESTAMP '{o}')",
                lambda r, p=p, o=o: py_time_ceil(r["t"], p, origin=o),
            )
        return (
            f"TIME_CEIL(t, '{p}', TIMESTAMP '{o}', '{tz}')",
            lambda r, p=p, o=o, tz=tz: py_time_ceil(
                r["t"], p, tz=tz, origin=o),
        )
    if k == "ceil":
        p = rng.choice(["P1D", "PT1H", "PT1M", "P1M"])
        return (f"TIME_CEIL(t, '{p}')",
                lambda r, p=p: py_time_ceil(r["t"], p))
    if k == "ceil_tz":
        p = rng.choice(["P1D", "PT1H", "PT15M"])
        tz = rng.choice(TZS)
        return (f"TIME_CEIL(t, '{p}', NULL, '{tz}')",
                lambda r, p=p, tz=tz: py_time_ceil(r["t"], p, tz=tz))
    if k == "shift":
        p = rng.choice(["P1D", "PT1H", "P1M", "P3M", "P1Y", "PT15M"])
        n = rng.choice([-3, -1, 1, 2, 5])
        pp = {"P3M": "P3M"}.get(p, p)
        return (f"TIME_SHIFT(t, '{pp}', {n})",
                lambda r, p=pp, n=n: py_time_shift(r["t"], p, n))
    if k == "shift_tz":
        p = rng.choice(["P1D", "PT1H", "PT15M"])
        n = rng.choice([-1, 1, 2])
        tz = rng.choice(TZS)
        return (f"TIME_SHIFT(t, '{p}', {n}, '{tz}')",
                lambda r, p=p, n=n, tz=tz: py_time_shift(r["t"], p, n, tz=tz))
    if k == "extract":
        u = rng.choice(["EPOCH", "MILLIS", "SECOND", "MINUTE", "HOUR",
                        "DAY", "DOW", "DOY", "WEEK", "MONTH", "QUARTER",
                        "YEAR"])
        return (f"TIME_EXTRACT(t, '{u}')",
                lambda r, u=u: py_time_extract(r["t"], u))
    if k == "extract_tz":
        u = rng.choice(["HOUR", "DAY", "DOW", "MONTH", "YEAR", "EPOCH"])
        tz = rng.choice(TZS)
        return (f"TIME_EXTRACT(t, '{u}', '{tz}')",
                lambda r, u=u, tz=tz: py_time_extract(r["t"], u, tz=tz))
    if k == "millis_rt":
        return ("MILLIS_TO_TIMESTAMP(TIMESTAMP_TO_MILLIS(t) + 1500)",
                lambda r: _from_epoch(_epoch(r["t"])) + dt.timedelta(
                    milliseconds=1500))
    if k == "format":
        fmt, pyfmt = rng.choice([
            ("yyyy-MM-dd", "%Y-%m-%d"), ("HH:mm:ss", "%H:%M:%S"),
            ("yyyy-MM-dd HH:mm", "%Y-%m-%d %H:%M"),
        ])
        if rng.random() < 0.4:
            tz = rng.choice(TZS)
            return (f"TIME_FORMAT(t, '{fmt}', '{tz}')",
                    lambda r, f=pyfmt, tz=tz: _to_wall(r["t"], tz)
                    .strftime(f))
        return (f"TIME_FORMAT(t, '{fmt}')",
                lambda r, f=pyfmt: r["t"].strftime(f))
    if k == "truncate":
        d_ = rng.choice([0, 1, 2, -1, -2])
        if rng.random() < 0.3:
            return (f"TRUNCATE(d)",
                    lambda r: py_truncate(r["d"], 0))
        return (f"TRUNCATE(d, {d_})",
                lambda r, d_=d_: py_truncate(r["d"], d_))
    if k == "strpos":
        needle = rng.choice(["l", "lo", "a", "z", " "])
        def _f(r, nd=needle):
            if r["s"] is None:
                return None
            return r["s"].find(nd) + 1
        return f"STRPOS(s, '{needle}')", _f
    if k == "textcat":
        lit = rng.choice(["!", "_x", ""])
        def _f(r, lit=lit):
            return None if r["s"] is None else r["s"] + lit
        return f"TEXTCAT(s, '{lit}')", _f
    if k == "bitwise":
        m = rng.randint(1, 255)
        fn, op = rng.choice([("BITWISE_AND", "&"), ("BITWISE_OR", "|"),
                             ("BITWISE_XOR", "^")])
        def _f(r, m=m, op=op):
            if r["n"] is None:
                return None
            return {"&": r["n"] & m, "|": r["n"] | m,
                    "^": r["n"] ^ m}[op]
        return f"{fn}(n, {m})", _f
    if k == "bitshift":
        sh = rng.randint(0, 6)
        if rng.random() < 0.5:
            def _f(r, sh=sh):
                if r["n"] is None:
                    return None
                v = (r["n"] << sh)
                # Java/Spark long shift wraps at 64 bits
                v &= (1 << 64) - 1
                return v - (1 << 64) if v >= (1 << 63) else v
            return f"BITWISE_SHIFT_LEFT(n, {sh})", _f
        def _f(r, sh=sh):
            return None if r["n"] is None else r["n"] >> sh
        return f"BITWISE_SHIFT_RIGHT(n, {sh})", _f
    if k == "safe_divide":
        def _f(r):
            if r["d"] is None or r["n"] is None or r["d"] == 0.0:
                return None
            return r["n"] / r["d"]
        return "SAFE_DIVIDE(n, d)", _f
    if k == "b64":
        plain = rng.choice(["hello", "Druid SQL", "ünïcødé", ""])
        enc = base64.b64encode(plain.encode()).decode()
        return (f"DECODE_BASE64_UTF8('{enc}')",
                lambda r, p=plain: p)
    if k == "ipv4_parse":
        addr = rng.choice(["192.168.1.1", "0.0.0.0", "255.255.255.255",
                           "10.1.2.3", "256.1.1.1", "1.2.3", "foo",
                           "01.2.3.4"])
        exp = py_ipv4_parse(addr)
        # the shim's octet regex accepts leading zeros like Druid's
        # jodah-free parser; python's ipaddress rejects them — align
        if re.fullmatch(
            r"((25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])[.]){3}"
            r"(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])", addr
        ) and exp is None:
            parts = [int(x) for x in addr.split(".")]
            exp = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
        return f"IPV4_PARSE('{addr}')", lambda r, e=exp: e
    if k == "ipv4_stringify":
        v = rng.choice([0, 3232235777, 4294967295, 167837443, -1,
                        4294967296])
        exp = (str(ipaddress.IPv4Address(v))
               if 0 <= v <= 4294967295 else None)
        return f"IPV4_STRINGIFY({v})", lambda r, e=exp: e
    if k == "ipv4_match":
        addr = rng.choice(["192.168.1.77", "192.168.2.1", "10.0.0.1",
                           "bogus"])
        subnet = rng.choice(["192.168.1.0/24", "192.168.0.0/16",
                             "10.0.0.0/8"])
        exp = py_ipv4_match(addr, subnet)
        return f"IPV4_MATCH('{addr}', '{subnet}')", lambda r, e=exp: e
    if k == "mv_len":
        def _f(r):
            return None if r["arr"] is None else len(r["arr"])
        return "MV_LENGTH(arr)", _f
    if k == "mv_contains":
        w = rng.choice(["hello", "world", "x", "zebra", "nope"])
        def _f(r, w=w):
            return None if r["arr"] is None else (w in r["arr"])
        return f"MV_CONTAINS(arr, '{w}')", _f
    if k == "mv_offset":
        i = rng.choice([-2, -1, 0, 1, 2, 9])
        def _f(r, i=i):
            if r["arr"] is None:
                return None
            if i < 0 or i >= len(r["arr"]):
                return None
            return r["arr"][i]
        return f"MV_OFFSET(arr, {i})", _f
    if k == "mv_ordinal":
        i = rng.choice([-1, 0, 1, 2, 9])
        def _f(r, i=i):
            if r["arr"] is None:
                return None
            if i <= 0 or i > len(r["arr"]):
                return None
            return r["arr"][i - 1]
        return f"MV_ORDINAL(arr, {i})", _f
    if k == "mv_to_string":
        d_ = rng.choice([",", "|", ""])
        def _f(r, d_=d_):
            return None if r["arr"] is None else d_.join(r["arr"])
        return f"MV_TO_STRING(arr, '{d_}')", _f
    if k == "string_to_mv":
        def _f(r):
            return None if r["s"] is None else re.split("[ ,]", r["s"])
        return "STRING_TO_MV(s, '[ ,]')", _f
    if k == "mv_append":
        w = rng.choice(["tail", ""])
        if rng.random() < 0.5:
            def _f(r, w=w):
                return None if r["arr"] is None else r["arr"] + [w]
            return f"MV_APPEND(arr, '{w}')", _f
        def _f(r, w=w):
            return None if r["arr"] is None else [w] + r["arr"]
        return f"MV_PREPEND('{w}', arr)", _f
    if k == "mv_concat":
        def _f(r):
            return None if r["arr"] is None else r["arr"] + r["arr"]
        return "MV_CONCAT(arr, arr)", _f
    if k == "mv_filter":
        allow = rng.sample(["hello", "world", "x", "zebra", "a,b,c"], 2)
        lit = "array(" + ", ".join(f"'{w}'" for w in allow) + ")"
        if rng.random() < 0.5:
            def _f(r, allow=tuple(allow)):
                if r["arr"] is None:
                    return None
                return [x for x in r["arr"] if x in allow]
            return f"MV_FILTER_ONLY(arr, {lit})", _f
        def _f(r, deny=tuple(allow)):
            if r["arr"] is None:
                return None
            return [x for x in r["arr"] if x not in deny]
        return f"MV_FILTER_NONE(arr, {lit})", _f
    if k == "time_in_interval":
        d1 = rng.randint(1, 6)
        m2 = rng.randint(7, 12)
        iv = f"2024-0{d1}-01T00:00:00/2024-{m2:02d}-01T00:00:00"
        lo = dt.datetime(2024, d1, 1)
        hi = dt.datetime(2024, m2, 1)
        def _f(r, lo=lo, hi=hi):
            return None if r["t"] is None else (lo <= r["t"] < hi)
        return f"TIME_IN_INTERVAL(t, '{iv}')", _f
    # time_parse on literals (pattern + tz forms)
    choice = rng.randrange(3)
    if choice == 0:
        return ("TIME_PARSE('2024-05-06T07:08:09')",
                lambda r: dt.datetime(2024, 5, 6, 7, 8, 9))
    if choice == 1:
        return ("TIME_PARSE('06/05/2024 07:08', 'dd/MM/yyyy HH:mm')",
                lambda r: dt.datetime(2024, 5, 6, 7, 8, 0))
    return ("TIME_PARSE('2024-05-06T07:08:09', NULL, 'Asia/Tokyo')",
            lambda r: _from_wall(dt.datetime(2024, 5, 6, 7, 8, 9),
                                 "Asia/Tokyo"))


def _cmp(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    if isinstance(a, list) or isinstance(b, list):
        return (isinstance(a, list) and isinstance(b, list)
                and len(a) == len(b)
                and all(_cmp(x, y) for x, y in zip(a, b)))
    return a == b


def test_fuzz_sqlshims(engine, shim_view):
    rng = random.Random(SEED)
    exprs = [gen_shim(rng) for _ in range(N_EXPRS)]
    rows = [dict(zip(["id", "n", "d", "s", "t"], r),
                 arr=(r[3].split(" ") if r[3] is not None else None))
            for r in ROWS]
    failures = []
    for start in range(0, len(exprs), BATCH):
        batch = exprs[start:start + BATCH]
        sel = ", ".join(f"{sql} AS e{j}" for j, (sql, _) in enumerate(batch))
        try:
            out = engine.sql(
                f"SELECT id, {sel} FROM {shim_view} ORDER BY id"
            ).collect()
        except Exception as e:  # noqa: BLE001
            # bisect: evaluate one-by-one to attribute the crash
            for j, (sql, _) in enumerate(batch):
                try:
                    engine.sql(
                        f"SELECT {sql} AS x FROM {shim_view}").collect()
                except Exception as e1:  # noqa: BLE001
                    failures.append((start + j, sql,
                                     f"{type(e1).__name__}: {e1}"))
            continue
        for ri, srow in enumerate(out):
            r = rows[srow["id"]]
            for j, (sql, fn) in enumerate(batch):
                got = srow[f"e{j}"]
                want = fn(r)
                if not _cmp(got, want):
                    failures.append(
                        (start + j, sql,
                         f"row id={r['id']}: spark={got!r} "
                         f"expected={want!r}"))
    if failures:
        seen = {}
        for idx, sql, err in failures:
            seen.setdefault(idx, (sql, err))
        msg = [f"{len(seen)}/{N_EXPRS} shim expressions diverged "
               f"(seed={SEED}); first 5:"]
        for idx, (sql, err) in list(seen.items())[:5]:
            msg.append(f"--- expr #{idx} ---\n sql: {sql}\n {err}")
        raise AssertionError("\n".join(msg))
