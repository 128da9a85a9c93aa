"""Temporal typecasts + the 17-function temporal kit (SURVEY §2.5),
all JVM-side Spark expressions over the gval encoding in gtype.py.

Reference implementations: gtype_temporal.c:40-831 (extract/date_part/
date_trunc/date_bin/age/justify_*/make_*/isfinite/overlaps) and
gtype_typecasting.c:278-399 (totimestamp/totimestamptz/todate/totime/
tointerval), which delegate to PostgreSQL's datetime.c/timestamp.c.
Conventions reproduced here:

- timestamp/date/time payloads are µs/days as in gtype.py; integers cast
  to timestamp are µs since the PG epoch 2000-01-01 (SetEpochTimestamp),
  confirmed by regress/expected/temporal.out:266 (toTimestamp(1e11) =
  'Sun Jan 02 03:46:40 2000').
- timestamptz/timetz collapse onto timestamp/time under the engine's
  fixed UTC session zone (spark.sql.session.timeZone=UTC); an input
  offset is applied for the tz-flavored casts and DROPPED for the naive
  ones, exactly PG's behavior at timezone='GMT' (the reference regress
  runs under SET timezone TO 'GMT').
- errors (unparseable text, out-of-range make_date fields) become gtype
  null per this engine's error->null convention.
- 'infinity'/'-infinity' map to ±INT64 extrema (PG DT_NOEND/DT_NOBEGIN).
"""

from __future__ import annotations

import datetime as _dt
import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F

from postgraph_spark.functions import gtype as G

US_PER_SEC = 1_000_000
US_PER_MIN = 60 * US_PER_SEC
US_PER_HOUR = 60 * US_PER_MIN
US_PER_DAY = G.US_PER_DAY
PG_EPOCH_US = 946_684_800_000_000  # 2000-01-01 in µs since 1970
PG_EPOCH_DAYS = 10_957  # 2000-01-01 in days since 1970
TS_INFINITY = (1 << 63) - 1
TS_NEG_INFINITY = -(1 << 63)
JULIAN_UNIX_EPOCH = 2_440_588  # julian day number of 1970-01-01


def _long_floor_div(n: Column, div: int) -> Column:
    """Exact floor division of a long column by a positive constant
    (double division loses exactness past 2^53 µs ≈ year 2255)."""
    return ((n - F.pmod(n, F.lit(div))).cast("decimal(28,0)") / F.lit(div)).cast("long")


# ------------------------------------------- compile-time (driver) parsing
#
# The Spark-side parsers below build sizeable expression trees (several
# try_to_timestamp formats + regexes). A literal '...'::timestamp inside a
# query would drag that whole tree into every consumer expression, and
# temporal functions reference their arguments many times — Catalyst
# analysis cost multiplies. The reference has the same concern and PG
# const-folds casts of literals at plan time; these py_* twins do exactly
# that for A.Lit operands (functions_map), collapsing the cast to a
# literal gval. Semantics mirror the column versions 1:1 and
# tests/test_temporal.py locks the two paths together.

def py_parse_ts_us(s: str, apply_tz: bool = False) -> int | None:
    txt = s.strip()
    if txt.endswith("Z"):  # ISO 'Z' = UTC
        txt = txt[:-1].strip()
    low = txt.lower()
    if low == "infinity":
        return TS_INFINITY
    if low == "-infinity":
        return TS_NEG_INFINITY
    tz_us = 0
    core = txt
    m = _re.search(r":\d{2}(\.\d+)?\s*([+-]\d{1,2}(:\d{2})?)\s*$", txt)
    if m:
        tz = m.group(2)
        core = txt[: m.start(2)].rstrip()
        sign = -1 if tz.startswith("-") else 1
        bits = tz[1:].split(":")
        tz_us = sign * (int(bits[0]) * 3600 + (int(bits[1]) * 60 if len(bits) > 1 else 0)) * US_PER_SEC
    fm = _re.search(r"\.(\d+)", core)
    frac = int(fm.group(1).ljust(6, "0")[:6]) if fm else 0
    core2 = _re.sub(r"\.\d+", "", core)
    noday = _re.sub(r"^[A-Za-z]{3}\s+(?=[A-Za-z]{3}\s)", "", core2)
    dt = None
    for fmt, src in (
        ("%Y-%m-%d %H:%M:%S", core2),
        ("%Y-%m-%dT%H:%M:%S", core2),
        ("%Y-%m-%d", core2),
        ("%m/%d/%Y %H:%M:%S", core2),
        ("%m/%d/%Y", core2),
        ("%b %d %H:%M:%S %Y", noday),
        ("%b %d %Y", noday),
    ):
        try:
            dt = _dt.datetime.strptime(src, fmt)
            break
        except ValueError:
            continue
    if dt is None:
        return None
    us = int((dt - _dt.datetime(1970, 1, 1)).total_seconds()) * US_PER_SEC + frac
    return us - tz_us if apply_tz else us


def py_parse_date_days(s: str) -> int | None:
    low = s.strip().lower()
    if low == "infinity":
        return TS_INFINITY
    if low == "-infinity":
        return TS_NEG_INFINITY
    us = py_parse_ts_us(s)
    if us is None:
        return None
    return us // US_PER_DAY


def py_parse_time_us(s: str) -> int | None:
    txt = s.strip()
    m = _re.search(r":\d{2}(\.\d+)?\s*[+-]\d{1,2}(:\d{2})?\s*$", txt)
    if m:
        txt = _re.sub(r"\s*[+-]\d{1,2}(:\d{2})?\s*$", "", txt)
    fm = _re.search(r"\.(\d+)", txt)
    frac = int(fm.group(1).ljust(6, "0")[:6]) if fm else 0
    core2 = _re.sub(r"\.\d+", "", txt)
    hm = _re.match(r"^(\d{1,2}):(\d{2})(?::(\d{2}))?$", core2)
    if hm:
        h, mi, sec = int(hm.group(1)), int(hm.group(2)), int(hm.group(3) or 0)
        return h * US_PER_HOUR + mi * US_PER_MIN + sec * US_PER_SEC + frac
    us = py_parse_ts_us(s)
    return None if us is None else us % US_PER_DAY


_PY_IV_UNITS = {
    "year": 12, "years": 12, "yr": 12, "yrs": 12,
    "month": 1, "months": 1, "mon": 1, "mons": 1,
    "week": ("d", 7), "weeks": ("d", 7), "day": ("d", 1), "days": ("d", 1),
    "hour": ("u", 3600), "hours": ("u", 3600), "hr": ("u", 3600), "hrs": ("u", 3600),
    "minute": ("u", 60), "minutes": ("u", 60), "min": ("u", 60), "mins": ("u", 60),
    "second": ("u", 1), "seconds": ("u", 1), "sec": ("u", 1), "secs": ("u", 1),
}


def py_parse_interval(s: str) -> tuple[int, int, int] | None:
    low = s.strip().lower()
    ago = bool(_re.search(r"\bago\s*$", low))
    core = _re.sub(r"\s*\bago\s*$", "", low)
    months = days = 0.0
    us = 0.0
    found = False
    for num, unit in _re.findall(r"(-?\d+(?:\.\d+)?)\s*([a-z]+)", core):
        v = float(num)
        spec = _PY_IV_UNITS.get(unit)
        found = True
        if spec is None:
            continue
        if isinstance(spec, int):
            months += v * spec
        elif spec[0] == "d":
            days += v * spec[1]
        else:
            us += v * spec[1] * US_PER_SEC
    cm = _re.search(r"(^|\s)(-?\d+:\d{2}(?::\d{2}(?:\.\d+)?)?)", core)
    if cm:
        found = True
        clk = cm.group(2)
        sign = -1.0 if clk.startswith("-") else 1.0
        bits = clk.lstrip("-").split(":")
        secs = int(bits[0]) * 3600 + int(bits[1]) * 60 + (float(bits[2]) if len(bits) > 2 else 0.0)
        us += sign * secs * US_PER_SEC
    if not found:
        return None
    m_i = int(months)
    days += (months - m_i) * 30
    d_i = int(days)
    us_i = round(us + (days - d_i) * US_PER_DAY)
    sign = -1 if ago else 1
    return (m_i * sign, d_i * sign, us_i * sign)


# ------------------------------------------------------------------ parsing

def _tz_offset_us(txt: Column) -> Column:
    """Trailing '+HH[:MM]' offset -> signed µs (0 when absent). Only a
    suffix that follows a time (…:SS[.f]) counts — '2023-06-23' must not
    lose its day to a bogus '-23' offset."""
    has = txt.rlike(r":\d{2}(\.\d+)?\s*[+-]\d{1,2}(:\d{2})?$")
    tz = F.when(has, F.regexp_extract(txt, r"([+-]\d{1,2}(:\d{2})?)\s*$", 1)).otherwise(F.lit(""))
    sign = F.when(tz.startswith("-"), F.lit(-1)).otherwise(F.lit(1))
    h = F.regexp_extract(tz, r"[+-](\d{1,2})", 1)
    m = F.regexp_extract(tz, r":(\d{2})$", 1)
    hh = F.when(h == "", F.lit(0)).otherwise(h.cast("int"))
    mm = F.when(m == "", F.lit(0)).otherwise(m.cast("int"))
    return (sign * (hh * 3600 + mm * 60)).cast("long") * US_PER_SEC


def _strip_tz(txt: Column) -> Column:
    has = txt.rlike(r":\d{2}(\.\d+)?\s*[+-]\d{1,2}(:\d{2})?$")
    return F.when(has, F.regexp_replace(txt, r"\s*[+-]\d{1,2}(:\d{2})?\s*$", "")).otherwise(txt)


def _frac_us(txt: Column) -> Column:
    """'.ffff' fraction after seconds -> µs (0 when absent)."""
    fr = F.regexp_extract(txt, r"\.(\d+)", 1)
    return F.when(fr == "", F.lit(0).cast("long")).otherwise(
        F.rpad(fr, 6, "0").substr(1, 6).cast("long")
    )


def parse_ts_us(s: Column, apply_tz: bool = False) -> Column:
    """Timestamp text -> µs since 1970 (SQL null on parse failure).
    Accepts ISO, 'M/D/YYYY [H:M:S[.f]][±TZ]' and 'Dow Mon D [H:M:S] YYYY'
    (the PG datestyles exercised by regress/sql/temporal.sql:30-42)."""
    # txt/core/core2 are each reused 2-5×: let-bound so a non-trivial
    # source expression (e.g. a variant property read) isn't copied into
    # every derived regex (see gtype.set_scalar_binder)
    txt = G.let_scalar(F.trim(s))
    low = F.lower(txt)
    core = G.let_scalar(_strip_tz(F.regexp_replace(txt, r"Z$", "")))  # ISO 'Z' = UTC
    frac = _frac_us(core)
    core2 = G.let_scalar(F.regexp_replace(core, r"\.\d+", ""))
    # 'Fri Jun 23 13:39:40 2023' — strip the weekday, parse 'MMM d H:m:s yyyy'
    noday = G.let_scalar(F.regexp_replace(core2, r"^[A-Za-z]{3}\s+(?=[A-Za-z]{3}\s)", ""))
    ts = F.coalesce(
        F.try_to_timestamp(core2),
        F.try_to_timestamp(core2, F.lit("M/d/yyyy H:m:s")),
        F.try_to_timestamp(core2, F.lit("M/d/yyyy")),
        F.try_to_timestamp(noday, F.lit("MMM d H:m:s yyyy")),
        F.try_to_timestamp(noday, F.lit("MMM d yyyy")),
    )
    us = F.unix_micros(ts) + frac
    if apply_tz:
        us = us - _tz_offset_us(txt)
    return (
        F.when(low == "infinity", F.lit(TS_INFINITY))
        .when(low == "-infinity", F.lit(TS_NEG_INFINITY))
        .otherwise(us)
    )


def parse_date_days(s: Column) -> Column:
    """Date text -> days since 1970 (truncates any time-of-day)."""
    low = F.lower(F.trim(s))
    us = parse_ts_us(s)
    return (
        F.when(low == "infinity", F.lit(TS_INFINITY))
        .when(low == "-infinity", F.lit(TS_NEG_INFINITY))
        .otherwise(_long_floor_div(us, US_PER_DAY))
    )


def parse_time_us(s: Column) -> Column:
    """Time-of-day text -> µs since midnight. Accepts 'H:M[:S[.f]][±TZ]'
    directly, else any timestamp format's time-of-day."""
    txt = _strip_tz(F.trim(s))
    frac = _frac_us(txt)
    hms = F.regexp_extract(txt, r"^(\d{1,2}):(\d{2})(?::(\d{2}))?$", 0)
    h = F.regexp_extract(txt, r"^(\d{1,2}):", 1).cast("long")
    m = F.regexp_extract(txt, r"^\d{1,2}:(\d{2})", 1).cast("long")
    sec = F.regexp_extract(txt, r"^\d{1,2}:\d{2}:(\d{2})", 1)
    sec_l = F.when(sec == "", F.lit(0)).otherwise(sec.cast("long"))
    core2 = F.regexp_replace(txt, r"\.\d+", "")
    direct = core2.rlike(r"^\d{1,2}:\d{2}(:\d{2})?$")
    from_parts = h * US_PER_HOUR + m * US_PER_MIN + sec_l * US_PER_SEC + frac
    fallback = F.pmod(parse_ts_us(s), F.lit(US_PER_DAY))
    _ = hms  # anchor kept for readability
    return F.when(direct, from_parts).otherwise(fallback)


def parse_interval_parts(s: Column) -> Column:
    """Interval text -> struct(months, days, us) with PG's unit grammar:
    '[N unit]... [ago]' plus an optional 'H:MM[:SS[.f]]' clock part.
    Fractional units cascade down (1.5 mons = 1 mon 15 days) per PG
    interval_in. Unparseable -> null struct.

    One regexp_extract_all + fold keeps the expression tree small (a
    per-unit regexp chain put whole-stage codegen 10s+ per query)."""
    low = F.lower(F.trim(s))
    ago = low.rlike(r"\bago\s*$")
    core = F.regexp_replace(low, r"\s*\bago\s*$", "")

    pairs = F.regexp_extract_all(core, F.lit(r"(-?\d+(?:\.\d+)?\s*[a-z]+)"), 1)

    def step(acc: Column, x: Column) -> Column:
        v = F.regexp_extract(x, r"(-?\d+(?:\.\d+)?)", 1).cast("double")
        unit = F.regexp_extract(x, r"([a-z]+)", 1)
        mon = (
            F.when(unit.rlike("^(years?|yrs?)$"), v * 12)
            .when(unit.rlike("^(months?|mons?)$"), v)
            .otherwise(F.lit(0.0))
        )
        day = (
            F.when(unit.rlike("^(weeks?)$"), v * 7)
            .when(unit.rlike("^(days?)$"), v)
            .otherwise(F.lit(0.0))
        )
        us = (
            F.when(unit.rlike("^(hours?|hrs?)$"), v * 3600)
            .when(unit.rlike("^(minutes?|mins?)$"), v * 60)
            .when(unit.rlike("^(seconds?|secs?)$"), v)
            .otherwise(F.lit(0.0))
        ) * US_PER_SEC
        return F.struct(
            (acc["m"] + mon).alias("m"), (acc["d"] + day).alias("d"), (acc["u"] + us).alias("u")
        )

    zero = F.struct(F.lit(0.0).alias("m"), F.lit(0.0).alias("d"), F.lit(0.0).alias("u"))
    acc = F.aggregate(pairs, zero, step)

    # clock part 'H:MM[:SS[.f]]' (PG sql-style interval text)
    clk = F.regexp_extract(core, r"(^|\s)(-?\d+:\d{2}(?::\d{2}(?:\.\d+)?)?)", 2)
    clk_sign = F.when(clk.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))
    clk_h = F.regexp_extract(clk, r"(\d+):", 1)
    clk_m = F.regexp_extract(clk, r":(\d{2})", 1)
    clk_s = F.regexp_extract(clk, r":\d{2}:(\d{2}(?:\.\d+)?)", 1)
    clk_us = F.when(clk == "", F.lit(0.0)).otherwise(
        clk_sign
        * (
            clk_h.cast("double") * 3600
            + clk_m.cast("double") * 60
            + F.when(clk_s == "", F.lit(0.0)).otherwise(clk_s.cast("double"))
        )
        * US_PER_SEC
    )

    found = (F.size(pairs) > 0) | (clk != "")
    months_d = acc["m"]
    # cascade fractional months -> days -> µs (PG AdjustFractDays)
    m_i = months_d.cast("long")
    days_d = acc["d"] + (months_d - m_i) * 30
    d_i = days_d.cast("long")
    us_i = F.round(acc["u"] + clk_us + (days_d - d_i) * US_PER_DAY).cast("long")
    sign = F.when(ago, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    return F.struct(
        F.when(found, m_i * sign).alias("months"),
        F.when(found, d_i * sign).alias("days"),
        F.when(found, us_i * sign).alias("us"),
    )


# ------------------------------------------------------------------- casts

def _gv_ts_us(gv: Column) -> Column:
    """timestamp-or-date gval -> µs axis (null for other types);
    statically-impossible branches pruned."""
    types = G.gv_types(gv)
    pairs = []
    if G.T_TIMESTAMP in types:
        pairs.append((gv.t == G.T_TIMESTAMP, gv.i))
    if G.T_DATE in types:
        pairs.append((gv.t == G.T_DATE, gv.i * US_PER_DAY))
    return G._whens(pairs) if pairs else F.lit(None).cast("long")


def cast_timestamp(gv: Column, with_tz: bool = False) -> Column:
    """:: timestamp / ::timestamptz (gtype_to_timestamp_internal):
    string -> datetime parse; integer -> µs since 2000-01-01; date
    promotes; timestamp passes through. Branches prune on gv_types —
    in particular the heavy text parser is only built when the operand
    may be a string."""
    types = G.gv_types(gv)
    pairs = []
    if G.T_TIMESTAMP in types:
        pairs.append((gv.t == G.T_TIMESTAMP, gv.i))
    if G.T_DATE in types:
        pairs.append((gv.t == G.T_DATE, gv.i * US_PER_DAY))
    if G.T_NUMBER in types:
        pairs.append(((gv.t == G.T_NUMBER) & gv.i.isNotNull(), gv.i + PG_EPOCH_US))
    if G.T_STRING in types:
        pairs.append((gv.t == G.T_STRING, parse_ts_us(gv.s, apply_tz=with_tz)))
    return G.gv_timestamp(G._whens(pairs) if pairs else F.lit(None).cast("long"))


def cast_date(gv: Column) -> Column:
    types = G.gv_types(gv)
    pairs = []
    if G.T_DATE in types:
        pairs.append((gv.t == G.T_DATE, gv.i))
    if G.T_TIMESTAMP in types:
        pairs.append((gv.t == G.T_TIMESTAMP, _long_floor_div(gv.i, US_PER_DAY)))
    if G.T_NUMBER in types:
        pairs.append(((gv.t == G.T_NUMBER) & gv.i.isNotNull(), gv.i + PG_EPOCH_DAYS))
    if G.T_STRING in types:
        pairs.append((gv.t == G.T_STRING, parse_date_days(gv.s)))
    return G.gv_date(G._whens(pairs) if pairs else F.lit(None).cast("long"))


def cast_time(gv: Column) -> Column:
    types = G.gv_types(gv)
    pairs = []
    if G.T_TIME in types:
        pairs.append((gv.t == G.T_TIME, gv.i))
    if G.T_TIMESTAMP in types:
        pairs.append((gv.t == G.T_TIMESTAMP, F.pmod(gv.i, F.lit(US_PER_DAY))))
    if G.T_INTERVAL in types:
        iv = G.interval_parts(gv)
        pairs.append((gv.t == G.T_INTERVAL, F.pmod(iv["us"], F.lit(US_PER_DAY))))
    if G.T_STRING in types:
        pairs.append((gv.t == G.T_STRING, parse_time_us(gv.s)))
    return G.gv_time(G._whens(pairs) if pairs else F.lit(None).cast("long"))


def cast_interval(gv: Column) -> Column:
    types = G.gv_types(gv)
    f_iv, f_s = G.T_INTERVAL in types, G.T_STRING in types
    iv = G.interval_parts(gv) if f_iv else None
    p = parse_interval_parts(gv.s) if f_s else None

    def pick(k: str) -> Column:
        pairs = []
        if f_iv:
            pairs.append((gv.t == G.T_INTERVAL, iv[k]))
        if f_s:
            pairs.append((gv.t == G.T_STRING, p[k]))
        return G._whens(pairs) if pairs else F.lit(None).cast("long")

    return G.gv_interval(pick("months"), pick("days"), pick("us"))


# --------------------------------------------------------------- functions

_EXTRACT_TS_FIELDS = {
    "year", "month", "day", "hour", "minute", "second", "century", "decade",
    "millennium", "dow", "isodow", "doy", "epoch", "isoyear", "julian",
    "microseconds", "milliseconds", "quarter", "week", "timezone",
    "timezone_hour", "timezone_minute",
}


# Field dispatch discipline: each kernel exposes its per-field formulas
# as a dict builder; a literal field name (the overwhelmingly common
# case — functions_map folds A.Lit fields to python strings) selects ONE
# formula at compile time. The fallback Column-field path builds the
# full when-chain. Without this, composed calls like
# date_part('epoch', date_trunc('month', x)) multiply tree paths
# (20 branches × 20 branches × per-branch arg fan-out) and Column->
# Catalyst conversion alone took minutes.


def _ts_field_exprs(us: Column) -> dict:
    """PG extract/date_part formulas over a µs-axis value -> double
    (timestamp_part, PG timestamp.c; tz fields are 0 under UTC).
    LAZY: values are thunks — a literal field name (the common case)
    builds exactly ONE formula instead of all 21 (driver-side plan-build
    cost, round-4 verdict item #1)."""
    def ts():
        return F.timestamp_micros(us)

    def y():
        return F.year(ts())

    def sec_us():
        return F.pmod(us, F.lit(US_PER_MIN))

    def century():
        yy = y()
        return F.when(yy > 0, F.floor((yy.cast("double") + 99) / 100)).otherwise(
            -F.floor((-yy.cast("double") + 99) / 100)
        ).cast("double")

    def millennium():
        yy = y()
        return F.when(yy > 0, F.floor((yy.cast("double") + 999) / 1000)).otherwise(
            -F.floor((-yy.cast("double") + 999) / 1000)
        ).cast("double")

    def julian():
        tod = F.pmod(us, F.lit(US_PER_DAY))
        days = _long_floor_div(us, US_PER_DAY)
        return (days + JULIAN_UNIX_EPOCH).cast("double") + tod.cast("double") / US_PER_DAY

    zero = lambda: F.lit(0.0)
    return {
        "year": lambda: y().cast("double"),
        "month": lambda: F.month(ts()).cast("double"),
        "day": lambda: F.dayofmonth(ts()).cast("double"),
        "hour": lambda: F.hour(ts()).cast("double"),
        "minute": lambda: F.minute(ts()).cast("double"),
        "second": lambda: sec_us().cast("double") / US_PER_SEC,
        "microseconds": lambda: sec_us().cast("double"),
        "milliseconds": lambda: sec_us().cast("double") / 1000,
        "epoch": lambda: us.cast("double") / US_PER_SEC,
        "century": century,
        "millennium": millennium,
        "decade": lambda: (y() / 10).cast("long").cast("double"),
        "dow": lambda: (F.dayofweek(ts()) - 1).cast("double"),
        "isodow": lambda: (F.weekday(ts()) + 1).cast("double"),
        "doy": lambda: F.dayofyear(ts()).cast("double"),
        "isoyear": lambda: F.extract(F.lit("YEAROFWEEK"), ts()).cast("double"),
        "week": lambda: F.weekofyear(ts()).cast("double"),
        "quarter": lambda: F.quarter(ts()).cast("double"),
        "julian": julian,
        "timezone": zero, "timezone_hour": zero, "timezone_minute": zero,
    }


def _time_field_exprs(us: Column) -> dict:
    def sec_us():
        return F.pmod(us, F.lit(US_PER_MIN))

    return {
        "hour": lambda: _long_floor_div(us, US_PER_HOUR).cast("double"),
        "minute": lambda: F.pmod(_long_floor_div(us, US_PER_MIN), F.lit(60)).cast("double"),
        "second": lambda: sec_us().cast("double") / US_PER_SEC,
        "microseconds": lambda: sec_us().cast("double"),
        "milliseconds": lambda: sec_us().cast("double") / 1000,
        "epoch": lambda: us.cast("double") / US_PER_SEC,
    }


def _interval_field_exprs(parts: Column) -> dict:
    """interval_part: year/month from months, day from days, time fields
    from µs; epoch uses PG's 365.25-day years / 30-day months. Lazy."""
    m, d, u = parts["months"], parts["days"], parts["us"]

    def yrs():
        return (m / 12).cast("long")

    def epoch():
        yy = yrs()
        return (
            (yy.cast("double") * 365.25 + (m - yy * 12).cast("double") * 30 + d.cast("double"))
            * 86400
            + u.cast("double") / US_PER_SEC
        )

    return {
        "year": lambda: yrs().cast("double"),
        "month": lambda: (m - yrs() * 12).cast("double"),
        "day": lambda: d.cast("double"),
        "hour": lambda: (u / US_PER_HOUR).cast("long").cast("double"),
        "minute": lambda: F.pmod((u / US_PER_MIN).cast("long"), F.lit(60)).cast("double"),
        "second": lambda: F.pmod(u, F.lit(US_PER_MIN)).cast("double") / US_PER_SEC,
        "microseconds": lambda: F.pmod(u, F.lit(US_PER_MIN)).cast("double"),
        "milliseconds": lambda: F.pmod(u, F.lit(US_PER_MIN)).cast("double") / 1000,
        "epoch": epoch,
        "decade": lambda: (yrs() / 10).cast("long").cast("double"),
        "century": lambda: (yrs() / 100).cast("long").cast("double"),
        "millennium": lambda: (yrs() / 1000).cast("long").cast("double"),
        "quarter": lambda: ((F.pmod(m, F.lit(12)) / 3).cast("long") + 1).cast("double"),
    }


def _pick_field(exprs: dict, field: Column | str) -> Column:
    """One formula for a literal field name; when-chain otherwise."""
    if isinstance(field, str):
        e = exprs.get(field.lower())
        return e() if e is not None else F.lit(None).cast("double")
    out = None
    for k, v in exprs.items():
        out = F.when(field == k, v()) if out is None else out.when(field == k, v())
    return out


def _dispatch_part(field_gv: Column | str, gv: Column) -> Column:
    """Shared extract/date_part dispatch -> double (null on bad input).
    field_gv may be a python str (compile-time-folded literal). Only
    statically-feasible source-type branches are built (gv_types)."""
    if isinstance(field_gv, str):
        field: Column | str = field_gv
        ok = F.lit(True)
    else:
        field = F.lower(field_gv.s)
        ok = field_gv.t == G.T_STRING
    types = G.gv_types(gv)
    pairs = []
    if types & {G.T_TIMESTAMP, G.T_DATE}:
        pairs.append((
            gv.t.isin(G.T_TIMESTAMP, G.T_DATE),
            _pick_field(_ts_field_exprs(_gv_ts_us(gv)), field),
        ))
    if G.T_TIME in types:
        pairs.append((gv.t == G.T_TIME, _pick_field(_time_field_exprs(gv.i), field)))
    if G.T_INTERVAL in types:
        pairs.append((
            gv.t == G.T_INTERVAL,
            _pick_field(_interval_field_exprs(G.interval_parts(gv)), field),
        ))
    d = G._whens(pairs) if pairs else F.lit(None).cast("double")
    return F.when(ok, d)


def extract_gv(field_gv: Column | str, gv: Column) -> Column:
    """EXTRACT(field FROM x) — returns numeric in the reference
    (gtype_extract, gtype_temporal.c:158-212); here integer-valued
    results keep integer identity (numeric '20' renders as 20)."""
    d = _dispatch_part(field_gv, gv)
    is_int = (d == F.floor(d)) & (F.abs(d) < F.lit(2.0 ** 53))
    return G.gv_num(i=F.when(is_int, d.cast("long")), d=d)


def date_part_gv(field_gv: Column | str, gv: Column) -> Column:
    """date_part(field, x) — float8 result (gtype_date_part,
    gtype_temporal.c:213-267)."""
    return G.gv_float(_dispatch_part(field_gv, gv))


def _trunc_ts_exprs(us: Column) -> dict:
    """timestamp_trunc target -> truncated µs (PG timestamp.c). Lazy."""
    def ts():
        return F.timestamp_micros(us)

    def dec():
        return F.unix_micros(
            F.make_date((F.year(ts()) / 10).cast("int") * 10, F.lit(1), F.lit(1)).cast("timestamp")
        )

    def cen():
        y = F.year(ts())
        cy = F.when(y > 0, ((y - 1) / 100).cast("int") * 100 + 1).otherwise(y)
        return F.unix_micros(F.make_date(cy, F.lit(1), F.lit(1)).cast("timestamp"))

    def mil():
        y = F.year(ts())
        my = F.when(y > 0, ((y - 1) / 1000).cast("int") * 1000 + 1).otherwise(y)
        return F.unix_micros(F.make_date(my, F.lit(1), F.lit(1)).cast("timestamp"))

    out = {
        f: (lambda f=f: F.unix_micros(F.date_trunc(f, ts())))
        for f in ("year", "quarter", "month", "week", "day", "hour", "minute", "second")
    }
    out["decade"] = dec
    out["century"] = cen
    out["millennium"] = mil
    out["milliseconds"] = lambda: us - F.pmod(us, F.lit(1000))
    out["microseconds"] = lambda: us
    return out


def _trunc_iv_exprs(parts: Column) -> dict:
    """interval_trunc target -> (months, days, us) thunks with
    lower-order fields zeroed (PG interval_trunc)."""
    m, d, u = parts["months"], parts["days"], parts["us"]
    z = F.lit(0).cast("long")
    return {
        "year": lambda: ((m / 12).cast("long") * 12, z, z),
        "quarter": lambda: ((m / 3).cast("long") * 3, z, z),
        "month": lambda: (m, z, z),
        "day": lambda: (m, d, z),
        "hour": lambda: (m, d, u - F.pmod(u, F.lit(US_PER_HOUR))),
        "minute": lambda: (m, d, u - F.pmod(u, F.lit(US_PER_MIN))),
        "second": lambda: (m, d, u - F.pmod(u, F.lit(US_PER_SEC))),
        "milliseconds": lambda: (m, d, u - F.pmod(u, F.lit(1000))),
        "microseconds": lambda: (m, d, u),
    }


def date_trunc_gv(field_gv: Column | str, gv: Column) -> Column:
    """date_trunc(field, ts|interval) (gtype_temporal.c:589-684; PG
    timestamp_trunc/interval_trunc). Optional tz arg of the reference's
    3-arg form is accepted upstream but only UTC semantics exist here.
    A literal field (python str) folds to the single target's formula;
    statically-infeasible source types are pruned (gv_types)."""
    if isinstance(field_gv, str):
        field: Column | str = field_gv.lower()
        field_ok = F.lit(True)
    else:
        field = F.lower(field_gv.s)
        field_ok = field_gv.t == G.T_STRING
    types = G.gv_types(gv)
    f_ts = bool(types & {G.T_TIMESTAMP, G.T_DATE})
    f_iv = G.T_INTERVAL in types
    nil_l = F.lit(None).cast("long")
    t_us = nil_l
    iv_m = iv_d = iv_u = nil_l
    if f_ts:
        ts_map = _trunc_ts_exprs(_gv_ts_us(gv))
        if isinstance(field, str):
            thunk = ts_map.get(field)
            t_us = thunk() if thunk is not None else nil_l
        else:
            t_us = _pick_field(ts_map, field).cast("long")
    if f_iv:
        iv_map = _trunc_iv_exprs(G.interval_parts(gv))
        if isinstance(field, str):
            thunk = iv_map.get(field)
            iv_m, iv_d, iv_u = thunk() if thunk is not None else (nil_l, nil_l, nil_l)
        else:
            iv_m = _pick_field({k: (lambda k=k: iv_map[k]()[0]) for k in iv_map}, field).cast("long")
            iv_d = _pick_field({k: (lambda k=k: iv_map[k]()[1]) for k in iv_map}, field).cast("long")
            iv_u = _pick_field({k: (lambda k=k: iv_map[k]()[2]) for k in iv_map}, field).cast("long")
    is_ts = gv.t.isin(G.T_TIMESTAMP, G.T_DATE) & field_ok if f_ts else F.lit(False)
    is_iv = ((gv.t == G.T_INTERVAL) & field_ok) if f_iv else F.lit(False)
    if not f_iv:
        return G.gv_timestamp(F.when(is_ts, t_us))
    iv_part = G.gv_interval(F.when(is_iv, iv_m), iv_d, iv_u)
    if not f_ts:
        return iv_part
    ts_part = G.gv_timestamp(F.when(is_ts, t_us))
    # one flat struct: pick field-wise between the two candidate gvals
    out = G._mk(
        F.when(is_iv, iv_part["t"]).otherwise(ts_part["t"]),
        i=F.when(is_iv, iv_part["i"]).otherwise(ts_part["i"]),
        d=F.when(is_iv, iv_part["d"]).otherwise(ts_part["d"]),
        j=F.when(is_iv, iv_part["j"]),
    )
    return G._tag_types(out, G.T_TIMESTAMP, G.T_INTERVAL)


def date_bin_gv(stride_gv: Column, src_gv: Column, origin_gv: Column) -> Column:
    """date_bin(stride, source, origin) (gtype_temporal.c:686-746; PG
    timestamp_bin): origin-anchored floor to a whole number of strides.
    Month-bearing strides are an error in PG -> gtype null here."""
    p = G.interval_parts(stride_gv)
    stride_us = p["days"] * US_PER_DAY + p["us"]
    src = _gv_ts_us(src_gv)
    org = _gv_ts_us(origin_gv)
    ok = (p["months"] == 0) & (stride_us > 0) & src.isNotNull() & org.isNotNull()
    out = src - F.pmod(src - org, stride_us)
    return G.gv_timestamp(F.when(ok, out))


def age2_gv(a: Column, b: Column) -> Column:
    """age(ts1, ts2) — PG timestamp_age's symbolic field-wise difference
    with borrow (gtype_temporal.c:123-157): produces {months, days, us}
    such that ts2 + result steps the calendar to ts1. PG computes the
    non-negative difference (negating the operands' roles when dt1<dt2)
    and flips the sign at the end — so age(x,y) == -age(y,x) exactly."""
    # every intermediate is let-bound (G.let_scalar): the borrow tower
    # reuses each level 2-4×, and built as one Column tree the reuse
    # copies whole subtrees — exponential growth, measured ~98KB for one
    # projection expression (round-6 verdict item #1). As hidden columns
    # each level is O(1) over attributes.
    L = G.let_scalar
    ua0, ub0 = L(_gv_ts_us(a)), L(_gv_ts_us(b))
    neg = ua0 < ub0
    sign = L(F.when(neg, F.lit(-1)).otherwise(F.lit(1)).cast("long"))
    ua, ub = L(F.greatest(ua0, ub0)), L(F.least(ua0, ub0))
    ta, tb = L(F.timestamp_micros(ua)), L(F.timestamp_micros(ub))
    tod_diff0 = L(F.pmod(ua, F.lit(US_PER_DAY)) - F.pmod(ub, F.lit(US_PER_DAY)))
    day_borrow = L(F.when(tod_diff0 < 0, F.lit(1)).otherwise(F.lit(0)))
    tod_diff = L(tod_diff0 + day_borrow * US_PER_DAY)

    day_diff0 = L(F.dayofmonth(ta) - F.dayofmonth(tb) - day_borrow)
    # borrow days-in-month of the earlier operand's month
    # (timestamp_age's day_tab lookup)
    dim = L(F.dayofmonth(F.last_day(tb)))
    b1 = L(F.when(day_diff0 < 0, F.lit(1)).otherwise(F.lit(0)))
    day_diff1 = L(day_diff0 + b1 * dim)
    b2 = L(F.when(day_diff1 < 0, F.lit(1)).otherwise(F.lit(0)))
    day_diff = L(day_diff1 + b2 * dim)
    mon_borrow = b1 + b2

    mon_diff0 = L(F.month(ta) - F.month(tb) - mon_borrow)
    yb1 = L(F.when(mon_diff0 < 0, F.lit(1)).otherwise(F.lit(0)))
    mon_diff1 = L(mon_diff0 + yb1 * 12)
    yb2 = L(F.when(mon_diff1 < 0, F.lit(1)).otherwise(F.lit(0)))
    mon_diff = L(mon_diff1 + yb2 * 12)
    year_diff = L(F.year(ta) - F.year(tb) - yb1 - yb2)

    months = L((year_diff.cast("long") * 12 + mon_diff).cast("long"))
    ok = a.t.isin(G.T_TIMESTAMP, G.T_DATE) & b.t.isin(G.T_TIMESTAMP, G.T_DATE)
    return G.gv_interval(
        F.when(ok, months * sign), day_diff.cast("long") * sign, tod_diff.cast("long") * sign
    )


def age1_gv(a: Column) -> Column:
    """age(ts) — today (date_trunc day) minus ts via plain timestamp_mi
    (gtype_age_today, gtype_temporal.c:92-121): {days, µs} interval, no
    month normalization."""
    today_us = F.unix_date(F.current_date()).cast("long") * US_PER_DAY
    diff = today_us - _gv_ts_us(a)
    # truncate-toward-zero split (justify_hours convention of timestamp_mi)
    q = F.when(diff >= 0, _long_floor_div(diff, US_PER_DAY)).otherwise(
        -_long_floor_div(-diff, US_PER_DAY)
    )
    rem = diff - q * US_PER_DAY
    ok = a.t.isin(G.T_TIMESTAMP, G.T_DATE)
    return G.gv_interval(F.when(ok, F.lit(0).cast("long")), q, rem)


def _days_from_civil(y: Column, m: Column, d: Column) -> Column:
    """Proleptic-Gregorian (y,m,d) -> days since 1970-01-01, pure integer
    arithmetic (the standard civil-calendar algorithm; also what PG's
    date2j computes, shifted to the unix epoch). Handles BC years."""
    yp = y - F.when(m <= 2, 1).otherwise(0)
    era = F.floor(yp.cast("double") / 400).cast("long")
    yoe = yp - era * 400
    mp = F.when(m > 2, m - 3).otherwise(m + 9)
    doy = ((153 * mp + 2) / 5).cast("long") + d - 1
    doe = yoe * 365 + (yoe / 4).cast("long") - (yoe / 100).cast("long") + doy
    return era * 146097 + doe - 719468


def _is_leap(y: Column) -> Column:
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def make_date_gv(y: Column, m: Column, d: Column) -> Column:
    """make_date(y,m,d); negative year = BC (ISO year = y+1), year 0 and
    out-of-range fields are errors -> null (gtype_temporal.c:268-298)."""
    iso_y = F.when(y.i < 0, y.i + 1).otherwise(y.i)
    dim = (
        F.when(m.i.isin(1, 3, 5, 7, 8, 10, 12), 31)
        .when(m.i.isin(4, 6, 9, 11), 30)
        .when(_is_leap(iso_y), 29)
        .otherwise(28)
    )
    ok = (y.i != 0) & (m.i >= 1) & (m.i <= 12) & (d.i >= 1) & (d.i <= dim)
    days = _days_from_civil(iso_y, m.i, d.i)
    return G.gv_date(F.when(ok, days))


def make_time_gv(h: Column, m: Column, s: Column) -> Column:
    us = (
        h.i * US_PER_HOUR
        + m.i * US_PER_MIN
        + F.round(s.d * US_PER_SEC).cast("long")
    )
    ok = (
        (h.i >= 0) & (h.i <= 23) & (m.i >= 0) & (m.i <= 59)
        & (s.d >= 0) & (s.d < 60)
    )
    return G.gv_time(F.when(ok, us))


def make_timestamp_gv(y, mo, d, h, mi, s) -> Column:
    date_part = make_date_gv(y, mo, d)
    time_part = make_time_gv(h, mi, s)
    us = date_part["i"] * US_PER_DAY + time_part["i"]
    return G.gv_timestamp(us)


def justify_hours_gv(gv: Column) -> Column:
    """24h blocks of the µs field move into days (PG justify_hours
    including the sign re-normalization)."""
    p = G.interval_parts(gv)
    m, d0, u0 = p["months"], p["days"], p["us"]
    whole = F.when(u0 >= 0, _long_floor_div(u0, US_PER_DAY)).otherwise(
        -_long_floor_div(-u0, US_PER_DAY)
    )
    u1 = u0 - whole * US_PER_DAY
    d1 = d0 + whole
    fix_pos = (d1 > 0) & (u1 < 0)
    fix_neg = (d1 < 0) & (u1 > 0)
    u2 = F.when(fix_pos, u1 + US_PER_DAY).when(fix_neg, u1 - US_PER_DAY).otherwise(u1)
    d2 = F.when(fix_pos, d1 - 1).when(fix_neg, d1 + 1).otherwise(d1)
    return G.gv_interval(m, d2, u2)


def justify_days_gv(gv: Column) -> Column:
    """30-day blocks of the day field move into months (PG justify_days)."""
    p = G.interval_parts(gv)
    m0, d0, u = p["months"], p["days"], p["us"]
    whole = F.when(d0 >= 0, _long_floor_div(d0, 30)).otherwise(-_long_floor_div(-d0, 30))
    d1 = d0 - whole * 30
    m1 = m0 + whole
    fix_pos = (m1 > 0) & (d1 < 0)
    fix_neg = (m1 < 0) & (d1 > 0)
    d2 = F.when(fix_pos, d1 + 30).when(fix_neg, d1 - 30).otherwise(d1)
    m2 = F.when(fix_pos, m1 - 1).when(fix_neg, m1 + 1).otherwise(m1)
    return G.gv_interval(m2, d2, u)


def justify_interval_gv(gv: Column) -> Column:
    """Full normalization: hours->days then days->months with combined
    sign fixups (PG justify_interval)."""
    p = G.interval_parts(gv)
    m0, d0, u0 = p["months"], p["days"], p["us"]
    wd = F.when(u0 >= 0, _long_floor_div(u0, US_PER_DAY)).otherwise(
        -_long_floor_div(-u0, US_PER_DAY)
    )
    u1 = u0 - wd * US_PER_DAY
    d1 = d0 + wd
    wm = F.when(d1 >= 0, _long_floor_div(d1, 30)).otherwise(-_long_floor_div(-d1, 30))
    d2 = d1 - wm * 30
    m1 = m0 + wm
    # sign corrections (month dominates, then day)
    neg_tail = (d2 < 0) | ((d2 == 0) & (u1 < 0))
    pos_tail = (d2 > 0) | ((d2 == 0) & (u1 > 0))
    fix1 = (m1 > 0) & neg_tail
    fix2 = (m1 < 0) & pos_tail
    d3 = F.when(fix1, d2 + 30).when(fix2, d2 - 30).otherwise(d2)
    m2 = F.when(fix1, m1 - 1).when(fix2, m1 + 1).otherwise(m1)
    fix3 = (d3 > 0) & (u1 < 0)
    fix4 = (d3 < 0) & (u1 > 0)
    u2 = F.when(fix3, u1 + US_PER_DAY).when(fix4, u1 - US_PER_DAY).otherwise(u1)
    d4 = F.when(fix3, d3 - 1).when(fix4, d3 + 1).otherwise(d3)
    return G.gv_interval(m2, d4, u2)


def isfinite_gv(gv: Column) -> Column:
    """isfinite(date|timestamp|interval) (gtype_temporal.c:480-510):
    false only for the ±infinity sentinels."""
    inf = gv.i.isin(TS_INFINITY, TS_NEG_INFINITY)
    ok = gv.t.isin(G.T_TIMESTAMP, G.T_DATE, G.T_INTERVAL)
    return G.gv_bool(F.when(ok, ~inf))


def overlaps_gv(s1: Column, e1: Column, s2: Column, e2: Column) -> Column:
    """(s1,e1) OVERLAPS (s2,e2) (gtype_temporal.c:748-831; SQL spec):
    each pair is normalized so start <= end; an interval end means
    start + interval. Strict inequality: touching ranges don't overlap."""

    def endpoint(base: Column, x: Column) -> Column:
        """comparison axis in µs; time gvals already are; interval ends
        add onto their pair's start."""
        p = G.interval_parts(x)
        iv_end = base + p["months"] * G.US_PER_MONTH + p["days"] * US_PER_DAY + p["us"]
        return (
            F.when(x.t.isin(G.T_TIMESTAMP, G.T_DATE), _gv_ts_us(x))
            .when(x.t == G.T_TIME, x.i)
            .when(x.t == G.T_INTERVAL, iv_end)
        )

    a1 = F.when(s1.t.isin(G.T_TIMESTAMP, G.T_DATE), _gv_ts_us(s1)).when(s1.t == G.T_TIME, s1.i)
    a2 = F.when(s2.t.isin(G.T_TIMESTAMP, G.T_DATE), _gv_ts_us(s2)).when(s2.t == G.T_TIME, s2.i)
    b1 = endpoint(a1, e1)
    b2 = endpoint(a2, e2)
    lo1, hi1 = F.least(a1, b1), F.greatest(a1, b1)
    lo2, hi2 = F.least(a2, b2), F.greatest(a2, b2)
    return G.gv_bool((lo1 < hi2) & (lo2 < hi1))
