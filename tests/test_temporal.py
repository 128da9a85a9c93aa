"""Temporal type + function golden tests, ported from the reference's
regress/sql/temporal.sql (and PG semantics where the reference's own
regress run errors with 'unrecognized node type' — the C implementations
in gtype_temporal.c/gtype_typecasting.c are the spec there).

Cases are batched several-per-RETURN: each statement pays a full
plan+codegen cycle, so one RETURN with N items is ~N× cheaper than N
statements.
"""

import pytest

from postgraph_spark.engine import CypherEngine

US = 1_000_000
HOUR = 3600 * US
DAY = 24 * HOUR


def iv(months=0, days=0, us=0):
    return {"months": months, "days": days, "us": us}


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH temporal")
    e.execute("USE GRAPH temporal")
    return e


def run_batch(engine, cases):
    """cases: list of (cypher_expr, expected); executed as one RETURN."""
    exprs = ", ".join(f"{c} AS c{i}" for i, (c, _) in enumerate(cases))
    row = engine.fetch(f"RETURN {exprs}")[0]
    for got, (expr, exp) in zip(row, cases):
        assert got == exp, f"{expr}: got {got!r}, expected {exp!r}"


# --- Basic I/O (temporal.sql:28-69) ---------------------------------------

def test_timestamp_io(engine):
    run_batch(engine, [
        ("'2023-06-23 13:39:40.00'::timestamp", "2023-06-23 13:39:40"),
        ("'06/23/2023 13:39:40.00'::timestamp", "2023-06-23 13:39:40"),
        ("'06/23/1970 13:39:40.00'::timestamp", "1970-06-23 13:39:40"),
        ("0::timestamp", "2000-01-01 00:00:00"),  # int = µs since PG epoch
        ("null::timestamp", None),
        ("'1997-12-17 07:37:16-08'::timestamp", "1997-12-17 07:37:16"),
        ("'12/17/1997 07:37:16.00'::timestamp", "1997-12-17 07:37:16"),
        ("'Wed Dec 17 07:37:16 1997'::timestamp", "1997-12-17 07:37:16"),
    ])


def test_timestamptz_io(engine):
    # under the engine's pinned UTC zone (reference regress runs at GMT)
    run_batch(engine, [
        ("'1997-12-17 07:37:16-06'::timestamptz", "1997-12-17 13:37:16"),
        ("'12/17/1997 07:37:16.00+00'::timestamptz", "1997-12-17 07:37:16"),
        ("'2020-02-11 15:44:17+08'::timestamptz", "2020-02-11 07:44:17"),
    ])


def test_date_time_io(engine):
    run_batch(engine, [
        ("'1997-12-17'::date", "1997-12-17"),
        ("'12/17/1997'::date", "1997-12-17"),
        ("'Wed Dec 17 1997'::date", "1997-12-17"),
        ("'07:37:16-08'::time", "07:37:16"),
        ("'07:37:16.00'::time", "07:37:16"),
        ("'07:37:16'::time", "07:37:16"),
        ("'07:37:16-08'::timetz", "07:37:16"),
    ])


def test_interval_io(engine):
    run_batch(engine, [
        ("'30 Seconds'::interval", iv(us=30 * US)),
        ("'15 Minutes'::interval", iv(us=15 * 60 * US)),
        ("'10 Hours'::interval", iv(us=10 * HOUR)),
        ("'40 Days'::interval", iv(days=40)),
        ("'10 Weeks'::interval", iv(days=70)),
        ("'10 Months'::interval", iv(months=10)),
        ("'3 Years'::interval", iv(months=36)),
        ("'30 Seconds Ago'::interval", iv(us=-30 * US)),
        ("'40 Days Ago'::interval", iv(days=-40)),
        ("'3 Years Ago'::interval", iv(months=-36)),
        ("'6 Years 11 Months 24 Days 5 Hours 23 Minutes'::interval",
         iv(months=83, days=24, us=5 * HOUR + 23 * 60 * US)),
        ("'1 month -1 hours'::interval", iv(months=1, us=-HOUR)),
        ("'1.5 mons'::interval", iv(months=1, days=15)),
    ])


# --- to* casts (temporal.sql:71-131; gtype_typecasting.c:278-399) ---------

def test_to_casts(engine):
    run_batch(engine, [
        ("toTimestamp('12/17/1997 07:37:16.00+00')", "1997-12-17 07:37:16"),
        ("toTimestamp(100000000000)", "2000-01-02 03:46:40"),
        ("toTimestamp('12/17/1997'::date)", "1997-12-17 00:00:00"),
        ("toDate('12/17/1997 07:37:16.00+00'::timestamp)", "1997-12-17"),
        ("toDate('12/17/1997')", "1997-12-17"),
        ("toTime('12/17/1997 07:37:16.00+00'::timestamp)", "07:37:16"),
        ("toTime('07:37:16.00+00')", "07:37:16"),
        ("toTime('7 Hours 37 Minutes 16 Seconds'::interval)", "07:37:16"),
        ("toInterval('7 Hours 37 Minutes 16 Seconds')",
         iv(us=7 * HOUR + (37 * 60 + 16) * US)),
    ])


# --- comparisons (temporal.sql:140-505) -----------------------------------

def test_timestamp_comparison(engine):
    t, earlier, later = (
        "'2023-06-23 13:39:40.00'::timestamp",
        "'2023-05-23 13:39:40.00'::timestamp",
        "'2023-07-23 13:39:40.00'::timestamp",
    )
    run_batch(engine, [
        (f"{t} = {t}", True), (f"{t} = {later}", False),
        (f"{t} <> {t}", False), (f"{t} <> {earlier}", True),
        (f"{t} > {earlier}", True), (f"{t} > {later}", False),
        (f"{t} < {later}", True), (f"{t} < {earlier}", False),
        (f"{t} >= {t}", True), (f"{t} <= {t}", True),
    ])


def test_timestamp_date_cross_comparison(engine):
    """date and timestamp share a comparison class (gtype_util.c:1838)."""
    run_batch(engine, [
        ("'2023-06-23 0:0:00.00'::timestamp = '2023-06-23'::date", True),
        ("'2023-06-23 13:39:40.00'::timestamp = '2023-07-23'::date", False),
        ("'2023-06-23 13:39:40.00'::timestamp <> '2023-05-23'::date", True),
        ("'2023-06-23 0:0:00.00'::timestamp > '2023-06-23'::date", False),
        ("'2023-06-23 13:39:40.00'::timestamp > '2023-05-23'::date", True),
        ("'2023-06-23 13:39:40.00'::timestamp < '2023-07-23'::date", True),
        ("'2023-06-23'::date = '2023-06-23 0:0:00.00'::timestamp", True),
        ("'2023-07-23'::date > '2023-06-23 13:39:40.00'::timestamp", True),
        ("'2023-05-23'::date < '2023-06-23 13:39:40.00'::timestamp", True),
        ("'2023-06-23'::date <= '2023-06-23 0:0:00.00'::timestamp", True),
    ])


def test_time_interval_comparison(engine):
    run_batch(engine, [
        ("'07:37:16.00'::time = '07:37:16.00'::time", True),
        ("'07:37:16.00'::time > '06:37:16.00'::time", True),
        ("'07:37:16.00'::time < '08:37:16.00'::time", True),
        ("'30 Seconds'::interval = '30 Seconds'::interval", True),
        ("'30 Seconds'::interval > '20 Seconds'::interval", True),
        ("'30 Seconds'::interval < '40 Seconds'::interval", True),
        ("'30 Seconds'::interval >= '30 Seconds'::interval", True),
        # normalized µs comparison: 1 mon = 30 days (interval_cmp)
        ("'1 month'::interval = '30 days'::interval", True),
    ])


# --- operators (temporal.sql:506-566) -------------------------------------

def test_temporal_plus_minus(engine):
    run_batch(engine, [
        ("'2023-06-23 13:39:40.00'::timestamp + '10 Days'::interval",
         "2023-07-03 13:39:40"),
        ("'2023-06-23'::date + '10 Days'::interval", "2023-07-03 00:00:00"),
        ("'13:39:40.00'::time + '8 Hours'::interval", "21:39:40"),
        ("'10 Days'::interval + '8 Hours'::interval", iv(days=10, us=8 * HOUR)),
        ("'2023-06-23 13:39:40.00'::timestamp - '10 Days'::interval",
         "2023-06-13 13:39:40"),
        ("'2023-06-23'::date - '10 Days'::interval", "2023-06-13 00:00:00"),
        ("'13:39:40.00'::time - '8 Hours'::interval", "05:39:40"),
        ("'10 Days'::interval - '8 Hours'::interval", iv(days=10, us=-8 * HOUR)),
        ("- ('8 Hours'::interval)", iv(us=-8 * HOUR)),
        ("- ('8 Hours Ago'::interval)", iv(us=8 * HOUR)),
        # calendar month add clamps day-of-month (timestamp_pl_interval)
        ("'2023-01-31'::date + '1 month'::interval", "2023-02-28 00:00:00"),
    ])


def test_interval_scaling(engine):
    run_batch(engine, [
        ("'8 Hours'::interval * 8.0", iv(us=64 * HOUR)),
        ("'8 Hours'::interval * 8", iv(us=64 * HOUR)),
        ("8 * ('8 Hours'::interval)", iv(us=64 * HOUR)),
        ("8.0 * ('8 Hours'::interval)", iv(us=64 * HOUR)),
        ("'8 Hours'::interval / 8.0", iv(us=HOUR)),
        ("'8 Hours'::interval / 8", iv(us=HOUR)),
        # fractional months cascade into days (interval_mul)
        ("'1 month'::interval * 1.5", iv(months=1, days=15)),
        ("'8 Hours'::interval / 0", None),
    ])


# --- EXTRACT / date_part (temporal.sql:568-637) ---------------------------

def test_extract(engine):
    ts = "TIMESTAMP '12/17/1997 07:37:16.00+00'"
    run_batch(engine, [
        (f"EXTRACT(day FROM {ts})", 17),
        ("EXTRACT(hour FROM TIME '07:37:16.00+00')", 7),
        ("EXTRACT(day FROM DATE '12/17/1997')", 17),
        ("EXTRACT(day FROM INTERVAL '6 Years 11 Months 24 Days 5 Hours 23 Minutes')", 24),
        (f"EXTRACT(CENTURY FROM {ts})", 20),
        (f"EXTRACT(DECADE FROM {ts})", 199),
        (f"EXTRACT(DOW FROM {ts})", 3),
        (f"EXTRACT(EPOCH FROM {ts})", 882344236),
        (f"EXTRACT(ISODOW FROM {ts})", 3),
        (f"EXTRACT(ISOYEAR FROM {ts})", 1997),
        (f"EXTRACT(MICROSECONDS FROM {ts})", 16000000),
        (f"EXTRACT(MILLISECONDS FROM {ts})", 16000),
        (f"EXTRACT(MINUTE FROM {ts})", 37),
        (f"EXTRACT(MONTH FROM {ts})", 12),
        (f"EXTRACT(QUARTER FROM {ts})", 4),
        (f"EXTRACT(SECOND FROM {ts})", 16),
        (f"EXTRACT(TIMEZONE FROM {ts})", 0),
        (f"EXTRACT(YEAR FROM {ts})", 1997),
        # PG julian = date2j (2450800 for 1997-12-17) + tod/86400
        (f"EXTRACT(JULIAN FROM {ts})", 2450800 + (7 * 3600 + 37 * 60 + 16) / 86400.0),
    ])


def test_date_part(engine):
    ts = "TIMESTAMP '12/17/1997 07:37:16.00+00'"
    run_batch(engine, [
        (f"date_part('day', {ts})", 17.0),
        ("date_part('hour', TIME '07:37:16.00+00')", 7.0),
        ("date_part('day', DATE '12/17/1997')", 17.0),
        ("date_part('day', INTERVAL '6 Years 11 Months 24 Days 5 Hours 23 Minutes')", 24.0),
        ("date_part('hour', INTERVAL '6 Years 11 Months 24 Days 5 Hours 23 Minutes')", 5.0),
        ("date_part('year', INTERVAL '6 Years 11 Months')", 6.0),
        ("date_part('month', INTERVAL '6 Years 11 Months')", 11.0),
        (f"date_part('CENTURY', {ts})", 20.0),
        (f"date_part('EPOCH', {ts})", 882344236.0),
        (f"date_part('YEAR', {ts})", 1997.0),
    ])


# --- date_bin / date_trunc (temporal.sql:639-656) -------------------------

def test_date_bin(engine):
    run_batch(engine, [
        ("date_bin(INTERVAL '15 minutes', TIMESTAMP '2020-02-11 15:44:17', TIMESTAMP '2001-01-01')",
         "2020-02-11 15:30:00"),
        ("date_bin('15 minutes'::interval, '2020-02-11 15:44:17+08'::timestamptz, '2001-01-01'::timestamptz)",
         "2020-02-11 07:30:00"),
        ("date_bin('15 minutes'::interval, '2001-01-01'::date, '2020-02-11 15:44:17'::timestamp)",
         "2000-12-31 23:59:17"),
        # month-bearing stride is a PG error -> null
        ("date_bin('1 month'::interval, TIMESTAMP '2020-02-11 15:44:17', TIMESTAMP '2001-01-01')",
         None),
    ])


def test_date_trunc(engine):
    ts = "TIMESTAMP '12/17/1997 07:37:16.00+00'"
    run_batch(engine, [
        (f"date_trunc('day', {ts})", "1997-12-17 00:00:00"),
        (f"date_trunc('hour', {ts})", "1997-12-17 07:00:00"),
        (f"date_trunc('minute', {ts})", "1997-12-17 07:37:00"),
        (f"date_trunc('month', {ts})", "1997-12-01 00:00:00"),
        (f"date_trunc('quarter', {ts})", "1997-10-01 00:00:00"),
        (f"date_trunc('year', {ts})", "1997-01-01 00:00:00"),
        (f"date_trunc('decade', {ts})", "1990-01-01 00:00:00"),
        (f"date_trunc('century', {ts})", "1901-01-01 00:00:00"),
        (f"date_trunc('week', {ts})", "1997-12-15 00:00:00"),
        ("date_trunc('day', INTERVAL '6 Years 11 Months 24 Days 5 Hours 23 Minutes')",
         iv(months=83, days=24)),
        ("date_trunc('hour', INTERVAL '24 Days 5 Hours 23 Minutes')",
         iv(days=24, us=5 * HOUR)),
    ])


# --- age (temporal.sql:658-663; PG timestamp_age) -------------------------

def test_age(engine):
    run_batch(engine, [
        ("age('2007-06-12 12:45:19.89'::timestamp, '1997-12-17 07:37:16'::timestamp)",
         iv(months=9 * 12 + 5, days=26, us=(5 * 3600 + 8 * 60 + 3) * US + 890000)),
        ("age('1997-12-17 07:37:16'::timestamp, '2007-06-12 12:45:19.89'::timestamp)",
         iv(months=-(9 * 12 + 5), days=-26, us=-((5 * 3600 + 8 * 60 + 3) * US + 890000))),
        ("age('2020-03-01'::timestamp, '2020-02-28'::timestamp)", iv(days=2)),
        ("age('2021-03-01'::timestamp, '2021-02-28'::timestamp)", iv(days=1)),
        ("age('2020-01-01'::timestamp, '2020-01-01'::timestamp)", iv()),
    ])


# --- OVERLAPS (temporal.sql:665-730) --------------------------------------

def test_overlaps(engine):
    run_batch(engine, [
        ("('2001-02-16'::date,'2001-10-29'::date) overlaps ('2001-10-30'::date,'2002-10-30'::date)", False),
        ("('2001-02-16'::date,'2001-10-31'::date) overlaps ('2001-10-30'::date,'2002-10-30'::date)", True),
        ("('2001-02-16'::date,'10 days'::interval) overlaps ('2001-10-30'::date,'10 days'::interval)", False),
        ("('2001-02-16'::date,'365 days'::interval) overlaps ('2001-10-30'::date,'10 days'::interval)", True),
        ("('2001-02-16'::date,'10 days'::interval) overlaps ('2001-10-30'::date,'2001-11-09'::date)", False),
        ("('2001-02-16'::date,'365 days'::interval) overlaps ('2001-10-30'::date,'2001-11-09'::date)", True),
        ("('2001-02-16'::date,'2001-10-28'::date) overlaps ('2001-10-30'::date,'-2 days'::interval)", False),
        ("('2001-02-16'::date,'2001-10-28'::date) overlaps ('2001-10-30'::date,'-3 days'::interval)", True),
        ("('20:00:00'::time,'21:00:00'::time) overlaps ('21:00:00'::time,'22:00:00'::time)", False),
        ("('20:00:00'::time,'21:01:00'::time) overlaps ('21:00:00'::time,'22:00:00'::time)", True),
        ("('20:00:00'::time,'10 minutes'::interval) overlaps ('20:10:00'::time,'10 minutes'::interval)", False),
        ("('20:00:00'::time,'11 minutes'::interval) overlaps ('20:10:00'::time,'10 minutes'::interval)", True),
    ])


# --- justify / isfinite / make_* (temporal.sql:732-757) -------------------

def test_justify(engine):
    run_batch(engine, [
        ("justify_interval('1 month -1 hours'::interval)", iv(days=29, us=23 * HOUR)),
        ("justify_interval('1 month 33 days 1 hours'::interval)", iv(months=2, days=3, us=HOUR)),
        ("justify_interval('1 week 6 days 27 hours'::interval)", iv(days=14, us=3 * HOUR)),
        ("justify_interval('27 hours'::interval)", iv(days=1, us=3 * HOUR)),
        ("justify_days('5 weeks'::interval)", iv(months=1, days=5)),
        ("justify_days('35 days'::interval)", iv(months=1, days=5)),
        ("justify_days('4 weeks 8 days'::interval)", iv(months=1, days=6)),
        ("justify_days('1 month 5 weeks'::interval)", iv(months=2, days=5)),
        ("justify_hours('27 hours'::interval)", iv(days=1, us=3 * HOUR)),
        ("justify_hours('1 week 27 hours'::interval)", iv(days=8, us=3 * HOUR)),
        ("justify_hours('2 days 30 hours'::interval)", iv(days=3, us=6 * HOUR)),
    ])


def test_isfinite(engine):
    run_batch(engine, [
        ("isfinite('infinity'::date)", False),
        ("isfinite('2001-02-16'::date)", True),
        ("isfinite('2001-02-16 23:40:00'::timestamp)", True),
        ("isfinite('infinity'::timestamp)", False),
        ("isfinite('15 minutes'::interval)", True),
    ])


def test_make_functions(engine):
    run_batch(engine, [
        ("make_date(0, 7, 15)", None),      # year 0: out of range
        ("make_date(2013, 2, 30)", None),
        ("make_date(2013, 13, 1)", None),
        ("make_date(-44, 3, 15)", "-0043-03-15"),  # 44 BC, ISO proleptic
        ("make_date(2013, 11, -1)", None),
        ("make_date(2013, 7, 15)", "2013-07-15"),
        ("make_time(8, 20, 0.0)", "08:20:00"),
        ("make_time(10, 55, 100.1)", None),
        ("make_time(24, 0, 2.1)", None),
        ("make_timestamp(2023, 2, 14, 5, 30, 0.0)", "2023-02-14 05:30:00"),
        ("make_timestamptz(2023, 2, 14, 5, 30, 0.0)", "2023-02-14 05:30:00"),
    ])


# --- cross-path consistency: Spark-side parse == driver-side parse --------

@pytest.mark.parametrize("txt,kind", [
    ("2023-06-23 13:39:40.00", "ts"),
    ("06/23/2023 13:39:40", "ts"),
    ("Wed Dec 17 07:37:16 1997", "ts"),
    ("1997-12-17 07:37:16-08", "ts"),
    ("1997-12-17", "date"),
    ("07:37:16.25", "time"),
    ("6 Years 11 Months 24 Days 5 Hours 23 Minutes", "iv"),
    ("1 month -1 hours", "iv"),
    ("10 Weeks Ago", "iv"),
    ("5:23:00", "iv"),
])
def test_spark_parse_matches_python_parse(spark, txt, kind):
    """The compile-time (py_*) parser and the Spark-column parser must
    agree — literal folding must never change results."""
    from pyspark.sql import functions as F

    from postgraph_spark.functions import temporal as T

    col = F.lit(txt)
    if kind == "ts":
        got = spark.range(1).select(T.parse_ts_us(col).alias("x")).collect()[0]["x"]
        assert got == T.py_parse_ts_us(txt)
    elif kind == "date":
        got = spark.range(1).select(T.parse_date_days(col).alias("x")).collect()[0]["x"]
        assert got == T.py_parse_date_days(txt)
    elif kind == "time":
        got = spark.range(1).select(T.parse_time_us(col).alias("x")).collect()[0]["x"]
        assert got == T.py_parse_time_us(txt)
    else:
        row = spark.range(1).select(T.parse_interval_parts(col).alias("x")).collect()[0]["x"]
        assert (row["months"], row["days"], row["us"]) == T.py_parse_interval(txt)


# --- non-literal path: casts over column values ---------------------------

def test_column_side_casts(spark):
    """The Spark-expression cast path (non-literal operands) — the same
    operators the Cypher engine uses when casting properties."""
    from pyspark.sql import functions as F

    from postgraph_spark.functions import gtype as G
    from postgraph_spark.functions import temporal as T

    df = spark.createDataFrame(
        [("1997-12-17 07:37:16",), ("2020-02-29 23:59:59",), ("bogus",)], ["s"]
    )
    out = df.select(
        T.cast_timestamp(G.gv_str(F.col("s"))).alias("ts"),
        T.cast_date(G.gv_str(F.col("s"))).alias("d"),
    ).collect()
    assert G.decode(out[0]["ts"]) == "1997-12-17 07:37:16"
    assert G.decode(out[1]["ts"]) == "2020-02-29 23:59:59"
    assert G.decode(out[2]["ts"]) is None
    assert G.decode(out[0]["d"]) == "1997-12-17"
    assert G.decode(out[2]["d"]) is None


def test_value_functions(engine):
    """CURRENT_DATE/CURRENT_TIMESTAMP/now() (g.y:17655-17707) — shape
    checks only (nondeterministic values)."""
    import re

    d, ts, n, lt = engine.fetch(
        "RETURN current_date AS d, current_timestamp AS ts, now() AS n, localtime AS t"
    )[0]
    assert re.match(r"^\d{4}-\d{2}-\d{2}$", d)
    assert ts.startswith(d)
    assert n.startswith(d)
    assert re.match(r"^\d{2}:\d{2}:\d{2}", lt)
    assert engine.fetch_values("RETURN current_date = current_date")[0] is True
    assert engine.fetch_values(
        "RETURN isfinite(current_timestamp) AND current_date <= current_timestamp"
    )[0] is True


def test_tovector(engine):
    assert engine.fetch_values("RETURN toVector('[1.0, 2.5, 3.0]')")[0] == [1.0, 2.5, 3.0]
    assert engine.fetch_values("RETURN size(toVector('[1.0, 2.0]'))")[0] == 2
