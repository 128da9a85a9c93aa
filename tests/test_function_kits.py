"""Unit tests for the vector / range / network function kits — edge
cases the oracle-gated queries don't reach (empty and unbounded ranges,
adjacency bound flags, zero vectors, malformed addresses)."""

import math

import pytest
from pyspark.sql import functions as F

from postgraph_spark.functions import network as NET
from postgraph_spark.functions import ranges as R
from postgraph_spark.functions import vector as V


def one_row(spark, **cols):
    df = spark.range(1)
    for k, v in cols.items():
        df = df.withColumn(k, v)
    return df


# ------------------------------------------------------------------ vector


def test_vector_distances(spark):
    a = F.array(*[F.lit(x) for x in (1.0, 2.0, 2.0)])
    b = F.array(*[F.lit(x) for x in (2.0, 4.0, 2.0)])
    row = one_row(
        spark,
        l2=V.l2_distance(a, b),
        l2sq=V.l2_squared_distance(a, b),
        l1=V.l1_distance(a, b),
        ip=V.inner_product(a, b),
        nip=V.negative_inner_product(a, b),
        cos=V.cosine_distance(a, b),
        norm=V.l2_norm(a),
        dims=V.dims(a),
    ).collect()[0]
    assert row["l2"] == pytest.approx(math.sqrt(5.0))
    assert row["l2sq"] == pytest.approx(5.0)
    assert row["l1"] == pytest.approx(3.0)
    assert row["ip"] == pytest.approx(14.0)
    assert row["nip"] == pytest.approx(-14.0)
    assert row["cos"] == pytest.approx(1 - 14.0 / (3.0 * math.sqrt(24.0)))
    assert row["norm"] == pytest.approx(3.0)
    assert row["dims"] == 3


def test_vector_arithmetic(spark):
    a = F.array(F.lit(1.0), F.lit(2.0))
    b = F.array(F.lit(3.0), F.lit(5.0))
    row = one_row(
        spark, s=V.vec_add(a, b), d=V.vec_sub(a, b), k=V.vec_scale(a, 2.5)
    ).collect()[0]
    assert row["s"] == [4.0, 7.0]
    assert row["d"] == [-2.0, -3.0]
    assert row["k"] == [2.5, 5.0]


def test_vector_identical_is_zero_distance(spark):
    a = F.array(F.lit(0.5), F.lit(-0.5))
    row = one_row(spark, l2=V.l2_distance(a, a), cos=V.cosine_distance(a, a)).collect()[0]
    assert row["l2"] == 0.0
    assert row["cos"] == pytest.approx(0.0)


# ------------------------------------------------------------------- ranges


def rng(lo, hi, lo_inc=True, hi_inc=False):
    mk = lambda v: F.lit(v).cast("double") if v is not None else F.lit(None).cast("double")  # noqa: E731
    return R.make_range(mk(lo), mk(hi), lo_inc, hi_inc)


def evals(spark, **cols):
    return one_row(spark, **cols).collect()[0]


def test_range_contains_value_bounds(spark):
    r = evals(
        spark,
        inside=R.contains_value(rng(1, 5), F.lit(3.0)),
        at_lo=R.contains_value(rng(1, 5), F.lit(1.0)),
        at_hi=R.contains_value(rng(1, 5), F.lit(5.0)),  # '[)' excludes hi
        at_hi_closed=R.contains_value(rng(1, 5, hi_inc=True), F.lit(5.0)),
        below=R.contains_value(rng(1, 5), F.lit(0.0)),
    )
    assert (r["inside"], r["at_lo"], r["at_hi"], r["at_hi_closed"], r["below"]) == (
        True,
        True,
        False,
        True,
        False,
    )


def test_range_empty_and_unbounded(spark):
    r = evals(
        spark,
        empty=R.is_empty(rng(5, 1)),
        point_open=R.is_empty(rng(2, 2)),  # [2,2) is empty
        point_closed=R.is_empty(rng(2, 2, hi_inc=True)),
        unbounded_hi=R.contains_value(rng(1, None), F.lit(1e18)),
        unbounded_lo=R.contains_value(rng(None, 5), F.lit(-1e18)),
        empty_contains_nothing=R.contains_value(rng(5, 1), F.lit(3.0)),
    )
    assert r["empty"] and r["point_open"] and not r["point_closed"]
    assert r["unbounded_hi"] and r["unbounded_lo"]
    assert not r["empty_contains_nothing"]


def test_range_overlaps_and_adjacent(spark):
    r = evals(
        spark,
        ov=R.overlaps(rng(1, 5), rng(4, 8)),
        no_ov=R.overlaps(rng(1, 5), rng(5, 8)),  # [1,5) vs [5,8): disjoint
        touch_closed=R.overlaps(rng(1, 5, hi_inc=True), rng(5, 8)),  # 5 shared
        adj=R.adjacent(rng(1, 5), rng(5, 8)),  # [1,5) -|- [5,8)
        not_adj_gap=R.adjacent(rng(1, 5), rng(6, 8)),
        not_adj_overlap=R.adjacent(rng(1, 5, hi_inc=True), rng(5, 8)),
    )
    assert r["ov"] and not r["no_ov"] and r["touch_closed"]
    assert r["adj"] and not r["not_adj_gap"] and not r["not_adj_overlap"]


def test_range_contains_range(spark):
    r = evals(
        spark,
        inner=R.contains_range(rng(1, 10), rng(2, 5)),
        same=R.contains_range(rng(1, 10), rng(1, 10)),
        spill=R.contains_range(rng(1, 10), rng(5, 11)),
        empty_inner=R.contains_range(rng(1, 10), rng(7, 3)),
        unbounded_outer=R.contains_range(rng(None, None), rng(2, 5)),
    )
    assert r["inner"] and r["same"] and not r["spill"]
    assert r["empty_inner"] and r["unbounded_outer"]


# ------------------------------------------------------------------ network


def test_network_funcs(spark):
    df = spark.createDataFrame(
        [("10.1.2.3/24",), ("192.168.0.77/16",), ("not-an-ip",), (None,)], ["addr"]
    )
    rows = {
        r["addr"]: r
        for r in df.select(
            "addr",
            NET.host("addr").alias("host"),
            NET.masklen("addr").alias("masklen"),
            NET.family("addr").alias("family"),
            NET.network("addr").alias("network"),
            NET.broadcast("addr").alias("broadcast"),
            NET.netmask("addr").alias("netmask"),
            NET.set_masklen(F.col("addr"), 8).alias("remasked"),
        ).collect()
    }
    r = rows["10.1.2.3/24"]
    assert (r["host"], r["masklen"], r["family"]) == ("10.1.2.3", 24, 4)
    assert r["network"] == "10.1.2.0/24"
    assert r["broadcast"] == "10.1.2.255"
    assert r["netmask"] == "255.255.255.0"
    assert r["remasked"] == "10.1.2.3/8"
    assert rows["192.168.0.77/16"]["broadcast"] == "192.168.255.255"
    assert rows["not-an-ip"]["host"] is None
    assert rows[None]["host"] is None


def test_subnet_contains(spark):
    df = spark.createDataFrame(
        [("10.1.0.0/16", "10.1.2.0/24"), ("10.1.0.0/16", "10.2.0.0/24"), ("10.1.0.0/16", "10.1.0.0/16")],
        ["net", "addr"],
    )
    got = [r[0] for r in df.select(NET.subnet_contains("net", "addr")).collect()]
    assert got == [True, False, False]


@pytest.fixture(scope="module")
def kit_engine(spark):
    from postgraph_spark.engine import CypherEngine

    e = CypherEngine(spark)
    e.execute("CREATE GRAPH fkit")
    e.execute("USE GRAPH fkit")
    return e


def test_inverse_hyperbolics(kit_engine):
    """expr.out:1937-1998 — asinh/acosh/atanh goldens. The reference
    ERRORS on out-of-domain input (acosh(0), atanh(pi)); the float-math
    analog here is NaN (the non-error engine convention)."""
    e = kit_engine
    assert e.fetch_values("RETURN asinh(3.1415)")[0] == pytest.approx(
        1.86226763975997, abs=1e-12
    )
    assert e.fetch_values("RETURN asinh(0)") == [0.0]
    assert e.fetch_values("RETURN asinh(1)")[0] == pytest.approx(
        0.881373587019543, abs=1e-12
    )
    assert e.fetch_values("RETURN acosh(3.1415)")[0] == pytest.approx(
        1.81149516122582, abs=1e-12
    )
    assert e.fetch_values("RETURN acosh(1)") == [0.0]
    assert math.isnan(e.fetch_values("RETURN acosh(0)")[0])  # ref: error
    assert e.fetch_values("RETURN atanh(0)") == [0.0]
    assert e.fetch_values("RETURN atanh(1)") == [float("inf")]
    assert math.isnan(e.fetch_values("RETURN atanh(3.1415)")[0])  # ref: error


def test_gcd_lcm(kit_engine):
    """expr.out:2233-2269 — gcd/lcm goldens: exact int64 path for int
    pairs, numeric (exact decimal) path when a float joins in, numeric
    strings coerce (gcd('10', 5) = 5)."""
    e = kit_engine
    assert e.fetch_values("RETURN gcd(10, 5)") == [5]
    assert e.fetch_values("RETURN gcd(10.0, 5.0)") == [5.0]
    assert e.fetch_values("RETURN gcd(10.0, 5)") == [5.0]
    assert e.fetch_values("RETURN gcd('10', 5)") == [5]
    assert e.fetch_values("RETURN lcm(10, 5)") == [10]
    assert e.fetch_values("RETURN gcd(0, 0)") == [0]
    assert e.fetch_values("RETURN gcd(-12, 18)") == [6]
    assert e.fetch_values("RETURN gcd(1.5, 0.5)") == [0.5]
    assert e.fetch_values("RETURN lcm(4, 6)") == [12]
    assert e.fetch_values("RETURN lcm(0, 5)") == [0]


def test_mac_trunc_set7bit_inet_merge(kit_engine):
    """network.out:869-1085 — trunc (macaddr zeroes last 3 bytes,
    macaddr8 last 5), macaddr8_set7bit (first byte |= 0x02, 6-byte
    input widens through fffe), inet_merge (smallest containing cidr)."""
    e = kit_engine
    assert e.fetch_values("RETURN trunc(tomacaddr('12:34:56:78:90:ab'))") == [
        "12:34:56:00:00:00"
    ]
    assert e.fetch_values("RETURN trunc(tomacaddr8('12:34:56:78:90:ab:cd:ef'))") == [
        "12:34:56:00:00:00:00:00"
    ]
    assert e.fetch_values(
        "RETURN macaddr8_set7bit(tomacaddr8('12:34:56:78:90:ab:cd:ef'))"
    ) == ["12:34:56:78:90:ab:cd:ef"]
    assert e.fetch_values(
        "RETURN macaddr8_set7bit(tomacaddr8('00:34:56:ab:cd:ef'))"
    ) == ["02:34:56:ff:fe:ab:cd:ef"]
    assert e.fetch_values(
        "RETURN inet_merge('192.168.1.5/24', '192.168.2.5/24')"
    ) == ["192.168.0.0/22"]
    # family mismatch: PG errors; kit convention is null
    assert e.fetch_values("RETURN inet_merge('192.168.1.5/24', '::1')") == [None]
