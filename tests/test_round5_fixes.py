"""Round-5 semantics: element-wise container orderability
(gtype_util.c:233-360), multiset set operations (cypher_gram.y:1082-1102),
GROUPING SETS (g.y:4441-4490), quantified subqueries (g.y:17037-17040,
17110-17126), and the round-4 advice fixes (integer-property temporal
casts; infinity/overflow timestamp decoding)."""

import pytest

from postgraph_spark.engine import CypherEngine
from postgraph_spark.functions import gtype as G


@pytest.fixture()
def eng(spark):
    return CypherEngine(spark)


@pytest.fixture()
def geng(spark):
    """Engine over a small fixture graph for subquery/property tests."""
    from postgraph_spark.graph import Graph, GraphCatalog

    g = Graph.from_rows(
        spark,
        "r5",
        vertex_rows=[
            ("item", {"v": 1, "name": "a"}),
            ("item", {"v": 2, "name": "b"}),
            ("item", {"v": 3, "name": "c"}),
            ("probe", {"v": 2}),
            ("probe", {"v": 4}),
            # integer-typed property that temporal casts must treat as
            # µs/days since 2000-01-01, NOT seconds-since-1970
            ("evt", {"ts_int": 100000000000, "d_int": 10}),
        ],
        edge_rows=[],
    )
    cat = GraphCatalog(spark)
    cat.register(g)
    return CypherEngine(spark, cat)


# ------------------------------------------------ container orderability

def test_array_numeric_equality(eng):
    assert eng.fetch_values("RETURN [1] = [1.0]") == [True]
    assert eng.fetch_values("RETURN [1, 2] = [1.0, 2.0]") == [True]
    assert eng.fetch_values("RETURN [1, 'a'] = [1.0, 'a']") == [True]
    assert eng.fetch_values("RETURN [1] = [2]") == [False]
    assert eng.fetch_values("RETURN [1] = [1, 1]") == [False]


def test_array_elementwise_order(eng):
    assert eng.fetch_values("RETURN [1, 'a'] < [1.0, 'b']") == [True]
    assert eng.fetch_values("RETURN [2] < [10]") == [True]  # numeric, not text
    assert eng.fetch_values("RETURN [1, 2] < [1.0, 2.0, 0]") == [True]  # prefix


def test_distinct_collapses_mixed_numeric_lists(eng):
    rows = eng.fetch_values("UNWIND [[1],[1.0],[2]] AS x RETURN DISTINCT x")
    assert sorted(map(str, rows)) == ["[1]", "[2]"]


def test_distinct_collapses_mixed_numeric_scalars(eng):
    rows = eng.fetch_values("UNWIND [1, 1.0, 2] AS x RETURN DISTINCT x")
    assert len(rows) == 2


def test_order_by_arrays_numeric(eng):
    rows = eng.fetch_values(
        "UNWIND [[10],[2],[1,'a']] AS x WITH x ORDER BY x RETURN x"
    )
    assert rows == [[1, "a"], [2], [10]]


# ------------------------------------------------------- multiset set ops

def test_intersect_all(eng):
    rows = eng.fetch_values(
        "UNWIND [1,1,2,3] AS x RETURN x INTERSECT ALL UNWIND [1,1,1,3] AS x RETURN x"
    )
    assert sorted(rows) == [1, 1, 3]


def test_except_all(eng):
    rows = eng.fetch_values(
        "UNWIND [1,1,2,3] AS x RETURN x EXCEPT ALL UNWIND [1,3] AS x RETURN x"
    )
    assert sorted(rows) == [1, 2]


def test_except_distinct_still_set_semantics(eng):
    rows = eng.fetch_values(
        "UNWIND [1,1,2,3] AS x RETURN x EXCEPT UNWIND [3] AS x RETURN x"
    )
    assert sorted(rows) == [1, 2]


# ---------------------------------------------------------- grouping sets

def test_grouping_sets(eng):
    rows = eng.fetch(
        "UNWIND [1,1,2] AS x WITH x, count(*) AS n "
        "GROUP BY GROUPING SETS ((x), ()) RETURN x, n"
    )
    assert sorted(rows, key=str) == sorted([(1, 2), (2, 1), (None, 3)], key=str)


def test_group_by_empty(eng):
    rows = eng.fetch(
        "UNWIND [1,2,3] AS x WITH count(*) AS n GROUP BY () RETURN n"
    )
    assert rows == [(3,)]


# --------------------------------------------------- quantified subqueries

def test_all_subquery(geng):
    assert geng.fetch_values(
        "MATCH (p:probe) WHERE p.v > ALL (MATCH (i:item) RETURN i.v) RETURN p.v"
    ) == [4]
    # empty subquery -> ALL true
    assert sorted(
        geng.fetch_values(
            "MATCH (p:probe) WHERE p.v > ALL (MATCH (i:item) WHERE i.v > 99 RETURN i.v) "
            "RETURN p.v"
        )
    ) == [2, 4]


def test_any_subquery(geng):
    assert sorted(
        geng.fetch_values(
            "MATCH (p:probe) WHERE p.v >= ANY (MATCH (i:item) RETURN i.v + 1) RETURN p.v"
        )
    ) == [2, 4]
    # empty subquery -> ANY false
    assert geng.fetch_values(
        "MATCH (p:probe) WHERE p.v > ANY (MATCH (i:item) WHERE i.v > 99 RETURN i.v) "
        "RETURN p.v"
    ) == []


def test_in_subquery_and_not_in(geng):
    assert geng.fetch_values(
        "MATCH (p:probe) WHERE p.v IN (MATCH (i:item) RETURN i.v) RETURN p.v"
    ) == [2]
    assert geng.fetch_values(
        "MATCH (p:probe) WHERE p.v <> ALL (MATCH (i:item) RETURN i.v) RETURN p.v"
    ) == [4]


def test_in_subquery_null_3vl(geng):
    # subquery containing a gtype null: non-member -> UNKNOWN (filtered)
    assert geng.fetch_values(
        "MATCH (p:probe) WHERE p.v IN (MATCH (i:item) RETURN "
        "  CASE WHEN i.v = 1 THEN null ELSE i.v END) RETURN p.v"
    ) == [2]
    assert geng.fetch_values(
        "MATCH (p:probe) WHERE p.v <> ALL (MATCH (i:item) RETURN "
        "  CASE WHEN i.v = 1 THEN null ELSE i.v END) RETURN p.v"
    ) == []  # 4 is UNKNOWN (might equal the null), 2 is false


# ------------------------------------ advice fixes: temporal casts, decode

def test_totimestamp_integer_property_pg_epoch(geng):
    """Integer PROPERTY through the variant fast path must use the same
    µs-since-2000 convention as the literal path (round-4 advice-high:
    the old coalesce cast ints as seconds-since-1970)."""
    lit = geng.fetch_values("RETURN toTimestamp(100000000000)")
    prop = geng.fetch_values("MATCH (e:evt) RETURN toTimestamp(e.ts_int)")
    assert lit == prop == ["2000-01-02 03:46:40"]
    lit_d = geng.fetch_values("RETURN toDate(10)")
    prop_d = geng.fetch_values("MATCH (e:evt) RETURN toDate(e.d_int)")
    assert lit_d == prop_d == ["2000-01-11"]


def test_decode_infinity_and_overflow():
    inf = (1 << 63) - 1
    assert G.decode({"t": G.T_TIMESTAMP, "i": inf, "b": None, "d": None, "s": None, "j": None}) == "infinity"
    assert G.decode({"t": G.T_DATE, "i": -(1 << 63), "b": None, "d": None, "s": None, "j": None}) == "-infinity"
    # out-of-datetime-range but finite: civil-from-days fallback, no raise
    big = 400000 * 365 * 86_400_000_000
    out = G.decode({"t": G.T_TIMESTAMP, "i": big, "b": None, "d": None, "s": None, "j": None})
    assert isinstance(out, str) and ":" in out


def test_infinity_cast_roundtrip(eng):
    assert eng.fetch_values("RETURN 'infinity'::timestamp") == ["infinity"]
    assert eng.fetch_values("RETURN '-infinity'::timestamp") == ["-infinity"]
    assert eng.fetch_values("RETURN isfinite('infinity'::timestamp)") == [False]


# -------------------------------------- extended to* casts (casts.py)

CAST_GOLDENS = [
    # gtype_typecasting.c tobytea; byteain hex form passes through
    ("RETURN toBytea('abc')", ["\\x616263"]),
    ("RETURN '\\\\x01ff'::bytea", ["\\x01ff"]),
    # old/regress/network.out:113-137, 241-251
    ("RETURN toMacAddr('12:34:56:78:90:ab')", ["12:34:56:78:90:ab"]),
    ("RETURN toMacAddr('1234.5678.90ab')", ["12:34:56:78:90:ab"]),
    ("RETURN toMacAddr8('12:34:56:78:90:ab')", ["12:34:56:ff:fe:78:90:ab"]),
    ("RETURN toMacAddr8('12:34:56:FF:FE:ab:cd:ef')::macaddr", ["12:34:56:ab:cd:ef"]),
    ("RETURN toMacAddr('nonsense')", [None]),
    ("RETURN toInet('192.168.1.5')", ["192.168.1.5"]),
    ("RETURN toCidr('192.168.1.0/24')", ["192.168.1.0/24"]),
    ("RETURN toCidr('192.168.1.5/24')", [None]),  # host bits set -> error
    ("RETURN toTSVector('y x y')", ["'x' 'y'"]),
    ("RETURN toTSQuery('x & y')", ["'x' & 'y'"]),
    # old/regress/range.out:28-49 int canonicalization
    ("RETURN toIntRange('[0, 1]')", ["[0,2)"]),
    ("RETURN toIntRange('[0, 1)')", ["[0,1)"]),
    ("RETURN toIntRange('(0, 1]')", ["[1,2)"]),
    ("RETURN toIntRange('(0, 1)')", ["empty"]),
    ("RETURN toNumRange('(0.5, 1]')", ["(0.5,1]"]),
    ("RETURN toDateRange('[2000-01-01, 2001-01-01)')", ['["2000-01-01","2001-01-01")']),
    ("RETURN intrange(0, 1, '[]')", ["[0,2)"]),
    ("RETURN range_contains(toIntRange('[1, 5)'), 3)", [True]),
    ("RETURN isempty(toIntRange('(0,1)'))", [True]),
    ("RETURN lower(toNumRange('[0.5, 2)'))", [0.5]),
    ("RETURN lower('ABC')", ["abc"]),  # string lower still resolves
    ("RETURN host('10.1.2.3/24')", ["10.1.2.3"]),
    ("RETURN masklen('10.1.2.3/24')", [24]),
    ("RETURN l2_distance([0.0, 0.0], [3.0, 4.0])", [5.0]),
    ("RETURN inner_product([1.0, 2.0], [3.0, 4.0])", [11.0]),
    ("RETURN dims([1.0, 2.0, 3.0])", [3]),
]


def test_extended_casts_and_kits(eng):
    for q, want in CAST_GOLDENS:
        assert eng.fetch_values(q) == want, q
