"""Round-6 advice fixes: duplicate-safe `<> ANY` (sublink semantics,
cypher_expr.c:82,231), let-flush for composed quantified-subquery left
operands, and range-vs-string dispatch for lower()/upper()
(gtype_range.c accessors vs the string kit)."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture()
def eng(spark):
    return CypherEngine(spark)


@pytest.fixture()
def geng(spark):
    from postgraph_spark.graph import Graph, GraphCatalog

    g = Graph.from_rows(
        spark,
        "r6",
        vertex_rows=[
            ("item", {"v": 1, "name": "a"}),
            ("item", {"v": 2, "name": "b"}),
            ("item", {"v": 3, "name": "c"}),
            ("probe", {"v": 2}),
            ("probe", {"v": 4}),
        ],
        edge_rows=[],
    )
    cat = GraphCatalog(spark)
    cat.register(g)
    return CypherEngine(spark, cat)


# ------------------------------------------- duplicate-safe <> ANY / ALL

def test_ne_any_all_duplicates(geng):
    # subquery = {2, 2}: for x=2, `x <> ANY` must be FALSE even though the
    # subquery has >= 2 rows (round-5 advice-high: n>=2 shortcut was wrong)
    rows = geng.fetch_values(
        "MATCH (p:probe) WHERE p.v <> ANY "
        "(UNWIND [2, 2] AS x RETURN x) RETURN p.v"
    )
    assert rows == [4]
    # distinct values: any x differs from one of them
    rows = geng.fetch_values(
        "MATCH (p:probe) WHERE p.v <> ANY "
        "(UNWIND [2, 3] AS x RETURN x) RETURN p.v ORDER BY p.v"
    )
    assert rows == [2, 4]
    # single row equal to x -> false for that x
    rows = geng.fetch_values(
        "MATCH (p:probe) WHERE p.v <> ANY (UNWIND [4] AS x RETURN x) RETURN p.v"
    )
    assert rows == [2]


def test_eq_all_duplicates(geng):
    rows = geng.fetch_values(
        "MATCH (p:probe) WHERE p.v = ALL (UNWIND [2, 2] AS x RETURN x) RETURN p.v"
    )
    assert rows == [2]


# ------------------------- composed left operand of quantified subquery

def test_quantified_composed_left_operand(geng):
    """A left operand with a nested composed subexpression used to leave
    __letN columns unflushed -> AnalysisException at compile time."""
    rows = geng.fetch_values(
        "MATCH (i:item) WHERE toUpper(i.name + 'x') = ANY "
        "(UNWIND ['AX', 'ZX'] AS s RETURN s) RETURN i.v"
    )
    assert rows == [1]
    rows = geng.fetch_values(
        "MATCH (i:item) WHERE (i.v * 10) + 1 > ALL "
        "(UNWIND [5, 10] AS s RETURN s) RETURN i.v ORDER BY i.v"
    )
    assert rows == [1, 2, 3]


# --------------------------------------- lower/upper range-vs-string fix

def test_lower_upper_plain_strings_not_ranges(eng):
    # 'empty' and bracketed strings with non-numeric bodies are STRINGS
    assert eng.fetch_values("RETURN lower('EMPTY')") == ["empty"]
    assert eng.fetch_values("RETURN lower('(ABC)')") == ["(abc)"]
    assert eng.fetch_values("RETURN upper('[a,b]')") == ["[A,B]"]
    assert eng.fetch_values("RETURN upper('(Hello, World)')") == ["(HELLO, WORLD)"]


def test_lower_upper_range_texts_still_ranges(eng):
    assert eng.fetch_values("RETURN lower('[1,5)')") == [1]
    assert eng.fetch_values("RETURN upper(toIntRange('[0, 1]'))") == [2]
    assert eng.fetch_values("RETURN lower(toNumRange('[0.5, 2)'))") == [0.5]


# ------------------- nested container orderability (depth 2 + objects)

def test_nested_array_numeric_equality(eng):
    assert eng.fetch_values("RETURN [[1]] = [[1.0]]") == [True]
    assert eng.fetch_values("RETURN [[1, 2], 3] = [[1.0, 2.0], 3.0]") == [True]
    assert eng.fetch_values("RETURN [[1]] = [[2]]") == [False]
    assert eng.fetch_values("RETURN [[1]] = [[1, 1]]") == [False]


def test_object_numeric_equality(eng):
    assert eng.fetch_values("RETURN {a: 1} = {a: 1.0}") == [True]
    assert eng.fetch_values("RETURN {a: 1, b: 'x'} = {b: 'x', a: 1.0}") == [True]
    assert eng.fetch_values("RETURN {a: 1} = {a: 2}") == [False]
    assert eng.fetch_values("RETURN {a: 1} = {b: 1}") == [False]
    # objects nested inside arrays
    assert eng.fetch_values("RETURN [{a: 1}] = [{a: 1.0}]") == [True]


def test_distinct_collapses_nested_mixed_numeric(eng):
    rows = eng.fetch_values("UNWIND [[[1]], [[1.0]], [[2]]] AS x RETURN DISTINCT x")
    assert len(rows) == 2
    rows = eng.fetch_values("UNWIND [{a: 1}, {a: 1.0}, {a: 2}] AS x RETURN DISTINCT x")
    assert len(rows) == 2
