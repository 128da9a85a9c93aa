"""Expression semantics golden tests — ported from the reference's
regress/sql/expr.sql + regress/expected/expr.out assertions."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH expr")
    e.execute("USE GRAPH expr")
    return e


# (query, expected) pairs straight from expr.out
CASES = [
    ("RETURN 1 = 1.0", True),
    ("RETURN 1 > -1.0", True),
    ("RETURN -1.0 < 1", True),
    ("RETURN 'aaa' < 'z'", True),
    ("RETURN 'z' > 'aaa'", True),
    ("RETURN false = false", True),
    ("RETURN ('string' < true)", True),  # string rank < bool rank
    ("RETURN true < 1", True),  # bool rank < number rank
    ("RETURN (1 + 1.0) = (7 % 5)", True),
    ("RETURN null IS NULL", True),
    ("RETURN 1 IS NULL", False),
    ("RETURN 1 IS NOT NULL", True),
    ("RETURN null IS NOT NULL", False),
    ("RETURN NOT false", True),
    ("RETURN NOT true", False),
    ("RETURN true AND true", True),
    ("RETURN true AND false", False),
    ("RETURN false AND true", False),
    ("RETURN false AND false", False),
    ("RETURN true OR true", True),
    ("RETURN true OR false", True),
    ("RETURN false OR true", True),
    ("RETURN false OR false", False),
    ("RETURN NOT ((true OR false) AND (false OR true))", False),
    ("RETURN true XOR true", False),
    ("RETURN true XOR false", True),
    ("RETURN false XOR true", True),
    ("RETURN false XOR false", False),
    # arithmetic dispatch (gtype_ops.c:153-280)
    ("RETURN 1 + 2", 3),
    ("RETURN 1 + 2.0", 3.0),
    ("RETURN 'a' + 'b'", "ab"),
    ("RETURN 7 / 2", 3),
    ("RETURN -7 / 2", -3),
    ("RETURN 7.0 / 2", 3.5),
    ("RETURN 7 % 5", 2),
    ("RETURN -7 % 5", -2),
    ("RETURN 2 ^ 10", 1024.0),
    ("RETURN -(3)", -3),
    # 3VL
    ("RETURN null = null", None),
    ("RETURN 1 = null", None),
    ("RETURN null AND true", None),
    ("RETURN null AND false", False),
    ("RETURN null OR true", True),
    ("RETURN null OR false", None),
    ("RETURN NOT null", None),
    # strings
    ("RETURN 'abc' STARTS WITH 'ab'", True),
    ("RETURN 'abc' ENDS WITH 'bc'", True),
    ("RETURN 'abc' CONTAINS 'b'", True),
    ("RETURN 'abc' =~ 'a.c'", True),
    ("RETURN 'abc' =~ 'b'", False),
    # IN list
    ("RETURN 2 IN [1, 2, 3]", True),
    ("RETURN 4 IN [1, 2, 3]", False),
    ("RETURN 4 IN [1, 2, null]", None),
    ("RETURN 2 IN [1, 2, null]", True),
    # lists & indexing (0-based, negative wrap)
    ("RETURN [1, 2, 3][0]", 1),
    ("RETURN [1, 2, 3][-1]", 3),
    ("RETURN [1, 2, 3][1..3]", [2, 3]),
    ("RETURN head([5, 6])", 5),
    ("RETURN last([5, 6])", 6),
    ("RETURN size([1, 2, 3])", 3),
    ("RETURN size('hello')", 5),
    ("RETURN reverse('abc')", "cba"),
    ("RETURN reverse([1, 2])", [2, 1]),
    ("RETURN range(0, 3)", [0, 1, 2, 3]),
    ("RETURN range(0, 6, 2)", [0, 2, 4, 6]),
    ("RETURN [1, 2] + [3]", [1, 2, 3]),
    # scalar functions
    ("RETURN toupper('ab')", "AB"),
    ("RETURN tolower('AB')", "ab"),
    ("RETURN trim('  x ')", "x"),
    ("RETURN replace('aXb', 'X', '-')", "a-b"),
    ("RETURN substring('hello', 1, 3)", "ell"),
    ("RETURN left('hello', 2)", "he"),
    ("RETURN right('hello', 2)", "lo"),
    ("RETURN split('a,b,c', ',')", ["a", "b", "c"]),
    ("RETURN abs(-3)", 3),
    ("RETURN abs(-3.5)", 3.5),
    ("RETURN sign(-2)", -1),
    ("RETURN floor(2.7)", 2.0),
    ("RETURN ceil(2.1)", 3.0),
    ("RETURN round(2.5)", 3.0),
    ("RETURN sqrt(16)", 4.0),
    ("RETURN tointeger('42')", 42),
    ("RETURN tofloat('1.5')", 1.5),
    ("RETURN tostring(42)", "42"),
    ("RETURN toboolean('true')", True),
    ("RETURN coalesce(null, 2)", 2),
    ("RETURN coalesce(null, null)", None),
    # CASE
    ("RETURN CASE WHEN 1 = 1 THEN 'y' ELSE 'n' END", "y"),
    ("RETURN CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END", "b"),
    ("RETURN CASE 9 WHEN 1 THEN 'a' END", None),
    # maps
    ("RETURN {a: 1, b: 'x'}", {"a": 1, "b": "x"}),
    ("RETURN {a: 1}.a", 1),
]


@pytest.mark.parametrize("query,expected", CASES, ids=[c[0][:60] for c in CASES])
def test_expr(engine, query, expected):
    vals = engine.fetch_values(query)
    assert len(vals) == 1
    assert vals[0] == expected, f"{query} -> {vals[0]!r}, want {expected!r}"
