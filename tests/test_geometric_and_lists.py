"""Minimal geometric kit (gtype_geometric.c: point/box subset) and the
to*List array casts (gtype_to_*_array surface by openCypher names)."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture()
def eng(spark):
    return CypherEngine(spark)


def one(eng, q):
    return eng.fetch_values(q)[0]


# -------------------------------------------------------------- geometric

def test_point_cast(eng):
    assert one(eng, "RETURN toPoint('(1, 2)')") == "(1,2)"
    assert one(eng, "RETURN toPoint('1.5, -2')") == "(1.5,-2)"
    assert one(eng, "RETURN toPoint([3.0, 4.0])") == "(3,4)"
    assert one(eng, "RETURN toPoint('nonsense')") is None
    assert one(eng, "RETURN '(1,2)'::point") == "(1,2)"


def test_box_cast_canonicalizes_corners(eng):
    # box_in stores upper-right first regardless of input corner order
    assert one(eng, "RETURN toBox('(0,0),(2,3)')") == "(2,3),(0,0)"
    assert one(eng, "RETURN toBox('(2,3),(0,0)')") == "(2,3),(0,0)"
    assert one(eng, "RETURN toBox('((0,3),(2,0))')") == "(2,3),(0,0)"
    assert one(eng, "RETURN '(1,1),(0,0)'::box") == "(1,1),(0,0)"


def test_point_distance(eng):
    assert one(eng, "RETURN distance(toPoint('(0,0)'), toPoint('(3,4)'))") == 5.0
    assert one(eng, "RETURN distance(toPoint('(1,1)'), toPoint('(1,1)'))") == 0.0


def test_box_accessors(eng):
    assert one(eng, "RETURN center(toBox('(0,0),(4,2)'))") == "(2,1)"
    assert one(eng, "RETURN center(toPoint('(5,6)'))") == "(5,6)"
    assert one(eng, "RETURN height(toBox('(0,0),(4,2)'))") == 2.0
    assert one(eng, "RETURN width(toBox('(0,0),(4,2)'))") == 4.0


def test_bound_box_and_contains(eng):
    assert one(
        eng, "RETURN bound_box(toBox('(0,0),(1,1)'), toBox('(2,2),(3,3)'))"
    ) == "(3,3),(0,0)"
    assert one(eng, "RETURN box_contains(toBox('(0,0),(2,2)'), toPoint('(1,1)'))") is True
    assert one(eng, "RETURN box_contains(toBox('(0,0),(2,2)'), toPoint('(3,1)'))") is False
    # boundary counts as contained
    assert one(eng, "RETURN box_contains(toBox('(0,0),(2,2)'), toPoint('(2,0)'))") is True


# -------------------------------------------------------------- to*List

def test_to_integer_list(eng):
    assert one(eng, "RETURN toIntegerList([1, 2.7, '3', true, 'x'])") == [1, 2, 3, 1, None]
    assert one(eng, "RETURN toIntegerList('nope')") is None


def test_to_float_list(eng):
    assert one(eng, "RETURN toFloatList([1, '2.5', 'x'])") == [1.0, 2.5, None]


def test_to_string_list(eng):
    assert one(eng, "RETURN toStringList([1, 2.5, true, 'a'])") == ["1", "2.5", "true", "a"]


def test_to_boolean_list(eng):
    assert one(eng, "RETURN toBooleanList([true, 'false', 'TRUE', 1, 'z'])") == [
        True, False, True, None, None
    ]


# ------------------------------------------------------------ multiranges

def test_multirange_casts(eng):
    """to*multirange (gtype_typecasting.c; old/regress/range.sql:94,168,
    496): members canonicalize by the single-range rules, then sort and
    merge (PG multirange canonical form; ISO bound style as in the r5
    range casts)."""
    assert one(eng, "RETURN toIntMultirange('{[0, 1]}')") == "{[0,2)}"
    assert one(eng, "RETURN toNumMultirange('{(0, 1.5)}')") == "{(0,1.5)}"
    assert one(eng, "RETURN toDateMultirange('{[2000-01-01, 2001-01-01)}')") == \
        '{["2000-01-01","2001-01-01")}'
    assert one(eng, "RETURN toTsMultirange('{[2000-01-01 12:00:00, 2000-01-01 16:00:00]}')") == \
        '{["2000-01-01 12:00:00","2000-01-01 16:00:00"]}'
    # sort + merge overlapping/adjacent members
    assert one(eng, "RETURN toIntMultirange('{[7,8), [0,2), [1,5)}')") == "{[0,5),[7,8)}"
    assert one(eng, "RETURN toNumMultirange('{(0,1], (1,2)}')") == "{(0,2)}"
    assert one(eng, "RETURN toNumMultirange('{(0,1), (1,2)}')") == "{(0,1),(1,2)}"
    assert one(eng, "RETURN toIntMultirange('{}')") == "{}"
    assert one(eng, "RETURN toIntMultirange('{(0,1)}')") == "{}"  # empty member
    assert one(eng, "RETURN toIntMultirange('junk')") is None
    assert one(eng, "RETURN '{[0, 1]}'::intmultirange") == "{[0,2)}"
