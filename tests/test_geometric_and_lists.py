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


# ------------------------------------------- full geometric surface
# (gtype_geometric.c 11 fns + construction casts; canonical texts per
# PG *_out: lseg [(..),(..)], line {A,B,C}, circle <(x,y),r>, path
# [..] open / (..) closed, polygon ((..),..))

def test_lseg_line_circle_casts(eng):
    assert one(eng, "RETURN toLseg('(1,1),(3,3)')") == "[(1,1),(3,3)]"
    assert one(eng, "RETURN toLseg('[(0,0),(2,2)]')") == "[(0,0),(2,2)]"
    assert one(eng, "RETURN toLseg('junk')") is None
    assert one(eng, "RETURN toLine('{1,-1,0}')") == "{1,-1,0}"
    # two-point form: slope line_construct {m,-1,b}; vertical {-1,0,x}
    assert one(eng, "RETURN toLine('[(0,0),(2,2)]')") == "{1,-1,0}"
    assert one(eng, "RETURN toLine('[(2,0),(2,5)]')") == "{-1,0,2}"
    assert one(eng, "RETURN toCircle('<(1,2),3>')") == "<(1,2),3>"
    assert one(eng, "RETURN toCircle('((1,2),3)')") == "<(1,2),3>"
    assert one(eng, "RETURN toCircle('<(1,2),-3>')") is None  # negative radius
    assert one(eng, "RETURN '<(0,0),1.5>'::circle") == "<(0,0),1.5>"


def test_path_polygon_casts(eng):
    assert one(eng, "RETURN toPath('[(0,0),(1,1),(2,0)]')") == "[(0,0),(1,1),(2,0)]"
    assert one(eng, "RETURN toPath('((0,0),(1,1))')") == "((0,0),(1,1))"
    assert one(eng, "RETURN toPolygon('((0,0),(4,0),(4,4),(0,4))')") == \
        "((0,0),(4,0),(4,4),(0,4))"
    assert one(eng, "RETURN toPolygon('junk')") is None


def test_length_one_arg_distance(eng):
    # gtype_distance(gtype) == `@-@`: lseg length / path length
    assert one(eng, "RETURN distance(toLseg('[(0,0),(3,4)]'))") == 5.0
    assert one(eng, "RETURN distance(toPath('[(0,0),(3,4),(3,8)]'))") == 9.0
    # closed path adds the closing segment
    assert one(eng, "RETURN distance(toPath('((0,0),(3,4))'))") == 10.0


def test_vertical_horizontal(eng):
    assert one(eng, "RETURN vertical(toLseg('[(1,0),(1,5)]'))") is True
    assert one(eng, "RETURN vertical(toLseg('[(0,0),(1,5)]'))") is False
    assert one(eng, "RETURN vertical(toLine('{-1,0,2}'))") is True
    assert one(eng, "RETURN horizontal(toLseg('[(0,2),(5,2)]'))") is True
    assert one(eng, "RETURN horizontal(toLine('{0,1,-3}'))") is True
    assert one(eng, "RETURN horizontal(toLine('{1,-1,0}'))") is False


def test_perp_parallel(eng):
    assert one(eng, "RETURN perp(toLseg('[(0,0),(1,0)]'), toLseg('[(0,0),(0,5)]'))") is True
    assert one(eng, "RETURN perp(toLseg('[(0,0),(1,1)]'), toLseg('[(0,0),(0,5)]'))") is False
    assert one(eng, "RETURN parallel(toLine('{1,-1,0}'), toLseg('[(1,1),(3,3)]'))") is True
    assert one(eng, "RETURN parallel(toLseg('[(0,0),(1,0)]'), toLseg('[(0,0),(0,5)]'))") is False


def test_intersection_point(eng):
    assert one(
        eng, "RETURN intersection_point(toLseg('[(0,0),(2,2)]'), toLseg('[(0,2),(2,0)]'))"
    ) == "(1,1)"
    # parallel segments: no intersection
    assert one(
        eng, "RETURN intersection_point(toLseg('[(0,0),(2,2)]'), toLseg('[(0,1),(2,3)]'))"
    ) is None
    assert one(
        eng, "RETURN intersection_point(toLine('{1,-1,0}'), toLine('{1,1,-2}'))"
    ) == "(1,1)"
    assert one(
        eng, "RETURN intersection_point(toBox('(0,0),(2,2)'), toBox('(1,1),(3,3)'))"
    ) == "(2,2),(1,1)"


def test_closest_point(eng):
    # point ## lseg: projection clamped to the segment
    assert one(
        eng, "RETURN closest_point(toPoint('(0,0)'), toLseg('[(1,1),(3,3)]'))"
    ) == "(1,1)"
    # point ## line: perpendicular foot
    assert one(
        eng, "RETURN closest_point(toPoint('(2,0)'), toLine('{1,-1,0}'))"
    ) == "(1,1)"
    # point ## box: clamp into the box
    assert one(
        eng, "RETURN closest_point(toPoint('(5,5)'), toBox('(2,2),(0,0)'))"
    ) == "(2,2)"


def test_geo_contains_overlap_same(eng):
    assert one(eng, "RETURN geo_contains(toCircle('<(0,0),5>'), toPoint('(3,4)'))") is True
    assert one(eng, "RETURN geo_contains(toCircle('<(0,0),5>'), toPoint('(4,4)'))") is False
    assert one(eng, "RETURN geo_contains(toCircle('<(0,0),5>'), toCircle('<(1,0),3>'))") is True
    poly = "toPolygon('((0,0),(4,0),(4,4),(0,4))')"
    assert one(eng, f"RETURN geo_contains({poly}, toPoint('(2,2)'))") is True
    assert one(eng, f"RETURN geo_contains({poly}, toPoint('(5,5)'))") is False
    assert one(eng, f"RETURN geo_contains({poly}, toPoint('(4,2)'))") is True  # boundary
    # open path contains: point on one of its segments
    assert one(eng, "RETURN geo_contains(toPath('[(0,0),(2,2),(4,0)]'), toPoint('(1,1)'))") is True
    assert one(eng, "RETURN geo_contains(toPath('[(0,0),(2,2),(4,0)]'), toPoint('(1,2)'))") is False
    assert one(eng, "RETURN geo_contained(toPoint('(1,1)'), toBox('(0,0),(2,2)'))") is True
    assert one(eng, "RETURN geo_overlap(toBox('(0,0),(2,2)'), toBox('(1,1),(3,3)'))") is True
    assert one(eng, "RETURN geo_overlap(toCircle('<(0,0),1>'), toCircle('<(3,0),1>'))") is False
    assert one(eng, "RETURN geo_same(toBox('(0,0),(2,3)'), toBox('(2,3),(0,0)'))") is True
    assert one(eng, "RETURN geo_same(toBox('(0,0),(2,3)'), toBox('(0,0),(2,2)'))") is False


def test_area_npoints_radius_diagonal_center(eng):
    assert one(eng, "RETURN area(toBox('(0,0),(4,2)'))") == 8.0
    assert one(eng, "RETURN round(area(toCircle('<(0,0),2>')), 6)") == 12.566371
    assert one(eng, "RETURN area(toPolygon('((0,0),(4,0),(4,4),(0,4))'))") == 16.0
    assert one(eng, "RETURN npoints(toPath('[(0,0),(1,1),(2,0)]'))") == 3
    assert one(eng, "RETURN radius(toCircle('<(1,2),3>'))") == 3.0
    assert one(eng, "RETURN diagonal(toBox('(0,0),(4,2)'))") == "[(4,2),(0,0)]"
    assert one(eng, "RETURN center(toLseg('[(0,0),(2,2)]'))") == "(1,1)"
    assert one(eng, "RETURN center(toCircle('<(3,4),2>'))") == "(3,4)"
    assert one(eng, "RETURN center(toPolygon('((0,0),(4,0),(4,4),(0,4))'))") == "(2,2)"


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
