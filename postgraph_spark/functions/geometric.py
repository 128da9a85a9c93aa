"""Minimal geometric kit (gtype_geometric.c; PG geo_ops semantics).

Scope (round-6, SURVEY §7 "minimal geometric kit"): point and box —
construction casts, distance, center, height/width, bounding box, and
box-contains-point. The lseg/path/polygon/circle surface and the
operator spellings (`<->`, `@>` overloads, `?|`, `?-`) remain out of
scope: the reference itself ships no geometric regress suite, and the
operator characters are already claimed by the tsearch/jsonb kits here
(the reference dispatches per operand TYPE tags, which the text-encoded
gval model cannot recover at compile time).

Representation: canonical PG output text inside string gvals —
point `(x,y)`, box `(hx,hy),(lx,ly)` (upper-right corner first, the
box_out shape). All parsing/arithmetic is JVM regexp + numeric
expressions: no UDFs, safe in scan predicates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from postgraph_spark.functions import gtype as G

_NUM = r"[-+]?(?:[0-9]*\.)?[0-9]+(?:[eE][-+]?[0-9]+)?"
_PT = rf"\(\s*({_NUM})\s*,\s*({_NUM})\s*\)"


def _num_txt(d: Column) -> Column:
    """double -> PG float8-ish display (integral values without '.0')."""
    as_long = d.cast("long")
    return F.when(
        as_long.cast("double") == d, as_long.cast("string")
    ).otherwise(d.cast("string"))


def _pt_xy(s: Column) -> tuple[Column, Column]:
    """point text (with or without parens) -> (x, y) doubles (null when
    malformed — errors become gtype nulls, the engine's convention)."""
    pat = rf"^\s*\(?\s*({_NUM})\s*,\s*({_NUM})\s*\)?\s*$"
    x = F.regexp_extract(s, pat, 1)
    y = F.regexp_extract(s, pat, 2)
    return (
        F.when(x != "", x).try_cast("double"),
        F.when(y != "", y).try_cast("double"),
    )


def _point_txt(x: Column, y: Column) -> Column:
    ok = x.isNotNull() & y.isNotNull()
    return F.when(ok, F.concat(F.lit("("), _num_txt(x), F.lit(","), _num_txt(y), F.lit(")")))


def _box_corners(s: Column) -> tuple[Column, Column, Column, Column]:
    """box text -> (hx, hy, lx, ly): two corner points in any order /
    paren style; canonicalized to upper-right, lower-left (box_in)."""
    pat = rf"^\s*\(?\s*{_PT}\s*,\s*{_PT}\s*\)?\s*$"
    nums = [F.regexp_extract(s, pat, i) for i in (1, 2, 3, 4)]
    x1, y1, x2, y2 = [F.when(n != "", n).try_cast("double") for n in nums]
    return (
        F.greatest(x1, x2), F.greatest(y1, y2), F.least(x1, x2), F.least(y1, y2)
    )


def _box_txt(hx: Column, hy: Column, lx: Column, ly: Column) -> Column:
    ok = hx.isNotNull() & hy.isNotNull() & lx.isNotNull() & ly.isNotNull()
    return F.when(ok, F.concat(_point_txt(hx, hy), F.lit(","), _point_txt(lx, ly)))


def _str_in(gv: Column) -> Column:
    return F.when(gv["t"] == G.T_STRING, gv["s"])


# ------------------------------------------------------------------ casts

def cast_point(gv: Column) -> Column:
    """topoint (gtype_topoint): '(x,y)' / 'x,y' text or a 2-element
    numeric array."""
    s = _str_in(gv)
    arr = F.when(gv["t"] == G.T_ARRAY, F.from_json(gv["j"], "array<double>"))
    x_a = F.when(F.size(arr) == 2, F.element_at(arr, 1))
    y_a = F.when(F.size(arr) == 2, F.element_at(arr, 2))
    x_s, y_s = _pt_xy(s)
    return G.gv_str(
        F.when(gv["t"] == G.T_ARRAY, _point_txt(x_a, y_a)).otherwise(_point_txt(x_s, y_s))
    )


def cast_box(gv: Column) -> Column:
    """tobox (gtype_tobox): '(x1,y1),(x2,y2)' in any corner order."""
    return G.gv_str(_box_txt(*_box_corners(_str_in(gv))))


# -------------------------------------------------------------- functions

def geo_distance(a: Column, b: Column) -> Column:
    """distance(point, point) — euclidean (point_distance)."""
    ax, ay = _pt_xy(_str_in(a))
    bx, by = _pt_xy(_str_in(b))
    return G.gv_float(F.sqrt(F.pow(ax - bx, F.lit(2.0)) + F.pow(ay - by, F.lit(2.0))))


def geo_center(a: Column) -> Column:
    """center(box) -> point; center(point) -> the point (gtype_center)."""
    s = _str_in(a)
    hx, hy, lx, ly = _box_corners(s)
    px, py = _pt_xy(s)
    box_c = _point_txt((hx + lx) / 2, (hy + ly) / 2)
    return G.gv_str(F.coalesce(box_c, _point_txt(px, py)))


def geo_height(a: Column) -> Column:
    hx, hy, lx, ly = _box_corners(_str_in(a))
    return G.gv_float(hy - ly)


def geo_width(a: Column) -> Column:
    hx, hy, lx, ly = _box_corners(_str_in(a))
    return G.gv_float(hx - lx)


def geo_bound_box(a: Column, b: Column) -> Column:
    """bound_box(box, box) — smallest box containing both
    (gtype_bound_box / boxes_bound_box)."""
    ahx, ahy, alx, aly = _box_corners(_str_in(a))
    bhx, bhy, blx, bly = _box_corners(_str_in(b))
    return G.gv_str(
        _box_txt(
            F.greatest(ahx, bhx), F.greatest(ahy, bhy),
            F.least(alx, blx), F.least(aly, bly),
        )
    )


def geo_box_contains(b: Column, p: Column) -> Column:
    """box_contains(box, point) — PG `box @> point` semantics."""
    hx, hy, lx, ly = _box_corners(_str_in(b))
    px, py = _pt_xy(_str_in(p))
    ok = hx.isNotNull() & px.isNotNull()
    return G.gv_bool(
        F.when(ok, (px >= lx) & (px <= hx) & (py >= ly) & (py <= hy))
    )
