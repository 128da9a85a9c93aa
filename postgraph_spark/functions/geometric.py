"""Geometric kit (gtype_geometric.c; PG geo_ops semantics).

Full function surface of the reference's geometric kit
(sql/postgraph-geometric.sql.in, 11 functions): construction casts for
all seven types, intersection_point (`#`), closest_point (`##`),
center (`@@`), length (`@-@`, the reference's 1-arg gtype_distance),
vertical (`?|`) / horizontal (`?-`), perp (`?-|`) / parallel (`?||`),
bound_box, height, width — plus the containment/overlap predicates the
regress exercises through operators (box/polygon/circle/path contains,
box/circle overlap, same-as), exposed as NAMED functions because the
operator characters (`@>`, `?|`, `@@`, ...) are already claimed by the
jsonb/tsearch kits here (the reference dispatches per operand TYPE
tags, which the text-encoded gval model cannot recover at compile
time; the self-describing canonical texts below restore that dispatch
at runtime).

Representation: canonical PG output text inside string gvals —
point `(x,y)`, box `(hx,hy),(lx,ly)` (upper-right corner first, the
box_out shape), lseg `[(x1,y1),(x2,y2)]`, line `{A,B,C}`, circle
`<(x,y),r>`, path `[(..),..]` open / `((..),..)` closed, polygon
`((x1,y1),...)`. All parsing/arithmetic is JVM regexp + numeric
expressions and higher-order array functions: no UDFs, safe in scan
predicates, whole-stage-codegen friendly.
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


# ------------------------------------------------- full-surface parsers
#
# Canonical texts are self-describing: lseg starts with '[', line with
# '{', circle with '<', path is '[..]' (open) or '((..),..)' (closed,
# >= 1 point), polygon '((..),..)'; a bare one-point text is a point
# and a bare two-point text is a box. Inputs accept the PG *_in lenient
# forms (optional outer parens/brackets), outputs are the *_out forms.

def _shape(s: Column) -> Column:
    """First significant char, '' for null/empty."""
    return F.substring(F.ltrim(s), 1, 1)


def _is_nested(s: Column) -> Column:
    """True for '((' openings — the canonical polygon / closed-path
    texts; distinguishes them from the bare-two-point box text."""
    return s.rlike(r"^\s*\(\s*\(")


def _pts_list(s: Column) -> Column:
    """All '(x,y)' point groups in the text -> array<struct<x,y>>."""
    pairs = F.regexp_extract_all(s, F.lit(rf"({_NUM})\s*,\s*({_NUM})"), 0)
    return F.transform(
        pairs,
        lambda p: F.struct(
            F.regexp_extract(p, rf"({_NUM})\s*,\s*({_NUM})", 1)
            .cast("double").alias("x"),
            F.regexp_extract(p, rf"({_NUM})\s*,\s*({_NUM})", 2)
            .cast("double").alias("y"),
        ),
    )


def _seg_ends(s: Column) -> tuple[Column, Column, Column, Column]:
    """lseg text ('[(..),(..)]' or bare corner pair) -> x1,y1,x2,y2."""
    pat = rf"^\s*\[?\s*{_PT}\s*,\s*{_PT}\s*\]?\s*$"
    nums = [F.regexp_extract(s, pat, i) for i in (1, 2, 3, 4)]
    x1, y1, x2, y2 = [F.when(n != "", n).try_cast("double") for n in nums]
    return x1, y1, x2, y2


def _seg_txt(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    ok = x1.isNotNull() & y1.isNotNull() & x2.isNotNull() & y2.isNotNull()
    return F.when(
        ok,
        F.concat(F.lit("["), _point_txt(x1, y1), F.lit(","), _point_txt(x2, y2), F.lit("]")),
    )


def _line_abc(s: Column) -> tuple[Column, Column, Column]:
    """line text -> (A, B, C) of Ax+By+C=0. Accepts '{A,B,C}' or a
    two-point form; two points follow PG line_construct: vertical
    {-1,0,x}, otherwise slope form {m,-1,b}."""
    pat = rf"^\s*\{{\s*({_NUM})\s*,\s*({_NUM})\s*,\s*({_NUM})\s*\}}\s*$"
    nums = [F.regexp_extract(s, pat, i) for i in (1, 2, 3)]
    a0, b0, c0 = [F.when(n != "", n).try_cast("double") for n in nums]
    x1, y1, x2, y2 = _seg_ends(s)
    vert = x2 == x1
    m = (y2 - y1) / (x2 - x1)
    a1 = F.when(vert, F.lit(-1.0)).otherwise(m)
    b1 = F.when(vert, F.lit(0.0)).otherwise(F.lit(-1.0))
    c1 = F.when(vert, x1).otherwise(y1 - m * x1)
    ok_pts = x1.isNotNull() & y2.isNotNull()
    return (
        F.coalesce(a0, F.when(ok_pts, a1)),
        F.coalesce(b0, F.when(ok_pts, b1)),
        F.coalesce(c0, F.when(ok_pts, c1)),
    )


def _line_txt(a: Column, b: Column, c: Column) -> Column:
    ok = a.isNotNull() & b.isNotNull() & c.isNotNull()
    return F.when(
        ok,
        F.concat(
            F.lit("{"), _num_txt(a), F.lit(","), _num_txt(b), F.lit(","),
            _num_txt(c), F.lit("}"),
        ),
    )


def _circle_cr(s: Column) -> tuple[Column, Column, Column]:
    """circle text '<(x,y),r>' / '((x,y),r)' / '(x,y),r' -> (cx,cy,r)."""
    pat = rf"^\s*[<(]?\s*{_PT}\s*,\s*({_NUM})\s*[>)]?\s*$"
    nums = [F.regexp_extract(s, pat, i) for i in (1, 2, 3)]
    cx, cy, r = [F.when(n != "", n).try_cast("double") for n in nums]
    return cx, cy, F.when(r >= 0, r)


def _circle_txt(cx: Column, cy: Column, r: Column) -> Column:
    ok = cx.isNotNull() & cy.isNotNull() & r.isNotNull()
    return F.when(
        ok, F.concat(F.lit("<"), _point_txt(cx, cy), F.lit(","), _num_txt(r), F.lit(">"))
    )


def _pts_txt(pts: Column) -> Column:
    return F.array_join(
        F.transform(pts, lambda p: _point_txt(p["x"], p["y"])), ","
    )


# ------------------------------------------------------------ new casts

def cast_lseg(gv: Column) -> Column:
    """tolseg (gtype_tolseg): '(x1,y1), (x2,y2)' / '[(..),(..)]'."""
    return G.gv_str(_seg_txt(*_seg_ends(_str_in(gv))))


def cast_line(gv: Column) -> Column:
    """toline (gtype_toline): '{A,B,C}' or a two-point text."""
    return G.gv_str(_line_txt(*_line_abc(_str_in(gv))))


def cast_circle(gv: Column) -> Column:
    """tocircle (gtype_tocircle): '<(x,y),r>' / '((x,y),r)' / '(x,y), r'."""
    return G.gv_str(_circle_txt(*_circle_cr(_str_in(gv))))


def cast_path(gv: Column) -> Column:
    """topath (gtype_topath): '[(..),..]' open, '((..),..)' or a bare
    point list closed (PG path_in: brackets mean open)."""
    s = _str_in(gv)
    pts = _pts_list(s)
    is_open = _shape(s) == "["
    body = _pts_txt(pts)
    ok = F.size(pts) >= 1
    return G.gv_str(
        F.when(
            ok & s.rlike(rf"^\s*[\[\(]?\s*(?:{_PT}\s*,?\s*)+[\]\)]?\s*$"),
            F.when(is_open, F.concat(F.lit("["), body, F.lit("]")))
            .otherwise(F.concat(F.lit("("), body, F.lit(")"))),
        )
    )


def cast_polygon(gv: Column) -> Column:
    """topolygon (gtype_topolygon): point list, canonical '((..),..)'."""
    s = _str_in(gv)
    pts = _pts_list(s)
    ok = (F.size(pts) >= 1) & s.rlike(rf"^\s*\(?\s*(?:{_PT}\s*,?\s*)+\)?\s*$")
    return G.gv_str(F.when(ok, F.concat(F.lit("("), _pts_txt(pts), F.lit(")"))))


# ------------------------------------------------- geometry primitives

def _closest_on_seg(px: Column, py: Column, x1, y1, x2, y2) -> tuple[Column, Column]:
    """Point on segment (x1,y1)-(x2,y2) closest to (px,py) — projection
    with parameter clamp (PG close_ps)."""
    dx, dy = x2 - x1, y2 - y1
    den = dx * dx + dy * dy
    t_raw = ((px - x1) * dx + (py - y1) * dy) / den
    t = F.when(den == 0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), t_raw))
    )
    return x1 + t * dx, y1 + t * dy


def _dist_pt_seg(px, py, x1, y1, x2, y2) -> Column:
    qx, qy = _closest_on_seg(px, py, x1, y1, x2, y2)
    return F.sqrt((px - qx) * (px - qx) + (py - qy) * (py - qy))


def _seg_interpt(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> tuple[Column, Column]:
    """Proper segment-segment intersection point (null when parallel /
    collinear / outside either parameter range) — lseg_interpt's
    non-degenerate branch."""
    d1x, d1y = ax2 - ax1, ay2 - ay1
    d2x, d2y = bx2 - bx1, by2 - by1
    den = d1x * d2y - d1y * d2x
    t = ((bx1 - ax1) * d2y - (by1 - ay1) * d2x) / den
    u = ((bx1 - ax1) * d1y - (by1 - ay1) * d1x) / den
    ok = (den != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    return F.when(ok, ax1 + t * d1x), F.when(ok, ay1 + t * d1y)


def _box_edges(hx, hy, lx, ly) -> list[tuple[Column, Column, Column, Column]]:
    """Box perimeter as four segments (bottom, left, top, right)."""
    return [
        (lx, ly, hx, ly),
        (lx, ly, lx, hy),
        (lx, hy, hx, hy),
        (hx, ly, hx, hy),
    ]


# ------------------------------------------------------- 11-fn surface

def geo_intersection_point(a: Column, b: Column) -> Column:
    """intersection_point `#` (gtype_intersection_point): lseg # lseg ->
    point, line # line -> point, box # box -> intersection box."""
    sa, sb = _str_in(a), _str_in(b)
    shp_a, shp_b = _shape(sa), _shape(sb)

    # lseg # lseg
    ax1, ay1, ax2, ay2 = _seg_ends(sa)
    bx1, by1, bx2, by2 = _seg_ends(sb)
    ix, iy = _seg_interpt(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    seg_case = _point_txt(ix, iy)

    # line # line: solve A1x+B1y+C1=0 / A2x+B2y+C2=0
    a1, b1, c1 = _line_abc(sa)
    a2, b2, c2 = _line_abc(sb)
    lden = a1 * b2 - a2 * b1
    lx_ = F.when(lden != 0, (b1 * c2 - b2 * c1) / lden)
    ly_ = F.when(lden != 0, (a2 * c1 - a1 * c2) / lden)
    line_case = _point_txt(lx_, ly_)

    # box # box: overlap rectangle
    ahx, ahy, alx, aly = _box_corners(sa)
    bhx, bhy, blx, bly = _box_corners(sb)
    nhx, nhy = F.least(ahx, bhx), F.least(ahy, bhy)
    nlx, nly = F.greatest(alx, blx), F.greatest(aly, bly)
    box_case = F.when((nhx >= nlx) & (nhy >= nly), _box_txt(nhx, nhy, nlx, nly))

    return G.gv_str(
        F.when((shp_a == "[") & (shp_b == "["), seg_case)
        .when((shp_a == "{") & (shp_b == "{"), line_case)
        .when(ahx.isNotNull() & bhx.isNotNull(), box_case)
    )


def _closest_pt_cases(sa: Column, sb: Column) -> Column:
    """closest_point dispatch body: the point ON b nearest to a, per
    the reference's six close_* branches."""
    shp_a, shp_b = _shape(sa), _shape(sb)
    pax, pay = _pt_xy(sa)
    is_pt_a = pax.isNotNull()

    # --- point ## lseg (close_ps)
    bx1, by1, bx2, by2 = _seg_ends(sb)
    ps_x, ps_y = _closest_on_seg(pax, pay, bx1, by1, bx2, by2)

    # --- point ## line (close_pl): perpendicular foot
    la, lb, lc = _line_abc(sb)
    nden = la * la + lb * lb
    k = (la * pax + lb * pay + lc) / nden
    pl_x, pl_y = pax - la * k, pay - lb * k

    # --- point ## box (close_pb): clamp into the box
    bhx, bhy, blx, bly = _box_corners(sb)
    pb_x = F.greatest(blx, F.least(bhx, pax))
    pb_y = F.greatest(bly, F.least(bhy, pay))

    # --- lseg ## lseg (close_lseg): candidates on b = projections of
    # a's endpoints, b's endpoints, and the proper intersection; pick
    # the first strictly-minimal by distance to a (candidate order
    # breaks ties the way the regress expects).
    ax1, ay1, ax2, ay2 = _seg_ends(sa)
    ix, iy = _seg_interpt(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    c1 = _closest_on_seg(ax1, ay1, bx1, by1, bx2, by2)
    c2 = _closest_on_seg(ax2, ay2, bx1, by1, bx2, by2)
    cands = [c1, c2, (bx1, by1), (bx2, by2)]
    best_x, best_y, best_d = None, None, None
    for qx, qy in cands:
        d = _dist_pt_seg(qx, qy, ax1, ay1, ax2, ay2)
        if best_d is None:
            best_x, best_y, best_d = qx, qy, d
        else:
            better = d < best_d
            best_x = F.when(better, qx).otherwise(best_x)
            best_y = F.when(better, qy).otherwise(best_y)
            best_d = F.when(better, d).otherwise(best_d)
    ll_x = F.coalesce(ix, best_x)
    ll_y = F.coalesce(iy, best_y)

    # --- line ## lseg (close_ls): distance to a line is linear along
    # the segment -> an endpoint, or the crossing point.
    a_l, b_l, c_l = _line_abc(sa)
    nden_a = F.sqrt(a_l * a_l + b_l * b_l)
    db1 = F.abs(a_l * bx1 + b_l * by1 + c_l) / nden_a
    db2 = F.abs(a_l * bx2 + b_l * by2 + c_l) / nden_a
    # crossing: sign change of the line form along the segment
    s1 = a_l * bx1 + b_l * by1 + c_l
    s2 = a_l * bx2 + b_l * by2 + c_l
    tc = s1 / (s1 - s2)
    crosses = (s1 * s2 <= 0) & (s1 != s2)
    cx_ = F.when(crosses, bx1 + tc * (bx2 - bx1))
    cy_ = F.when(crosses, by1 + tc * (by2 - by1))
    ls_x = F.coalesce(cx_, F.when(db1 <= db2, bx1).otherwise(bx2))
    ls_y = F.coalesce(cy_, F.when(db1 <= db2, by1).otherwise(by2))

    # --- lseg ## box (close_sb): min over b's four edges of the
    # closest point on that edge to segment a (same candidate scheme).
    sb_best = None
    for ex1, ey1, ex2, ey2 in _box_edges(bhx, bhy, blx, bly):
        eix, eiy = _seg_interpt(ax1, ay1, ax2, ay2, ex1, ey1, ex2, ey2)
        e1 = _closest_on_seg(ax1, ay1, ex1, ey1, ex2, ey2)
        e2 = _closest_on_seg(ax2, ay2, ex1, ey1, ex2, ey2)
        for qx, qy in ((F.coalesce(eix, e1[0]), F.coalesce(eiy, e1[1])),
                       e2, (ex1, ey1), (ex2, ey2)):
            d = _dist_pt_seg(qx, qy, ax1, ay1, ax2, ay2)
            if sb_best is None:
                sb_best = (qx, qy, d)
            else:
                better = d < sb_best[2]
                sb_best = (
                    F.when(better, qx).otherwise(sb_best[0]),
                    F.when(better, qy).otherwise(sb_best[1]),
                    F.when(better, d).otherwise(sb_best[2]),
                )
    sb_x, sb_y, _ = sb_best

    is_seg_a = shp_a == "["
    is_line_a = shp_a == "{"
    is_seg_b = shp_b == "["
    is_line_b = shp_b == "{"
    is_box_b = bhx.isNotNull() & ~is_seg_b & ~is_line_b

    return (
        F.when(is_pt_a & is_seg_b, _point_txt(ps_x, ps_y))
        .when(is_pt_a & is_line_b, _point_txt(pl_x, pl_y))
        .when(is_pt_a & is_box_b, _point_txt(pb_x, pb_y))
        .when(is_seg_a & is_seg_b, _point_txt(ll_x, ll_y))
        .when(is_line_a & is_seg_b, _point_txt(ls_x, ls_y))
        .when(is_seg_a & is_box_b, _point_txt(sb_x, sb_y))
    )


def geo_closest_point(a: Column, b: Column) -> Column:
    """closest_point `##` (gtype_closest_point): the point on b nearest
    to a — point##{lseg,line,box}, lseg##{lseg,box}, line##lseg."""
    return G.gv_str(_closest_pt_cases(_str_in(a), _str_in(b)))


def geo_length(a: Column) -> Column:
    """`@-@` (the reference's 1-arg gtype_distance): lseg_length, or
    path_length = sum of segment lengths (+ the closing segment for a
    closed path)."""
    s = _str_in(a)
    x1, y1, x2, y2 = _seg_ends(s)
    seg_len = F.sqrt((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1))

    pts = _pts_list(s)
    n = F.size(pts)
    closed = _shape(s) == "("
    ring = F.when(closed & (n > 1), F.concat(pts, F.slice(pts, 1, 1))).otherwise(pts)
    hops = F.zip_with(
        ring,
        F.slice(ring, 2, F.greatest(F.size(ring) - 1, F.lit(0))),
        lambda p, q: F.sqrt(
            (q["x"] - p["x"]) * (q["x"] - p["x"])
            + (q["y"] - p["y"]) * (q["y"] - p["y"])
        ),
    )
    path_len = F.aggregate(
        F.filter(hops, lambda d: d.isNotNull()), F.lit(0.0), lambda acc, d: acc + d
    )
    return G.gv_float(
        F.when(x1.isNotNull() & (F.size(pts) == 2) & (_shape(s) == "["), seg_len)
        .when(n >= 1, path_len)
    )


def geo_vertical(a: Column) -> Column:
    """`?|` vertical: lseg x1==x2; line {A,B,C} B==0."""
    s = _str_in(a)
    x1, _, x2, _ = _seg_ends(s)
    la, lb, _ = _line_abc(s)
    return G.gv_bool(
        F.when(_shape(s) == "{", lb == 0).otherwise(F.when(x1.isNotNull(), x1 == x2))
    )


def geo_horizontal(a: Column) -> Column:
    """`?-` horizontal: lseg y1==y2; line A==0."""
    s = _str_in(a)
    _, y1, _, y2 = _seg_ends(s)
    la, _, _ = _line_abc(s)
    return G.gv_bool(
        F.when(_shape(s) == "{", la == 0).otherwise(F.when(y1.isNotNull(), y1 == y2))
    )


def _dirs(s: Column) -> tuple[Column, Column]:
    """Direction vector of an lseg or line (for parallel/perp tests):
    lseg (dx,dy); line {A,B,C} direction (B,-A)."""
    x1, y1, x2, y2 = _seg_ends(s)
    la, lb, _ = _line_abc(s)
    is_line = _shape(s) == "{"
    return (
        F.when(is_line, lb).otherwise(x2 - x1),
        F.when(is_line, -la).otherwise(y2 - y1),
    )


def geo_perp(a: Column, b: Column) -> Column:
    """`?-|` perpendicular (lseg/line): direction dot product == 0."""
    ax, ay = _dirs(_str_in(a))
    bx, by = _dirs(_str_in(b))
    return G.gv_bool(F.when(ax.isNotNull() & bx.isNotNull(), ax * bx + ay * by == 0))


def geo_parallel(a: Column, b: Column) -> Column:
    """`?||` parallel (lseg/line): direction cross product == 0."""
    ax, ay = _dirs(_str_in(a))
    bx, by = _dirs(_str_in(b))
    return G.gv_bool(F.when(ax.isNotNull() & bx.isNotNull(), ax * by - ay * bx == 0))


# ----------------------------------- center/contain/overlap extensions

def geo_center_full(a: Column) -> Column:
    """center `@@` over the full surface: box center, lseg midpoint,
    circle center, polygon vertex average (poly_center), point
    identity."""
    s = _str_in(a)
    shp = _shape(s)

    cx, cy, r = _circle_cr(s)
    x1, y1, x2, y2 = _seg_ends(s)
    seg_c = _point_txt((x1 + x2) / 2, (y1 + y2) / 2)

    pts = _pts_list(s)
    n = F.size(pts)
    sx = F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + p["x"])
    sy = F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + p["y"])
    poly_c = F.when(n >= 1, _point_txt(sx / n, sy / n))

    hx, hy, lx, ly = _box_corners(s)
    box_c = _point_txt((hx + lx) / 2, (hy + ly) / 2)
    px, py = _pt_xy(s)

    return G.gv_str(
        F.when(shp == "<", _point_txt(cx, cy))
        .when(shp == "[", seg_c)
        .when(_is_nested(s), poly_c)
        .when(box_c.isNotNull(), box_c)
        .when(px.isNotNull(), _point_txt(px, py))
    )


def _poly_contains_xy(pts: Column, px: Column, py: Column) -> Column:
    """Even-odd ray cast: point in polygon, vertices/edges count as in
    (matches PG point_inside's boundary behavior for the regress set).
    Pure higher-order JVM expressions: fold over the closed ring."""
    n = F.size(pts)
    ring = F.when(n >= 1, F.concat(pts, F.slice(pts, 1, 1)))
    edges = F.zip_with(
        ring,
        F.slice(ring, 2, F.greatest(F.size(ring) - 1, F.lit(0))),
        lambda p, q: F.struct(
            p["x"].alias("x1"), p["y"].alias("y1"),
            q["x"].alias("x2"), q["y"].alias("y2"),
        ),
    )
    on_edge = F.exists(
        edges,
        lambda e: (
            ((px - e["x1"]) * (e["y2"] - e["y1"]) == (py - e["y1"]) * (e["x2"] - e["x1"]))
            & (px >= F.least(e["x1"], e["x2"])) & (px <= F.greatest(e["x1"], e["x2"]))
            & (py >= F.least(e["y1"], e["y2"])) & (py <= F.greatest(e["y1"], e["y2"]))
        ),
    )
    crossings = F.aggregate(
        edges,
        F.lit(0),
        lambda acc, e: acc
        + F.when(
            ((e["y1"] > py) != (e["y2"] > py))
            & (px < (e["x2"] - e["x1"]) * (py - e["y1"]) / (e["y2"] - e["y1"]) + e["x1"]),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return on_edge | (crossings % 2 == 1)


def geo_contains(a: Column, b: Column) -> Column:
    """Containment `@>` family by canonical-text shape: box@>point,
    box@>box, circle@>point, circle@>circle, polygon@>point,
    path@>point (point on a segment of the path)."""
    sa, sb = _str_in(a), _str_in(b)
    shp_a = _shape(sa)
    px, py = _pt_xy(sb)

    # circle a
    cx, cy, r = _circle_cr(sa)
    d_pt = F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))
    bcx, bcy, br = _circle_cr(sb)
    d_cc = F.sqrt((bcx - cx) * (bcx - cx) + (bcy - cy) * (bcy - cy))
    circle_case = F.when(px.isNotNull(), d_pt <= r).otherwise(
        F.when(br.isNotNull(), d_cc + br <= r)
    )

    # box a
    ahx, ahy, alx, aly = _box_corners(sa)
    bhx, bhy, blx, bly = _box_corners(sb)
    box_pt = (px >= alx) & (px <= ahx) & (py >= aly) & (py <= ahy)
    box_box = (bhx <= ahx) & (bhy <= ahy) & (blx >= alx) & (bly >= aly)
    box_case = F.when(px.isNotNull(), box_pt).otherwise(F.when(bhx.isNotNull(), box_box))

    # polygon / closed path a: interior test; open path: on-a-segment
    pts = _pts_list(sa)
    poly_case = F.when(px.isNotNull(), _poly_contains_xy(pts, px, py))
    ring = F.when(_shape(sa) == "(", F.concat(pts, F.slice(pts, 1, 1))).otherwise(pts)
    segs = F.zip_with(
        ring,
        F.slice(ring, 2, F.greatest(F.size(ring) - 1, F.lit(0))),
        lambda p, q: F.struct(
            p["x"].alias("x1"), p["y"].alias("y1"),
            q["x"].alias("x2"), q["y"].alias("y2"),
        ),
    )
    path_case = F.when(
        px.isNotNull(),
        F.exists(
            segs,
            lambda e: (
                ((px - e["x1"]) * (e["y2"] - e["y1"]) == (py - e["y1"]) * (e["x2"] - e["x1"]))
                & (px >= F.least(e["x1"], e["x2"])) & (px <= F.greatest(e["x1"], e["x2"]))
                & (py >= F.least(e["y1"], e["y2"])) & (py <= F.greatest(e["y1"], e["y2"]))
            ),
        ),
    )

    is_box_a = (
        ahx.isNotNull() & (shp_a == "(") & ~_is_nested(sa) & (F.size(pts) == 2)
    )
    return G.gv_bool(
        F.when(shp_a == "<", circle_case)
        .when(shp_a == "[", path_case)
        .when(is_box_a, box_case)
        .when(_is_nested(sa), poly_case)
    )


def geo_contained(a: Column, b: Column) -> Column:
    """`<@`: a contained in b — argument-swapped geo_contains."""
    return geo_contains(b, a)


def geo_overlap(a: Column, b: Column) -> Column:
    """Overlap `&&`: box&&box (interval overlap both axes),
    circle&&circle (center distance <= r1+r2)."""
    sa, sb = _str_in(a), _str_in(b)
    acx, acy, ar = _circle_cr(sa)
    bcx, bcy, br = _circle_cr(sb)
    dcc = F.sqrt((bcx - acx) * (bcx - acx) + (bcy - acy) * (bcy - acy))
    circle_case = F.when(ar.isNotNull() & br.isNotNull(), dcc <= ar + br)

    ahx, ahy, alx, aly = _box_corners(sa)
    bhx, bhy, blx, bly = _box_corners(sb)
    box_case = F.when(
        ahx.isNotNull() & bhx.isNotNull(),
        (alx <= bhx) & (blx <= ahx) & (aly <= bhy) & (bly <= ahy),
    )
    return G.gv_bool(
        F.when((_shape(sa) == "<") & (_shape(sb) == "<"), circle_case).otherwise(box_case)
    )


def geo_same(a: Column, b: Column) -> Column:
    """Same-as `~=`: canonical-text equality (box corners, circle
    center+radius, polygon vertex sequence — the canonicalizing casts
    make text equality exactly PG's *_same coordinate tests)."""
    sa, sb = _str_in(a), _str_in(b)
    return G.gv_bool(F.when(sa.isNotNull() & sb.isNotNull(), sa == sb))


def geo_area(a: Column) -> Column:
    """area(): box (w*h), circle (pi r^2), polygon (shoelace)."""
    s = _str_in(a)
    hx, hy, lx, ly = _box_corners(s)
    box_area = (hx - lx) * (hy - ly)
    cx, cy, r = _circle_cr(s)
    circle_area = r * r * F.lit(3.141592653589793)
    pts = _pts_list(s)
    ring = F.concat(pts, F.slice(pts, 1, 1))
    cross = F.zip_with(
        ring,
        F.slice(ring, 2, F.greatest(F.size(ring) - 1, F.lit(0))),
        lambda p, q: p["x"] * q["y"] - q["x"] * p["y"],
    )
    poly_area = F.abs(F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v)) / 2
    return G.gv_float(
        F.when(_shape(s) == "<", circle_area)
        .when(_is_nested(s), poly_area)
        .when(hx.isNotNull() & (F.size(pts) == 2), box_area)
    )


def geo_npoints(a: Column) -> Column:
    """npoints(path/polygon) — vertex count."""
    s = _str_in(a)
    pts = _pts_list(s)
    return G.gv_int(F.when(F.size(pts) >= 1, F.size(pts)).cast("long"))


def geo_radius(a: Column) -> Column:
    """radius(circle)."""
    _, _, r = _circle_cr(_str_in(a))
    return G.gv_float(r)


def geo_diagonal(a: Column) -> Column:
    """diagonal(box) -> lseg from high corner to low corner."""
    hx, hy, lx, ly = _box_corners(_str_in(a))
    return G.gv_str(_seg_txt(hx, hy, lx, ly))
