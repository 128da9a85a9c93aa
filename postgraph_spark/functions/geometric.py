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
    """double -> PG float8-ish display (integral values without '.0').
    The input is `_bind`-bound: every text builder references its args
    3-4x, and those factors COMPOUND through the layered builders
    (point -> box -> branch select), blowing the logical plan up
    multiplicatively without the binds (a center() call over a cast
    input analyzed to a 42 MB plan before this treatment)."""
    return _bind(
        lambda r: F.when(
            r["d"].cast("long").cast("double") == r["d"],
            r["d"].cast("long").cast("string"),
        ).otherwise(r["d"].cast("string")),
        d=d,
    )


def _rex_d(s: Column, pat: str, i: int) -> Column:
    """regexp group i of s as a nullable double ('' -> null), with the
    extract bound once (the ''-guard would otherwise copy s twice)."""
    return _bind(
        lambda r: F.when(r["n"] != "", r["n"]).try_cast("double"),
        n=F.regexp_extract(s, pat, i),
    )


def _pt_xy(s: Column) -> tuple[Column, Column]:
    """point text (with or without parens) -> (x, y) doubles (null when
    malformed — errors become gtype nulls, the engine's convention)."""
    pat = rf"^\s*\(?\s*({_NUM})\s*,\s*({_NUM})\s*\)?\s*$"
    return _rex_d(s, pat, 1), _rex_d(s, pat, 2)


def _point_txt(x: Column, y: Column) -> Column:
    return _bind(
        lambda r: F.when(
            r["x"].isNotNull() & r["y"].isNotNull(),
            F.concat(
                F.lit("("), _num_txt(r["x"]), F.lit(","), _num_txt(r["y"]), F.lit(")")
            ),
        ),
        x=x,
        y=y,
    )


def _box_corners(s: Column) -> tuple[Column, Column, Column, Column]:
    """box text -> (hx, hy, lx, ly): two corner points in any order /
    paren style; canonicalized to upper-right, lower-left (box_in)."""
    pat = rf"^\s*\(?\s*{_PT}\s*,\s*{_PT}\s*\)?\s*$"
    x1, y1, x2, y2 = [_rex_d(s, pat, i) for i in (1, 2, 3, 4)]
    return (
        F.greatest(x1, x2), F.greatest(y1, y2), F.least(x1, x2), F.least(y1, y2)
    )


def _box_txt(hx: Column, hy: Column, lx: Column, ly: Column) -> Column:
    return _bind(
        lambda r: F.when(
            r["hx"].isNotNull() & r["hy"].isNotNull()
            & r["lx"].isNotNull() & r["ly"].isNotNull(),
            F.concat(
                _point_txt(r["hx"], r["hy"]), F.lit(","), _point_txt(r["lx"], r["ly"])
            ),
        ),
        hx=hx, hy=hy, lx=lx, ly=ly,
    )


def _str_in(gv: Column) -> Column:
    return F.when(gv["t"] == G.T_STRING, gv["s"])


def _bind(f, **cols) -> Column:
    """Let-binding for single-Column builders: pack the named values
    into a one-element array of struct and evaluate ``f`` on the lambda
    variable, so N references to a bound value cost N lambda-var nodes
    instead of N copies of its whole Catalyst tree. Without this the
    multi-branch geometric functions build EXPONENTIAL trees (each
    candidate/branch re-references parsed endpoints which re-reference
    the input text tree) — binding keeps construction and analysis
    linear while staying 100% JVM expressions (same device as the
    compiler's ``_maybe_let``, but usable without a DataFrame)."""
    s = F.struct(*[c.alias(k) for k, c in cols.items()])
    return F.element_at(F.transform(F.array(s), f), 1)


def _argmin_pt(cands: list[tuple[Column, Column, Column]]) -> tuple[Column, Column]:
    """(x, y, d) candidates -> (x, y) of the first strict minimum by d
    (ties keep the earlier candidate, matching the reference's
    candidate-order tie behavior; null-d candidates never win). The
    candidates enter ONE array literal and a linear fold picks the
    best — tree size O(sum of candidate trees), not O(2^n)."""
    arr = F.array(
        *[
            c
            if isinstance(c, Column)
            else F.struct(
                c[0].cast("double").alias("x"),
                c[1].cast("double").alias("y"),
                c[2].cast("double").alias("d"),
            )
            for c in cands
        ]
    )
    init = F.struct(
        F.lit(None).cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
        F.lit(float("inf")).cast("double").alias("d"),
    )
    best = F.aggregate(
        arr, init, lambda acc, e: F.when(e["d"] < acc["d"], e).otherwise(acc)
    )
    # render through a bind so the fold tree appears ONCE in the plan
    # (GetStructField twice would unfold it twice); null x marks no win
    return _bind(
        lambda r: F.struct(r["b"]["x"].alias("x"), r["b"]["y"].alias("y")), b=best
    )


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
    return tuple(_rex_d(s, pat, i) for i in (1, 2, 3, 4))


def _seg_txt(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    return _bind(
        lambda r: F.when(
            r["x1"].isNotNull() & r["y1"].isNotNull()
            & r["x2"].isNotNull() & r["y2"].isNotNull(),
            F.concat(
                F.lit("["), _point_txt(r["x1"], r["y1"]), F.lit(","),
                _point_txt(r["x2"], r["y2"]), F.lit("]"),
            ),
        ),
        x1=x1, y1=y1, x2=x2, y2=y2,
    )


def _line_abc(s: Column) -> tuple[Column, Column, Column]:
    """line text -> (A, B, C) of Ax+By+C=0. Accepts '{A,B,C}' or a
    two-point form; two points follow PG line_construct: vertical
    {-1,0,x}, otherwise slope form {m,-1,b}."""
    pat = rf"^\s*\{{\s*({_NUM})\s*,\s*({_NUM})\s*,\s*({_NUM})\s*\}}\s*$"
    a0, b0, c0 = [_rex_d(s, pat, i) for i in (1, 2, 3)]
    x1, y1, x2, y2 = _seg_ends(s)

    def two_pt(r, which):
        x1, y1, x2, y2 = r["x1"], r["y1"], r["x2"], r["y2"]
        vert = x2 == x1
        m = (y2 - y1) / (x2 - x1)
        ok_pts = x1.isNotNull() & y2.isNotNull()
        val = {
            "a": F.when(vert, F.lit(-1.0)).otherwise(m),
            "b": F.when(vert, F.lit(0.0)).otherwise(F.lit(-1.0)),
            "c": F.when(vert, x1).otherwise(y1 - m * x1),
        }[which]
        return F.when(ok_pts, val)

    return (
        F.coalesce(a0, _bind(lambda r: two_pt(r, "a"), x1=x1, y1=y1, x2=x2, y2=y2)),
        F.coalesce(b0, _bind(lambda r: two_pt(r, "b"), x1=x1, y1=y1, x2=x2, y2=y2)),
        F.coalesce(c0, _bind(lambda r: two_pt(r, "c"), x1=x1, y1=y1, x2=x2, y2=y2)),
    )


def _line_txt(a: Column, b: Column, c: Column) -> Column:
    return _bind(
        lambda r: F.when(
            r["a"].isNotNull() & r["b"].isNotNull() & r["c"].isNotNull(),
            F.concat(
                F.lit("{"), _num_txt(r["a"]), F.lit(","), _num_txt(r["b"]),
                F.lit(","), _num_txt(r["c"]), F.lit("}"),
            ),
        ),
        a=a, b=b, c=c,
    )


def _circle_cr(s: Column) -> tuple[Column, Column, Column]:
    """circle text '<(x,y),r>' / '((x,y),r)' / '(x,y),r' -> (cx,cy,r)."""
    pat = rf"^\s*[<(]?\s*{_PT}\s*,\s*({_NUM})\s*[>)]?\s*$"
    cx, cy, r = [_rex_d(s, pat, i) for i in (1, 2, 3)]
    return cx, cy, _bind(lambda t: F.when(t["r"] >= 0, t["r"]), r=r)


def _circle_txt(cx: Column, cy: Column, r: Column) -> Column:
    return _bind(
        lambda t: F.when(
            t["cx"].isNotNull() & t["cy"].isNotNull() & t["r"].isNotNull(),
            F.concat(
                F.lit("<"), _point_txt(t["cx"], t["cy"]), F.lit(","),
                _num_txt(t["r"]), F.lit(">"),
            ),
        ),
        cx=cx, cy=cy, r=r,
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
    point, line # line -> point, box # box -> intersection box.

    The input texts and every parsed scalar are `_bind`-bound once —
    the three branches reference them dozens of times and unbound
    trees go exponential at Column-construction time."""

    def with_parsed(r):
        sa, sb = r["sa"], r["sb"]
        ax1, ay1, ax2, ay2 = _seg_ends(sa)
        bx1, by1, bx2, by2 = _seg_ends(sb)
        a1, b1, c1 = _line_abc(sa)
        a2, b2, c2 = _line_abc(sb)
        ahx, ahy, alx, aly = _box_corners(sa)
        bhx, bhy, blx, bly = _box_corners(sb)
        return _bind(
            body,
            shp_a=_shape(sa), shp_b=_shape(sb),
            ax1=ax1, ay1=ay1, ax2=ax2, ay2=ay2,
            bx1=bx1, by1=by1, bx2=bx2, by2=by2,
            a1=a1, b1=b1, c1=c1, a2=a2, b2=b2, c2=c2,
            ahx=ahx, ahy=ahy, alx=alx, aly=aly,
            bhx=bhx, bhy=bhy, blx=blx, bly=bly,
        )

    def body(r):
        # lseg # lseg
        ix, iy = _seg_interpt(
            r["ax1"], r["ay1"], r["ax2"], r["ay2"],
            r["bx1"], r["by1"], r["bx2"], r["by2"],
        )
        seg_case = _point_txt(ix, iy)

        # line # line: solve A1x+B1y+C1=0 / A2x+B2y+C2=0
        a1, b1, c1 = r["a1"], r["b1"], r["c1"]
        a2, b2, c2 = r["a2"], r["b2"], r["c2"]
        lden = a1 * b2 - a2 * b1
        lx_ = F.when(lden != 0, (b1 * c2 - b2 * c1) / lden)
        ly_ = F.when(lden != 0, (a2 * c1 - a1 * c2) / lden)
        line_case = _point_txt(lx_, ly_)

        # box # box: overlap rectangle
        nhx, nhy = F.least(r["ahx"], r["bhx"]), F.least(r["ahy"], r["bhy"])
        nlx, nly = F.greatest(r["alx"], r["blx"]), F.greatest(r["aly"], r["bly"])
        box_case = F.when((nhx >= nlx) & (nhy >= nly), _box_txt(nhx, nhy, nlx, nly))

        return (
            F.when((r["shp_a"] == "[") & (r["shp_b"] == "["), seg_case)
            .when((r["shp_a"] == "{") & (r["shp_b"] == "{"), line_case)
            .when(r["ahx"].isNotNull() & r["bhx"].isNotNull(), box_case)
        )

    return G.gv_str(_bind(with_parsed, sa=_str_in(a), sb=_str_in(b)))


def _closest_pt_cases(r) -> Column:
    """closest_point dispatch body over `_bind`-bound parsed scalars:
    the point ON b nearest to a, per the reference's six close_*
    branches. Candidate minimization folds over ONE array
    (`_argmin_pt`) — the former chained-`when` loops doubled the tree
    per candidate (2^16 nodes for lseg##box) and hung construction."""
    pax, pay = r["pax"], r["pay"]
    bx1, by1, bx2, by2 = r["bx1"], r["by1"], r["bx2"], r["by2"]
    ax1, ay1, ax2, ay2 = r["ax1"], r["ay1"], r["ax2"], r["ay2"]
    bhx, bhy, blx, bly = r["bhx"], r["bhy"], r["blx"], r["bly"]
    is_pt_a = pax.isNotNull()

    # --- point ## lseg (close_ps)
    ps_x, ps_y = _closest_on_seg(pax, pay, bx1, by1, bx2, by2)

    # --- point ## line (close_pl): perpendicular foot
    la, lb, lc = r["la"], r["lb"], r["lc"]
    nden = la * la + lb * lb
    k = (la * pax + lb * pay + lc) / nden
    pl_x, pl_y = pax - la * k, pay - lb * k

    # --- point ## box (close_pb): clamp into the box
    pb_x = F.greatest(blx, F.least(bhx, pax))
    pb_y = F.greatest(bly, F.least(bhy, pay))

    # --- lseg ## lseg (close_lseg): candidates on b = the proper
    # intersection (distance 0, listed first so it wins), projections
    # of a's endpoints, and b's endpoints; first strict minimum by
    # distance to a (candidate order breaks ties the way the regress
    # expects).
    def cand(qx, qy):
        # bind the candidate point so its (possibly deep) coordinate
        # trees appear once even though the distance term reads each
        # several times
        return _bind(
            lambda c: F.struct(
                c["x"].cast("double").alias("x"),
                c["y"].cast("double").alias("y"),
                _dist_pt_seg(c["x"], c["y"], ax1, ay1, ax2, ay2)
                .cast("double")
                .alias("d"),
            ),
            x=qx,
            y=qy,
        )

    ix, iy = _seg_interpt(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
    c1 = _closest_on_seg(ax1, ay1, bx1, by1, bx2, by2)
    c2 = _closest_on_seg(ax2, ay2, bx1, by1, bx2, by2)
    ll_cands = [(ix, iy, F.when(ix.isNotNull(), F.lit(-1.0)))] + [
        cand(qx, qy)
        for qx, qy in (c1, c2, (bx1, by1), (bx2, by2))
    ]
    ll_xy = _argmin_pt(ll_cands)

    # --- line ## lseg (close_ls): distance to a line is linear along
    # the segment -> an endpoint, or the crossing point.
    nden_a = F.sqrt(la * la + lb * lb)
    db1 = F.abs(la * bx1 + lb * by1 + lc) / nden_a
    db2 = F.abs(la * bx2 + lb * by2 + lc) / nden_a
    # crossing: sign change of the line form along the segment
    s1 = la * bx1 + lb * by1 + lc
    s2 = la * bx2 + lb * by2 + lc
    tc = s1 / (s1 - s2)
    crosses = (s1 * s2 <= 0) & (s1 != s2)
    cx_ = F.when(crosses, bx1 + tc * (bx2 - bx1))
    cy_ = F.when(crosses, by1 + tc * (by2 - by1))
    ls_x = F.coalesce(cx_, F.when(db1 <= db2, bx1).otherwise(bx2))
    ls_y = F.coalesce(cy_, F.when(db1 <= db2, by1).otherwise(by2))

    # --- lseg ## box (close_sb): min over b's four edges of the
    # closest point on that edge to segment a (same candidate scheme,
    # one 16-candidate fold).
    sb_cands = []
    for ex1, ey1, ex2, ey2 in _box_edges(bhx, bhy, blx, bly):
        eix, eiy = _seg_interpt(ax1, ay1, ax2, ay2, ex1, ey1, ex2, ey2)
        e1 = _closest_on_seg(ax1, ay1, ex1, ey1, ex2, ey2)
        e2 = _closest_on_seg(ax2, ay2, ex1, ey1, ex2, ey2)
        for qx, qy in ((F.coalesce(eix, e1[0]), F.coalesce(eiy, e1[1])),
                       e2, (ex1, ey1), (ex2, ey2)):
            sb_cands.append(cand(qx, qy))
    sb_xy = _argmin_pt(sb_cands)

    shp_a, shp_b = r["shp_a"], r["shp_b"]
    is_seg_a = shp_a == "["
    is_line_a = shp_a == "{"
    is_seg_b = shp_b == "["
    is_line_b = shp_b == "{"
    is_box_b = bhx.isNotNull() & ~is_seg_b & ~is_line_b

    # select the branch coordinates as ONE struct, then render the text
    # from lambda-var fields — `_point_txt` references each coordinate
    # 4x, which would unfold the big argmin/aggregate trees 8x into the
    # logical plan if applied per branch
    def xy(x, y):
        return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))

    sel = (
        F.when(is_pt_a & is_seg_b, xy(ps_x, ps_y))
        .when(is_pt_a & is_line_b, xy(pl_x, pl_y))
        .when(is_pt_a & is_box_b, xy(pb_x, pb_y))
        .when(is_seg_a & is_seg_b, ll_xy)
        .when(is_line_a & is_seg_b, xy(ls_x, ls_y))
        .when(is_seg_a & is_box_b, sb_xy)
    )
    return _bind(lambda r2: _point_txt(r2["p"]["x"], r2["p"]["y"]), p=sel)


def geo_closest_point(a: Column, b: Column) -> Column:
    """closest_point `##` (gtype_closest_point): the point on b nearest
    to a — point##{lseg,line,box}, lseg##{lseg,box}, line##lseg."""

    def with_parsed(t):
        sa, sb = t["sa"], t["sb"]
        pax, pay = _pt_xy(sa)
        ax1, ay1, ax2, ay2 = _seg_ends(sa)
        bx1, by1, bx2, by2 = _seg_ends(sb)
        bhx, bhy, blx, bly = _box_corners(sb)
        # the two line-involving branches are disjoint: point##line
        # reads the line from b, line##lseg reads it from a — bind the
        # abc of whichever operand IS the line
        is_line_a = _shape(sa) == "{"
        aa, ab_, ac = _line_abc(sa)
        ba, bb, bc = _line_abc(sb)
        return _bind(
            lambda r: _closest_pt_cases(r),
            shp_a=_shape(sa), shp_b=_shape(sb),
            pax=pax, pay=pay,
            ax1=ax1, ay1=ay1, ax2=ax2, ay2=ay2,
            bx1=bx1, by1=by1, bx2=bx2, by2=by2,
            bhx=bhx, bhy=bhy, blx=blx, bly=bly,
            la=F.when(is_line_a, aa).otherwise(ba),
            lb=F.when(is_line_a, ab_).otherwise(bb),
            lc=F.when(is_line_a, ac).otherwise(bc),
        )

    return G.gv_str(_bind(with_parsed, sa=_str_in(a), sb=_str_in(b)))


def geo_length(a: Column) -> Column:
    """`@-@` (the reference's 1-arg gtype_distance): lseg_length, or
    path_length = sum of segment lengths (+ the closing segment for a
    closed path)."""

    def body(t):
        s = t["s"]
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
        return F.when(
            x1.isNotNull() & (F.size(pts) == 2) & (_shape(s) == "["), seg_len
        ).when(n >= 1, path_len)

    return G.gv_float(_bind(body, s=_str_in(a)))


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
    identity. Input text and the per-branch coordinates are bound; the
    text render happens once on the selected branch struct."""

    def body(t):
        s = t["s"]
        shp = _shape(s)

        cx, cy, _r = _circle_cr(s)
        x1, y1, x2, y2 = _seg_ends(s)

        pts = _pts_list(s)
        n = F.size(pts)
        sx = F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + p["x"])
        sy = F.aggregate(pts, F.lit(0.0), lambda acc, p: acc + p["y"])

        hx, hy, lx, ly = _box_corners(s)
        px, py = _pt_xy(s)

        def xy(x, y):
            return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))

        sel = (
            F.when(shp == "<", xy(cx, cy))
            .when(shp == "[", xy((x1 + x2) / 2, (y1 + y2) / 2))
            .when(
                _is_nested(s),
                F.when(n >= 1, xy(sx / n, sy / n)),
            )
            .when(
                hx.isNotNull() & hy.isNotNull() & lx.isNotNull() & ly.isNotNull(),
                xy((hx + lx) / 2, (hy + ly) / 2),
            )
            .when(px.isNotNull() & py.isNotNull(), xy(px, py))
        )
        return _bind(lambda r2: _point_txt(r2["p"]["x"], r2["p"]["y"]), p=sel)

    return G.gv_str(_bind(body, s=_str_in(a)))


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
    return G.gv_bool(
        _bind(lambda t: _contains_body(t["sa"], t["sb"]), sa=_str_in(a), sb=_str_in(b))
    )


def _contains_body(sa: Column, sb: Column) -> Column:
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
    return (
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

    def body(t):
        sa, sb = t["sa"], t["sb"]
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
        return F.when(
            (_shape(sa) == "<") & (_shape(sb) == "<"), circle_case
        ).otherwise(box_case)

    return G.gv_bool(_bind(body, sa=_str_in(a), sb=_str_in(b)))


def geo_same(a: Column, b: Column) -> Column:
    """Same-as `~=`: canonical-text equality (box corners, circle
    center+radius, polygon vertex sequence — the canonicalizing casts
    make text equality exactly PG's *_same coordinate tests)."""
    sa, sb = _str_in(a), _str_in(b)
    return G.gv_bool(F.when(sa.isNotNull() & sb.isNotNull(), sa == sb))


def geo_area(a: Column) -> Column:
    """area(): box (w*h), circle (pi r^2), polygon (shoelace)."""

    def body(t):
        s = t["s"]
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
        # zip_with pads the shorter side with null — drop the pad before
        # folding or the whole sum goes null
        poly_area = (
            F.abs(
                F.aggregate(
                    F.filter(cross, lambda v: v.isNotNull()),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            )
            / 2
        )
        return (
            F.when(_shape(s) == "<", circle_area)
            .when(_is_nested(s), poly_area)
            .when(hx.isNotNull() & (F.size(pts) == 2), box_area)
        )

    return G.gv_float(_bind(body, s=_str_in(a)))


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
