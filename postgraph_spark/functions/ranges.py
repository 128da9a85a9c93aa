"""Range types (reference gtype_range.c: intrange/numrange/tsrange/
tstzrange/daterange constructors + containment/overlap operators;
storage is `struct(lower, upper, bounds_flags)` per SURVEY §1.3).

Spark design: a range is ``struct<lo, hi, lo_inc boolean, hi_inc
boolean>`` over any orderable element type. All predicates are pure
Column expressions; an empty range is lo > hi (or lo = hi with an open
bound). NULL bounds mean unbounded (Postgres range semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def make_range(lo: Column, hi: Column, lo_inc: bool = True, hi_inc: bool = False) -> Column:
    """Constructor — default bounds '[)' like Postgres int4range/numrange
    canonical form."""
    return F.struct(
        lo.alias("lo"),
        hi.alias("hi"),
        F.lit(lo_inc).alias("lo_inc"),
        F.lit(hi_inc).alias("hi_inc"),
    )


def is_empty(r: Column) -> Column:
    both_closed = r["lo_inc"] & r["hi_inc"]
    return (
        r["lo"].isNotNull()
        & r["hi"].isNotNull()
        & (
            (r["lo"] > r["hi"])
            | ((r["lo"] == r["hi"]) & ~both_closed)
        )
    )


def contains_value(r: Column, v: Column) -> Column:
    """`range @> elem` (gtype_range.c containment strategy)."""
    above_lo = r["lo"].isNull() | F.when(r["lo_inc"], v >= r["lo"]).otherwise(v > r["lo"])
    below_hi = r["hi"].isNull() | F.when(r["hi_inc"], v <= r["hi"]).otherwise(v < r["hi"])
    return ~is_empty(r) & above_lo & below_hi


def contains_range(outer: Column, inner: Column) -> Column:
    """`range @> range`: every point of inner is in outer."""
    lo_ok = outer["lo"].isNull() | (
        inner["lo"].isNotNull()
        & (
            (inner["lo"] > outer["lo"])
            | ((inner["lo"] == outer["lo"]) & (outer["lo_inc"] | ~inner["lo_inc"]))
        )
    )
    hi_ok = outer["hi"].isNull() | (
        inner["hi"].isNotNull()
        & (
            (inner["hi"] < outer["hi"])
            | ((inner["hi"] == outer["hi"]) & (outer["hi_inc"] | ~inner["hi_inc"]))
        )
    )
    return is_empty(inner) | (~is_empty(outer) & lo_ok & hi_ok)


def overlaps(a: Column, b: Column) -> Column:
    """`&&` — ranges share at least one point."""
    a_before_b = a["hi"].isNotNull() & b["lo"].isNotNull() & (
        (a["hi"] < b["lo"]) | ((a["hi"] == b["lo"]) & ~(a["hi_inc"] & b["lo_inc"]))
    )
    b_before_a = b["hi"].isNotNull() & a["lo"].isNotNull() & (
        (b["hi"] < a["lo"]) | ((b["hi"] == a["lo"]) & ~(b["hi_inc"] & a["lo_inc"]))
    )
    return ~is_empty(a) & ~is_empty(b) & ~a_before_b & ~b_before_a


def adjacent(a: Column, b: Column) -> Column:
    """`-|-` for discrete/continuous ranges: closed-open or open-closed
    bounds meeting at the same point."""
    meet_right = (
        a["hi"].isNotNull() & b["lo"].isNotNull() & (a["hi"] == b["lo"]) & (a["hi_inc"] != b["lo_inc"])
    )
    meet_left = (
        b["hi"].isNotNull() & a["lo"].isNotNull() & (b["hi"] == a["lo"]) & (b["hi_inc"] != a["lo_inc"])
    )
    return ~is_empty(a) & ~is_empty(b) & (meet_right | meet_left)
