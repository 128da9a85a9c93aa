"""GROUPS window frames (cypher_gram.y:17484-17520) — rewritten to a
dense_rank + RANGE frame — checked against a direct SQL:2011 GROUPS
implementation in python (DuckDB's parser rejects GROUPS mode, so the
oracle here is the spec itself: the frame is a span of PEER GROUPS
around the current row's group)."""

import re

import pytest

from postgraph_spark.engine import CypherEngine

ROWS = [
    ("a", 1, 10), ("a", 1, 20), ("a", 2, 30), ("a", 3, 40), ("a", 3, 50),
    ("a", 5, 60), ("b", 1, 1), ("b", 2, 2), ("b", 2, 3), ("b", 4, 4),
]


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH gf")
    e.execute("USE GRAPH gf")
    for g, k, v in ROWS:
        e.execute(f"CREATE (:r {{g: '{g}', k: {k}, v: {v}}})")
    return e


def _parse_bound(tok: str, default_end=False):
    tok = tok.strip().upper()
    if tok.startswith("UNBOUNDED"):
        return None  # unbounded in its direction
    if tok.startswith("CURRENT"):
        return 0
    m = re.match(r"(\d+)\s+(PRECEDING|FOLLOWING)", tok)
    n = int(m.group(1))
    return -n if m.group(2) == "PRECEDING" else n


def oracle(frame):
    """Direct SQL:2011 GROUPS evaluation: per partition, order rows by
    k; peer groups = runs of equal k; the frame spans group indices
    [gi+lo, gi+hi] of the current row's group gi."""
    body = frame[len("GROUPS"):].strip()
    if body.upper().startswith("BETWEEN"):
        lo_s, hi_s = re.split(r"\s+AND\s+", body[len("BETWEEN"):].strip(), flags=re.I)
    else:
        lo_s, hi_s = body, "CURRENT ROW"
    lo, hi = _parse_bound(lo_s), _parse_bound(hi_s)

    out = []
    for g in sorted({r[0] for r in ROWS}):
        part = sorted([r for r in ROWS if r[0] == g], key=lambda r: r[1])
        ks = sorted({r[1] for r in part})
        gidx = {k: i for i, k in enumerate(ks)}
        for r in part:
            gi = gidx[r[1]]
            glo = 0 if lo is None else gi + lo
            ghi = len(ks) - 1 if hi is None else gi + hi
            vals = [x[2] for x in part if glo <= gidx[x[1]] <= ghi]
            out.append((r[0], r[1], r[2], sum(vals) if vals else None))
    return sorted(out)


def run(engine, frame):
    q = (
        "MATCH (n:r) "
        "RETURN n.g AS g, n.k AS k, n.v AS v, "
        f"sum(n.v) OVER (PARTITION BY n.g ORDER BY n.k {frame}) AS s "
        "ORDER BY g, k, v"
    )
    return [tuple(r) for r in engine.fetch(q)]


@pytest.mark.parametrize(
    "frame",
    [
        "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        "GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "GROUPS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        "GROUPS 2 PRECEDING",
        "GROUPS BETWEEN 1 FOLLOWING AND 2 FOLLOWING",
    ],
)
def test_groups_frame_matches_duckdb(engine, frame):
    assert run(engine, frame) == oracle(frame)


def test_groups_current_row_is_peer_group(engine):
    # GROUPS CURRENT ROW = the whole peer group, unlike ROWS CURRENT ROW
    got = run(engine, "GROUPS BETWEEN CURRENT ROW AND CURRENT ROW")
    assert got == oracle("GROUPS BETWEEN CURRENT ROW AND CURRENT ROW")
    a1 = [r for r in got if r[0] == "a" and r[1] == 1]
    assert all(r[3] == 30 for r in a1)  # both k=1 rows sum the peer group


def test_groups_requires_order_by(engine):
    from postgraph_spark.plans.compiler import CompileError

    with pytest.raises(Exception):
        engine.execute(
            "MATCH (n:r) RETURN sum(n.v) OVER "
            "(PARTITION BY n.g GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s"
        ).collect()


# ---------------------------------------------------- EXCLUDE clause


def duck_exclude(agg, frame):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE r (g text, k int, v int)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", ROWS)
    q = (
        f"SELECT g, k, v, {agg} OVER (PARTITION BY g ORDER BY k "
        f"{frame}) AS s FROM r ORDER BY g, k, v"
    )
    return [tuple(r) for r in con.execute(q).fetchall()]


def run_exclude(engine, agg, frame):
    q = (
        "MATCH (n:r) "
        "RETURN n.g AS g, n.k AS k, n.v AS v, "
        f"{agg.replace('(v)', '(n.v)')} OVER (PARTITION BY n.g ORDER BY n.k {frame}) AS s "
        "ORDER BY g, k, v"
    )
    return [tuple(r) for r in engine.fetch(q)]


@pytest.mark.parametrize("excl", ["EXCLUDE CURRENT ROW", "EXCLUDE GROUP", "EXCLUDE TIES", "EXCLUDE NO OTHERS"])
@pytest.mark.parametrize("agg", ["sum(v)", "count(v)", "avg(v)"])
def test_exclude_matches_duckdb(engine, agg, excl):
    frame = f"ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING {excl}"
    got = run_exclude(engine, agg, frame)
    want = duck_exclude(agg, frame)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        if g[3] is None or w[3] is None:
            assert g[3] == w[3], (agg, excl, g, w)
        else:
            assert abs(g[3] - w[3]) < 1e-9, (agg, excl, g, w)


def test_exclude_over_range_frame(engine):
    frame = "RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP"
    assert run_exclude(engine, "sum(v)", frame) == duck_exclude("sum(v)", frame)


def test_exclude_unsupported_agg(engine):
    # ranking/navigation functions still reject EXCLUDE
    with pytest.raises(Exception, match="EXCLUDE"):
        engine.execute(
            "MATCH (n:r) RETURN first_value(n.v) OVER (PARTITION BY n.g ORDER BY n.k "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS s"
        ).collect()


# min/max/stdev/stdevp take the collect-list EXCLUDE path
_HARD_AGGS = [
    ("min(n.v)", "min(v)"),
    ("max(n.v)", "max(v)"),
    ("stdev(n.v)", "stddev_samp(v)"),
    ("stdevp(n.v)", "stddev_pop(v)"),
]


@pytest.mark.parametrize("excl", ["EXCLUDE CURRENT ROW", "EXCLUDE GROUP", "EXCLUDE TIES"])
@pytest.mark.parametrize("cy,du", _HARD_AGGS)
def test_exclude_hard_aggs(engine, cy, du, excl):
    frame = f"ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING {excl}"
    q = (
        "MATCH (n:r) "
        "RETURN n.g AS g, n.k AS k, n.v AS v, "
        f"{cy} OVER (PARTITION BY n.g ORDER BY n.k {frame}) AS s "
        "ORDER BY g, k, v"
    )
    got = [tuple(r) for r in engine.fetch(q)]
    want = duck_exclude(du, frame)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        if g[3] is None or w[3] is None:
            assert g[3] == w[3], (cy, excl, g, w)
        else:
            assert abs(g[3] - w[3]) < 1e-9, (cy, excl, g, w)


# SQL:2011 removes only rows INSIDE the frame: frames that do not
# contain the current row (and ROWS frames whose peer groups straddle
# the frame edge — the ADVICE duplicate-order-key case) must not
# over-correct. The oracle here is a direct SQL:2011 evaluation in
# python, NOT DuckDB: DuckDB's EXCLUDE implementation EXPANDS such
# frames toward the current row before excluding (measured: count(*)
# over `4 PRECEDING AND 2 PRECEDING EXCLUDE CURRENT ROW` is LARGER
# than without the exclusion), which contradicts PG/SQL:2011 — the
# reference reuses PG's windowagg, so PG semantics win.
def py_exclude(agg, frame_text):
    m = re.match(
        r"(ROWS|RANGE)\s+BETWEEN\s+(.+?)\s+AND\s+(.+?)(?:\s+EXCLUDE\s+(.+))?$",
        frame_text.strip(), flags=re.I,
    )
    kind, lo_s, hi_s, excl = m.group(1).upper(), m.group(2), m.group(3), m.group(4)
    lo, hi = _parse_bound(lo_s), _parse_bound(hi_s)
    excl = (excl or "NO OTHERS").upper()
    out = []
    for g in sorted({r[0] for r in ROWS}):
        part = [r for r in ROWS if r[0] == g]
        part.sort(key=lambda r: r[1])  # python sort is stable: ties keep insertion order
        for i, r in enumerate(part):
            if kind == "ROWS":
                in_frame = [
                    j for j in range(len(part))
                    if (lo is None or j >= i + lo) and (hi is None or j <= i + hi)
                ]
            else:  # RANGE: value offsets over k
                in_frame = [
                    j for j, x in enumerate(part)
                    if (lo is None or x[1] >= r[1] + lo) and (hi is None or x[1] <= r[1] + hi)
                ]
            if excl == "CURRENT ROW":
                drop = {i}
            elif excl == "GROUP":
                drop = {j for j in range(len(part)) if part[j][1] == r[1]}
            elif excl == "TIES":
                drop = {j for j in range(len(part)) if part[j][1] == r[1]} - {i}
            else:
                drop = set()
            vals = [part[j][2] for j in in_frame if j not in drop]
            if agg == "count(*)" or agg == "count(v)":
                s = len(vals)
            elif agg == "sum(v)":
                s = sum(vals) if vals else None
            elif agg == "avg(v)":
                s = sum(vals) / len(vals) if vals else None
            elif agg == "min(v)":
                s = min(vals) if vals else None
            else:
                raise ValueError(agg)
            out.append((r[0], r[1], r[2], s))
    return sorted(out, key=lambda t: (t[0], t[1], t[2]))


@pytest.mark.parametrize(
    "frame",
    [
        "ROWS BETWEEN 4 PRECEDING AND 2 PRECEDING EXCLUDE CURRENT ROW",
        "ROWS BETWEEN 4 PRECEDING AND 2 PRECEDING EXCLUDE GROUP",
        "ROWS BETWEEN 4 PRECEDING AND 2 PRECEDING EXCLUDE TIES",
        "ROWS BETWEEN 2 FOLLOWING AND 4 FOLLOWING EXCLUDE GROUP",
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW EXCLUDE GROUP",
        "ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING EXCLUDE TIES",
        "RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING EXCLUDE GROUP",
        "RANGE BETWEEN 2 PRECEDING AND 1 PRECEDING EXCLUDE CURRENT ROW",
    ],
)
@pytest.mark.parametrize("agg", ["sum(v)", "count(v)", "avg(v)", "min(v)", "count(*)"])
def test_exclude_frame_intersection(engine, agg, frame):
    got = run_exclude(engine, agg, frame)
    want = py_exclude(agg, frame)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        if g[3] is None or w[3] is None:
            assert g[3] == w[3], (agg, frame, g, w)
        else:
            assert abs(g[3] - w[3]) < 1e-9, (agg, frame, g, w)


def _groups_exclude_oracle(frame, excl):
    """SQL:2011 GROUPS + EXCLUDE by direct evaluation (DuckDB has no
    GROUPS mode): frame = span of peer groups; exclusion removes
    in-frame rows only."""
    body = frame[len("GROUPS"):].strip()
    lo_s, hi_s = re.split(r"\s+AND\s+", body[len("BETWEEN"):].strip(), flags=re.I)
    lo, hi = _parse_bound(lo_s), _parse_bound(hi_s)
    out = []
    for g in sorted({r[0] for r in ROWS}):
        part = sorted([r for r in ROWS if r[0] == g], key=lambda r: r[1])
        ks = sorted({r[1] for r in part})
        gidx = {k: i for i, k in enumerate(ks)}
        for i, r in enumerate(part):
            gi = gidx[r[1]]
            glo = 0 if lo is None else gi + lo
            ghi = len(ks) - 1 if hi is None else gi + hi
            in_frame = [j for j, x in enumerate(part) if glo <= gidx[x[1]] <= ghi]
            if excl == "CURRENT ROW":
                drop = {i}
            elif excl == "GROUP":
                drop = {j for j in range(len(part)) if part[j][1] == r[1]}
            else:  # TIES
                drop = {j for j in range(len(part)) if part[j][1] == r[1]} - {i}
            vals = [part[j][2] for j in in_frame if j not in drop]
            out.append((r[0], r[1], r[2], sum(vals) if vals else None))
    return sorted(out)


@pytest.mark.parametrize("excl", ["CURRENT ROW", "GROUP", "TIES"])
@pytest.mark.parametrize(
    "frame",
    ["GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
     "GROUPS BETWEEN 2 PRECEDING AND 1 PRECEDING"],
)
def test_groups_frame_exclude(engine, frame, excl):
    got = run(engine, f"{frame} EXCLUDE {excl}")
    assert got == _groups_exclude_oracle(frame, excl)


# ---------------------------------------------- two-column + collect
# corr/covar_*/regr_* and collect are ordinary aggregates in the
# reference (sql/postgraph-aggregation.sql.in:353-533) and therefore
# window + EXCLUDE capable via PG's windowagg. Oracle: DuckDB on the
# same rows (frames here always contain the current row, where DuckDB
# agrees with PG).

_TWO_COL = [
    ("corr(n.v, n.k)", "corr(v, k)"),
    ("covar_pop(n.v, n.k)", "covar_pop(v, k)"),
    ("covar_samp(n.v, n.k)", "covar_samp(v, k)"),
    ("regr_slope(n.v, n.k)", "regr_slope(v, k)"),
    ("regr_intercept(n.v, n.k)", "regr_intercept(v, k)"),
    ("regr_r2(n.v, n.k)", "regr_r2(v, k)"),
    ("regr_avgx(n.v, n.k)", "regr_avgx(v, k)"),
    ("regr_avgy(n.v, n.k)", "regr_avgy(v, k)"),
    ("regr_count(n.v, n.k)", "regr_count(v, k)"),
    ("regr_sxx(n.v, n.k)", "regr_sxx(v, k)"),
    ("regr_syy(n.v, n.k)", "regr_syy(v, k)"),
    ("regr_sxy(n.v, n.k)", "regr_sxy(v, k)"),
]


def _num_eq(a, b):
    import math

    def norm(x):
        # PG's float kernels return NULL where DuckDB can emit NaN
        # (zero-variance frames) — treat them as the same "no value"
        if isinstance(x, float) and math.isnan(x):
            return None
        return x

    a, b = norm(a), norm(b)
    if a is None or b is None:
        return a is None and b is None
    return abs(a - b) < 1e-9


@pytest.mark.parametrize(
    "excl", ["", "EXCLUDE CURRENT ROW", "EXCLUDE GROUP", "EXCLUDE TIES"]
)
@pytest.mark.parametrize("cy,du", _TWO_COL)
def test_two_col_window_aggs(engine, cy, du, excl):
    frame = f"ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING {excl}".strip()
    q = (
        "MATCH (n:r) "
        "RETURN n.g AS g, n.k AS k, n.v AS v, "
        f"{cy} OVER (PARTITION BY n.g ORDER BY n.k {frame}) AS s "
        "ORDER BY g, k, v"
    )
    got = [tuple(r) for r in engine.fetch(q)]
    want = duck_exclude(du, frame)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert _num_eq(g[3], w[3]), (cy, excl, g, w)


@pytest.mark.parametrize(
    "excl", ["", "EXCLUDE CURRENT ROW", "EXCLUDE GROUP", "EXCLUDE TIES"]
)
def test_collect_window(engine, excl):
    frame = f"ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING {excl}".strip()
    q = (
        "MATCH (n:r) "
        "RETURN n.g AS g, n.k AS k, n.v AS v, "
        f"collect(n.v) OVER (PARTITION BY n.g ORDER BY n.k {frame}) AS s "
        "ORDER BY g, k, v"
    )
    got = [tuple(r) for r in engine.fetch(q)]
    want = duck_exclude("list(v)", frame)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        # window-tie order can differ between engines: compare as bags
        assert sorted(g[3] or []) == sorted(w[3] or []), (excl, g, w)


def test_two_col_exclude_over_groups_frame(engine):
    # the GROUPS rewrite composes with the two-column EXCLUDE path
    q = (
        "MATCH (n:r) "
        "RETURN n.g AS g, n.k AS k, n.v AS v, "
        "regr_count(n.v, n.k) OVER (PARTITION BY n.g ORDER BY n.k "
        "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS s "
        "ORDER BY g, k, v"
    )
    got = [tuple(r) for r in engine.fetch(q)]
    # direct SQL:2011 evaluation: peer-group span minus the current group
    want = []
    for g in sorted({r[0] for r in ROWS}):
        part = sorted([r for r in ROWS if r[0] == g], key=lambda r: r[1])
        ks = sorted({r[1] for r in part})
        gidx = {k: i for i, k in enumerate(ks)}
        for r in part:
            gi = gidx[r[1]]
            n = sum(
                1 for x in part
                if gi - 1 <= gidx[x[1]] <= gi + 1 and x[1] != r[1]
            )
            want.append((r[0], r[1], r[2], n))
    assert got == sorted(want)
