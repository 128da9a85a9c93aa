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
    with pytest.raises(Exception, match="EXCLUDE"):
        engine.execute(
            "MATCH (n:r) RETURN min(n.v) OVER (PARTITION BY n.g ORDER BY n.k "
            "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS s"
        ).collect()
