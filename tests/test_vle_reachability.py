"""VLE reachability mode (round-6): EXISTS-style traversals run as BFS
with a visited set — state bounded by pair count, never path count, and
unbounded `*` terminates at the graph diameter. Path-mode semantics
(dfs.c enumeration) are untouched; golden counts live in
test_cypher_vle.py."""

import pytest

from postgraph_spark.engine import CypherEngine
from postgraph_spark.graph import Graph, GraphCatalog
from postgraph_spark.operators.vle import vle


N = 8  # clique size — path enumeration on K8 is astronomically large


@pytest.fixture()
def clique(spark):
    """Directed clique: every ordered pair (i, j), i != j, has an edge.
    Trail enumeration here is exponential; reachability must not be."""
    vrows = [("v", {"i": i}) for i in range(N)]
    erows = [
        ("e", i, j, {}) for i in range(N) for j in range(N) if i != j
    ]
    return Graph.from_rows(spark, "clique", vrows, erows)


def test_reachability_unbounded_terminates(clique):
    # unbounded `*`: BFS visits every pair once and stops at the
    # diameter (2 hops incl. cycles back to the start) — no hop cap hit
    pairs = vle(clique, lo=1, hi=None, reachability=True)
    rows = pairs.select("start_id", "end_id").collect()
    # every ordered pair incl. (s, s) via a 2-cycle: N*N pairs
    assert len(rows) == N * N
    assert len(set((r[0], r[1]) for r in rows)) == N * N
    # min-hop emission: direct neighbors at hop 1, self-cycles at hop 2
    hops = {(r["start_id"], r["end_id"]): r["hops"] for r in pairs.collect()}
    assert all(h == (2 if s == e else 1) for (s, e), h in hops.items())


def test_reachability_zero_lo_includes_self(clique):
    pairs = vle(clique, lo=0, hi=1, reachability=True)
    assert pairs.count() == N + N * (N - 1)  # self at hop 0 + neighbors


def test_reachability_respects_hi(spark):
    # chain a->b->c->d: reachability within 2 hops misses the 3-hop pair
    g = Graph.from_rows(
        spark,
        "chain",
        [("v", {"i": i}) for i in range(4)],
        [("e", i, i + 1, {}) for i in range(3)],
    )
    pairs = vle(g, lo=1, hi=2, reachability=True)
    got = {(r[0], r[1]) for r in pairs.select("start_id", "end_id").collect()}
    ids = [r["id"] for r in g.vertices.orderBy("id").collect()]
    assert (ids[0], ids[2]) in got
    assert (ids[0], ids[3]) not in got


def test_exists_vle_uses_reachability_on_dense_graph(spark, clique):
    """EXISTS((a)-[*]->(b)) on the clique: path mode would enumerate an
    astronomical trail count; the reachability rewrite answers it."""
    cat = GraphCatalog(spark)
    cat.register(clique)
    eng = CypherEngine(spark, cat)
    n = eng.fetch_values(
        "MATCH (a:v) WHERE EXISTS((a)-[*]->(:v)) RETURN count(*)"
    )
    assert n == [N]


def test_reachability_matches_path_mode_on_sparse(spark):
    """On a small sparse graph the DISTINCT pairs of path mode and the
    reachability pairs agree (lo=1, bounded)."""
    g = Graph.from_rows(
        spark,
        "sparse",
        [("v", {"i": i}) for i in range(5)],
        [("e", 0, 1, {}), ("e", 1, 2, {}), ("e", 2, 3, {}), ("e", 1, 3, {}), ("e", 3, 0, {})],
    )
    p_mode = vle(g, lo=1, hi=4)
    r_mode = vle(g, lo=1, hi=4, reachability=True)
    p_pairs = {(r[0], r[1]) for r in p_mode.select("start_id", "end_id").collect()}
    r_pairs = {(r[0], r[1]) for r in r_mode.select("start_id", "end_id").collect()}
    assert r_pairs == p_pairs
