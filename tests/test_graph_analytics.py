"""Whole-graph analytics (operators/pagerank.py)."""

import pytest
from pyspark.sql import functions as F

from postgraph_spark.operators.pagerank import pagerank, triangle_count


def test_pagerank_star(spark):
    # star: 1..4 all point at 0; 0 dangles. Hand-computable invariants:
    # the hub outranks the leaves, leaves tie, total mass == 1.
    e = spark.createDataFrame([(i, 0) for i in range(1, 5)], ["src", "dst"])
    r = {row.v: row.rank for row in pagerank(e, num_iter=15).collect()}
    assert abs(sum(r.values()) - 1.0) < 1e-6
    assert r[0] > r[1]
    assert abs(r[1] - r[4]) < 1e-9


def test_pagerank_cycle_uniform(spark):
    # a directed cycle is perfectly symmetric: uniform ranks
    e = spark.createDataFrame([(i, (i + 1) % 5) for i in range(5)], ["src", "dst"])
    ranks = [row.rank for row in pagerank(e, num_iter=10).collect()]
    assert all(abs(x - 0.2) < 1e-9 for x in ranks)


def test_triangle_count_known(spark):
    # K4 has 4 triangles, every vertex in 3; the pendant vertex 9 in none
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    e = spark.createDataFrame(k4 + [(3, 9)], ["a", "b"])
    t = {row.v: row.triangles for row in triangle_count(e).collect()}
    assert t == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_count_orientation_dedup(spark):
    # duplicate + reversed edges must not inflate the count
    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (0, 2), (2, 0), (0, 1)], ["a", "b"]
    )
    t = {row.v: row.triangles for row in triangle_count(e).collect()}
    assert t == {0: 1, 1: 1, 2: 1}


def test_label_propagation_disjoint_cliques(spark):
    from postgraph_spark.operators.pagerank import label_propagation

    # two disjoint triangles: each converges to its min vertex id
    tri1 = [(0, 1), (1, 2), (0, 2)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(tri1 + tri2, ["src", "dst"])
    got = {r.v: r.lbl for r in label_propagation(e, num_iter=4).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_label_propagation_deterministic(spark):
    from postgraph_spark.operators.pagerank import label_propagation

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5), (5, 6)], ["src", "dst"]
    )
    a = sorted(map(tuple, label_propagation(e, num_iter=3).collect()))
    b = sorted(map(tuple, label_propagation(e, num_iter=3).collect()))
    assert a == b


def test_hits_star_in_and_out(spark):
    from postgraph_spark.operators.pagerank import hits

    # in-star: every spoke points at the center -> the center is the
    # authority (spokes are the hubs); integer scores, exact values:
    # round1 a(c)=3 h(s)=3; round2 a(c)=9 h(s)=9; round3 a(c)=27 h(s)=27
    e = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], ["src", "dst"])
    got = {r.v: (r.hub, r.auth) for r in hits(e, num_iter=3).collect()}
    assert got[0] == (0, 27)
    assert got[1] == got[2] == got[3] == (27, 0)
    # out-star: roles flip (spoke auth reads the PREVIOUS round's hub,
    # so after round 3 it holds h2(center) = 9, while the center's hub
    # reads the just-updated spoke auths: 3 * 9 = 27)
    e2 = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    got2 = {r.v: (r.hub, r.auth) for r in hits(e2, num_iter=3).collect()}
    assert got2[0] == (27, 0)
    assert got2[1] == got2[2] == got2[3] == (0, 9)


def test_hits_deterministic_and_long(spark):
    from postgraph_spark.operators.pagerank import hits

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (0, 2), (3, 2)], ["src", "dst"]
    )
    a = sorted(map(tuple, hits(e, num_iter=3).collect()))
    b = sorted(map(tuple, hits(e, num_iter=3).collect()))
    assert a == b
    df = hits(e, num_iter=3)
    assert dict(df.dtypes) == {"v": "bigint", "hub": "bigint", "auth": "bigint"}


def test_kcore_peels_tails(spark):
    from postgraph_spark.operators.pagerank import kcore

    # triangle 0-1-2 with a tail 2-3-4: the 2-core is the triangle
    # alone (3 peels off after 4 does, so >1 round is exercised)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)], ["src", "dst"]
    )
    got = {r.v: r.core_degree for r in kcore(e, k=2, rounds=4).collect()}
    assert got == {0: 2, 1: 2, 2: 2}
    # k=3 empties it
    assert kcore(e, k=3, rounds=4).count() == 0


def test_kcore_fixpoint_on_dupgraph(spark):
    """the registered row uses 4 fixed rounds; assert peeling has
    actually converged there (round 5 changes nothing)."""
    from postgraph_spark.operators.dedup import lsh_candidate_pairs
    from postgraph_spark.operators.pagerank import kcore
    from postgraph_spark.sources.relational import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    pairs = lsh_candidate_pairs(docs, "doc_id", "text", n_hashes=8, bands=4, k=3)
    r4 = sorted(map(tuple, kcore(pairs, "a", "b", k=2, rounds=4).collect()))
    r5 = sorted(map(tuple, kcore(pairs, "a", "b", k=2, rounds=5).collect()))
    assert r4 == r5 and r4


def test_hits_zero_iterations_returns_init_scores(spark):
    from postgraph_spark.operators.pagerank import hits

    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    rows = {r.v: (r.hub, r.auth) for r in hits(edges, num_iter=0).collect()}
    assert rows == {1: (1, 1), 2: (1, 1), 3: (1, 1)}


def test_adamic_adar_star_and_direct_exclusion(spark):
    """Star: every leaf pair shares exactly the hub, so AA =
    1/log2(deg(hub)); direct edges are excluded from the output."""
    import math

    from postgraph_spark.operators.pagerank import adamic_adar

    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    rows = {(r.a, r.b): r for r in adamic_adar(edges).collect()}
    want = round(1.0 / math.log2(3), 6)
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}  # no (0, leaf) rows
    for r in rows.values():
        assert r.aa == want and r.common == 1
