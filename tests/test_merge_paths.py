"""Full-path MERGE golden tests, ported from the reference's
old/regress/cypher_merge.sql (tests 3-13): whole-pattern match-or-create
over edges, unbound endpoints, correlated property maps, and partial
paths. Each test runs in its own graph (the regress file DETACH DELETEs
between tests)."""

import itertools

import pytest

from postgraph_spark.engine import CypherEngine

_n = itertools.count()


@pytest.fixture()
def engine(spark):
    e = CypherEngine(spark)
    name = f"merge_paths_{next(_n)}"
    e.execute(f"CREATE GRAPH {name}")
    e.execute(f"USE GRAPH {name}")
    return e


def _count(engine, q):
    return engine.fetch_values(q)[0]


def test_merge_correlated_prop_no_new(engine):
    """test 4: MATCH (n) MERGE ({i: n.i}) — every value already exists,
    nothing created."""
    engine.execute("CREATE (:x {i: 1}), (:x {i: 2})")
    engine.execute("MATCH (n) MERGE ({i: n.i})")
    assert _count(engine, "MATCH (m) RETURN count(*)") == 2


def test_merge_correlated_prop_creates(engine):
    """test 5: MERGE ({j: n.i}) — key j missing everywhere, one create
    per distinct n.i."""
    engine.execute("CREATE (:x {i: 1}), (:x {i: 2})")
    engine.execute("MATCH (n) MERGE ({j: n.i})")
    assert _count(engine, "MATCH (m) RETURN count(*)") == 4


def test_merge_creates_edge_bound_start(engine):
    """test 8/10: MATCH (n) MERGE (n)-[:e]->(:v) creates the edge and
    the :v endpoint."""
    engine.execute("CREATE ()")
    engine.execute("MATCH (n) MERGE (n)-[:e]->(:v)")
    rows = engine.fetch("MATCH (n)-[e:e]->(m:v) RETURN id(n), id(e), id(m)")
    assert len(rows) == 1


def test_merge_edge_exists_no_create(engine):
    """test 9: MERGE (n)-[:e]->(:v) — but the existing edge's endpoint
    is NOT labeled :v, so the pattern does not match and a fresh path is
    created (the regress validate finds exactly one :v edge)."""
    engine.execute("CREATE ()-[:e]->()")
    engine.execute("MERGE (n)-[:e]->(:v)")
    assert _count(engine, "MATCH (n)-[e:e]->(m:v) RETURN count(*)") == 1
    # original 2 + created 2 vertices
    assert _count(engine, "MATCH (m) RETURN count(*)") == 4


def test_merge_bound_start_edge_exists(engine):
    """test 11: MATCH (n) MERGE (n)-[:e]->(:v) when each n already has
    the :e edge to a :v — nothing new for matched, created for rest."""
    engine.execute("CREATE ()-[:e]->(:v)")
    engine.execute("MATCH (n) MERGE (n)-[:e]->(:v)")
    # start vertex already had the path; the :v endpoint gets its own
    # (v)-[:e]->(:v) created since it had no outgoing :e
    assert _count(engine, "MATCH ()-[e:e]->(:v) RETURN count(*)") == 2


def test_merge_partial_path_creates_whole(engine):
    """test 12: MERGE ()-[:e]->()-[:e]->() — only a 1-hop exists, so the
    whole 2-hop path is created: 3 edges total, the 2-hop pattern then
    matches exactly once."""
    engine.execute("CREATE ()-[:e]->()")
    engine.execute("MERGE ()-[:e]->()-[:e]->()")
    assert _count(engine, "MATCH ()-[e:e]->() RETURN count(*)") == 3
    assert _count(engine, "MATCH ()-[:e]->()-[:e]->() RETURN count(*)") == 1


def test_merge_different_edge_label_creates(engine):
    """test 13: MATCH (n) MERGE (n)-[:e_new]->(:v) with only :e edges
    present — creates an :e_new edge per vertex."""
    engine.execute("CREATE ()-[:e]->()")
    engine.execute("MATCH (n) MERGE (n)-[:e_new]->(:v)")
    assert _count(engine, "MATCH ()-[x:e_new]->(:v) RETURN count(*)") == 2


def test_merge_unbound_both_endpoints_match(engine):
    """MERGE over an existing full match binds instead of creating."""
    engine.execute("CREATE (:a {k: 1})-[:r]->(:b {k: 2})")
    engine.execute("MERGE (:a)-[:r]->(:b)")
    assert _count(engine, "MATCH (n) RETURN count(*)") == 2
    assert _count(engine, "MATCH ()-[r:r]->() RETURN count(*)") == 1


def test_merge_then_return(engine):
    rows = engine.fetch(
        "MERGE (a:city {name: 'lyon'})-[:in]->(c:country {name: 'fr'}) "
        "RETURN a.name AS an, c.name AS cn"
    )
    assert rows == [("lyon", "fr")]
    # idempotent on re-run
    rows = engine.fetch(
        "MERGE (a:city {name: 'lyon'})-[:in]->(c:country {name: 'fr'}) "
        "RETURN a.name AS an, c.name AS cn"
    )
    assert rows == [("lyon", "fr")]
    assert _count(engine, "MATCH (n) RETURN count(*)") == 2
