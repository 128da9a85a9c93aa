"""Regression tests for round-2 semantic fixes: EXCEPT multiplicity,
undirected self-loop dedup, implicit grouping on a bare variable,
statement-scoped CREATE variables, percentileDisc, literal split."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH r2")
    e.execute("USE GRAPH r2")
    # self-loop fixture (cypher_vle.sql fixture has a B->B loop)
    e.execute("CREATE (a:sl {name: 'A'})-[:knows]->(a2:sl {name: 'B'})")
    e.execute("MATCH (b:sl {name: 'B'}) CREATE (b)-[:knows]->(b)")
    # EXCEPT multiplicity fixture: 'x' appears 3x left / 1x right
    for _ in range(3):
        e.execute("CREATE (:exl {v: 'x'})")
    e.execute("CREATE (:exl {v: 'y'})")
    e.execute("CREATE (:exr {v: 'x'})")
    return e


def test_except_removes_all_duplicates(engine):
    # SQL EXCEPT: 'x' (3x left, 1x right) must vanish entirely
    vals = engine.fetch_values(
        "MATCH (n:exl) RETURN n.v AS v EXCEPT MATCH (m:exr) RETURN m.v AS v"
    )
    assert vals == ["y"]


def test_undirected_self_loop_counted_once(engine):
    # B has a self-loop; undirected single-hop from B must yield the loop
    # once, not twice (plus the incoming A edge)
    rows = engine.fetch("MATCH (b:sl {name: 'B'})-[e:knows]-(x) RETURN x.name")
    names = sorted(v[0] for v in rows)
    assert names == ["A", "B"]


def test_implicit_grouping_bare_variable(engine):
    # RETURN n, count(*) — group key aliased to an existing column name
    rows = engine.fetch("MATCH (n:exl) RETURN n, count(*) AS c")
    assert len(rows) == 4
    assert all(r[1] == 1 for r in rows)


def test_unwind_grouping_bare_alias(engine):
    rows = engine.fetch("UNWIND [1, 1, 2] AS x RETURN x, count(*) AS c")
    assert sorted((r[0], r[1]) for r in rows) == [(1, 2), (2, 1)]


def test_create_var_reuse_across_statements(engine):
    # re-using a variable name in a later statement creates a NEW vertex
    engine.execute("CREATE (n:reuse {gen: 1})")
    engine.execute("CREATE (n:reuse {gen: 2})")
    gens = sorted(engine.fetch_values("MATCH (n:reuse) RETURN n.gen"))
    assert gens == [1, 2]


def test_percentile_disc(engine):
    # discrete percentile returns an actual element of the set
    v = engine.fetch_values(
        "UNWIND [10.0, 20.0, 30.0, 40.0] AS x RETURN percentileDisc(x, 0.5)"
    )
    assert v == [20.0]
    v = engine.fetch_values(
        "UNWIND [10.0, 20.0, 30.0, 40.0] AS x RETURN percentileDisc(x, 0.26)"
    )
    assert v == [20.0]
    v = engine.fetch_values("UNWIND [10.0, 20.0, 30.0] AS x RETURN percentileDisc(x, 1.0)")
    assert v == [30.0]


def test_exists_pattern_where(engine):
    # A has an outgoing knows edge, B has a self-loop -> both qualify
    names = sorted(
        engine.fetch_values("MATCH (n:sl) WHERE EXISTS((n)-[:knows]->()) RETURN n.name")
    )
    assert names == ["A", "B"]


def test_not_exists_pattern(engine):
    # only A has an INCOMING knows edge? A<-nothing; B<-A and B<-B.
    names = sorted(
        engine.fetch_values("MATCH (n:sl) WHERE NOT EXISTS((n)<-[:knows]-()) RETURN n.name")
    )
    assert names == ["A"]


def test_exists_pattern_in_return(engine):
    rows = engine.fetch(
        "MATCH (n:sl) RETURN n.name AS name, EXISTS((n)-[:knows]->(:sl {name: 'B'})) AS hits_b"
    )
    assert sorted(rows) == [("A", True), ("B", True)]


def test_exists_pattern_with_prop_map(engine):
    names = engine.fetch_values(
        "MATCH (n:exl) WHERE EXISTS((n)) AND n.v = 'y' RETURN n.v"
    )
    assert names == ["y"]


def test_split_literal_delimiter(engine):
    assert engine.fetch_values("RETURN split('a.b.c', '.')") == [["a", "b", "c"]]
    assert engine.fetch_values("RETURN split('a|b|c', '|')") == [["a", "b", "c"]]
