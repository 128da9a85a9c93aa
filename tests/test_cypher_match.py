"""MATCH / WITH / UNWIND / set-op semantics — ported from the
reference's regress/sql/cypher_match.sql, cypher_with.sql,
cypher_unwind.sql, cypher_setop.sql fixtures (FIXTURES.md F1/F2/F6/F7).
"""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH m")
    e.execute("USE GRAPH m")
    # F1 match_basic (cypher_match.sql:27-36)
    e.execute("CREATE (:v)")
    e.execute("CREATE (:v {i: 0})")
    e.execute("CREATE (:v {i: 1})")
    # F2 chain (cypher_match.sql:38-95)
    e.execute("CREATE (a:v1 {id: 'initial'}), (b:v1 {id: 'middle'}), (c:v1 {id: 'end'})")
    e.execute("MATCH (a) RETURN a")  # warm nothing; keep engine simple
    e.execute(
        "CREATE (x:v1b {id: 'initial'})-[:e1]->(y:v1b {id: 'middle'})-[:e1]->(z:v1b {id: 'end'})"
    )
    # F7 with_where (cypher_with.sql:27-35)
    e.execute("CREATE (:w {i: 1})")
    e.execute("CREATE (:w {i: 1, j: 2})")
    e.execute("CREATE (:w {i: 2})")
    return e


def test_label_scan(engine):
    assert len(engine.fetch("MATCH (n:v) RETURN n")) == 3


def test_property_projection(engine):
    vals = sorted(
        (v for v in engine.fetch_values("MATCH (n:v) RETURN n.i")),
        key=lambda x: (x is None, x),
    )
    assert vals == [0, 1, None]


def test_property_filter(engine):
    assert engine.fetch_values("MATCH (n:v) WHERE n.i > 0 RETURN n.i") == [1]


def test_missing_property_is_null(engine):
    assert len(engine.fetch("MATCH (n:v) WHERE n.i IS NULL RETURN n")) == 1


def test_prop_map_constraint(engine):
    rows = engine.fetch("MATCH (n:v {i: 1}) RETURN n")
    assert len(rows) == 1


def test_one_hop_directed(engine):
    rows = engine.fetch(
        "MATCH (a:v1b)-[:e1]->(b:v1b) RETURN a.id, b.id"
    )
    assert sorted(rows) == [("initial", "middle"), ("middle", "end")]


def test_one_hop_reversed(engine):
    rows = engine.fetch("MATCH (a:v1b)<-[:e1]-(b:v1b) RETURN a.id, b.id")
    assert sorted(rows) == [("end", "middle"), ("middle", "initial")]


def test_one_hop_undirected(engine):
    rows = engine.fetch("MATCH (a:v1b)-[:e1]-(b:v1b) RETURN a.id, b.id")
    assert len(rows) == 4  # each edge seen from both ends


def test_two_hop(engine):
    rows = engine.fetch("MATCH (a:v1b)-[:e1]->()-[:e1]->(c:v1b) RETURN a.id, c.id")
    assert rows == [("initial", "end")]


def test_two_hop_undirected_edge_uniqueness(engine):
    # without pairwise edge-uniqueness this would bounce back over the
    # same edge (prevent_duplicate_edges, cypher_clause.c:2962-3026)
    rows = engine.fetch("MATCH (a:v1b)-[]-()-[]-(c:v1b) RETURN a.id, c.id")
    assert sorted(rows) == [("end", "initial"), ("initial", "end")]


def test_bound_variable_rejoin(engine):
    rows = engine.fetch("MATCH (a:v1b)-[:e1]->(b:v1b)<-[:e1]-(a) RETURN a.id")
    assert rows == []  # no diamond in the chain fixture


def test_optional_match(engine):
    rows = engine.fetch(
        "MATCH (a:v1b) OPTIONAL MATCH (a)-[:e1]->(b) RETURN a.id, b.id"
    )
    assert sorted(rows, key=str) == [("end", None), ("initial", "middle"), ("middle", "end")]


def test_with_where(engine):
    rows = engine.fetch("MATCH (n:w) WITH n AS a WHERE n.i = 1 RETURN a.i")
    assert rows == [(1,), (1,)]


def test_with_projection_barrier(engine):
    vals = engine.fetch_values(
        "MATCH (n:w) WITH n.i AS i WHERE n.i = 2 RETURN i"
    )
    assert vals == [2]


def test_unwind(engine):
    assert engine.fetch_values("UNWIND [1, 2, 3] AS x RETURN x") == [1, 2, 3]


def test_unwind_expr(engine):
    vals = engine.fetch_values("UNWIND [1, 2, 3] AS x RETURN x * 2")
    assert sorted(vals) == [2, 4, 6]


def test_return_distinct(engine):
    vals = engine.fetch_values("UNWIND [1, 1, 2] AS x RETURN DISTINCT x")
    assert sorted(vals) == [1, 2]


def test_order_by_on_match(engine):
    vals = engine.fetch_values("MATCH (n:w) ORDER BY n.i DESC RETURN n.i")
    assert vals[0] == 2


def test_with_order_skip_limit(engine):
    vals = engine.fetch_values(
        "UNWIND [5, 3, 1, 4, 2] AS x WITH x AS y ORDER BY y SKIP 1 LIMIT 2 RETURN y"
    )
    assert vals == [2, 3]


def test_union(engine):
    vals = engine.fetch_values("RETURN 1 AS a UNION RETURN 1 AS a")
    assert vals == [1]


def test_union_all(engine):
    vals = engine.fetch_values("RETURN 1 AS a UNION ALL RETURN 1 AS a")
    assert vals == [1, 1]


def test_union_mixed_types(engine):
    vals = engine.fetch_values("RETURN 1 AS a UNION ALL RETURN 'x' AS a UNION ALL RETURN null AS a")
    assert sorted(vals, key=lambda v: str(v)) == [1, None, "x"]


def test_implicit_grouping(engine):
    rows = engine.fetch("MATCH (n:w) RETURN n.i AS i, count(*) AS c")
    assert sorted(rows) == [(1, 2), (2, 1)]


def test_count_aggregate_of_all(engine):
    assert engine.fetch_values("MATCH (n:w) RETURN count(*)") == [3]


def test_agg_expression_around(engine):
    vals = engine.fetch_values("MATCH (n:w) RETURN count(*) + 1")
    assert vals == [4]


def test_case_in_match(engine):
    vals = engine.fetch_values(
        "MATCH (n:w) RETURN CASE WHEN n.i = 1 THEN 'one' ELSE 'other' END AS c"
    )
    assert sorted(vals) == ["one", "one", "other"]
