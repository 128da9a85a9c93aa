"""CREATE-after-MATCH / SET / REMOVE / DELETE / MERGE semantics — ported
from the reference's regress/sql/cypher_set.sql, cypher_remove.sql,
cypher_delete.sql, cypher_merge.sql assertions.
"""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture()
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH w")
    e.execute("USE GRAPH w")
    return e


def props_of(engine, query):
    return [r[0]["properties"] for r in engine.fetch(query)]


# ------------------------------------------------------------------ SET


def test_set_simple(engine):
    # cypher_set.sql:26-35
    engine.execute("CREATE (:v)")
    engine.execute("CREATE (:v {i: 0, j: 5, a: 0})")
    engine.execute("CREATE (:v {i: 1})")
    engine.execute("MATCH (n) SET n.i = 3 RETURN n").collect()
    vals = engine.fetch_values("MATCH (n) RETURN n.i")
    assert vals == [3, 3, 3]


def test_set_null_removes(engine):
    # cypher_set.sql:32-37: SET n.i = NULL removes the property
    engine.execute("CREATE (:v {i: 0, j: 5})")
    engine.execute("MATCH (n) WHERE n.j = 5 SET n.i = NULL RETURN n").collect()
    assert props_of(engine, "MATCH (n) RETURN n") == [{"j": 5}]


def test_set_visible_in_return(engine):
    engine.execute("CREATE (:v {i: 1})")
    out = engine.fetch("MATCH (n) SET n.i = 50 RETURN n")
    assert out[0][0]["properties"] == {"i": 50}


def test_set_multiple_clauses(engine):
    # cypher_set.sql:56: MATCH (n {j: 5}) SET n.y = 50 SET n.z = 99
    engine.execute("CREATE (:v {j: 5})")
    engine.execute("MATCH (n) WHERE n.j = 5 SET n.y = 50 SET n.z = 99 RETURN n").collect()
    assert props_of(engine, "MATCH (n) RETURN n") == [{"j": 5, "y": 50, "z": 99}]


def test_set_expression_self_reference(engine):
    engine.execute("CREATE (:v {i: 10})")
    engine.execute("MATCH (n) SET n.i = n.i + 1 RETURN n").collect()
    assert engine.fetch_values("MATCH (n) RETURN n.i") == [11]


def test_set_plus_equals_merge(engine):
    engine.execute("CREATE (:v {i: 1, j: 2})")
    engine.execute("MATCH (n) SET n += {j: 9, k: 7} RETURN n").collect()
    assert props_of(engine, "MATCH (n) RETURN n") == [{"i": 1, "j": 9, "k": 7}]


def test_set_edge_property(engine):
    # cypher_set.sql:51-53 (edge updates)
    engine.execute("CREATE (:a)-[:e {j: 20}]->(:b)")
    engine.execute("MATCH ()-[r]->() SET r.i = 3 RETURN r").collect()
    rows = engine.fetch("MATCH ()-[r]->() RETURN r")
    assert rows[0][0]["properties"] == {"j": 20, "i": 3}


def test_remove(engine):
    # cypher_remove.sql: REMOVE n.i deletes the key
    engine.execute("CREATE (:v {i: 0, j: 5})")
    engine.execute("MATCH (n) REMOVE n.i RETURN n").collect()
    assert props_of(engine, "MATCH (n) RETURN n") == [{"j": 5}]


# ------------------------------------------------------- CREATE after MATCH


def test_create_per_matched_row(engine):
    # cypher_set.sql:47: MATCH (n) CREATE (n)-[:e {j:20}]->(:other_v {k:10})
    engine.execute("CREATE (:v {i: 1})")
    engine.execute("CREATE (:v {i: 2})")
    engine.execute("MATCH (n:v) CREATE (n)-[:e {j: 20}]->(:other_v {k: 10}) RETURN n").collect()
    assert len(engine.fetch("MATCH (:v)-[e:e]->(m:other_v) RETURN e")) == 2
    assert engine.fetch_values("MATCH (m:other_v) RETURN m.k") == [10, 10]


def test_create_props_from_matched_row(engine):
    engine.execute("CREATE (:src {i: 7})")
    engine.execute("MATCH (n:src) CREATE (:copy {i: n.i * 2})")
    assert engine.fetch_values("MATCH (m:copy) RETURN m.i") == [14]


def test_create_self_loop(engine):
    # cypher_set.sql:61: CREATE p=(n)-[e:e {j:34}]->(n)
    engine.execute("CREATE (:v {j: 5})")
    engine.execute("MATCH (n:v) CREATE (n)-[:e {j: 34}]->(n)")
    rows = engine.fetch("MATCH (a)-[e]->(b) RETURN e")
    assert len(rows) == 1
    assert rows[0][0]["start_id"] == rows[0][0]["end_id"]


def test_create_then_set_same_statement(engine):
    # cypher_set.sql:64: CREATE ()-[e:e {j:34}]->() SET e.y = 99 RETURN e
    out = engine.fetch("CREATE (:x)-[e:e {j: 34}]->(:x) SET e.y = 99 RETURN e")
    assert out[0][0]["properties"] == {"j": 34, "y": 99}
    stored = engine.fetch("MATCH ()-[r:e]->() RETURN r")
    assert stored[0][0]["properties"] == {"j": 34, "y": 99}


# ------------------------------------------------------------------ DELETE


def test_delete_vertices(engine):
    # cypher_delete.sql:28-34
    engine.execute("CREATE (:v)")
    engine.execute("CREATE (:v {i: 0, j: 5, a: 0})")
    engine.execute("CREATE (:v {i: 1})")
    out = engine.fetch("MATCH (n) DELETE n RETURN n")
    assert len(out) == 3  # RETURN still shows the deleted entities
    assert engine.fetch("MATCH (n) RETURN n") == []


def test_delete_vertex_with_edge_fails(engine):
    # cypher_delete.sql:38-40: deleting a still-connected vertex errors
    engine.execute("CREATE (:v)-[:e]->(:v)")
    with pytest.raises(Exception):
        engine.execute("MATCH (n1)-[e]->(n2) DELETE n1 RETURN n1")


def test_delete_edge(engine):
    engine.execute("CREATE (:v)-[:e]->(:v)")
    engine.execute("MATCH ()-[e]->() DELETE e RETURN e").collect()
    assert engine.fetch("MATCH ()-[e]->() RETURN e") == []
    assert len(engine.fetch("MATCH (n) RETURN n")) == 2


def test_detach_delete(engine):
    # cypher_delete.sql:47-49
    engine.execute("CREATE (:v)-[:e]->(:v)")
    engine.execute("MATCH (n1)-[e]->(n2) DETACH DELETE n1 RETURN e").collect()
    assert engine.fetch("MATCH ()-[e]->() RETURN e") == []
    assert len(engine.fetch("MATCH (n) RETURN n")) == 1


def test_detach_delete_both(engine):
    engine.execute("CREATE (:v)-[:e]->(:v)")
    engine.execute("MATCH (n1)-[e]->(n2) DETACH DELETE n1, n2 RETURN e").collect()
    assert engine.fetch("MATCH (n) RETURN n") == []


# ------------------------------------------------------------------- MERGE


def test_merge_creates_when_missing(engine):
    # cypher_merge.sql test 1
    engine.execute("MERGE (n {i: 'Hello Merge'})")
    rows = engine.fetch("MATCH (n) RETURN n")
    assert len(rows) == 1
    assert rows[0][0]["properties"] == {"i": "Hello Merge"}


def test_merge_matches_when_present(engine):
    # cypher_merge.sql test 2
    engine.execute("CREATE ({i: 'Hello Merge'})")
    engine.execute("MERGE ({i: 'Hello Merge'})")
    assert len(engine.fetch("MATCH (n) RETURN n")) == 1


def test_merge_no_input_rows_creates_nothing(engine):
    # cypher_merge.sql test 3: MATCH yields no rows -> MERGE creates nothing
    engine.execute("MATCH (n) MERGE ({i: n.i})")
    assert engine.fetch("MATCH (n) RETURN n") == []


def test_merge_correlated_match(engine):
    # cypher_merge.sql test 4: path exists per input row -> nothing created
    engine.execute("CREATE ({i: 'Hello Merge'})")
    engine.execute("MATCH (n) MERGE ({i: n.i})")
    assert len(engine.fetch("MATCH (n) RETURN n")) == 1


def test_merge_correlated_create(engine):
    # cypher_merge.sql test 5: different property name -> one create
    engine.execute("CREATE ({i: 'Hello Merge'})")
    engine.execute("MATCH (n) WHERE n.i IS NOT NULL MERGE ({j: n.i})")
    rows = [r[0]["properties"] for r in engine.fetch("MATCH (n) RETURN n")]
    assert sorted(rows, key=str) == [{"i": "Hello Merge"}, {"j": "Hello Merge"}]


def test_merge_dedups_within_statement(engine):
    # two input rows with the same missing key create ONE vertex
    # (created entities visible to later rows, cypher_merge.c:199-246)
    engine.execute("CREATE (:s {k: 1})")
    engine.execute("CREATE (:s {k: 1})")
    engine.execute("MATCH (n:s) MERGE (:t {k: n.k})")
    assert len(engine.fetch("MATCH (m:t) RETURN m")) == 1


def test_merge_edge_between_bound(engine):
    engine.execute("CREATE (:a {id: 1})")
    engine.execute("CREATE (:b {id: 2})")
    engine.execute("MATCH (x:a), (y:b) MERGE (x)-[:knows]->(y)")
    assert len(engine.fetch("MATCH (:a)-[e:knows]->(:b) RETURN e")) == 1
    # second MERGE matches, creates nothing
    engine.execute("MATCH (x:a), (y:b) MERGE (x)-[:knows]->(y)")
    assert len(engine.fetch("MATCH (:a)-[e:knows]->(:b) RETURN e")) == 1


def test_merge_returns_binding(engine):
    out = engine.fetch("MERGE (n {i: 42}) RETURN n")
    assert out[0][0]["properties"] == {"i": 42}
    out2 = engine.fetch("MERGE (n {i: 42}) RETURN n")
    assert out2[0][0]["id"] == out[0][0]["id"]
