"""Entity operator goldens — old/regress/vertex.sql + edge.sql: entity
equality/inequality compare by graphid; accessors id()/label()/
properties(); containment `v @> map` / `map <@ v` and key existence
`? ?| ?&` operate on the entity's PROPERTIES document
(gtype_ops.c's vertex/edge operator wiring)."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH entops")
    e.execute("USE GRAPH entops")
    e.execute("CREATE (:vt {id: 2, tag: 'a'})")
    e.execute("CREATE (:vt {})")
    e.execute("MATCH (a:vt), (b:vt) WHERE a.id = 2 AND b.id IS NULL "
              "CREATE (a)-[:et {w: 5}]->(b)")
    return e


def one(engine, q):
    return engine.fetch_values(q)[0]


def test_entity_equality_by_id(engine):
    # vertex.sql: build_vertex(gid1,...) = build_vertex(gid1,...) -> true,
    # different gids -> false (property maps are ignored: id-only compare)
    assert one(engine, "MATCH (n:vt), (m:vt) RETURN count(*) AS c "
                       "ORDER BY c LIMIT 1") == 4
    assert one(engine, "MATCH (n:vt), (m:vt) WHERE n = m RETURN count(*) AS c") == 2
    assert one(engine, "MATCH (n:vt), (m:vt) WHERE n <> m RETURN count(*) AS c") == 2


def test_entity_accessors(engine):
    # id(NULL)/label(NULL) -> null (vertex.sql)
    assert one(engine, "RETURN id(null) AS r") is None
    assert one(engine, "RETURN label(null) AS r") is None
    rows = engine.fetch(
        "MATCH (n:vt) WHERE n.id = 2 RETURN label(n) AS l, properties(n) AS p"
    )
    assert rows[0][0] == "vt"
    assert rows[0][1] == {"id": 2, "tag": "a"}


def test_entity_containment(engine):
    # v @> {} -> true for every vertex; v @> {id: 2} matches one;
    # v @> {id: 1} matches none (value mismatch)
    assert one(engine, "MATCH (n:vt) WHERE n @> {} RETURN count(*) AS c") == 2
    assert one(engine, "MATCH (n:vt) WHERE n @> {id: 2} RETURN count(*) AS c") == 1
    assert one(engine, "MATCH (n:vt) WHERE n @> {id: 1} RETURN count(*) AS c") == 0
    # map <@ v mirrors
    assert one(engine, "MATCH (n:vt) WHERE {} <@ n RETURN count(*) AS c") == 2
    assert one(engine, "MATCH (n:vt) WHERE {id: 2} <@ n RETURN count(*) AS c") == 1
    assert one(engine, "MATCH (n:vt) WHERE {id: 1} <@ n RETURN count(*) AS c") == 0


def test_entity_key_existence(engine):
    assert one(engine, "MATCH (n:vt) WHERE n ? 'id' RETURN count(*) AS c") == 1
    assert one(engine, "MATCH (n:vt) WHERE n ? 'idd' RETURN count(*) AS c") == 0
    assert one(engine, "MATCH (n:vt) WHERE n ?| ['idd', 'tag'] RETURN count(*) AS c") == 1
    assert one(engine, "MATCH (n:vt) WHERE n ?& ['id', 'tag'] RETURN count(*) AS c") == 1
    assert one(engine, "MATCH (n:vt) WHERE n ?& ['id', 'zz'] RETURN count(*) AS c") == 0


def test_edge_containment(engine):
    assert one(engine, "MATCH ()-[e:et]->() WHERE e @> {w: 5} RETURN count(*) AS c") == 1
    assert one(engine, "MATCH ()-[e:et]->() WHERE e ? 'w' RETURN count(*) AS c") == 1
    assert one(engine, "MATCH ()-[e:et]->() WHERE e @> {w: 4} RETURN count(*) AS c") == 0
