"""Entry point C — plain SQL through the engine (SURVEY §3;
regress/sql/new_cypher.sql mixes CREATE TABLE / SELECT with Cypher):
SQL statements route to Spark SQL with the current graph visible as
`vertices` / `edges` views plus one view per declared label."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH new_cypher")
    e.execute("USE GRAPH new_cypher")
    e.execute("CREATE VLABEL students")
    e.execute("CREATE (:students {name: 'Jack', gpa: 3.0})")
    e.execute("CREATE (:students {name: 'Jill', gpa: 3.5})")
    e.execute("CREATE (:other {x: 1})")
    return e


def test_select_over_graph_views(engine):
    assert engine.execute("SELECT count(*) AS n FROM vertices").first()["n"] == 3
    assert engine.execute("SELECT count(*) AS n FROM students").first()["n"] == 2
    # properties are the JSON document column, queryable with SQL tools
    rows = engine.execute(
        "SELECT get_json_object(properties, '$.name') AS name "
        "FROM students ORDER BY name"
    ).collect()
    assert [r["name"] for r in rows] == ["Jack", "Jill"]


def test_sql_sees_cypher_writes(engine):
    engine.execute("CREATE (:students {name: 'Jim', gpa: 3.75})")
    assert engine.execute("SELECT count(*) AS n FROM students").first()["n"] == 3


def test_values_and_expressions(engine):
    assert engine.execute("SELECT 1 + 1 AS a").first()["a"] == 2
    assert [r[0] for r in engine.execute("VALUES (1), (2), (3)").collect()] == [1, 2, 3]


def test_create_table_insert_select(engine):
    engine.execute("CREATE OR REPLACE TEMPORARY VIEW tst AS SELECT 'a' AS i")
    assert engine.execute("SELECT i FROM tst").first()["i"] == "a"


def test_cypher_still_routes_to_cypher(engine):
    # leading WITH stays Cypher; CREATE (...) stays Cypher
    assert engine.fetch_values("WITH 1 AS x RETURN x + 1") == [2]
    assert engine.fetch_values("RETURN 1") == [1]


def test_explain_sql(engine):
    df = engine.execute("EXPLAIN SELECT count(*) AS n FROM students")
    txt = "\n".join(r.plan for r in df.collect())
    assert "Aggregate" in txt or "HashAggregate" in txt
