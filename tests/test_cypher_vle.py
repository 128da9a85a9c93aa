"""VLE golden-count tests — the exact assertions from the reference's
regress/sql/cypher_vle.sql:26-75 on its 13-edge fixture graph
(FIXTURES.md F3). These counts (400/2/7092/1/2922) are the semantic
contract of variable-length traversal: hop bounds, direction, label and
property filters, and path-level edge-uniqueness."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH vle")
    e.execute("USE GRAPH vle")
    e.execute(
        "CREATE (b:begin)-[:edge {name: 'main edge'}]->(u1:middle)"
        "-[:edge {name: 'main edge'}]->(u2:middle)"
        "-[:edge {name: 'main edge'}]->(u3:middle)"
        "-[:edge {name: 'main edge'}]->(e:end),"
        "(u1)-[:self_loop {name: 'self loop'}]->(u1),"
        "(e)-[:self_loop {name: 'self loop'}]->(e),"
        "(b)-[:alternate_edge {name: 'alternate edge'}]->(u1),"
        "(u2)-[:alternate_edge {name: 'alternate edge'}]->(u3),"
        "(u3)-[:alternate_edge {name: 'alternate edge'}]->(e),"
        "(u2)-[:bypass_edge {name: 'bypass edge'}]->(e),"
        "(e)-[:alternate_edge {name: 'backup edge'}]->(u3),"
        "(u3)-[:alternate_edge {name: 'backup edge'}]->(u2),"
        "(u2)-[:bypass_edge {name: 'bypass edge'}]->(b)"
    )
    e.graph.cache()
    return e


def n(engine, q):
    return engine.fetch_values(q)[0]


def test_vle_forward_unbounded(engine):
    assert n(engine, "MATCH (u:begin)-[*]->(v:end) RETURN count(*)") == 400


def test_vle_forward_0_unbounded(engine):
    assert n(engine, "MATCH (u:begin)-[*0..]->(v:end) RETURN count(*)") == 400


def test_vle_forward_1_200(engine):
    assert n(engine, "MATCH (u:begin)-[*1..200]->(v:end) RETURN count(*)") == 400


def test_vle_reversed(engine):
    assert n(engine, "MATCH (u:begin)<-[*]-(v:end) RETURN count(*)") == 2


def test_vle_undirected(engine):
    assert n(engine, "MATCH (u:begin)-[*]-(v:end) RETURN count(*)") == 7092


def test_vle_label_filtered(engine):
    assert n(engine, "MATCH (u:begin)-[:edge*]-(v:end) RETURN count(*)") == 1


def test_vle_label_prop_filtered(engine):
    assert n(engine, "MATCH (u:begin)-[:edge* {name: 'main edge'}]-(v:end) RETURN count(*)") == 1


def test_vle_prop_filtered(engine):
    assert n(engine, "MATCH (u:begin)-[* {name: 'main edge'}]-(v:end) RETURN count(*)") == 1


def test_vle_exact_bounds_anon(engine):
    assert n(engine, "MATCH ()<-[*4..4 {name: 'main edge'}]-() RETURN count(*)") == 1


def test_vle_full_enumeration(engine):
    assert n(engine, "MATCH ()-[*]->() RETURN count(*)") == 2922
