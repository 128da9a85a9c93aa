"""Variable-edge value surface: two-VLE patterns, the `!!=` match_vles
operator, edge/VLE containment, accessors (nodes/relationships/edges)
and `@-@` length — mirrored from regress/expected/cypher_vle.out:278-325
and old/regress/variable_edge_functions.{sql,out} on the F3 fixture.
"""

import json

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH ve")
    e.execute("USE GRAPH ve")
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


# -------------------------------------- two-VLE / mixed compositions
# golden counts from regress/expected/cypher_vle.out:278-325


@pytest.mark.parametrize(
    "q,want",
    [
        ("MATCH ()-[e1]->(v)-[e2]->() RETURN count(*)", 31),
        ("MATCH ()-[e1*1..1]->(v)-[e2*1..1]->() RETURN count(*)", 31),
        ("MATCH (v)-[e1*1..1]->()-[e2*1..1]->() RETURN count(*)", 31),
        ("MATCH ()-[e1]->(v)-[e2*1..1]->() RETURN count(*)", 31),
        ("MATCH ()-[e1]->()-[e2*1..1]->() RETURN count(*)", 31),
        ("MATCH ()-[e1*1..1]->(v)-[e2]->() RETURN count(*)", 31),
        ("MATCH ()-[e1*1..1]->()-[e2]->() RETURN count(*)", 31),
        ("MATCH (a)-[e1]->(a)-[e2*1..1]->() RETURN count(*)", 2),
    ],
)
def test_vle_composition_goldens(engine, q, want):
    assert n(engine, q) == want


def test_two_vle_multi_hop(engine):
    # both segments truly variable-length, joined at the shared vertex
    got = n(engine, "MATCH (a:begin)-[e1*1..2]->(b)-[e2*1..2]->(c) RETURN count(*)")
    # enumerate independently: 1-2 hop paths from begin, then 1-2 hop
    # continuations — equals sum over b of paths(begin->b,1-2)*paths(b->c,1-2)
    assert got == 50


# ---------------------------------------------------- `!!=` match_vles


def test_match_vles_operator(engine):
    # lhs first-edge endpoints vs rhs LAST-edge endpoints
    # (variable_edge.c:269-289). e1 from begin (first edge touches
    # begin/u1); e2 ending at end (last edge touches end) -> they match
    # exactly when the rhs last edge touches u1 or begin... pin against
    # an equivalent structural count.
    got = n(
        engine,
        "MATCH (:begin)-[e1*1..1]->(), (:middle)-[e2*1..1]->(:end) "
        "WHERE e1 !!= e2 RETURN count(*)",
    )
    # e1: begin->u1 via :edge or :alternate_edge (2 bindings, first edge
    # endpoints {begin,u1}); e2 one-hop middle->end: u3->e (:edge),
    # u3->e (:alternate_edge), u2->e (:bypass_edge) — last-edge
    # endpoints {u3,e} or {u2,e}; u1/begin never among them -> 0 matches
    assert got == 0
    got2 = n(
        engine,
        "MATCH (:begin)-[e1*1..1]->(), ()-[e2*1..1]->(:middle) "
        "WHERE e1 !!= e2 RETURN count(*)",
    )
    # e2 one-hop ending at a middle vertex whose last edge touches
    # begin or u1: b->u1 (:edge), b->u1 (:alternate_edge), u1->u1
    # (self loop); each pairs with both e1 bindings -> 6
    assert got2 == 6


# ------------------------------------------- containment + accessors


def test_edge_vle_containment(engine):
    rows = engine.fetch(
        "MATCH (:begin)-[ve*3..3]->(:end) MATCH ()-[e]->() "
        "RETURN e @> ve AS contained, ve <@ e AS contained2, id(e) AS eid"
    )
    # 2 three-hop paths x 13 edges (variable_edge_functions.out)
    assert len(rows) == 26
    t = sum(1 for r in rows if r[0] is True)
    assert t == 6  # 3 member edges per path
    assert all(r[0] == r[1] for r in rows)  # @> and <@ agree


def test_vle_nodes_accessor(engine):
    rows = engine.fetch_values("MATCH (:begin)-[e*3..3]->(:end) RETURN nodes(e)")
    assert len(rows) == 2
    for arr in rows:
        assert len(arr) == 4  # 3 hops -> 4 nodes incl. endpoints
        assert arr[0]["label"] == "begin"
        assert arr[-1]["label"] == "end"


def test_vle_relationships_accessor(engine):
    rows = engine.fetch_values("MATCH (:begin)-[e*3..3]->(:end) RETURN relationships(e)")
    assert len(rows) == 2
    labels = sorted(tuple(x["label"] for x in arr) for arr in rows)
    # the two 3-hop routes (variable_edge_functions.out)
    assert labels == [
        ("alternate_edge", "edge", "bypass_edge"),
        ("edge", "edge", "bypass_edge"),
    ] or labels == sorted([
        ("alternate_edge", "edge", "bypass_edge"),
        ("edge", "edge", "bypass_edge"),
    ])
    # edges(e) is the same accessor
    rows2 = engine.fetch_values("MATCH (:begin)-[e*3..3]->(:end) RETURN edges(e)")
    assert sorted(json.dumps(r) for r in rows) == sorted(json.dumps(r) for r in rows2)


def test_vle_edge_chain_consistent(engine):
    # every consecutive edge pair in a resolved array is head-to-tail
    rows = engine.fetch_values("MATCH (:begin)-[e*3..3]->(:end) RETURN relationships(e)")
    for arr in rows:
        for a, b in zip(arr, arr[1:]):
            assert {a["start_id"], a["end_id"]} & {b["start_id"], b["end_id"]}


def test_vle_length_operator(engine):
    vals = engine.fetch_values("MATCH (:begin)-[e*]->(:end) RETURN DISTINCT @-@ e")
    # variable_edge_functions.out: {3,4,5,6,7,8,9,10}
    assert sorted(vals) == [3, 4, 5, 6, 7, 8, 9, 10]
