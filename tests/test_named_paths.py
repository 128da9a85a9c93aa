"""Named-path (traversal) golden tests, ported from the reference's
old/regress/traversal_functions.{sql,out}: the same begin/middle/end
fixture graph, `p = (...)` binding over fixed and variable-length
patterns, nodes()/relationships()/size()/length() accessors, and
startnode()/endnode() (edge.c:354-366)."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH traversal_functions")
    e.execute("USE GRAPH traversal_functions")
    # the exact fixture of traversal_functions.sql:31-44
    e.execute(
        "CREATE (b:begin)-[:edge]->(u1:middle)-[:edge]->(u2:middle)"
        "-[:edge]->(u3:middle)-[:edge]->(e:end), "
        "(u1)-[:self_loop]->(u1), "
        "(e)-[:self_loop]->(e), "
        "(b)-[:alternate_edge]->(u1), "
        "(u2)-[:alternate_edge]->(u3), "
        "(u3)-[:alternate_edge]->(e), "
        "(u2)-[:bypass_edge]->(e), "
        "(e)-[:alternate_edge]->(u3), "
        "(u3)-[:alternate_edge]->(u2), "
        "(u2)-[:bypass_edge]->(b)"
    )
    return e


def test_vle_relationships(engine):
    """traversal_functions.out:49-60 — exactly 2 three-hop begin->end
    paths; label sequences (b->u1 edge|alternate_edge, u1->u2 edge,
    u2->e bypass_edge)."""
    rows = engine.fetch_values(
        "MATCH p = (u:begin)-[*3..3]->(v:end) RETURN relationships(p)"
    )
    assert len(rows) == 2
    label_seqs = sorted(tuple(e["label"] for e in r) for r in rows)
    assert label_seqs == [
        ("alternate_edge", "edge", "bypass_edge"),
        ("edge", "edge", "bypass_edge"),
    ]
    for r in rows:
        # chain is connected: e[i].end_id == e[i+1].start_id
        for a, b in zip(r, r[1:]):
            assert a["end_id"] == b["start_id"]
        assert all(set(e) == {"id", "start_id", "end_id", "label", "properties"} for e in r)


def test_vle_nodes(engine):
    """traversal_functions.out:62-85 — 4 nodes per 3-hop path,
    begin..end with middles between."""
    rows = engine.fetch_values("MATCH p = (u:begin)-[*3..3]->(v:end) RETURN nodes(p)")
    assert len(rows) == 2
    for r in rows:
        assert len(r) == 4
        assert r[0]["label"] == "begin"
        assert r[-1]["label"] == "end"
        assert all(n["label"] == "middle" for n in r[1:-1])


def test_vle_size(engine):
    """size(p) counts nodes + edges: 7 for a 3-hop path
    (traversal_functions.out:87-93)."""
    assert engine.fetch_values(
        "MATCH p = (u:begin)-[*3..3]->(v:end) RETURN size(p)"
    ) == [7, 7]


def test_vle_distinct_lengths(engine):
    """@-@ path_length analog: DISTINCT length(p) over unbounded * =
    {3..10} (traversal_functions.out:95-107)."""
    got = engine.fetch_values(
        "MATCH p = (u:begin)-[*]->(v:end) RETURN DISTINCT length(p)"
    )
    assert sorted(got) == [3, 4, 5, 6, 7, 8, 9, 10]


def test_fixed_length_named_path(engine):
    rows = engine.fetch(
        "MATCH p = (b:begin)-[:edge]->(m:middle) "
        "RETURN nodes(p) AS ns, relationships(p) AS es, length(p) AS n, size(p) AS sz"
    )
    assert len(rows) == 1
    ns, es, n, sz = rows[0]
    assert [x["label"] for x in ns] == ["begin", "middle"]
    assert [x["label"] for x in es] == ["edge"]
    assert n == 1 and sz == 3


def test_startnode_endnode(engine):
    rows = engine.fetch(
        "MATCH (b:begin)-[e:edge]->(m:middle) "
        "RETURN startnode(e) AS s, endnode(e) AS t"
    )
    assert len(rows) == 1
    s, t = rows[0]
    assert s["label"] == "begin"
    assert t["label"] == "middle"
    assert s["id"] is not None and t["id"] is not None


def test_startnode_in_where(engine):
    got = engine.fetch_values(
        "MATCH (x)-[e:bypass_edge]->(y) "
        "WHERE label(endnode(e)) <> 'nope' "
        "RETURN label(y)"
    )
    assert sorted(got) == ["begin", "end"]
