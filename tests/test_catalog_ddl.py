"""Graph-catalog DDL golden mirrors — old/regress/catalog.{sql,out}
(the last reference regress file without a repo mirror; drop.sql's
extension-lifecycle cases are PG-extension mechanics with no engine
analog and are documented out of scope in SURVEY §2).

Portable semantics asserted here, with catalog.out line references:

- create_graph errors on a duplicate name; create_graph_if_not_exists
  (the `CREATE GRAPH IF NOT EXISTS` statement form) is idempotent
  (catalog.out:401-411).
- drop_graph without cascade ALWAYS errors on an existing graph — the
  default label tables depend on it (catalog.out:69-74); with cascade
  it drops the graph and its durable directory (catalog.out:75-84,
  count(*) = 0 afterwards :86-97).
- drop_graph on a missing graph errors (the post-drop alter_graph
  calls at catalog.out:174-178 show missing-name errors).
- alter_graph RENAME is case-sensitive ('graphx' does not match
  'GraphX', catalog.out:174-175) and errors when the target name
  already exists (:177-178).
- create_vlabel/create_elabel error on duplicates (catalog.out:353-356)
  and drop_label errors on a missing label; a label created after a
  drop gets a FRESH id (label_id high-water mark — graphid packing
  label_id<<48|entry_id must never collide across drop+create).
"""

import os

import pytest

from postgraph_spark.engine import CypherEngine
from postgraph_spark.graph import GraphCatalog


@pytest.fixture()
def engine(spark, tmp_path):
    return CypherEngine(spark, GraphCatalog(spark, root=str(tmp_path)))


def test_create_graph_duplicate_errors(engine):
    engine.execute("CREATE GRAPH g")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute("CREATE GRAPH g")


def test_create_graph_if_not_exists_idempotent(engine):
    engine.execute("CREATE GRAPH IF NOT EXISTS new_g")
    before = engine.catalog.graphs["new_g"]
    engine.execute("CREATE GRAPH IF NOT EXISTS new_g")  # catalog.out:408-411
    assert engine.catalog.graphs["new_g"] is before


def test_drop_graph_requires_cascade(engine, tmp_path):
    engine.execute("CREATE GRAPH g")
    engine.execute("USE GRAPH g")
    engine.execute("CREATE (:v {x: 1})")
    with pytest.raises(ValueError, match="depend on it"):
        engine.execute("DROP GRAPH g")  # catalog.out:69-74
    assert os.path.isdir(str(tmp_path / "g"))
    engine.execute("DROP GRAPH g CASCADE")  # catalog.out:75-84
    assert "g" not in engine.catalog.graphs
    assert not os.path.isdir(str(tmp_path / "g"))  # pg_namespace count = 0


def test_drop_graph_missing_errors(engine):
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute("DROP GRAPH nope CASCADE")


def test_rename_case_sensitive_and_collisions(engine):
    engine.execute("CREATE GRAPH GraphA")
    engine.execute("CREATE GRAPH GraphB")
    with pytest.raises(ValueError, match="does not exist"):
        # catalog.out:174-175 — 'graphx' does not name 'GraphX'
        engine.execute("ALTER GRAPH grapha RENAME TO GRAPHA")
    engine.execute("ALTER GRAPH GraphA RENAME TO GraphX")
    assert "GraphX" in engine.catalog.graphs and "GraphA" not in engine.catalog.graphs
    with pytest.raises(ValueError, match="already exists"):
        engine.execute("ALTER GRAPH GraphX RENAME TO GraphB")  # :177-178


def test_label_duplicate_and_missing(engine):
    engine.execute("CREATE GRAPH g")
    engine.execute("USE GRAPH g")
    engine.execute("CREATE VLABEL n")
    engine.execute("CREATE ELABEL r")
    with pytest.raises(ValueError, match="already exists"):
        engine.execute("CREATE VLABEL n")  # catalog.out:353-354
    with pytest.raises(ValueError, match="already exists"):
        engine.execute("CREATE ELABEL r")  # catalog.out:355-356
    engine.execute("DROP LABEL n")
    engine.execute("DROP LABEL r")
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute("DROP LABEL n")


def test_label_id_fresh_after_drop(engine):
    """drop+create never reuses a label id (round-8 ADVICE high #2):
    graphids pack label_id<<48|entry_id, so a reused id would alias
    entities of two labels onto equal graphids."""
    engine.execute("CREATE GRAPH g")
    engine.execute("USE GRAPH g")
    engine.execute("CREATE VLABEL a")
    engine.execute("CREATE VLABEL b")
    g = engine.graph
    old_a = g.label_ids["a"]
    engine.execute("DROP LABEL a")
    engine.execute("CREATE VLABEL c")
    assert g.label_ids["c"] > old_a
    assert g.label_ids["c"] > g.label_ids["b"]


def test_drop_label_after_cypher_create(engine):
    """catalog.out:37-48 — a label auto-created by Cypher CREATE can be
    dropped; its rows disappear from the read path."""
    engine.execute("CREATE GRAPH g")
    engine.execute("USE GRAPH g")
    engine.execute("CREATE (:l {x: 1}), (:keep {x: 2})")
    assert engine.fetch_values("MATCH (v:l) RETURN count(*)") == [1]
    engine.execute("DROP LABEL l")
    assert engine.fetch_values("MATCH (v:l) RETURN count(*)") == [0]
    assert engine.fetch_values("MATCH (v:keep) RETURN count(*)") == [1]
