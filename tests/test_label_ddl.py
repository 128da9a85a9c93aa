"""Label DDL + property constraints — the statement surface over the
reference's create_vlabel/create_elabel/drop_label,
create_unique_properties_constraint and create_property_index functions
(sql/postgraph.sql.in:131-171; src/backend/commands/label_commands.c:
170-265, 271-350, 425-520, 976-1040).
"""

import pytest

from postgraph_spark.engine import CypherEngine
from postgraph_spark.graph import Graph


@pytest.fixture()
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH ddl")
    e.execute("USE GRAPH ddl")
    return e


# ------------------------------------------------------------ label DDL


def test_create_vlabel_and_duplicate_errors(engine):
    engine.execute("CREATE VLABEL person")
    assert engine.graph.label_kinds["person"] == "vertex"
    # label_commands.c:156-160: 'label "x" already exists'
    with pytest.raises(ValueError, match="already exists"):
        engine.execute("CREATE VLABEL person")
    # an elabel of the same name collides too (one label namespace)
    with pytest.raises(ValueError, match="already exists"):
        engine.execute("CREATE ELABEL person")


def test_kind_enforced_on_write(engine):
    engine.execute("CREATE VLABEL person")
    engine.execute("CREATE ELABEL knows")
    engine.execute("CREATE (:person {name: 'a'})")
    # writing an edge under a vertex label is the shape mismatch the
    # reference's per-kind table schemas reject
    with pytest.raises(ValueError, match="vertex label"):
        engine.execute("CREATE (:x)-[:person]->(:y)")
    with pytest.raises(ValueError, match="edge label"):
        engine.execute("CREATE (:knows)")


def test_drop_label(engine):
    engine.execute("CREATE (:person {name: 'a'})")
    engine.execute("CREATE (:person {name: 'b'})")
    engine.execute("CREATE (:city {name: 'x'})")
    engine.execute("DROP LABEL person")
    assert engine.fetch_values("MATCH (n) RETURN n.name") == ["x"]
    # label_commands.c:1020-1025: 'label "x" does not exist'
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute("DROP LABEL person")
    # label_commands.c:1027-1031: force is gated and unsupported
    engine.execute("CREATE VLABEL gone")
    with pytest.raises(ValueError, match="force"):
        engine.execute("DROP LABEL gone FORCE")


def test_label_ddl_requires_graph(spark):
    e = CypherEngine(spark)
    with pytest.raises(ValueError, match="no graph selected"):
        e.execute("CREATE VLABEL person")


# ----------------------------------------------- unique properties


def test_unique_properties_constraint_blocks_duplicates(engine):
    engine.execute("CREATE VLABEL person")
    engine.execute("CREATE UNIQUE PROPERTIES CONSTRAINT ON person")
    engine.execute("CREATE (:person {name: 'a', age: 1})")
    engine.execute("CREATE (:person {name: 'b'})")
    # identical document -> unique violation at write time
    with pytest.raises(ValueError, match="unique constraint"):
        engine.execute("CREATE (:person {name: 'a', age: 1})")
    # key order / numeric form do not matter: gtype object equality
    with pytest.raises(ValueError, match="unique constraint"):
        engine.execute("CREATE (:person {age: 1.0, name: 'a'})")
    # intra-batch duplicates are caught too
    with pytest.raises(ValueError, match="unique constraint"):
        engine.execute("CREATE (:person {x: 9}), (:person {x: 9})")
    assert len(engine.fetch("MATCH (n:person) RETURN n")) == 2


def test_unique_constraint_on_existing_duplicates_fails(engine):
    engine.execute("CREATE (:p {v: 1})")
    engine.execute("CREATE (:p {v: 1})")
    # ALTER TABLE ADD CONSTRAINT builds the index over existing rows
    with pytest.raises(ValueError, match="existing duplicate"):
        engine.execute("CREATE UNIQUE PROPERTIES CONSTRAINT ON p")


def test_unique_property_index(engine):
    engine.execute("CREATE VLABEL user")
    engine.execute("CREATE UNIQUE PROPERTY INDEX ON user (email)")
    engine.execute("CREATE (:user {email: 'a@x', plan: 'f'})")
    engine.execute("CREATE (:user {email: 'b@x', plan: 'f'})")  # other props may repeat
    with pytest.raises(ValueError, match="unique constraint"):
        engine.execute("CREATE (:user {email: 'a@x', plan: 'g'})")
    # btree-unique semantics: NULL keys never collide
    engine.execute("CREATE (:user {plan: 'f'})")
    engine.execute("CREATE (:user {plan: 'g'})")
    assert len(engine.fetch("MATCH (n:user) RETURN n")) == 4


def test_nonunique_property_index_is_metadata(engine):
    engine.execute("CREATE VLABEL doc")
    engine.execute("CREATE PROPERTY INDEX ON doc (ts)")
    assert engine.graph.property_indexes == [{"label": "doc", "property": "ts"}]
    with pytest.raises(ValueError, match="does not exist"):
        engine.execute("CREATE PROPERTY INDEX ON nope (ts)")


def test_merge_respects_unique_constraint(engine):
    engine.execute("CREATE VLABEL item")
    engine.execute("CREATE UNIQUE PROPERTY INDEX ON item (sku)")
    engine.execute("MERGE (i:item {sku: 's1'})")
    engine.execute("MERGE (i:item {sku: 's1'})")  # matches, creates nothing
    assert len(engine.fetch("MATCH (n:item) RETURN n")) == 1


# ----------------------------------------------------- durability


def test_constraints_survive_reopen(spark, tmp_path):
    from postgraph_spark.graph import GraphCatalog

    cat = GraphCatalog(spark, root=str(tmp_path))
    e = CypherEngine(spark, cat)
    e.execute("CREATE GRAPH dur")
    e.execute("USE GRAPH dur")
    e.execute("CREATE VLABEL acct")
    e.execute("CREATE UNIQUE PROPERTY INDEX ON acct (iban)")
    e.execute("CREATE (:acct {iban: 'X1'})")

    g2 = Graph.read(spark, str(tmp_path / "dur"))
    assert g2.label_kinds["acct"] == "vertex"
    assert g2.constraints == [{"label": "acct", "property": "iban"}]
    cat2 = GraphCatalog(spark, root=str(tmp_path))
    e2 = CypherEngine(spark, cat2)
    e2.execute("USE GRAPH dur")
    with pytest.raises(ValueError, match="unique constraint"):
        e2.execute("CREATE (:acct {iban: 'X1'})")


# -------- old/regress/index.sql Section 1 behavioral sequence --------


def test_index_regress_sequence(spark):
    """Unique-properties-constraint lifecycle mirrored from
    old/regress/index.{sql,out} Tests 1-6: duplicate CREATE rejected
    (one statement or two), SET that produces a duplicate rejected,
    DELETE and SET-away free the value for re-use."""
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH cypher_index")
    e.execute("USE GRAPH cypher_index")
    e.execute("CREATE VLABEL idx")
    e.execute("CREATE UNIQUE PROPERTIES CONSTRAINT ON idx")

    # Test 1: second identical CREATE errors
    e.execute("CREATE (:idx {i: 1})")
    with pytest.raises(ValueError, match="unique constraint"):
        e.execute("CREATE (:idx {i: 1})")
    e.execute("MATCH (n) DETACH DELETE n")

    # Test 2: intra-statement duplicate errors
    with pytest.raises(ValueError, match="unique constraint"):
        e.execute("CREATE (:idx {i: 1}), (:idx {i: 1})")
    e.execute("MATCH (n) DETACH DELETE n")

    # Test 3: SET producing duplicate properties errors (index.out:70)
    e.execute("CREATE (:idx {i: 1})")
    e.execute("CREATE (:idx)")
    with pytest.raises(ValueError, match="unique constraint"):
        e.execute("MATCH (n) SET n.i = 1")
    e.execute("MATCH (n) DETACH DELETE n")

    # Test 4: delete frees the value
    e.execute("CREATE (:idx {i: 1})")
    e.execute("MATCH (n) DETACH DELETE n")
    e.execute("CREATE (:idx {i: 1})")
    e.execute("MATCH (n) DETACH DELETE n")

    # Test 6: SET-away frees the value
    e.execute("CREATE (:idx {i: 1})")
    e.execute("MATCH (n) SET n.i = 2")
    e.execute("CREATE (:idx {i: 1})")
    vals = sorted(e.fetch_values("MATCH (n) RETURN n.i"))
    assert vals == [1, 2]


# ------------------------------------------------------- ALTER GRAPH


def test_alter_graph_rename(spark, tmp_path):
    from postgraph_spark.graph import GraphCatalog

    cat = GraphCatalog(spark, root=str(tmp_path))
    e = CypherEngine(spark, cat)
    e.execute("CREATE GRAPH old_name")
    e.execute("USE GRAPH old_name")
    e.execute("CREATE (:v {i: 1})")
    e.execute("ALTER GRAPH old_name RENAME TO new_name")
    assert e.catalog.current == "new_name"
    assert e.fetch_values("MATCH (n) RETURN n.i") == [1]
    assert (tmp_path / "new_name").is_dir() and not (tmp_path / "old_name").exists()
    with pytest.raises(ValueError, match="does not exist"):
        e.execute("ALTER GRAPH old_name RENAME TO x")
    # reopen from disk under the new name
    cat2 = GraphCatalog(spark, root=str(tmp_path))
    e2 = CypherEngine(spark, cat2)
    e2.execute("USE GRAPH new_name")
    assert e2.fetch_values("MATCH (n) RETURN n.i") == [1]


def test_dropped_label_id_never_reused(engine):
    """ADVICE r8 high #2: DROP LABEL must not free its label id —
    graphids pack label_id<<48 | entry_id and a recycled id with a
    fresh entry sequence collides with a surviving label's graphids."""
    engine.execute("CREATE VLABEL keep1")
    engine.execute("CREATE VLABEL victim")
    engine.execute("CREATE VLABEL keep2")
    ids_before = dict(engine.graph.label_ids)
    engine.execute("DROP LABEL victim")
    engine.execute("CREATE VLABEL reborn")
    assert engine.graph.label_ids["reborn"] not in ids_before.values()
    # entities of the new label cannot collide with any existing graphid
    engine.execute("CREATE (:keep2 {k: 1})")
    engine.execute("CREATE (:reborn {k: 1})")
    ids = [r[0] for r in engine.graph.vertices.select("id").collect()]
    assert len(ids) == len(set(ids))


def test_label_id_hwm_survives_reopen(spark, tmp_path):
    """The high-water mark persists in catalog.json: a reload after a
    drop must not hand out the dropped id either (graph.py:_alloc_label_id)."""
    from postgraph_spark.graph import GraphCatalog

    root = str(tmp_path / "hwm")
    eng = CypherEngine(spark, GraphCatalog(spark, root=root))
    eng.execute("CREATE GRAPH g")
    eng.execute("USE GRAPH g")
    eng.execute("CREATE VLABEL a")
    eng.execute("CREATE VLABEL b")
    dropped_id = eng.graph.label_ids["b"]
    eng.execute("DROP LABEL b")

    eng2 = CypherEngine(spark, GraphCatalog(spark, root=root))
    eng2.execute("USE GRAPH g")
    eng2.execute("CREATE VLABEL c")
    assert eng2.graph.label_ids["c"] > dropped_id
