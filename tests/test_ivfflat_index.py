"""IVFFlat vector index DDL + search (create_ivfflat_{l2,ip}_ops_index,
sql/postgraph.sql.in; ivfkmeans.c trains the list centroids): CREATE
IVFFLAT L2|IP INDEX ON label (prop) trains a persisted k-means coarse
quantizer; ivf_search probes nprobe lists and ranks candidates."""

import math

import pytest

from postgraph_spark.engine import CypherEngine
from postgraph_spark.graph import Graph, GraphCatalog


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("ivf")
    e = CypherEngine(spark, GraphCatalog(spark, root=str(root)))
    e.execute("CREATE GRAPH vix")
    e.execute("USE GRAPH vix")
    # two well-separated point clouds around (0,0) and (10,10)
    for i in range(8):
        e.execute(f"CREATE (:doc {{i: {i}, v: [{i * 0.1}, {i * 0.1}]}})")
    for i in range(8, 16):
        e.execute(f"CREATE (:doc {{i: {i}, v: [{10 + i * 0.1}, {10 + i * 0.1}]}})")
    e.execute("CREATE IVFFLAT L2 INDEX ON doc (v) LISTS 2")
    e._root = root
    return e


def test_index_metadata_persisted(engine):
    ix = engine.graph.vector_indexes
    assert len(ix) == 1
    assert ix[0]["label"] == "doc" and ix[0]["metric"] == "l2"
    assert len(ix[0]["centroids"]) == 2
    # survives reopen from disk
    g2 = Graph.read(engine.spark, str(engine._root / "vix"))
    assert g2.vector_indexes == ix


def test_l2_search_probes_near_list(engine):
    hits = engine.graph.ivf_search("doc", "v", [0.0, 0.0], k=3, nprobe=1).collect()
    assert len(hits) == 3
    # the closest points are the small-coordinate cloud, in distance order
    dists = [h["dist"] for h in hits]
    assert dists == sorted(dists)
    assert math.isclose(dists[0], 0.0, abs_tol=1e-12)


def test_nprobe_widens_recall(engine):
    near = engine.graph.ivf_search("doc", "v", [5.0, 5.0], k=16, nprobe=1).count()
    both = engine.graph.ivf_search("doc", "v", [5.0, 5.0], k=16, nprobe=2).count()
    assert near <= 8 and both == 16  # probe=2 reaches both clouds


def test_ip_metric(engine):
    engine.execute("CREATE IVFFLAT IP INDEX ON doc (v) LISTS 2")
    hits = engine.graph.ivf_search("doc", "v", [1.0, 1.0], k=2, nprobe=2).collect()
    # negative inner product: the LARGEST vectors rank first
    top = engine.fetch_values(
        "MATCH (n:doc) WHERE n.i = 15 RETURN n.v"
    )[0]
    assert math.isclose(hits[0]["dist"], -(top[0] + top[1]), rel_tol=1e-12)


def test_search_requires_index(engine):
    with pytest.raises(ValueError, match="no ivfflat index"):
        engine.graph.ivf_search("doc", "w", [0.0, 0.0])
