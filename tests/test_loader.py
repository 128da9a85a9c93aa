"""Bulk graph loader (sources/loader.py — the AGE loader analog)."""

import csv
import os

from postgraph_spark.engine import CypherEngine
from postgraph_spark.graph import Graph, GraphCatalog
from postgraph_spark.sources import loader as L


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _fixture_files(tmp_path):
    people = os.path.join(tmp_path, "people.csv")
    knows = os.path.join(tmp_path, "knows.csv")
    _write_csv(
        people,
        ["id", "name", "age"],
        [[1, "ann", 34], [2, "bob", 28], [3, "cal", 41]],
    )
    _write_csv(
        knows,
        ["start_id", "end_id", "since"],
        [[1, 2, 2019], [2, 3, 2021], [9, 1, 1999]],  # 9 unresolvable
    )
    return people, knows


def test_csv_load_and_query(spark, tmp_path):
    people, knows = _fixture_files(str(tmp_path))
    cat = GraphCatalog(spark)
    g = cat.create_graph("ldr")
    nv = L.load_vertices_file(g, "person", people)
    ne = L.load_edges_file(g, "knows", knows, "person", "person")
    assert nv == 3
    assert ne == 2  # the (9 -> 1) row drops: no vertex with __id = 9

    eng = CypherEngine(spark, cat)
    got = eng.fetch_values(
        "MATCH (a:person)-[k:knows]->(b:person) "
        "RETURN a.name + '->' + b.name + '@' + toString(k.since) AS hop "
        "ORDER BY hop"
    )
    assert got == ["ann->bob@2019", "bob->cal@2021"]
    # the natural key is queryable as __id (AGE loader convention)
    assert eng.fetch_values(
        "MATCH (p:person) WHERE p.age > 30 RETURN count(*) AS n"
    ) == [2]


def test_durable_load_roundtrip(spark, tmp_path):
    people, knows = _fixture_files(str(tmp_path))
    root = str(tmp_path / "graphs")
    cat = GraphCatalog(spark, root=root)
    g = cat.create_graph("ldr2")
    L.load_vertices_file(g, "person", people)
    L.load_edges_file(g, "knows", knows, "person", "person")

    g2 = Graph.read(spark, os.path.join(root, "ldr2"), "ldr2")
    assert g2.vertices.count() == 3
    assert g2.edges.count() == 2
    assert set(g2.label_ids) >= {"person", "knows"}


def test_parquet_vertex_load(spark, tmp_path):
    pq = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(10, "hello"), (11, "world")], "doc_id long, body string"
    ).write.parquet(pq)
    cat = GraphCatalog(spark)
    g = cat.create_graph("ldr3")
    n = L.load_vertices_file(g, "doc", pq, fmt="parquet", id_col="doc_id")
    assert n == 2
    eng = CypherEngine(spark, cat)
    assert eng.fetch_values(
        "MATCH (d:doc) WHERE d.__id = 11 RETURN d.body"
    ) == ["world"]
