"""Connected-components dedup clustering (operators/cc.py)."""

from pyspark.sql import functions as F

from postgraph_spark.operators.cc import connected_components, dup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_cc_triangle_and_pair(spark):
    # triangle {1,2,3} + pair {10,11} + chain {20-21-22}
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (21, 22)])
    got = {
        (r["v"], r["component"])
        for r in connected_components(e).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_cc_long_chain_converges_logarithmically(spark):
    # a 64-node path exercises pointer jumping: without it, min-label
    # propagation needs 63 rounds; with doubling it must finish well
    # under the 50-iteration cap
    n = 64
    e = _edges(spark, [(i, i + 1) for i in range(n - 1)])
    rows = connected_components(e).collect()
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)


def test_dup_clusters_shape(spark):
    e = _edges(spark, [(5, 9), (9, 7), (100, 200)])
    rows = {r["doc_id"]: r for r in dup_clusters(e).collect()}
    assert rows[5]["cluster_id"] == 5 and rows[5]["is_keep"]
    assert rows[9]["cluster_id"] == 5 and not rows[9]["is_keep"]
    assert rows[7]["csize"] == 3
    assert rows[100]["is_keep"] and rows[200]["cluster_id"] == 100
    assert rows[200]["csize"] == 2
