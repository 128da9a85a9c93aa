"""Distributed connected components for near-duplicate clustering.

Turns a pair list (the output of MinHash-LSH / Jaccard / embedding
near-dup joins) into duplicate CLUSTERS with a canonical representative
per cluster — the step a corpus-curation pipeline runs between
"candidate pairs" and "keep one copy".

Algorithm: min-label propagation with pointer jumping.
Each vertex starts labeled with itself; every round takes the min of
its own label, its neighbors' labels, and its label's label (pointer
jump). The neighbor step alone converges in O(diameter) rounds; the
pointer jump gives the Shiloach-Vishkin style doubling, so convergence
is O(log n) rounds even on path graphs. Each round is two shuffles
(neighbor groupBy-min + jump join), both on the vertex id — at 100 TB
the edge list is hash-partitioned on src once and AQE handles the
skewed mega-cluster keys. Lineage is cut with localCheckpoint every
round, so the plan never grows with iterations (the same pattern as
the VLE checkpoint loop, operators/vle.py).

The only driver-side value per round is a single aggregated change
count (one row) — no .collect() of data.

Reference: the reference engine has no clustering operator (it stops at
pairs); this is part of the additive LLM-pipeline surface the driver's
north star asks for, same family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given as a pair
    list. Returns (v, component) with component = min vertex id in the
    component. Vertices = every id appearing in the pair list.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # initial labels: own id
    lab = e.select(F.col("u").alias("v")).distinct().select(
        "v", F.col("v").alias("c")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # neighbor min: every edge ships the label across; min per vertex
        nbr = (
            e.join(lab.withColumnRenamed("v", "u"), "u")
            .select(F.col("v"), F.col("c"))
        )
        l2 = (
            lab.unionByName(nbr)
            .groupBy("v")
            .agg(F.min("c").alias("c"))
        )
        # pointer jump: label of my label (label table joined to itself)
        l3 = (
            l2.join(
                l2.select(F.col("v").alias("c"), F.col("c").alias("cc")),
                "c",
                "left",
            )
            .select("v", F.least(F.col("c"), F.coalesce(F.col("cc"), F.col("c"))).alias("c"))
            .localCheckpoint(eager=True)
        )
        changed = (
            lab.withColumnRenamed("c", "c0")
            .join(l3, "v")
            .select(F.sum((F.col("c0") != F.col("c")).cast("long")).alias("n"))
            .first()["n"]
        )
        lab = l3
        if not changed:
            break
    return lab.select(F.col("v"), F.col("c").alias("component"))


def dup_clusters(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Duplicate clusters from a near-dup pair list: one row per member
    doc with its cluster id (min doc id — the canonical copy to KEEP),
    the cluster size, and the keep flag. Downstream dedup is then an
    anti-join of the corpus against `WHERE NOT is_keep`.
    """
    cc = connected_components(edges, src, dst)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return (
        # equi-join on component; sizes has one row per component so AQE
        # broadcast-converts it when small — forcing broadcast would be
        # wrong at 100 TB (components can number in the hundreds of
        # millions there)
        cc.join(sizes, "component")
        .select(
            F.col("v").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "csize",
            (F.col("v") == F.col("component")).alias("is_keep"),
        )
    )
