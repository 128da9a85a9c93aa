"""KMV distinct-count sketch (operators/sketches.py): partition
independence (the defining merge property), estimator sanity, and
determinism of the normalized-fraction arithmetic."""

import os

from pyspark.sql import functions as F

from postgraph_spark.operators.sketches import kmv_distinct_estimate, kmv_sketch

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


def _grams(spark):
    from postgraph_spark.functions import text as TX

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    toks = TX.tokens(F.col("text"))
    return docs.select(F.explode(TX.shingles(toks, 3)).alias("g"))


def test_sketch_partition_independent(spark):
    g = _grams(spark)
    a = [r["h"] for r in kmv_sketch(g, "g", k=64).collect()]
    b = [r["h"] for r in kmv_sketch(g.repartition(3), "g", k=64).collect()]
    c = [r["h"] for r in kmv_sketch(g.coalesce(1), "g", k=64).collect()]
    assert sorted(a) == sorted(b) == sorted(c)
    assert len(a) == 64


def test_estimate_within_kmv_error(spark):
    g = _grams(spark)
    est = kmv_distinct_estimate(g, "g", k=256).collect()[0]
    exact = g.select(F.md5("g").alias("h")).distinct().count()
    # standard error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est["est_distinct"] - exact) / exact < 0.25
    assert est["k"] == 256


def test_small_domain_underflows_k(spark):
    # fewer distinct values than k: the sketch holds them all and the
    # estimate still computes (k = actual count)
    df = spark.createDataFrame([(str(i % 7),) for i in range(100)], "v string")
    est = kmv_distinct_estimate(df, "v", k=64).collect()[0]
    assert est["k"] == 7


def test_cms_never_undercounts_and_bounds_cells(spark):
    from postgraph_spark.operators import sketches as SK

    vals = spark.createDataFrame(
        [(w,) for w in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + list("defghij")],
        ["v"],
    )
    sk = SK.cms_sketch(vals, "v", depth=4, width=32)
    assert sk.count() <= 4 * 32
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], ["v"])
    got = {r.v: r.cms_n for r in SK.cms_estimate(sk, probes, "v", depth=4, width=32).collect()}
    assert got["a"] >= 50 and got["b"] >= 20 and got["c"] >= 5
    # an absent key can only collide upward, never negative
    assert got["zzz"] >= 0
    # total mass conservation per hash row: every row sums to n items
    rows = sk.groupBy("row").sum("cnt").collect()
    n = vals.count()
    assert all(r["sum(cnt)"] == n for r in rows)


def test_cms_forced_collision_overcounts(spark):
    from postgraph_spark.operators import sketches as SK

    # width=1: every key shares the single counter per row -> estimate
    # equals the total stream length for every probe
    vals = spark.createDataFrame([("x",)] * 7 + [("y",)] * 3, ["v"])
    sk = SK.cms_sketch(vals, "v", depth=2, width=1)
    got = {r.v: r.cms_n for r in SK.cms_estimate(
        sk, spark.createDataFrame([("x",), ("y",)], ["v"]), "v", depth=2, width=1
    ).collect()}
    assert got == {"x": 10, "y": 10}


def test_kmv_overlap_identical_and_disjoint(spark):
    from postgraph_spark.operators.sketches import kmv_overlap

    a = spark.createDataFrame([(f"v{i}",) for i in range(500)], ["g"])
    same = kmv_overlap(a, a, "g", k=64).first()
    assert same.est_jaccard == 1.0
    assert same.est_inter == same.est_union
    b = spark.createDataFrame([(f"w{i}",) for i in range(500)], ["g"])
    disj = kmv_overlap(a, b, "g", k=64).first()
    # inclusion-exclusion on saturated sketches is approximate: disjoint
    # sets must estimate near zero and far below the identical case
    assert disj.est_jaccard < 0.35
    # unsaturated side degrades to the exact count
    small = spark.createDataFrame([("v1",), ("v2",), ("zz",)], ["g"])
    mix = kmv_overlap(small, small, "g", k=64).first()
    assert mix.est_a == 3.0 and mix.est_union == 3.0 and mix.est_jaccard == 1.0
