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
