"""As-of and interval range joins (operators/temporal_join.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from postgraph_spark.operators.temporal_join import asof_join, range_join_buckets


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_basic_and_ties(spark):
    probes = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1"),
         (1, _ts("2024-01-01T10:05:00"), "p2"),
         (2, _ts("2024-01-01T09:00:00"), "p3")],
        ["k", "ts", "tag"],
    )
    quotes = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:59:00"), 10.0),
         (1, _ts("2024-01-01T10:05:00"), 20.0),  # tie: visible to p2
         (2, _ts("2024-01-01T09:30:00"), 99.0)],  # AFTER p3: not visible
        ["k", "ts", "v"],
    )
    out = {r.tag: r.asof_v for r in asof_join(probes, quotes, on="k", value_cols=["v"]).collect()}
    assert out == {"p1": 10.0, "p2": 20.0, "p3": None}


def test_asof_tolerance(spark):
    probes = spark.createDataFrame([(1, _ts("2024-01-01T12:00:00"), "p")], ["k", "ts", "tag"])
    quotes = spark.createDataFrame([(1, _ts("2024-01-01T10:00:00"), 5.0)], ["k", "ts", "v"])
    fresh = asof_join(probes, quotes, on="k", value_cols=["v"], tolerance_seconds=3 * 3600)
    stale = asof_join(probes, quotes, on="k", value_cols=["v"], tolerance_seconds=3600)
    assert fresh.first().asof_v == 5.0
    assert stale.first().asof_v is None


def test_range_join_spanning_buckets(spark):
    # interval spans several buckets; points inside/outside the bounds
    pts = spark.createDataFrame(
        [(1, 100.0, "in_lo"), (1, 5000.0, "in_mid"), (1, 9000.0, "in_hi"),
         (1, 9001.0, "out"), (2, 5000.0, "wrong_key")],
        ["k", "t", "tag"],
    )
    ivals = spark.createDataFrame([(1, 100.0, 9000.0, "w")], ["k", "lo", "hi", "win"])
    got = sorted(
        r.tag
        for r in range_join_buckets(pts, ivals, on="k", point_ts="t",
                                    lo_col="lo", hi_col="hi", bucket_seconds=1800).collect()
    )
    assert got == ["in_hi", "in_lo", "in_mid"]
