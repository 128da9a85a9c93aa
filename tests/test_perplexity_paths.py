"""The two perplexity_buckets bucketing paths (exact ntile vs
approx_percentile threshold comparison) must agree on schema and
tercile semantics. The threshold path is the 100x-scale plan: no
partitionless window, no global sort — this suite forces it by
setting exact_max=0 and checks it against the exact path at sf0.001.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgraph_spark.queries.llm_ops import perplexity_buckets

SF = "/root/testdata/sf0.001"


def test_threshold_path_schema_matches_ntile_path(spark):
    exact = perplexity_buckets(spark, SF)  # default: ntile at this size
    approx = perplexity_buckets(spark, SF, exact_max=0)  # forced threshold path
    assert exact.schema == approx.schema


def test_threshold_path_semantics(spark):
    exact_rows = {r["bucket"]: r.asDict() for r in perplexity_buckets(spark, SF).collect()}
    approx_rows = {
        r["bucket"]: r.asDict()
        for r in perplexity_buckets(spark, SF, exact_max=0).collect()
    }
    assert set(approx_rows) == {1, 2, 3} == set(exact_rows)
    for rows in (exact_rows, approx_rows):
        assert rows[1]["label"] == "head"
        assert rows[2]["label"] == "middle"
        assert rows[3]["label"] == "tail"
        for b in (1, 2, 3):
            assert rows[b]["min_logprob"] <= rows[b]["avg_logprob"] <= rows[b]["max_logprob"]
        # head holds the highest scores, tail the lowest
        assert rows[1]["min_logprob"] >= rows[2]["max_logprob"] - 1e-9
        assert rows[2]["min_logprob"] >= rows[3]["max_logprob"] - 1e-9
    # both paths bucket the same total doc count
    assert sum(r["n_docs"] for r in exact_rows.values()) == sum(
        r["n_docs"] for r in approx_rows.values()
    )
    # threshold terciles are approximate but must stay near-even: each
    # bucket within ±20% of n/3 on this well-spread score distribution
    n = sum(r["n_docs"] for r in approx_rows.values())
    for b in (1, 2, 3):
        assert abs(approx_rows[b]["n_docs"] - n / 3) <= max(2, 0.2 * n)


def test_threshold_path_has_no_partitionless_window(spark):
    plan = perplexity_buckets(spark, SF, exact_max=0)._jdf.queryExecution().toString()
    assert "ntile" not in plan.lower()
