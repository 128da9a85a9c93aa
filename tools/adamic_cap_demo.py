"""Demonstrate the adamic-adar fanout guards binding under density.

BENCH_SCALE replicates sf0.1 ten times into the SAME 5-minute buckets
(membership 10x, buckets unchanged) — the incident-storm densification
the round-11 caps exist for, and adversarial for any co-occurrence
operator: pair rows grow ~quadratically (22.9k -> 3.18M measured) until
the caps bind. The registered row's caps (bucket 1000 / degree 1000)
deliberately do NOT bind at these densities — on moderately dense
graphs the quadratic is real signal — so its scale ratio is the honest
quadratic. This script measures the same pipeline with BINDING caps
(bucket 32 / degree 64) at both scales to show the guard flattening the
curve; the result goes into BENCH_SCALE_r{N}.json as `guards_demo`.

Usage: python tools/adamic_cap_demo.py [sf0.1_dir] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgraph_spark.operators import pagerank as PR  # noqa: E402
from postgraph_spark.operators.guards import cap_per_key  # noqa: E402
from postgraph_spark.queries.registry import t  # noqa: E402
from postgraph_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir: str, bucket_cap: int, max_degree: int):
    ev = t(spark, sf_dir, "events")
    nodes = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", F.window("ts", "5 minutes")["start"].alias("w"))
        .distinct()
    )
    nodes = cap_per_key(nodes, ["w"], ["user_id"], bucket_cap)
    a = nodes.select(F.col("user_id").alias("a"), "w")
    b = nodes.select(F.col("user_id").alias("b"), "w")
    pairs = a.join(b, "w").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    return PR.adamic_adar(pairs, "a", "b", max_degree=max_degree)


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    bucket_cap, max_degree = 32, 64
    spark = get_spark("adamic_cap_demo")
    spark.range(1).write.format("noop").mode("overwrite").save()
    out = {"bucket_cap": bucket_cap, "max_degree": max_degree}
    for key, sf in (("sf0.1_sec", sf01), ("sf1_sec", sf1)):
        df = build(spark, sf, bucket_cap, max_degree)
        execs = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        out[key] = round(min(execs), 3)
    out["ratio"] = round(out["sf1_sec"] / out["sf0.1_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
