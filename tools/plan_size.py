"""Measure optimized-plan max expression line size for headline Cypher rows.

Usage: python tools/plan_size.py [query ...]   (default: the cypher_* rows)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgraph_spark.session import get_spark  # noqa: E402
from postgraph_spark.queries import QUERIES  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

CYPHER_ROWS = [
    "cypher_temporal_funcs", "cypher_group_having", "cypher_window_topn",
    "cypher_named_paths", "cypher_with_orderby_limit", "graph_match_2hop",
    "cypher_match_agg", "cypher_grouping_sets",
]


def main():
    names = sys.argv[1:] or CYPHER_ROWS
    spark = get_spark()
    reg = QUERIES
    for name in names:
        fn = reg[name]
        t0 = time.time()
        df = fn(spark, SF)
        build = time.time() - t0
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        lines = plan.splitlines()
        mx = max((len(ln) for ln in lines), default=0)
        t0 = time.time()
        n = df.count()
        exec_s = time.time() - t0
        print(f"{name}: build={build:.2f}s exec={exec_s:.2f}s rows={n} "
              f"plan_lines={len(lines)} max_line={mx} total={len(plan)}")


if __name__ == "__main__":
    main()
