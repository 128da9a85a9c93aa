"""Capture .explain('formatted') for every bench row into plans/r11/.

Usage: python tools/capture_plans.py [suffix] [row ...]
  suffix: 'before' or 'after' (default 'before')
  rows:   subset of bench rows (default: all HEADLINE+ROUND9+ROUND11)

Writes plans/r11/<name>_<suffix>.txt plus a one-line summary (Exchange /
join-node / python-eval counts) to stdout so plan-shape diffs are easy to
scan. Build-time eager jobs (probes, checkpoints) run as part of plan
construction, same as the bench's build phase.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, ROUND9, ROUND11  # noqa: E402
from postgraph_spark.queries import QUERIES  # noqa: E402
from postgraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    rows = sys.argv[2:] or (HEADLINE + ROUND9 + ROUND11)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rdir = os.environ.get("SPARK_GRAFT_PLANS_DIR", "r12")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rdir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("postgraph_spark_plans")
    for name in rows:
        df = QUERIES[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = len(re.findall(r"\bExchange\b", txt))
        joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", txt)
        py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow)", txt))
        from collections import Counter

        jc = dict(Counter(joins))
        print(f"{name}: Exchange={n_ex} joins={jc} pyNodes={py}")


if __name__ == "__main__":
    main()
