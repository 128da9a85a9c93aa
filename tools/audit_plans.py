"""Registry-wide physical-plan audit: one line per registered query.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/audit_plans.py

For every row in the registry, builds the plan and reports the counts
that the optimization rounds watch: Exchange / SortMergeJoin /
BroadcastHashJoin / Window / Python-eval nodes, plus loud flags for the
anti-patterns (CartesianProduct, BroadcastNestedLoopJoin, row-at-a-time
BatchEvalPython, partitionless window). Output is the machine-readable
backbone of OPTIMIZATION_r11.md's per-row checklist.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgraph_spark.queries import QUERIES  # noqa: E402
from postgraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("postgraph_spark_audit")
    out = {}
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - audit robustness
            out[name] = {"error": str(exc)[:120]}
            continue
        out[name] = {
            # \bExchange\b counts only real shuffle nodes: the word
            # boundary excludes ReusedExchange (avoided work, counted
            # separately) and BroadcastExchange (ADVICE r11)
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "reused_exchanges": plan.count("ReusedExchange"),
            "broadcast_exchanges": len(re.findall(r"\bBroadcastExchange\b", plan)),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "window": plan.count("Window"),
            "python": plan.count("ArrowEvalPython")
            + plan.count("BatchEvalPython")
            + plan.count("MapInArrow")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "flags": [
                f
                for f, hit in (
                    ("CARTESIAN", "CartesianProduct" in plan),
                    ("NESTEDLOOP", "BroadcastNestedLoopJoin" in plan),
                    ("ROW_PYTHON", "BatchEvalPython" in plan),
                )
                if hit
            ],
        }
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
