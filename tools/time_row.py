"""Time individual bench rows with the bench's own two-pass policy.

Usage: SPARK_GRAFT_CPUS=32 python tools/time_row.py name [name ...]
Prints per-row build/exec/total (min across two interleaved passes,
first pass executes twice), same as bench.py's fold.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _run_pass, fold_passes  # noqa: E402
from postgraph_spark.session import get_spark  # noqa: E402


def main() -> None:
    rows = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("postgraph_spark_time_row")
    spark.range(1).write.format("noop").mode("overwrite").save()
    p1 = _run_pass(spark, sf_dir, execs_per_row=2, rows=rows)
    p2 = _run_pass(spark, sf_dir, execs_per_row=1, rows=rows)
    timings, build = fold_passes(p1, p2, rows)
    out = {n: {"total": timings[n], "build": build[n], "exec": round(timings[n] - build[n], 3)} for n in rows}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
