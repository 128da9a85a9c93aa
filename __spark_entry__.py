"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query on sf0.001 (smoke check).
queries()      — name -> (spark, sf_dir) -> DataFrame, one per operator
                 implemented from SURVEY.md §2.
oracle_sql()   — name -> DuckDB-runnable ANSI SQL producing the same
                 columns/values (omitted for non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from postgraph_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q5-shaped snowflake join over the graph-week data."""
    return QUERIES["q5_region_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
