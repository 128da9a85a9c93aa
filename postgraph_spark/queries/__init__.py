"""Query registry: every entry pairs a Spark DataFrame query with an
ANSI-SQL oracle string (DuckDB-runnable) over the same parquet tables.

This is the engine's exercised operator inventory (SURVEY.md §2): joins,
implicit/explicit grouping, windows, set ops, scalar function families,
plus the training-data-pipeline extensions (dedup, similarity, text).
"""

from postgraph_spark.queries.registry import QUERIES, ORACLES, register

# importing modules populates the registry
from postgraph_spark.queries import relational  # noqa: E402,F401
from postgraph_spark.queries import llm_ops  # noqa: E402,F401
from postgraph_spark.queries import graph_queries  # noqa: E402,F401
from postgraph_spark.queries import streaming_queries  # noqa: E402,F401
from postgraph_spark.queries import reference_funcs  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "register"]
