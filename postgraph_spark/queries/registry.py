"""Registry mapping query name -> (spark_fn, oracle_sql)."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query, with an
    optional DuckDB-runnable ANSI-SQL oracle producing identical columns."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from postgraph_spark.sources.relational import load_table

    return load_table(spark, name, sf_dir)


def parquet_rows(sf_dir: str, name: str) -> int:
    """Row count of ``{sf_dir}/{name}.parquet`` from the parquet FOOTER
    (pyarrow, driver-side) — no Spark job. Registered query wrappers pass
    this as ``n_docs`` to the size-probed operators (jaccard_pairs,
    minhash_estimate_calibration, pack_sequences) so PLAN CONSTRUCTION
    stays lazy: the materialize-or-not decision needs a cardinality, and
    reading it from footer metadata costs microseconds instead of a
    hidden count job per plan build. Directory datasets sum their
    fragments' footers."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            for root, _dirs, files in os.walk(path)
            for f in files
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows
