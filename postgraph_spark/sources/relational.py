"""Relational parquet sources (the driver's TPC-H-ish star schema).

Reads stay declarative (``spark.read.parquet``) so Catalyst gets predicate
pushdown, column pruning, and partition-size planning for free. At 100 TB
these tables would be directory-partitioned (e.g. orders by month); the
loader takes any directory so that layout change is transparent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any scale factor
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark rejects by
    # default. Set the legacy flag at runtime so the fix holds even when the
    # caller built its own SparkSession (e.g. the driver's harness) rather
    # than our session.py builder.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # nanos timestamps surface as LongType under nanosAsLong — normalize
    # to microsecond TimestampType (truncation matches DuckDB's
    # CAST(ts_ns AS TIMESTAMP))
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view for the SQL surface."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
