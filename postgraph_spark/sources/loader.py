"""Bulk graph loader: CSV / JSON / Parquet -> vertex and edge labels.

The reference's old AGE loader (old/regress/age_load.out;
load_labels_from_file / load_edges_from_file) bulk-creates a label from
a file whose rows carry a user id column; edge files then reference
endpoints by those user ids. This is the Spark-native re-design:

- Any DataFrame (or file readable by ``spark.read``) becomes a vertex
  label: each row's columns are packed into the JSON properties
  document, graphids are assigned with the same distributed
  per-partition scheme as CREATE (plans/writes.py with_rowid — no
  single-partition window, no collect of data), and the rows are
  appended to the graph (incremental persist_append when durable).
- The user id column is kept as the ``__id`` property (AGE convention),
  so edge loads resolve endpoints with two equi-joins on
  ``properties.__id`` — shuffle on the join key, broadcast when a side
  is small, never a driver-side lookup table.

At 100 TB the load is: scan (parallel) -> one count-per-partition job
-> map-side id packing -> append. Edge loads add two shuffles (endpoint
resolution) that AQE sizes; a skewed hub vertex id is handled by the
skew-join config already on in the session defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postgraph_spark.graph import ENTRY_ID_BITS, Graph
from postgraph_spark.plans.writes import with_rowid


def _props_json(df: DataFrame, cols: list[str], id_col: str | None) -> F.Column:
    """Pack the given columns into the JSON properties text. The user
    id column (when present) is duplicated as ``__id`` — the AGE loader
    keeps it queryable and the edge loader joins on it."""
    struct_cols = [F.col(c).alias(c) for c in cols]
    if id_col is not None:
        struct_cols.append(F.col(id_col).alias("__id"))
    return F.to_json(F.struct(*struct_cols))


def load_vertices(
    graph: Graph,
    label: str,
    df: DataFrame,
    id_col: str | None = None,
    props_cols: list[str] | None = None,
) -> int:
    """Append df's rows as vertices of `label`. Returns the row count.

    id_col: the user's natural key (kept as property ``__id``);
    props_cols: which columns become properties (default: all).
    """
    cols = props_cols if props_cols is not None else list(df.columns)
    body, n = with_rowid(df)
    lid, base = graph.alloc_entry_ids(label, n)
    gid = F.lit(lid << ENTRY_ID_BITS).cast("long") + F.lit(base) + F.col("__rn")
    new_rows = body.select(
        gid.alias("id"),
        F.lit(label).alias("label"),
        _props_json(body, cols, id_col).alias("properties"),
    )
    if "pv" in graph.vertices.columns:
        new_rows = new_rows.withColumn("pv", F.try_parse_json("properties"))
    new_rows = new_rows.localCheckpoint(eager=True)
    graph.vertices = graph.vertices.unionByName(new_rows).localCheckpoint(eager=True)
    graph.persist_append("vertices", new_rows.drop("pv") if "pv" in new_rows.columns else new_rows)
    return n


def _gid_by_user_id(graph: Graph, label: str) -> DataFrame:
    """(user __id, graphid) lookup for a vertex label — a projection of
    the label scan, compared as text (CSV sources arrive as text)."""
    return (
        graph.vertices_with_label(label)
        .select(
            F.get_json_object("properties", "$.__id").alias("__key"),
            F.col("id").alias("__gid"),
        )
    )


def load_edges(
    graph: Graph,
    label: str,
    df: DataFrame,
    start_id_col: str,
    end_id_col: str,
    start_label: str,
    end_label: str,
    props_cols: list[str] | None = None,
) -> int:
    """Append df's rows as edges of `label`, resolving endpoints by the
    ``__id`` property of previously loaded vertex labels. Rows whose
    endpoints do not resolve are DROPPED (the AGE loader errors row-wise;
    a bulk pipeline wants the load to proceed — the returned count lets
    the caller compare against df.count() and decide). Returns the
    number of edges created."""
    cols = props_cols if props_cols is not None else [
        c for c in df.columns if c not in (start_id_col, end_id_col)
    ]
    src = _gid_by_user_id(graph, start_label).withColumnRenamed("__gid", "__src")
    dst = _gid_by_user_id(graph, end_label).withColumnRenamed("__gid", "__dst")
    resolved = (
        df.join(src, df[start_id_col].cast("string") == src["__key"]).drop("__key")
        .join(dst, df[end_id_col].cast("string") == dst["__key"]).drop("__key")
    )
    body, n = with_rowid(resolved)
    lid, base = graph.alloc_entry_ids(label, n)
    gid = F.lit(lid << ENTRY_ID_BITS).cast("long") + F.lit(base) + F.col("__rn")
    new_rows = body.select(
        gid.alias("id"),
        F.col("__src").alias("start_id"),
        F.col("__dst").alias("end_id"),
        F.lit(label).alias("label"),
        _props_json(body, cols, None).alias("properties"),
    )
    if "pv" in graph.edges.columns:
        new_rows = new_rows.withColumn("pv", F.try_parse_json("properties"))
    new_rows = new_rows.localCheckpoint(eager=True)
    graph.edges = graph.edges.unionByName(new_rows).localCheckpoint(eager=True)
    graph.persist_append("edges", new_rows.drop("pv") if "pv" in new_rows.columns else new_rows)
    return n


def _read(spark: SparkSession, path: str, fmt: str, **options) -> DataFrame:
    reader = spark.read
    if fmt == "csv":
        opts = {"header": "true", "inferSchema": "true"}
        opts.update({k: str(v) for k, v in options.items()})
        return reader.options(**opts).csv(path)
    if fmt == "json":
        return reader.options(**{k: str(v) for k, v in options.items()}).json(path)
    if fmt == "parquet":
        return reader.parquet(path)
    raise ValueError(f"unsupported loader format {fmt!r}")


def load_vertices_file(
    graph: Graph, label: str, path: str, fmt: str = "csv",
    id_col: str | None = "id", **options,
) -> int:
    df = _read(graph.vertices.sparkSession, path, fmt, **options)
    if id_col is not None and id_col not in df.columns:
        id_col = None
    return load_vertices(graph, label, df, id_col=id_col)


def load_edges_file(
    graph: Graph, label: str, path: str,
    start_label: str, end_label: str, fmt: str = "csv",
    start_id_col: str = "start_id", end_id_col: str = "end_id", **options,
) -> int:
    df = _read(graph.edges.sparkSession, path, fmt, **options)
    return load_edges(
        graph, label, df, start_id_col, end_id_col, start_label, end_label
    )
