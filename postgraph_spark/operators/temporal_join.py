"""As-of joins and interval range joins — the timeseries operators Spark
has no built-in for (the reference inherits them from PG's btree range
scans; kdb/DuckDB expose them as ASOF JOIN).

Both are written to AVOID the naive theta join, which Spark executes as
BroadcastNestedLoop (quadratic, executor-OOM at scale):

- asof_join: the union-tag trick. Probe and quote rows UNION into one
  frame ordered by (key, ts); a `last(..., ignorenulls=True)` window
  carries the most recent quote forward onto each probe row. ONE shuffle
  on the key, no join at all — the same plan shape at 100 TB, with AQE
  handling hot keys.
- range_join_buckets: interval overlap via bucket equi-join. Intervals
  explode to the fixed-width buckets they cover, points map to their
  bucket, the equi-join on (key, bucket) prunes candidates, and the
  exact predicate filters inside the bucket. Shuffle volume is
  O(rows x interval_width / bucket) instead of O(n^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def _epoch(df: DataFrame, col: str) -> Column:
    """Column as epoch-seconds double. TIMESTAMP_NTZ has no direct
    numeric cast — hop through the session-tz timestamp first (both
    sides of a join get the same hop, so the offset cancels)."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, (T.TimestampNTZType, T.DateType)):
        c = c.cast("timestamp")
    return c.cast("double")


def asof_join(
    probes: DataFrame,
    quotes: DataFrame,
    on: str,
    probe_ts: str = "ts",
    quote_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every probe row, attach the LATEST quote row with the same
    key and quote_ts <= probe_ts (ties at equal ts count as visible).
    Returns the probe columns plus `asof_<value_col>` columns (null when
    no quote precedes, or the match is older than tolerance_seconds)."""
    value_cols = value_cols or [c for c in quotes.columns if c not in (on, quote_ts)]
    p = probes.select(
        *[F.col(c) for c in probes.columns],
        F.lit(1).alias("__is_probe"),
        F.col(probe_ts).alias("__t"),
        *[F.lit(None).cast(quotes.schema[c].dataType).alias(f"__q_{c}") for c in value_cols],
        F.lit(None).cast(quotes.schema[quote_ts].dataType).alias("__q_ts"),
    )
    q = quotes.select(
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in probes.columns if c != on],
        F.col(on),
        F.lit(0).alias("__is_probe"),
        F.col(quote_ts).alias("__t"),
        *[F.col(c).alias(f"__q_{c}") for c in value_cols],
        F.col(quote_ts).alias("__q_ts"),
    )
    u = p.unionByName(q)
    # quotes sort BEFORE probes at the same timestamp -> "at or before"
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_probe").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = [F.last(f"__q_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols]
    carried_ts = F.last("__q_ts", ignorenulls=True).over(w).alias("__m_ts")
    out = u.select(*u.columns, *carried, carried_ts).filter(F.col("__is_probe") == 1)
    if tolerance_seconds is not None:
        ntz = isinstance(
            probes.schema[probe_ts].dataType, (T.TimestampNTZType, T.DateType)
        )

        def ep(c: Column) -> Column:
            return (c.cast("timestamp") if ntz else c).cast("double")

        age = ep(F.col("__t")) - ep(F.col("__m_ts"))
        keep = age <= F.lit(float(tolerance_seconds))
        out = out.select(
            *[c for c in probes.columns],
            *[F.when(keep, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in value_cols],
        )
        return out
    return out.select(*[c for c in probes.columns], *[f"asof_{c}" for c in value_cols])


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Equi-join points to every interval (same key) that CONTAINS them
    ([lo, hi] inclusive) without a nested-loop: intervals explode to the
    bucket grid they cover, points map to one bucket, and the exact
    containment predicate filters within the matched bucket."""
    b = F.lit(bucket_seconds)
    ivals = intervals.select(
        F.col(on),
        F.col(lo_col).alias("__lo"),
        F.col(hi_col).alias("__hi"),
        _epoch(intervals, lo_col).alias("__loe"),
        _epoch(intervals, hi_col).alias("__hie"),
        *[c for c in intervals.columns if c not in (on, lo_col, hi_col)],
    ).withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col("__loe") / b).cast("long"),
                F.floor(F.col("__hie") / b).cast("long"),
            )
        ),
    ).drop("__loe", "__hie")
    pts = points.withColumn(
        "__bkt", F.floor(_epoch(points, point_ts) / b).cast("long")
    )
    return (
        pts.join(ivals, [on, "__bkt"])
        .filter(
            (F.col(point_ts) >= F.col("__lo")) & (F.col(point_ts) <= F.col("__hi"))
        )
        .drop("__bkt")
    )
