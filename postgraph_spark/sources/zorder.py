"""Z-order (Morton-curve) clustering for multi-column data skipping.

The reference's btree/GIN indexes give it point- and range-lookup
pruning on ANY indexed column; a parquet lake gets the same effect from
FILE-LEVEL min/max statistics — but only for columns the layout is
clustered on. Sorting clusters one column perfectly and the rest not at
all; interleaving the bits of k rank-normalized columns (the Z-order /
Morton curve) gives every participating column locality, so a filter on
any of them prunes most files. This is the standard lakehouse analog of
a multi-column index (used by Delta OPTIMIZE ZORDER BY, Iceberg
rewrite_data_files strategy=sort sort_order=zorder; public algorithm).

Scale notes (100 TB):
- The z-value is computed per row with pure JVM bitwise expressions
  (no UDF, no shuffle of its own); the only shuffle is the
  repartitionByRange on the z-value that the write needs anyway to get
  non-overlapping file stats.
- Column normalization uses approxQuantile bounds (one cheap pass,
  driver gets 2 doubles per column — no data collect). At a fixed
  16 bits per column the interleave is exact regardless of data size.
- Works for numeric, timestamp (epoch micros), and string (xxhash64
  bucketing — hash destroys range locality, so strings only benefit
  equality filters; documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: max bits per column in the interleave. The usable width of a signed
#: long is 63 bits (bit 63 is the sign — setting it would order those
#: rows BEFORE the curve origin under repartitionByRange), so the
#: per-column width is min(BITS, 63 // n_cols): 16 for 2-3 columns,
#: 15 for 4.
BITS = 16


def _bits_per_col(k: int) -> int:
    return min(BITS, 63 // k)


def _as_double(df: DataFrame, col: str) -> Column | None:
    """Orderable column as double, or None for hash-bucketed strings."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return c.cast("timestamp").cast("double")
    if isinstance(dt, T.StringType):
        return None
    if isinstance(dt, T.NumericType):
        return c.cast("double")
    raise TypeError(f"z-order does not support column type {dt} ({col})")


def zvalue(df: DataFrame, cols: list[str]) -> Column:
    """Morton interleave of the normalized columns as one long column —
    pure bitwise JVM expressions (shiftleft/shiftright/bitwiseAND),
    2*BITS terms per column pair, well inside codegen limits. Numeric /
    temporal columns rank into [0, 2^BITS) from min/max bounds gathered
    in ONE stats pass (driver receives 2 doubles per column); strings
    hash-bucket (equality-only pruning)."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("z-order needs 2-4 columns")
    bits = _bits_per_col(len(cols))
    dbl = {c: _as_double(df, c) for c in cols}
    rng = [c for c in cols if dbl[c] is not None]
    bounds = {}
    if rng:
        aggs = []
        for c in rng:
            aggs += [F.min(dbl[c]).alias(f"lo_{c}"), F.max(dbl[c]).alias(f"hi_{c}")]
        row = df.select(*aggs).first()
        bounds = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in rng}
    norm = []
    for c in cols:
        if dbl[c] is None:
            norm.append(F.pmod(F.xxhash64(F.col(c)), F.lit(1 << bits)).cast("long"))
            continue
        lo, hi = bounds[c]
        if lo is None or hi is None or hi <= lo:
            norm.append(F.lit(0).cast("long"))
            continue
        scaled = (dbl[c] - F.lit(float(lo))) / F.lit(float(hi - lo))
        q = F.floor(scaled * F.lit(float((1 << bits) - 1)))
        q = F.coalesce(q, F.lit(0))  # nulls cluster at the curve origin
        norm.append(
            F.greatest(F.lit(0), F.least(q, F.lit((1 << bits) - 1))).cast("long")
        )
    k = len(norm)
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for j, nc in enumerate(norm):
            # bit `bit` of column j lands at position bit*k + j
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(nc, bit).bitwiseAND(F.lit(1)), bit * k + j)
            )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered on the Z-curve of `cols`:
    range-partition on the z-value (non-overlapping file extents ->
    disjoint min/max stats) and sort within partitions so row groups
    inside each file are clustered too. Readers need nothing special —
    Spark's parquet scan prunes files and row groups from the
    min/max stats of the ORIGINAL columns, which the curve made local.
    """
    zc = zvalue(df, cols)
    (
        df.withColumn("__z", zc)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def skipped_fraction(path: str, col: str, lo, hi) -> float:
    """Diagnostic: fraction of the parquet ROW GROUPS under `path` whose
    [min, max] stats exclude the predicate col BETWEEN lo AND hi — i.e.
    what a stats-based reader skips without reading data pages. Driver
    reads footers only (file metadata, not data)."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = skipped = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and st.has_min_max and (st.min > hi or st.max < lo):
                skipped += 1
    return skipped / total if total else 0.0
