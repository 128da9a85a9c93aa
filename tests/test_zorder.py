"""Z-order clustering: multi-column data-skipping layout
(sources/zorder.py — the lake analog of the reference's multi-column
btree index pruning)."""

import pytest
from pyspark.sql import functions as F

from postgraph_spark.sources.zorder import skipped_fraction, zorder_write, zvalue


@pytest.fixture(scope="module")
def grid(spark):
    # 200x200 integer grid: uniformly fills 2-D space, the worst case
    # for single-column sorting and the textbook case for the Z-curve
    return (
        spark.range(40000)
        .select(
            (F.col("id") % 200).alias("x"),
            (F.col("id") / 200).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )


def test_zvalue_locality(spark, grid):
    # points close in (x, y) get close z-values: the quadrant containing
    # (0..99, 0..99) must occupy the lowest quarter of the curve
    zdf = grid.withColumn("z", zvalue(grid, ["x", "y"]))
    top = zdf.filter((F.col("x") < 100) & (F.col("y") < 100)).agg(F.max("z")).first()[0]
    bottom = (
        zdf.filter((F.col("x") >= 100) & (F.col("y") >= 100)).agg(F.min("z")).first()[0]
    )
    assert top < bottom


def test_zorder_write_skips_on_both_columns(spark, grid, tmp_path):
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted_x")
    zorder_write(grid, zpath, ["x", "y"], num_files=16)
    # baseline: clustered on x only
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    # round-trip identical
    assert spark.read.parquet(zpath).count() == 40000

    # narrow range filter on EACH column skips most row groups
    skip_x = skipped_fraction(zpath, "x", 10, 20)
    skip_y = skipped_fraction(zpath, "y", 10, 20)
    assert skip_x > 0.5, skip_x
    assert skip_y > 0.5, skip_y

    # the x-sorted baseline skips on x but NOT on y — the gap is the
    # point of the curve
    base_y = skipped_fraction(spath, "y", 10, 20)
    assert skip_y > base_y + 0.4, (skip_y, base_y)


def test_zorder_string_column(spark, tmp_path):
    df = spark.range(5000).select(
        F.concat(F.lit("u"), (F.col("id") % 50).cast("string")).alias("user"),
        F.col("id").alias("t"),
    )
    path = str(tmp_path / "zs")
    zorder_write(df, path, ["user", "t"], num_files=8)
    assert spark.read.parquet(path).count() == 5000
    # equality pruning via the hash bucket: every row group still has
    # valid stats; at minimum the write round-trips and t-ranges skip
    assert skipped_fraction(path, "t", 0, 100) > 0.3


def test_zvalue_rejects_bad_arity(spark, grid):
    with pytest.raises(ValueError):
        zvalue(grid, ["x"])


def test_zvalue_four_columns_stays_positive(spark):
    """4 cols x 16 bits would write bit 63 (the sign bit), splitting the
    Morton curve: rows with the 4th column's top bit set sorted before
    everything else (round-6 ADVICE). 4 columns must drop to 15 bits."""
    df = spark.range(4096).select(
        (F.col("id") % 16).alias("a"),
        ((F.col("id") / 16) % 16).cast("long").alias("b"),
        ((F.col("id") / 256) % 16).cast("long").alias("c"),
        # near the max so the top normalized bit is exercised
        (F.col("id") % 65536).alias("d"),
    )
    zs = df.select(zvalue(df, ["a", "b", "c", "d"]).alias("z")).agg(
        F.min("z").alias("lo"), F.max("z").alias("hi")
    ).first()
    assert zs["lo"] >= 0, zs  # sign bit never set
    assert zs["hi"] < (1 << 60), zs  # 4 cols x 15 bits
