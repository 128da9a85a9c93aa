"""Distributed cardinality and frequency sketches.

KMV (k-minimum-values) distinct-count estimation — the sketch a corpus
pipeline uses to size shingle space / dedup structures BEFORE paying for
an exact distinct (Bar-Yossef et al., "Counting distinct elements in a
data stream", RANDOM 2002): hash every element, keep the k smallest
distinct hashes; if the k-th smallest normalized hash is U, the distinct
count is ~ (k-1)/U.

Count-min sketch (Cormode & Muthukrishnan 2005) — fixed-size frequency
estimation: d hash rows x w counters; an item's estimate is the MIN of
its d counters (always an overestimate, never under). Deterministic
md5-derived bucket hashing means two engines build IDENTICAL counter
tables — the sketch is exactly replayable in SQL.

Scale design (100 TB):
- The corpus NEVER shuffles: an Arrow-batched mapInPandas pass emits at
  most k unique hashes per partition (the per-partition KMV), and only
  those k * n_partitions rows move — the global k smallest distinct
  hashes are recoverable from any partitioning's per-partition sketches
  (set-union then k smallest), so the merge is a tiny distinct + sort.
- Deterministic and cross-engine exact: md5 hex compares lexicographic ==
  numeric (fixed width); the normalized fraction reads the first 13 hex
  digits (52 bits — exact in a double; the divisor 16^13 is a power of
  two, so the division only shifts the exponent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kmv_sketch(values: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct md5 hashes of `values[col]` — one
    `h string` column with at most k rows. Input may contain duplicates;
    hashing collapses them (same value -> same hash), and uniqueness is
    enforced per partition then globally."""
    hs = values.select(F.md5(F.col(col)).alias("h")).filter(F.col("h").isNotNull())

    def per_partition(batches):
        import heapq

        import pandas as pd

        seen: set[str] = set()
        for pdf in batches:
            seen.update(pdf["h"])
            if len(seen) > 8 * k:  # bound the working set
                seen = set(heapq.nsmallest(k, seen))
        yield pd.DataFrame({"h": sorted(seen)[:k]})

    per_part = hs.mapInPandas(per_partition, "h string")
    return per_part.distinct().orderBy("h").limit(k)


def _hash_fraction(h: Column, digits: int = 13) -> Column:
    """First `digits` hex chars of h as an exact fraction in [0, 1):
    conv to decimal (< 2^52 -> exact in double) / 16^digits (a power of
    two -> exact exponent shift)."""
    return F.conv(F.substring(h, 1, digits), 16, 10).cast("double") / float(16 ** digits)


def kmv_overlap(
    values_a: DataFrame, values_b: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """Set-operation estimates from KMV sketches ALONE (Beyer et al.
    2007, "On synopses for distinct-value estimation under multiset
    operations"): the union sketch is the k smallest of the two
    sketches' hash union (no data re-scan), giving |A u B|; then
    |A n B| = D_A + D_B - D_U by inclusion-exclusion and the Jaccard
    estimate their ratio. One row: (est_a, est_b, est_union,
    est_inter, est_jaccard). An unsaturated sketch (< k hashes) IS the
    exact distinct count, so small sides degrade gracefully.

    Scale: each corpus is sketched with the no-shuffle per-partition
    KMV pass; everything after operates on <= 3k hash strings."""
    sa = kmv_sketch(values_a, col, k=k)
    sb = kmv_sketch(values_b, col, k=k)
    su = sa.union(sb).distinct().orderBy("h").limit(k)

    def est(sk: DataFrame, name: str) -> DataFrame:
        agg = sk.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("mx"))
        e = F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
            (F.col("n") - 1) / _hash_fraction(F.col("mx"))
        )
        return agg.select(e.alias(name))

    one = (
        est(sa, "est_a")
        .crossJoin(F.broadcast(est(sb, "est_b")))
        .crossJoin(F.broadcast(est(su, "est_union")))
    )
    inter = F.greatest(
        F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    return one.select(
        F.round("est_a", 3).alias("est_a"),
        F.round("est_b", 3).alias("est_b"),
        F.round("est_union", 3).alias("est_union"),
        F.round(inter, 3).alias("est_inter"),
        F.round(inter / F.col("est_union"), 6).alias("est_jaccard"),
    )


def cms_bucket(value: Column, row: int, width: int = 1024) -> Column:
    """Deterministic count-min bucket for hash row `row`: first 8 hex
    chars of md5('<row>:' || value) as an int, mod width. Exactly
    reproducible in any engine with md5 (the minhash convention)."""
    h = F.md5(F.concat(F.lit(f"{row}:"), value))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast("int")


def cms_sketch(
    values: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the d x w counter table: (row, bucket, cnt). ONE map-side
    explode (each element emits its d (row, bucket) cells) + ONE partial
    aggregation on a key space of at most d*w cells — the shuffle moves
    bounded partial sums regardless of corpus size, and the result is a
    tiny table (4k cells here) that broadcasts to probes."""
    cells = values.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cms_bucket(F.col(col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c")
    ).select("c.row", "c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for every probe value: min over the d
    counters (0 when a cell is empty). The sketch side broadcasts."""
    keyed = probes.select(
        F.col(col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    cms_bucket(F.col(col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("c"),
    ).select(col, "c.row", "c.bucket")
    joined = keyed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("cms_n")
    )


def kmv_distinct_estimate(values: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: (k, est_distinct, kth_hash) — the KMV
    estimate (k-1)/U with U the k-th smallest normalized hash. The
    caller can attach an exact count for validation at test scale; at
    production scale the estimate IS the product."""
    sk = kmv_sketch(values, col, k=k)
    agg = sk.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        "k",
        F.round((F.col("k") - 1) / _hash_fraction(F.col("kth_hash")), 3).alias(
            "est_distinct"
        ),
        "kth_hash",
    )
