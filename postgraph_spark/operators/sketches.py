"""Distributed cardinality sketches.

KMV (k-minimum-values) distinct-count estimation — the sketch a corpus
pipeline uses to size shingle space / dedup structures BEFORE paying for
an exact distinct (Bar-Yossef et al., "Counting distinct elements in a
data stream", RANDOM 2002): hash every element, keep the k smallest
distinct hashes; if the k-th smallest normalized hash is U, the distinct
count is ~ (k-1)/U.

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
