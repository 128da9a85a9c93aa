"""Bounded-fanout guards for keys whose REAL-data cardinality is
unbounded.

The recurring failure class (round-9/10 verdicts): an operator groups or
self-joins on a key that is *logically* bounded (a 5-minute bucket, an
LSH band bucket, a k-means cluster, a shingle) but whose *per-key row
count* on real data is not — one incident-storm bucket or boilerplate
shingle turns a linear plan into a quadratic one. Three instances have
been fixed ad hoc (perplexity's probe-or-threshold path, the
block-chunked cosine pair matrices, pack_sequences' sub-sharded prefix
sum). This module is the shared primitive for the remaining class:
deterministic min-K retention per key, the same convention IVFFlat uses
for its fixed-size probe lists (reference: src/backend/access/ivfscan.c
probes `lists` fixed-size inverted lists, never the full corpus).

Determinism contract: the cap keeps the FIRST ``k`` rows per key under a
total order (``row_number`` over explicit ORDER BY columns — ties must
be impossible, i.e. the order columns must be a per-key unique key), so
an exact SQL oracle replays the cap with the same ``row_number`` CTE and
both engines keep byte-identical survivor sets.

Cost: one window sort per key. A hot key of n rows costs O(n log n) in
ONE task — linear-ish and bounded by the input, unlike the O(n^2) join
blowup it prevents. For keys so hot that even one task's sort is a
problem, pre-aggregate or sub-shard first (the pack_sequences pattern).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Keep the first ``k`` rows per ``key_cols`` group under the total
    order given by ``order_cols`` (ascending; must be unique within a
    key for cross-engine determinism). Oracle mirror::

        SELECT ... FROM (SELECT ..., row_number() OVER (
            PARTITION BY <keys> ORDER BY <order>) AS rn FROM t)
        WHERE rn <= k
    """
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        df.withColumn("_guard_rn", F.row_number().over(w))
        .filter(F.col("_guard_rn") <= k)
        .drop("_guard_rn")
    )
