"""Vector similarity search (reference: pgvector-style distances,
src/backend/utils/adt/vector.c, and the IVFFlat index,
src/backend/access/ivf*.c — re-designed for batch analytics).

Distances are pure Column expressions (zip_with + aggregate → sequential
double folds, identical to a SQL oracle's evaluation order). Top-k is a
window over the candidate join; the IVF variant restricts candidates to
a cluster/bucket column, turning the all-pairs join into a per-bucket
join — the 100 TB path (bucket by k-means centroid, shuffle on bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _d(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """inner_product (vector.c: gtype_inner_product)."""
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _dotd(a: Column, b: Column) -> Column:
    """dot over arrays already cast to double (skips the per-pair cast)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_d(a), F.lit(0.0), lambda acc, x: acc + x * x))


def l2_distance(a: Column, b: Column) -> Column:
    """`<->` (vector.c: gtype_l2_distance)."""
    return F.sqrt(
        F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x)
    )


def l1_distance(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(_d(a), _d(b), lambda x, y: F.abs(x - y)), F.lit(0.0), lambda acc, x: acc + x)


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """`<=>` (vector.c: gtype_cosine_distance)."""
    return 1 - cosine_similarity(a, b)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries/corpus: (id, vec[, bucket]). Output (q, n, sim, rn), rn<=k.
    With bucket_col set, candidates are restricted to the query's bucket
    (IVF probe=1). Without it, a broadcast of the query set keeps the
    corpus scan shuffle-free until the final per-query top-k.
    """
    # norms are computed per ROW before the join (one O(d) fold per vector,
    # not one per candidate pair — a 3x cut in per-pair float work)
    q = queries.select(
        F.col(id_col).alias("q"),
        _d(F.col(vec_col)).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        *([F.col(bucket_col).alias("qb")] if bucket_col else []),
    )
    c = corpus.select(
        F.col(id_col).alias("n"),
        _d(F.col(vec_col)).alias("nv"),
        l2_norm(F.col(vec_col)).alias("nn"),
        *([F.col(bucket_col).alias("nb")] if bucket_col else []),
    )
    cond = F.col("q") != F.col("n")
    if bucket_col:
        joined = c.join(F.broadcast(q), (F.col("qb") == F.col("nb")) & cond)
    else:
        joined = c.join(F.broadcast(q), cond)
    sims = joined.select(
        "q",
        "n",
        F.round(_dotd(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6).alias("sim"),
    )
    w = W.partitionBy("q").orderBy(F.col("sim").desc(), F.col("n"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def neardup_pairs_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs (a < b, cosine >= t) within buckets.

    The bucket column bounds the quadratic blow-up: per-bucket self-join
    (shuffle on bucket) instead of a full cross join. At scale the bucket
    is a k-means/LSH assignment; recall is traded per probe count.
    """
    # per-row norm + pre-cast before the self-join (see brute_force_topk)
    a = df.select(
        F.col(id_col).alias("a"),
        _d(F.col(vec_col)).alias("av"),
        l2_norm(F.col(vec_col)).alias("an"),
        F.col(bucket_col).alias("bk"),
    )
    b = df.select(
        F.col(id_col).alias("b"),
        _d(F.col(vec_col)).alias("bv"),
        l2_norm(F.col(vec_col)).alias("bn"),
        F.col(bucket_col).alias("bk"),
    )
    return (
        a.join(b, "bk")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(_dotd(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
