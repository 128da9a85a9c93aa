"""Vector similarity search (reference: pgvector-style distances,
src/backend/utils/adt/vector.c, and the IVFFlat index,
src/backend/access/ivf*.c — re-designed for batch analytics).

Distances are pure Column expressions (zip_with + aggregate → sequential
double folds, identical to a SQL oracle's evaluation order). Top-k is a
window over a broadcast candidate join.

The quadratic operators (near-dup pairs) run as Arrow-batched
applyInPandas per bucket: the bucket group is the unit of work, pairwise
sims are computed with numpy accumulated DIM-BY-DIM so the float fold
order is exactly the sequential left-associated fold a SQL oracle uses —
vectorized across the pair matrix, bit-identical to the per-pair chain.
Bucket assignment (the 'index build') is a random-hyperplane LSH pass
(mapInPandas, one narrow scan, shuffle-free) — the SimHash-projection
analog of the reference's IVF k-means build (ivfkmeans.c:512).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
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
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries/corpus: (id, vec[, bucket]). Output (q, n, sim, rn), rn<=k.
    With bucket_col set, candidates are restricted to the query's bucket
    (IVF probe=1). Without it, a broadcast of the query set keeps the
    corpus scan shuffle-free until the final per-query top-k.

    The broadcast is GUARDED: a query set beyond max_broadcast_queries
    rows (one cheap limit-probe job, no full count) falls back to a
    plain join so an unbounded query set cannot OOM the executors —
    top-k probes are the design point, query==corpus self-joins the
    exception.
    """
    probe = queries.limit(max_broadcast_queries + 1).count()
    small = probe <= max_broadcast_queries
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
    qside = F.broadcast(q) if small else q
    cond = F.col("q") != F.col("n")
    if bucket_col:
        joined = c.join(qside, (F.col("qb") == F.col("nb")) & cond)
    else:
        joined = c.join(qside, cond)
    sims = joined.select(
        "q",
        "n",
        F.round(_dotd(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6).alias("sim"),
    )
    w = W.partitionBy("q").orderBy(F.col("sim").desc(), F.col("n"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


# -- near-duplicate pairs (quadratic within bucket) ------------------------


def neardup_pairs_cosine(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    threshold: float = 0.95,
    block_rows: int = 2048,
) -> DataFrame:
    """Embedding near-duplicate pairs (a < b, round(cosine,6) >= t)
    within buckets.

    The bucket bounds the quadratic blow-up. Instead of a per-bucket
    SQL self-join (which materializes both vectors per candidate pair
    through the shuffle), each bucket group is handed to an Arrow
    batch: the shuffle moves each vector ONCE, and the pair matrix is
    computed with numpy outer products accumulated dim-by-dim — the
    identical left-associated float fold a sequential SQL evaluation
    uses, so results are bit-equal to the oracle. At 100 TB the bucket
    count (LSH planes / k-means k) is chosen so a bucket fits an
    executor; the shuffle volume is |V| vectors, not |pairs|.

    Skew hardening: an oversized or skewed bucket must not materialize
    its full n x n pair matrix in one task's memory. Buckets larger
    than ``block_rows`` are pair-scanned block x block (upper-triangle
    block walk), capping the live similarity matrix at
    block_rows^2 doubles (~33 MB at the 2048 default) regardless of
    bucket size; each entry's dim-by-dim accumulation is unchanged, so
    chunking is bit-exact with the monolithic matrix. Time within one
    skewed bucket is still quadratic — the cure for that is more
    buckets — but memory no longer is.
    """

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        empty = pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
        if n < 2:
            return empty
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy()
        V = np.stack(pdf["__v"].to_numpy()).astype(np.float64)  # n x d
        d = V.shape[1]
        # squared norms DIM BY DIM: sum_i v_i*v_i in index order,
        # left-associated — exactly the sequential fold of
        # list_dot_product / F.aggregate
        sq = np.zeros(n)
        for i in range(d):
            c = V[:, i]
            sq += c * c
        nrm = np.sqrt(sq)
        B = max(int(block_rows), 2)
        parts = []
        for bi in range(0, n, B):
            Va = V[bi : bi + B]
            na = len(Va)
            for bj in range(bi, n, B):
                Vb = V[bj : bj + B]
                nb = len(Vb)
                # G[a,b] = sum_i va_i*vb_i accumulated dim-by-dim: the
                # same per-entry arithmetic as the full matrix, so the
                # block walk is bit-exact
                G = np.zeros((na, nb))
                for i in range(d):
                    G += np.outer(Va[:, i], Vb[:, i])
                S = np.round(G / np.outer(nrm[bi : bi + B], nrm[bj : bj + B]), 6)
                if bi == bj:
                    iu, ju = np.triu_indices(na, k=1)
                else:
                    iu, ju = np.indices((na, nb))
                    iu, ju = iu.ravel(), ju.ravel()
                keep = S[iu, ju] >= threshold
                if keep.any():
                    parts.append(
                        pd.DataFrame(
                            {
                                "a": ids[bi + iu[keep]],
                                "b": ids[bj + ju[keep]],
                                "sim": S[iu, ju][keep],
                            }
                        )
                    )
        if not parts:
            return empty
        return pd.concat(parts, ignore_index=True)

    narrow = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), F.col(bucket_col).alias("__bk")
    )
    return narrow.groupBy("__bk").applyInPandas(per_bucket, "a long, b long, sim double")


# -- random-hyperplane LSH bucketing --------------------------------------


def lsh_plane_weight(p: int, d: int) -> int:
    """Deterministic pseudo-random hyperplane weight in [-48, 48]: small
    integers so BOTH engines (Spark and a SQL oracle) evaluate the exact
    same arithmetic — no RNG state to ship, no float divergence. The
    analog of the reference's sampled k-means centroids (ivfkmeans.c:512)
    re-cast as SimHash-style signed projections."""
    return ((p * 73 + d * 7919) % 97) - 48


def lsh_assign(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = 8, out_col: str = "__lsh"
) -> DataFrame:
    """Bucket id in [0, 2^n_planes): bit p = sign of the projection onto
    plane p. mapInPandas over the narrow (id, vec) projection — one
    Arrow-batched pass, no shuffle; projections are accumulated
    dim-by-dim so the fold order matches a SQL oracle's chained sum."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights: dict[int, "np.ndarray"] = {}
        for pdf in batches:
            if len(pdf) == 0:
                out = pdf.copy()
                out[out_col] = pd.Series(dtype="int64")
                yield out
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = V.shape[1]
            if d not in weights:
                weights[d] = np.array(
                    [[float(lsh_plane_weight(p, i)) for i in range(d)] for p in range(n_planes)]
                )
            Wm = weights[d]
            bucket = np.zeros(len(pdf), dtype=np.int64)
            for p in range(n_planes):
                acc = V[:, 0] * Wm[p, 0]
                for i in range(1, d):
                    acc = acc + V[:, i] * Wm[p, i]
                bucket += (acc >= 0).astype(np.int64) << p
            out = pdf.copy()
            out[out_col] = bucket
            yield out

    schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.LongType())])
    return df.mapInPandas(gen, schema)


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    iters: int = 2,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    with k-means, then inside each cluster drop every vector that has a
    LOWER-id neighbor with cosine >= threshold — semantic duplicates
    that exact/MinHash dedup cannot see. Deterministic keeper rule
    (min id survives) instead of the paper's random representative so
    both engines agree row-for-row.

    Returns (id_col, cluster, keep): one row per input vector.

    Scale design (100 TB): k-means assignment is a pure projection
    (clustering.py — centroids travel as plan literals); the quadratic
    pair scan is confined within a cluster (the SemDeDup premise: k
    grows with the corpus so cluster sizes stay bounded) and rides the
    same one-shuffle applyInPandas pair matrix as neardup_pairs_cosine
    — each vector moves once, pairs never shuffle. The final keep flag
    is a cluster-key-partitioned left-anti lookup of the dropped-id
    set, which is at most one id per duplicate pair."""
    from postgraph_spark.operators.clustering import kmeans

    clustered, _cent = kmeans(df, vec_col, id_col, k=k, iters=iters)
    pairs = neardup_pairs_cosine(
        clustered, id_col=id_col, vec_col=vec_col, bucket_col="cluster",
        threshold=threshold,
    )
    # pairs emit a < b, so the dropped set is exactly the distinct b side
    dropped = pairs.select(F.col("b").alias(id_col)).distinct().withColumn(
        "__dropped", F.lit(True)
    )
    return (
        clustered.select(F.col(id_col), F.col("cluster").cast("long").alias("cluster"))
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.col("__dropped").isNull().alias("keep"),
        )
    )


def neardup_pairs_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
) -> DataFrame:
    """Near-dup pairs with a REAL bucketing stage: random-hyperplane LSH
    assignment (no pre-existing bucket column), then the per-bucket pair
    matrix of neardup_pairs_cosine. probe=1: pairs split across buckets
    are missed — the standard LSH recall/cost trade (recall rises with
    fewer planes or multi-probe)."""
    narrow = df.select(F.col(id_col), F.col(vec_col))
    bucketed = lsh_assign(narrow, vec_col=vec_col, n_planes=n_planes)
    return neardup_pairs_cosine(
        bucketed, id_col=id_col, vec_col=vec_col, bucket_col="__lsh", threshold=threshold
    )


# -- trained IVF (k-means coarse quantizer) --------------------------------


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 2,
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """IVFFlat with a TRAINED coarse quantizer (ivfkmeans.c + ivfscan):
    k-means (operators/clustering.py — deterministic init, pure-
    projection assignment) partitions the corpus into nlist inverted
    lists; each query probes its `nprobe` nearest centroids and ranks
    candidates from those lists only.

    Scale shape: training = iters hash aggregations; list assignment and
    query probing are projections (centroids are plan literals); the
    candidate join is an EQUI join on the list id — the recall/cost dial
    is nprobe, never an all-pairs pass."""
    from postgraph_spark.operators.clustering import _sq_dist, kmeans

    assigned, cents = kmeans(corpus, vec_col, id_col, k=nlist, iters=iters)
    v = _d(F.col(vec_col))
    cand = F.array(
        *[
            F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(cents)
        ]
    )
    probe_lists = F.transform(F.slice(F.array_sort(cand), 1, nprobe), lambda s: s["i"])
    q = queries.select(
        F.col(id_col).alias("q"),
        _d(F.col(vec_col)).alias("qv"),
        l2_norm(F.col(vec_col)).alias("qn"),
        F.explode(probe_lists).alias("list"),
    )
    c = assigned.select(
        F.col(id_col).alias("n"),
        _d(F.col(vec_col)).alias("nv"),
        l2_norm(F.col(vec_col)).alias("nn"),
        F.col("cluster").alias("list"),
    )
    # guarded broadcast (same limit-probe discipline as brute_force_topk):
    # an unbounded query set falls back to a shuffle equi-join
    small = queries.limit(max_broadcast_queries + 1).count() <= max_broadcast_queries
    sims = (
        c.join(F.broadcast(q) if small else q, ["list"])
        .filter(F.col("q") != F.col("n"))
        .select(
            "q", "n",
            F.round(_dotd(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn")), 6).alias("sim"),
        )
    )
    w = W.partitionBy("q").orderBy(F.col("sim").desc(), F.col("n"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


# -- IVF-PQ: coarse quantizer + product-quantized ADC scoring ---------------


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 4,
    ksub: int = 8,
    iters: int = 2,
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """IVF-PQ approximate nearest neighbor — the Faiss IVFPQ layout, the
    ANN configuration that actually survives 100 TB: a trained coarse
    quantizer prunes the corpus to nprobe inverted lists, and candidate
    scoring reads ONLY m small PQ codes per row via asymmetric distance
    computation (ADC: Jegou et al., "Product Quantization for Nearest
    Neighbor Search", TPAMI 2011) — the full vectors are never touched
    after the one-time encode.

    Scale design:
    - Encode (one-time, amortized like an index build — the batch analog
      of the reference's IVF build, src/backend/access/ivfflat): one pure
      projection emits (id, list, code0..code{m-1}); the codes table is
      dim*4/m-fold smaller than the vectors (64-dim float -> 4 longs).
    - Query: each query computes its own ADC lookup table as a plan-side
      expression — per subspace, an array of ksub distances
      ||q_sub - codebook[j][c]||^2 with the codebooks as literals. The
      LUT columns are m arrays of ksub doubles per query row.
    - Candidates: equi-join on list id (broadcast when the query set is
      small, limit-probe-guarded); score = element_at(lut_j, code_j)
      summed left-to-right — integer array indexing, no vector math in
      the join. The recall dials are nprobe and m/ksub, never an
      all-pairs pass.

    Simplification vs Faiss: codes quantize the RAW vectors, not the
    residual (v - coarse_centroid), so the LUT is list-independent and
    each query computes it once. Residual encoding would make the LUT a
    per-(query, probed-list) expression — same shape, m*nprobe arrays.

    Determinism: both trainings are kmeans()/pq_train() (smallest-id
    init, left-to-right folds, lowest-index ties); LUT entries fold
    left-to-right; ADC adds subspace terms 0..m-1 in order; ties in the
    top-k break on the neighbor id — a SQL oracle replaying the same
    rounds reproduces every row bit-for-bit (up to one final rounding).
    """
    from postgraph_spark.operators.clustering import (
        _argmin_dist,
        _sq_dist,
        kmeans,
        pq_train,
    )

    assigned, cents = kmeans(corpus, vec_col, id_col, k=nlist, iters=iters)
    codebooks = pq_train(corpus, vec_col, id_col, m=m, ksub=ksub, iters=iters)
    sub = len(codebooks[0][0])

    # corpus -> (n, list, code0..code{m-1}): ONE pure projection
    v = _d(F.col(vec_col))
    code_cols = [
        _argmin_dist(F.slice(v, j * sub + 1, sub), cb)["i"].cast("int").alias(f"code{j}")
        for j, cb in enumerate(codebooks)
    ]
    codes = assigned.select(
        F.col(id_col).alias("n"), F.col("cluster").alias("list"), *code_cols
    )

    # query -> (q, list, lut0..lut{m-1}): probe lists + per-subspace ADC LUTs
    cand = F.array(
        *[
            F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(cents)
        ]
    )
    probe_lists = F.transform(F.slice(F.array_sort(cand), 1, nprobe), lambda s: s["i"])
    def _lut(cb: list[list[float]], qsub: Column) -> Column:
        # NOTE: the inner lambda must take exactly ONE arg — a two-arg
        # lambda is PySpark's (element, index) form, which would bind a
        # captured default to the index
        from postgraph_spark.operators.clustering import lit_matrix

        cbmat = lit_matrix(cb)
        return F.transform(
            cbmat,
            lambda cv: F.aggregate(
                F.zip_with(qsub, cv, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, val: acc + val,
            ),
        )

    lut_cols = [
        _lut(cb, F.slice(v, j * sub + 1, sub)).alias(f"lut{j}")
        for j, cb in enumerate(codebooks)
    ]
    q = queries.select(
        F.col(id_col).alias("q"),
        F.explode(probe_lists).alias("list"),
        *lut_cols,
    )

    small = queries.limit(max_broadcast_queries + 1).count() <= max_broadcast_queries
    adc = F.lit(0.0)
    for j in range(m):
        adc = adc + F.element_at(F.col(f"lut{j}"), F.col(f"code{j}") + 1)
    scored = (
        codes.join(F.broadcast(q) if small else q, ["list"])
        .filter(F.col("q") != F.col("n"))
        .select("q", "n", F.round(adc, 6).alias("adc"))
    )
    w = W.partitionBy("q").orderBy(F.col("adc").asc(), F.col("n"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
