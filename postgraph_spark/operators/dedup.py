"""Deduplication operators for large-scale corpus curation.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup, all expressed as
shuffle-based DataFrame pipelines with no driver-side state — the layout
that scales to 100 TB:

- exact: hash -> groupBy (one shuffle on the 16-byte digest).
- MinHash/LSH: shingle -> per-doc signature (map-side agg) -> band
  buckets -> self-join on bucket (shuffle on band key, never all-pairs).
- Jaccard verify: inverted-index join on shingle (shuffle on shingle),
  candidate pair counts vs set sizes — the classic set-similarity join.
- SimHash: per-token bit votes aggregated per doc (map-side partial agg).

Hashing uses md5 prefixes (not murmur) so signatures are reproducible
across engines — the DuckDB oracles compute the identical pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postgraph_spark.functions.text import shingles, tokens


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, cnt, min_id)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("keep_id"))
        .filter(F.col("cnt") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id representative per exact fingerprint."""
    fp = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
    keep = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return keep.select(id_col)


def _spread(df: DataFrame) -> DataFrame:
    """Widen under-partitioned input to the cluster's parallelism before
    CPU-heavy per-row work (tokenize/shingle/hash). A single small parquet
    file arrives as ONE partition — without this every shingle of the
    corpus is computed on one core. No-op when the input is already at
    least as wide (the 100 TB case)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-shingles per document: (id, shingle)."""
    return (
        _spread(df).select(
            F.col(id_col), F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), k))).alias("shingle")
        )
    )


def _minhash_wide(df: DataFrame, id_col: str, text_col: str, n_hashes: int, k: int) -> DataFrame:
    """Wide MinHash: one row per doc, columns m0..m{n-1}.

    h_i(s) = substr(md5(i || s), 1, 8) compared lexicographically — engine
    portable and deterministic. All n hashes are computed in ONE projection
    per shingle row and min-aggregated as n parallel partial aggs, so the
    shuffle carries one narrow row per document (not n_hashes x shingles
    rows — that long-form shape was 8x the rows for the same result)."""
    sh = doc_shingles(df, id_col, text_col, k)
    hv = sh.select(
        F.col(id_col),
        *[
            F.substring(F.md5(F.concat(F.lit(str(i)), F.col("shingle"))), 1, 8).alias(f"hv{i}")
            for i in range(n_hashes)
        ],
    )
    return hv.groupBy(id_col).agg(*[F.min(f"hv{i}").alias(f"m{i}") for i in range(n_hashes)])


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 8, k: int = 3
) -> DataFrame:
    """Long-form MinHash signature: (id, h (hash index), minhash) — the
    wide per-doc aggregate unpivoted at the end (docs x n rows, cheap)."""
    wide = _minhash_wide(df, id_col, text_col, n_hashes, k)
    stack = ", ".join(f"{i}, m{i}" for i in range(n_hashes))
    return wide.selectExpr(id_col, f"stack({n_hashes}, {stack}) AS (h, minhash)")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b) sharing >= 1 band bucket.

    Band key = md5 of the band's lex-sorted 'h:minhash' strings, built
    straight from the wide signature columns (no per-band shuffle). The
    only all-to-all operation is the equi-join on (band, bucket) — skew
    (a giant bucket of boilerplate docs) is handled by AQE skew-join.
    """
    rows_per_band = n_hashes // bands
    wide = _minhash_wide(df, id_col, text_col, n_hashes, k)
    band_structs = []
    for b in range(bands):
        parts = [
            F.concat(F.lit(f"{h}:"), F.col(f"m{h}"))
            for h in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        bucket = F.md5(F.array_join(F.array_sort(F.array(*parts)), "|"))
        band_structs.append(F.struct(F.lit(b).alias("band"), bucket.alias("bucket")))
    band_keys = wide.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = band_keys.select(F.col(id_col).alias("a"), "band", "bucket")
    b = band_keys.select(F.col(id_col).alias("b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs (a < b, jac >= t).

    Inverted-index self-join on shingle: only documents sharing at least
    one shingle ever meet, so cost is sum over shingles of freq^2 — the
    standard scalable set-similarity join (prefix filtering would trim
    further; omitted for clarity).
    """
    # The join key is the 64-bit shingle hash, not the text — the same
    # equality classes (collisions negligible at 2^-64) with far smaller
    # shuffle rows. Self-joining ONE plan via alias lets Spark reuse the
    # shuffle exchange for both sides; the tiny per-doc size table joins
    # back by broadcast, so the only large shuffle is the inverted-index
    # join itself.
    sh = doc_shingles(df, id_col, text_col, k).select(
        F.col(id_col).alias("id"), F.xxhash64("shingle").alias("shingle")
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), F.col("x.shingle") == F.col("y.shingle"))
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .withColumn(
            "jac", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6)
        )
        .filter(F.col("jac") >= threshold)
        .select("a", "b", "jac")
    )


_HEX = "0123456789abcdef"


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash per document: (id, simhash).

    Per-token 32-bit hash = first 8 hex chars of md5(token); each bit
    votes +1/-1 weighted by occurrence; sign of the vote sets the output
    bit. Pure expressions + one groupBy — fully distributed, and exactly
    reproducible in the SQL oracle. (The md5 is computed in its own
    projection BEFORE the 32-bit explode; folding it into per-bit agg
    expressions re-evaluates it 32x — aggs get no common-subexpression
    elimination.)
    """
    tok = _spread(df).select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    tok = tok.withColumn("th", F.substring(F.md5("tok"), 1, 8))
    bits = tok.select(
        F.col(id_col),
        "th",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"),
    )
    # SQL expressions: shiftright/shiftleft need expression shift amounts
    vote = F.expr(
        f"(shiftright(instr('{_HEX}', substring(th, CAST(b / 4 AS INT) + 1, 1)) - 1,"
        f"            CAST(b % 4 AS INT)) & 1) * 2 - 1"
    )
    votes = bits.select(F.col(id_col), "b", vote.alias("vote"))
    return (
        votes.groupBy(id_col, "b")
        .agg(F.sum("vote").alias("v"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.expr("CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END")
            ).alias("simhash")
        )
    )
