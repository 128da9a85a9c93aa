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


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct k-shingles per document: (id, shingle)."""
    return (
        df.select(F.col(id_col), F.explode(F.array_distinct(shingles(tokens(F.col(text_col)), k))).alias("shingle"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int = 8, k: int = 3
) -> DataFrame:
    """Long-form MinHash signature: (id, h (hash index), minhash).

    h_i(s) = substr(md5(i || s), 1, 8) compared lexicographically — engine
    portable and deterministic. Per-doc min is a map-side partial agg, so
    the shuffle carries n_hashes rows per document.
    """
    sh = doc_shingles(df, id_col, text_col, k)
    hs = sh.select(
        F.col(id_col), "shingle", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("h")
    )
    return (
        hs.select(
            F.col(id_col),
            "h",
            F.substring(F.md5(F.concat(F.col("h").cast("string"), F.col("shingle"))), 1, 8).alias("hv"),
        )
        .groupBy(id_col, "h")
        .agg(F.min("hv").alias("minhash"))
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b) sharing >= 1 band bucket.

    Band key = md5 of the concatenated signature rows of the band. The
    only all-to-all operation is the equi-join on (band, bucket) — skew
    (a giant bucket of boilerplate docs) is handled by AQE skew-join.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, k)
    band_keys = (
        sig.withColumn("band", (F.col("h") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.md5(F.array_join(F.array_sort(F.collect_list(F.concat_ws(":", "h", "minhash"))), "|")).alias("bucket"))
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
    sh = doc_shingles(df, id_col, text_col, k)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn("jac", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
        .filter(F.col("jac") >= threshold)
        .select("a", "b", "jac")
    )


_HEX = "0123456789abcdef"


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash per document: (id, simhash).

    Per-token 32-bit hash = first 8 hex chars of md5(token); each bit
    votes +1/-1 weighted by occurrence; sign of the vote sets the output
    bit. Pure expressions + one groupBy — fully distributed, and exactly
    reproducible in the SQL oracle.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
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
