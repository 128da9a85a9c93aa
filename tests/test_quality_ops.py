"""SemDeDup semantic dedup + Gopher document-filter rule semantics."""

import pyspark.sql.functions as F
import pytest

from postgraph_spark.functions import text as TX
from postgraph_spark.operators import similarity as SIM
from tests.conftest import SF_DIR


def test_semdedup_keep_iff_no_smaller_neighbor(spark):
    """keep=false exactly for vectors with a LOWER-id same-cluster
    neighbor at round(cos,6) >= t; the min id of every dup group
    survives."""
    from postgraph_spark.operators.clustering import kmeans

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = SIM.semdedup(emb, k=10, iters=2, threshold=0.4)
    clustered, _ = kmeans(emb, "embedding", "vec_id", k=10, iters=2)
    pairs = SIM.neardup_pairs_cosine(
        clustered, bucket_col="cluster", threshold=0.4
    ).collect()
    dropped = {r["b"] for r in pairs}
    rows = out.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert r["keep"] == (r["vec_id"] not in dropped), r
    # at least one pair fires on this corpus so the rule is exercised
    assert dropped
    # the smaller side of every pair is kept unless itself dominated
    smaller = {r["a"] for r in pairs} - dropped
    kept = {r["vec_id"] for r in rows if r["keep"]}
    assert smaller <= kept


def test_semdedup_schema_and_clusters(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = SIM.semdedup(emb, k=10, iters=2, threshold=0.4)
    assert out.columns == ["vec_id", "cluster", "keep"]
    assert dict(out.dtypes)["cluster"] == "bigint"
    n_clusters = out.select("cluster").distinct().count()
    assert 1 < n_clusters <= 10


@pytest.fixture(scope="module")
def gopher_df(spark):
    rows = [
        # id, text
        (0, " ".join(["the analyse word"] * 20)),        # passes everything
        (1, "too short the"),                             # fails word count
        (2, " ".join(["the"] + ["antidisestablishmentarianism"] * 60)),  # long words
        (3, " ".join(["the 123 456 789"] * 15)),          # <80% alphabetic
        (4, "- the one\n- the two\n- the three"),          # all bullet lines
        (5, ("the trail off... \n" * 10).strip()),         # ellipsis lines
        (6, " ".join(["the ###### word word"] * 15)),      # symbol ratio
        (7, " ".join(["word alone here"] * 20)),           # no stop words
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_gopher_rule_verdicts(spark, gopher_df):
    rules = TX.gopher_rules(F.col("text"), min_stop_words=1)
    got = {
        r["doc_id"]: r
        for r in gopher_df.select(
            "doc_id", *[c.alias(n) for n, c in rules.items()]
        ).collect()
    }
    assert got[0]["keep"]
    assert not got[1]["r_word_count"] and not got[1]["keep"]
    assert not got[2]["r_mean_word_len"]
    assert not got[3]["r_alpha_words"]
    assert not got[4]["r_bullet_lines"]
    assert not got[5]["r_ellipsis_lines"]
    assert not got[6]["r_symbol_ratio"]
    assert not got[7]["r_stopwords"]
    # keep is exactly the conjunction of the named rules
    for r in got.values():
        names = [
            "r_word_count", "r_mean_word_len", "r_symbol_ratio",
            "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
            "r_stopwords",
        ]
        assert r["keep"] == all(r[n] for n in names)


def test_gopher_published_stop_minimum(spark):
    """With the published min of 2 distinct stop words, a 'the'-only
    document fails; adding a second list word passes."""
    df = spark.createDataFrame(
        [(0, " ".join(["the word data"] * 20)),
         (1, " ".join(["the word with"] * 20))],
        ["doc_id", "text"],
    )
    rules = TX.gopher_rules(F.col("text"))  # default min_stop_words=2
    got = {r["doc_id"]: r["r_stopwords"] for r in
           df.select("doc_id", rules["r_stopwords"].alias("r_stopwords")).collect()}
    assert got == {0: False, 1: True}


def test_pmi_cooccurrence_semantics(spark, tmp_path):
    """PMI of a pair present in every doc with half-frequency marginals
    is exactly log2(N * n12 / (df1 * df2))."""
    import math

    rows = []
    # 'alpha beta' co-occur in all 10 docs; 'gamma' in 5 of them
    for i in range(10):
        text = "alpha beta" + (" gamma" if i % 2 == 0 else "")
        rows.append((i, text, "en", "s", len(text)))
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/documents.parquet")
    from postgraph_spark.queries import QUERIES

    got = {(r.t1, r.t2): r for r in QUERIES["pmi_cooccurrence"](spark, sf).collect()}
    ab = got[("alpha", "beta")]
    assert ab.n12 == 10
    assert ab.pmi == round(math.log2(10 * 10 / (10 * 10)), 6) == 0.0
    ag = got[("alpha", "gamma")]
    assert ag.n12 == 5
    assert ag.pmi == round(math.log2(5 * 10 / (10 * 5)), 6) == 0.0
    # and a positively-associated pair: beta+gamma same as alpha+gamma
    assert ("beta", "gamma") in got


def test_pack_sequences_is_gapless_per_source(spark):
    from postgraph_spark.queries import QUERIES

    rows = QUERIES["pack_sequences"](spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rs:
            assert r.start_tok == cum, (src, r)
            assert r.bin_id == cum // 256
            cum += r.n_tok


def test_pack_sequences_sharding_is_bit_exact(spark):
    """The two-level prefix sum (contiguous doc_id sub-shards + broadcast
    shard bases) must equal the single-window cumsum exactly: a tiny
    shard_span forces MANY shards per source and the output must be
    byte-identical to the default (one shard covers everything at
    sf0.01)."""
    from postgraph_spark.queries.llm_ops import pack_sequences

    one = sorted(map(tuple, pack_sequences(spark, SF_DIR).collect()))
    many = sorted(
        map(tuple, pack_sequences(spark, SF_DIR, shard_span=7).collect())
    )
    assert one == many
    assert len(one) == 500


def test_neardup_block_chunking_is_bit_exact(spark):
    """An oversized bucket must be pair-scanned block x block without
    changing a single pair: force MANY tiny blocks (block_rows=3) on a
    single 500-vector bucket and compare against the monolithic matrix
    (block_rows large enough to cover the bucket in one block)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "one", F.lit(1)
    )
    mono = sorted(
        map(
            tuple,
            SIM.neardup_pairs_cosine(
                emb, bucket_col="one", threshold=0.4, block_rows=1 << 20
            ).collect(),
        )
    )
    chunked = sorted(
        map(
            tuple,
            SIM.neardup_pairs_cosine(
                emb, bucket_col="one", threshold=0.4, block_rows=3
            ).collect(),
        )
    )
    assert mono == chunked
    assert mono  # the corpus fires pairs at this threshold


def test_winnow_fingerprints_matches_textbook_reference(spark, tmp_path):
    """Engine output must equal naive textbook winnowing (min of every
    w-window of k-gram hashes, RIGHTMOST position on ties) computed in
    plain Python over utf-8 BYTES — including tie-heavy repetitive text
    and multi-byte characters."""
    import duckdb

    from postgraph_spark.queries import ORACLES, QUERIES
    from postgraph_spark.queries.llm_ops import _RK_COEF, _WIN_W

    texts = [
        (0, "abababababababab"),          # all-tie windows
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "café naïve 中文 rolling bytes"),  # multi-byte utf-8
        (3, "short"),                      # < 11 bytes: no fingerprints
        (4, "aaaaaaaaaaaaaaaaaaaa"),       # single repeated hash
    ]
    df = spark.createDataFrame(
        [(i, s, "en", "s", len(s)) for i, s in texts],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/documents.parquet")

    def ref(doc_id, s):
        b = s.encode("utf-8")
        hs = [
            sum(b[j + i] * c for i, c in enumerate(_RK_COEF))
            for j in range(len(b) - 7)
        ]
        out = set()
        for st in range(len(hs) - _WIN_W + 1):
            win = hs[st : st + _WIN_W]
            m = min(win)
            rp = max(i for i, x in enumerate(win) if x == m)
            out.add((doc_id, st + rp + 1, m))  # 1-based position
        return out

    want = sorted(set().union(*(ref(i, s) for i, s in texts)))
    got = sorted(
        map(tuple, QUERIES["winnow_fingerprints"](spark, sf).collect())
    )
    assert got == want
    assert not any(d == 3 for d, _, _ in got)  # short doc excluded

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    try:
        orows = sorted(map(tuple, con.execute(ORACLES["winnow_fingerprints"]).fetchall()))
        assert orows == want
    finally:
        con.close()
