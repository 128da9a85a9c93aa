"""BPE merge-learning semantics: hand-computed merges on a tiny corpus,
left-to-right non-overlapping merge application, determinism."""

import pyspark.sql.functions as F

from postgraph_spark.operators import bpe as BPE


def test_merge_pair_left_to_right_nonoverlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["x"],), ([],)],
        ["syms"],
    )
    aa = [r[0] for r in df.select(BPE.merge_pair(F.col("syms"), "a", "a")).collect()]
    assert aa == [["aa", "a"], ["a", "b", "a", "b"], ["x"], []]
    ab = [r[0] for r in df.select(BPE.merge_pair(F.col("syms"), "a", "b")).collect()]
    assert ab == [["a", "a", "a"], ["ab", "ab"], ["x"], []]


def test_bpe_train_hand_computed(spark):
    # corpus: 'low' x3, 'lower' x1 -> symbol stats (with </w>):
    #   l o: 4, o w: 4, w </w>: 3, w e: 1, e r: 1, r </w>: 1
    # round 1: tie (l,o) vs (o,w) at 4 -> lexicographic min ('l','o')
    # round 2: ('lo','w') now 4 -> merge ('lo','w')
    # round 3: ('low','</w>') 3
    docs = spark.createDataFrame(
        [(0, "low low low lower")], ["doc_id", "text"]
    )
    _vocab, merges = BPE.bpe_train(docs, "text", rounds=3)
    assert merges == [("l", "o", 4), ("lo", "w", 4), ("low", "</w>", 3)]
    syms = {r.word: r.syms for r in _vocab.collect()}
    assert syms["low"] == ["low</w>"]
    assert syms["lower"] == ["low", "e", "r", "</w>"]


def test_bpe_train_deterministic(spark):
    docs = spark.createDataFrame(
        [(0, "aba bab abab baba ab"), (1, "bb aa ab ba")], ["doc_id", "text"]
    )
    m1 = BPE.bpe_train(docs, "text", rounds=4)[1]
    m2 = BPE.bpe_train(docs, "text", rounds=4)[1]
    assert m1 == m2 and len(m1) == 4


def test_bpe_oracle_survives_degenerate_corpus(spark, tmp_path):
    """A corpus supporting fewer than 8 merges must NOT empty the oracle's
    vocabulary chain: the merge CTE LEFT-joins the (possibly empty) argmax
    round so later rounds pass syms through unchanged — matching
    bpe_train's break-and-keep behavior. Engine and oracle must agree on
    BOTH registered BPE rows."""
    rows = [(i, "ab ab ab", "en", "s", 8) for i in range(4)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/documents.parquet")

    import duckdb

    from postgraph_spark.queries import ORACLES, QUERIES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    try:
        for name in ("bpe_learn_merges", "bpe_segment_stats"):
            srows = sorted(map(tuple, QUERIES[name](spark, sf).collect()))
            orows = sorted(map(tuple, con.execute(ORACLES[name]).fetchall()))
            assert srows == orows, (name, srows, orows)
            assert srows, name  # the degenerate corpus still yields rows
    finally:
        con.close()
