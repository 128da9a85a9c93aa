"""Round-11 pins: lazy plan construction on the registry surface
(ADVICE r10), the adamic-adar hot-bucket cap, winnowing chunking, and
the ExactSubstr operator's behavior guards."""

import os
import sys

import pytest
from pyspark.sql import DataFrame

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR  # noqa: E402

from postgraph_spark.queries.registry import QUERIES, parquet_rows  # noqa: E402


def test_parquet_rows_matches_scan(spark):
    n_footer = parquet_rows(SF_DIR, "documents")
    n_scan = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()
    assert n_footer == n_scan


@pytest.mark.parametrize(
    "name", ["dedup_jaccard_pairs", "minhash_jaccard_estimate", "pack_sequences"]
)
def test_registry_plan_build_is_lazy(spark, name, monkeypatch):
    """ADVICE r10: the size-probed operators must not run a hidden
    count job (or eager checkpoint) when their REGISTERED wrappers
    build a plan — n_docs now comes from the parquet footer."""

    def _boom(self):
        raise AssertionError("plan construction ran a Spark count job")

    monkeypatch.setattr(DataFrame, "count", _boom)
    monkeypatch.setattr(
        DataFrame,
        "localCheckpoint",
        lambda self, eager=True: (_ for _ in ()).throw(
            AssertionError("plan construction ran an eager checkpoint")
        ),
    )
    df = QUERIES[name](spark, SF_DIR)
    assert df.columns  # plan built without any eager job


# ---------------------------------------------------------------------------
# adamic_adar hot-bucket guard (round-10 verdict #1)
# ---------------------------------------------------------------------------


def test_cap_per_key_deterministic_min_k(spark):
    from postgraph_spark.operators.guards import cap_per_key

    df = spark.createDataFrame(
        [(b, u) for b in range(3) for u in range(50)], "w int, user_id int"
    )
    capped = cap_per_key(df, ["w"], ["user_id"], 7)
    rows = capped.collect()
    assert len(rows) == 3 * 7
    # min-K retention: exactly user_ids 0..6 survive in every bucket
    for b in range(3):
        assert sorted(r.user_id for r in rows if r.w == b) == list(range(7))


def test_storm_bucket_pair_growth_is_bounded(spark):
    """One oversized bucket (500 members) must emit at most K*(K-1)/2
    pair rows once membership is capped — the quadratic the round-10
    verdict flagged, proven bounded."""
    from postgraph_spark.operators.guards import cap_per_key
    from pyspark.sql import functions as F

    K = 20
    nodes = spark.createDataFrame(
        [(0, u) for u in range(500)] + [(1, u) for u in range(5)],
        "w int, user_id int",
    )
    nodes = cap_per_key(nodes, ["w"], ["user_id"], K)
    a = nodes.select(F.col("user_id").alias("a"), "w")
    b = nodes.select(F.col("user_id").alias("b"), "w")
    pairs = a.join(b, "w").filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    n = pairs.count()
    assert n <= K * (K - 1) // 2 + 5 * 4 // 2
    assert n > 0


def test_adamic_adar_degree_cap_bounds_adjacency_and_matches_uncapped(spark):
    """max_degree caps each wedge middle's fan; a NON-binding cap is
    byte-identical to the uncapped path (incl. the new dg>=2 filter,
    which is a tautology on symmetric graphs)."""
    import random

    from postgraph_spark.operators import pagerank as PR

    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src int, dst int")

    uncapped = {
        (r.a, r.b): (r.aa, r.common)
        for r in PR.adamic_adar(df, "src", "dst").collect()
    }
    nonbinding = {
        (r.a, r.b): (r.aa, r.common)
        for r in PR.adamic_adar(df, "src", "dst", max_degree=10_000).collect()
    }
    assert uncapped == nonbinding and len(uncapped) > 0

    # binding cap: a star hub of degree 400 contributes at most K^2
    # wedge rows instead of 400^2, and every score stays finite
    hub = [(999, i) for i in range(400)]
    star = spark.createDataFrame(hub, "src int, dst int")
    capped = PR.adamic_adar(star, "src", "dst", max_degree=12).collect()
    assert len(capped) <= 12 * 12
    assert all(r.aa is not None and r.aa > 0 for r in capped)


def test_adamic_adar_distinct_oriented_identical(spark):
    """distinct_oriented=True (input promised DISTINCT with src < dst)
    must give byte-identical scores to the default path — it only skips
    the symmetrizing union's provably-no-op distinct + checkpoint."""
    import random

    from postgraph_spark.operators import pagerank as PR

    rng = random.Random(23)
    pairs = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(90)})
    pairs = [(a, b) for a, b in pairs if a < b]
    df = spark.createDataFrame(pairs, "src int, dst int")

    base = {
        (r.a, r.b): (r.aa, r.common)
        for r in PR.adamic_adar(df, "src", "dst", max_degree=1000).collect()
    }
    fast = {
        (r.a, r.b): (r.aa, r.common)
        for r in PR.adamic_adar(
            df, "src", "dst", max_degree=1000, distinct_oriented=True
        ).collect()
    }
    assert base == fast and len(base) > 0


def test_adamic_adar_distinct_oriented_guard(spark):
    """ADVICE r11: a caller VIOLATING the src < dst promise must not
    silently inflate degrees — reversed rows are excluded map-side, so
    the flagged path equals the default path run on the correctly-
    oriented subset of the input."""
    from postgraph_spark.operators import pagerank as PR

    good = [(0, 1), (0, 2), (1, 3), (2, 3), (1, 2)]
    bad = good + [(2, 0), (3, 1)]  # reversed duplicates of real edges
    df_bad = spark.createDataFrame(bad, "src int, dst int")
    df_good = spark.createDataFrame(good, "src int, dst int")
    guarded = {
        (r.a, r.b): (r.aa, r.common)
        for r in PR.adamic_adar(df_bad, "src", "dst", distinct_oriented=True).collect()
    }
    clean = {
        (r.a, r.b): (r.aa, r.common)
        for r in PR.adamic_adar(df_good, "src", "dst", distinct_oriented=True).collect()
    }
    assert guarded == clean


# ---------------------------------------------------------------------------
# winnowing: >= 2^20-byte documents chunk instead of erroring
# (round-10 verdict "What's missing #3")
# ---------------------------------------------------------------------------


def _winnow_ref(doc_id, data: bytes):
    """Independent textbook winnowing (numpy sliding-window min with an
    explicit rightmost-tie argmax — a different formulation from the
    engine's h*2^20-p encoded min)."""
    import numpy as np

    from postgraph_spark.queries.llm_ops import _RK_COEF, _WIN_W

    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    if len(b) < 8 + _WIN_W - 1:
        return set()
    n = len(b) - 7
    hs = np.zeros(n, dtype=np.int64)
    for i, c in enumerate(_RK_COEF):
        hs += b[i : i + n] * c
    win = np.lib.stride_tricks.sliding_window_view(hs, _WIN_W)
    m = win.min(axis=1)
    rp = _WIN_W - 1 - np.argmax(win[:, ::-1] == m[:, None], axis=1)
    pos = np.arange(len(m)) + rp + 1  # 1-based
    return set(zip([doc_id] * len(m), pos.tolist(), m.tolist()))


def test_winnow_chunked_equals_unchunked_across_boundaries():
    """_winnow_batch with a tiny chunk_cap must be bit-identical to the
    unchunked path — boundary windows, tie runs, multi-byte text."""
    from postgraph_spark.queries.llm_ops import _winnow_batch

    texts = [
        b"ab" * 200,                      # all-tie windows crossing every boundary
        ("café naïve 中文 rolling " * 30).encode("utf-8"),
        b"a" * 150,                       # one repeated hash value
        bytes(range(256)) * 3,            # distinct bytes
        b"tail",                          # shorter than a window
    ]
    base = {tuple(r) for r in _winnow_batch(texts)}
    for cap in (32, 64, 101):
        chunked = {tuple(r) for r in _winnow_batch(texts, chunk_cap=cap)}
        assert chunked == base
    assert base == set().union(*(_winnow_ref(i, t) for i, t in enumerate(texts)))


def test_winnow_fingerprints_over_1mib_document(spark, tmp_path):
    """A > 2^20-byte document must produce fingerprints identical to the
    textbook reference (the old path raised ValueError)."""
    import random

    from postgraph_spark.queries.registry import QUERIES

    rng = random.Random(7)
    big = "".join(
        rng.choice(["lorem ", "ipsum ", "dolor ", "sit ", "amet "])
        for _ in range(230_000)
    )
    assert len(big.encode()) > (1 << 20)
    df = spark.createDataFrame(
        [(0, big, "en", "s", len(big)), (1, "the quick brown fox", "en", "s", 19)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(f"{sf}/documents.parquet")
    got = set(map(tuple, QUERIES["winnow_fingerprints"](spark, sf).collect()))
    want = _winnow_ref(0, big.encode()) | _winnow_ref(1, b"the quick brown fox")
    assert got == want


# ---------------------------------------------------------------------------
# ExactSubstr (Lee et al. 2022) — known-span behavior
# ---------------------------------------------------------------------------


def test_exact_substring_spans_known_corpus(spark):
    """Cross-doc duplicate, within-doc self-repeat, and sub-threshold
    docs resolve to exactly the paper-defined spans at L=4."""
    from postgraph_spark.operators.dedup import exact_substring_spans

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h x y z w"),
            (1, "q r s a b c d e f t u v"),
            (2, "p1 p2 p3 p4 k1 p1 p2 p3 p4"),
            (3, "x y"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_tokens)
        for r in exact_substring_spans(docs, "doc_id", "text", min_len=4).collect()
    }
    # docs 0/1 share the 6-token run "a b c d e f"; doc 2 self-repeats
    # "p1 p2 p3 p4" at token 0 and 5 (two islands — the repeats do not
    # overlap); doc 3 is below threshold
    assert got == {(0, 0, 6), (1, 3, 6), (2, 0, 4), (2, 5, 4)}

    from postgraph_spark.operators.dedup import exact_substring_clean

    cleaned = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.clean_text)
        for r in exact_substring_clean(docs, "doc_id", "text", min_len=4).collect()
    }
    assert cleaned == {
        0: (12, 6, "g h x y z w"),
        1: (12, 6, "q r s t u v"),
        2: (9, 8, "k1"),
        3: (2, 0, "x y"),
    }


# ---------------------------------------------------------------------------
# Bloom decontamination: a sound over-approximation of the exact join
# ---------------------------------------------------------------------------


def test_bloom_decontam_superset_of_exact_and_broadcast(spark):
    """Bloom membership can only ADD false positives: per doc,
    n_bloom_hit >= the exact join's n_hit, n_grams identical, and every
    exactly-contaminated doc stays flagged. The membership join must be
    broadcast (the corpus never shuffles on gram text)."""
    from postgraph_spark.queries.registry import QUERIES

    exact = {
        r.doc_id: r for r in QUERIES["decontam_overlap"](spark, SF_DIR).collect()
    }
    bloom_df = QUERIES["decontam_bloom"](spark, SF_DIR)
    bloom = {r.doc_id: r for r in bloom_df.collect()}
    assert set(bloom) == set(exact)
    assert any(r.n_hit > 0 for r in exact.values())  # non-vacuous
    for d, e in exact.items():
        b = bloom[d]
        assert b.n_grams == e.n_grams
        assert b.n_bloom_hit >= e.n_hit, d
        if e.contaminated:
            assert b.contaminated, d

    plan = bloom_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# LSH star-cap: linear pair growth on giant buckets, clusters preserved
# ---------------------------------------------------------------------------


def test_lsh_star_cap_linear_and_cluster_preserving(spark):
    from postgraph_spark.operators.dedup import lsh_candidate_pairs

    # 120 byte-identical docs (one giant bucket per band) + 6 unrelated
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(120)]
    rows += [(200 + i, f"unique document number {i} with its own words {i}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = {(r.a, r.b) for r in lsh_candidate_pairs(docs, "doc_id", "text").collect()}
    capped = {
        (r.a, r.b)
        for r in lsh_candidate_pairs(docs, "doc_id", "text", star_cap=10).collect()
    }
    # linear, not quadratic: 119 star pairs vs 120*119/2 = 7140
    assert len(full) >= 120 * 119 // 2
    assert len(capped) < 3 * 120
    assert capped <= full  # star pairs are a subset of true pairs

    def components(pairs, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent.setdefault(a, a), parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    nodes = {r[0] for r in rows}
    assert components(full, nodes) == components(capped, nodes)

    # non-binding cap is byte-identical
    loose = {
        (r.a, r.b)
        for r in lsh_candidate_pairs(docs, "doc_id", "text", star_cap=10_000).collect()
    }
    assert loose == full
