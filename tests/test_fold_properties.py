"""Randomized cross-checks of the JVM fold primitives against plain
Python reference implementations — seeded RNG, one DataFrame per
property (batched: Spark evaluates every case in a single job)."""

import random

import pyspark.sql.functions as F

from postgraph_spark.operators import bpe as BPE


def _ref_merge(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_merge_pair_matches_reference_scan(spark):
    rng = random.Random(42)
    alphabet = ["a", "b", "ab", "ba", "c"]
    cases = []
    for i in range(200):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        left, right = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((i, syms, left, right))
    df = spark.createDataFrame(
        [(i, syms) for i, syms, _, _ in cases], ["i", "syms"]
    )
    # group cases by (left, right) so each rule is one Column expression
    by_rule = {}
    for i, syms, left, right in cases:
        by_rule.setdefault((left, right), []).append(i)
    for (left, right), idxs in by_rule.items():
        got = {
            r.i: r.m
            for r in df.filter(F.col("i").isin(idxs))
            .select("i", BPE.merge_pair(F.col("syms"), left, right).alias("m"))
            .collect()
        }
        for i in idxs:
            syms = cases[i][1]
            assert got[i] == _ref_merge(syms, left, right), (syms, left, right)


def test_rpn_match_matches_python_eval(spark):
    """Randomized cross-check of the JVM struct-stack fold against the
    Python reference evaluator over the FULL supported tsquery surface:
    boolean ops, prefix tests, weight restrictions, phrase distance
    (including one negated operand), and nesting of all of them."""
    from postgraph_spark.functions.tsearch import (
        parse_tsquery, rpn_match, tsvector_in,
        ts_match_py, tsquery_rpn, tsv_entry_map_w,
    )

    rng = random.Random(7)
    lexes = ["cat", "dog", "rat", "catalog", "x1"]

    def gen_leaf():
        lex = rng.choice(lexes)
        r = rng.random()
        if r < 0.2:
            return lex + ":*"
        if r < 0.4:
            w = "".join(rng.sample("ABCD", rng.randint(1, 2)))
            return f"{lex}:{w}"
        return lex

    def gen_phrase(depth):
        dist = rng.choice([1, 1, 2, 3])
        op = "<->" if dist == 1 else f"<{dist}>"
        l, r = gen_phrase_operand(depth - 1), gen_phrase_operand(depth - 1)
        # at most one side negated (both-negated is the PG error form)
        if rng.random() < 0.3:
            if rng.random() < 0.5:
                l = "!" + gen_leaf()
            else:
                r = "!" + gen_leaf()
        return f"({l} {op} {r})"

    def gen_phrase_operand(depth):
        # phrase operands may be vals, and/or combinations, or phrases
        if depth <= 0 or rng.random() < 0.5:
            return gen_leaf()
        r = rng.random()
        if r < 0.4:
            return gen_phrase(depth)
        op = rng.choice(["&", "|"])
        return f"({gen_phrase_operand(depth - 1)} {op} {gen_phrase_operand(depth - 1)})"

    def gen_query(depth):
        if depth == 0 or rng.random() < 0.3:
            return gen_leaf()
        r = rng.random()
        if r < 0.25:
            return gen_phrase(2)
        op = rng.choice(["&", "|", "!"])
        if op == "!":
            return f"!({gen_query(depth - 1)})"
        return f"({gen_query(depth - 1)} {op} {gen_query(depth - 1)})"

    # weighted, positioned, and positionless-lexeme vectors
    docs = [
        "cat:1 dog:2 rat:3",
        "catalog:5A",
        "dog:1,4B x1:2",
        "rat:2 catalog:3C cat:4,7A",
        "x1:1 cat:2A dog:3B rat:4C catalog:5",
        "cat dog",  # lexemes without positions
    ]
    queries = [gen_query(3) for _ in range(120)]
    rows = [
        (di, qi, tsvector_in(d), q)
        for di, d in enumerate(docs)
        for qi, q in enumerate(queries)
    ]
    df = spark.createDataFrame(rows, ["di", "qi", "tsv", "q"])
    # Spark: parse every query text per-row through the same rpn UDF the
    # operator path uses, evaluate with the JVM fold
    from postgraph_spark.functions.tsearch import _udfs

    rpn = _udfs()["rpn"](F.col("q"))
    got = {
        (r.di, r.qi): r.m
        for r in df.select(
            "di", "qi", rpn_match(tsv_entry_map_w(F.col("tsv")), rpn).alias("m")
        ).collect()
    }
    for di, d in enumerate(docs):
        tsv = tsvector_in(d)
        for qi, q in enumerate(queries):
            want = ts_match_py(tsv, parse_tsquery(q))
            assert got[(di, qi)] == want, (d, q, got[(di, qi)], want)
    # every generated query is in the JVM-supported set (no fallback)
    for q in queries:
        assert tsquery_rpn(q) != ["X"], q
