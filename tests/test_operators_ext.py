"""Operator-surface golden tests: LIKE/ILIKE (gtype_string.c:163-190),
PG regex operators ~ ~* !~ !~* (gtype_string.c:193-227), jsonb
containment/existence @> <@ ? ?| ?& (gtype_ops.c:849-1080) and the
integer-bitwise superset of ~ & | (reference wires inet/tsquery only,
gtype_ops.c:703-753 — divergence documented in gtype.op_bitand)."""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH ops_ext")
    e.execute("USE GRAPH ops_ext")
    return e


def run_batch(engine, cases):
    exprs = ", ".join(f"{c} AS c{i}" for i, (c, _) in enumerate(cases))
    row = engine.fetch(f"RETURN {exprs}")[0]
    for got, (expr, exp) in zip(row, cases):
        assert got == exp, f"{expr}: got {got!r}, expected {exp!r}"


def test_like_family(engine):
    run_batch(engine, [
        ("'hello' LIKE 'h%'", True),
        ("'hello' LIKE 'h_llo'", True),
        ("'hello' LIKE 'H%'", False),
        ("'hello' LIKE 'hello'", True),
        ("'hello' LIKE 'hell'", False),  # full-string match
        ("'hello' ILIKE 'H%'", True),
        ("'hello' NOT LIKE 'x%'", True),
        ("'hello' NOT ILIKE 'H%'", False),
        ("null LIKE 'x'", None),
        ("'x' LIKE null", None),
        ("'50%' LIKE '50!%' ", False),  # no escape char by default
    ])


def test_regex_operators(engine):
    run_batch(engine, [
        ("'hello' ~ 'ell'", True),       # match anywhere (PG semantics)
        ("'hello' ~ '^ell'", False),
        ("'hello' ~ '^hel'", True),
        ("'HELLO' ~* 'ell'", True),
        ("'hello' !~ 'xyz'", True),
        ("'HELLO' !~* 'ell'", False),
        ("'hello' =~ 'ell'", False),     # Cypher =~ is anchored full match
        ("'hello' =~ 'h.*o'", True),
    ])


def test_bitwise(engine):
    run_batch(engine, [
        ("5 & 3", 1),
        ("5 | 3", 7),
        ("~5", -6),
        ("~(-1)", 0),
        ("1 + 2 | 4", 7),       # | binds looser than +
        ("5 & 3 = 1", True),    # comparison binds looser than &
        ("5.5 & 3", None),      # non-integer -> gtype null
        ("null | 1", None),
    ])


def test_containment(engine):
    run_batch(engine, [
        ("{a: 1, b: {c: 2}} @> {a: 1}", True),
        ("{a: 1, b: {c: 2}} @> {b: {c: 2}}", True),
        ("{a: 1, b: {c: 2}} @> {b: {}}", True),
        ("{a: 1} @> {a: 2}", False),
        ("{a: 1} @> {a: 1.0}", True),        # numeric cross-type equality
        ("[1, 2, 3] @> [1, 3]", True),
        ("[1, 2, 3] @> [4]", False),
        ("[1, 2, 3] @> 1", True),            # top-level array ∋ scalar
        # nested arrays contain element-wise: [1] ⊆ [1,2] (PG jsonb)
        ("[[1, 2]] @> [[1]]", True),
        ("{a: 1} <@ {a: 1, b: 2}", True),
        ("{a: 1, c: 3} <@ {a: 1, b: 2}", False),
    ])


def test_existence(engine):
    run_batch(engine, [
        ("{a: 1, b: 2} ? 'a'", True),
        ("{a: 1, b: 2} ? 'c'", False),
        ("['x', 'y'] ? 'x'", True),
        ("['x', 'y'] ? 'z'", False),
        ("{a: 1, b: 2} ?| ['c', 'b']", True),
        ("{a: 1, b: 2} ?| ['c', 'd']", False),
        ("{a: 1, b: 2} ?& ['a', 'b']", True),
        ("{a: 1, b: 2} ?& ['a', 'c']", False),
        ("['x', 'y'] ?& ['x', 'y']", True),
        ("1 ? 'a'", None),  # non-container -> gtype null
    ])


def test_jaccard_materialized_path_identical(spark):
    """the size-probed checkpoint (scale path) must not change results:
    force it with materialize_min_docs=0 and compare to the recompute
    path on the same corpus."""
    from postgraph_spark.operators.dedup import jaccard_pairs
    from postgraph_spark.sources.relational import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, "documents", SF_DIR)
    a = sorted(map(tuple, jaccard_pairs(docs, "doc_id", "text").collect()))
    b = sorted(
        map(tuple, jaccard_pairs(docs, "doc_id", "text", materialize_min_docs=0).collect())
    )
    assert a == b and a
