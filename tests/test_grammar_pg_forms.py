"""PG expression-grammar forms plugged into the Cypher language
(cypher_gram.y a_expr rules; exercised by regress/sql/new_cypher.sql):
BETWEEN [A]SYMMETRIC, IS [NOT] DISTINCT FROM, IS [NOT] TRUE/FALSE/
UNKNOWN, ISNULL/NOTNULL, [NOT] SIMILAR TO, NOT IN, and RETURN *.
"""

import pytest

from postgraph_spark.engine import CypherEngine


@pytest.fixture(scope="module")
def engine(spark):
    e = CypherEngine(spark)
    e.execute("CREATE GRAPH pgforms")
    e.execute("USE GRAPH pgforms")
    return e


CASES = [
    # BETWEEN (g.y:13943-13989) — desugared comparison conjunctions
    ("RETURN 1 BETWEEN 0 AND 2", True),
    ("RETURN 1 BETWEEN ASYMMETRIC 0 AND 2", True),
    ("RETURN 3 BETWEEN 0 AND 2", False),
    ("RETURN 1 BETWEEN 2 AND 0", False),  # asymmetric: empty range
    ("RETURN 1 BETWEEN SYMMETRIC 2 AND 0", True),
    ("RETURN 1 NOT BETWEEN 0 AND 2", False),
    ("RETURN 3 NOT BETWEEN 0 AND 2", True),
    ("RETURN null BETWEEN 0 AND 2", None),  # 3VL
    ("RETURN 1.5 BETWEEN 1 AND 2", True),  # cross-type numeric
    ("RETURN 'b' BETWEEN 'a' AND 'c'", True),
    # chains with logical AND after the BETWEEN's AND
    ("RETURN 1 BETWEEN 0 AND 2 AND true", True),
    # IS DISTINCT FROM (g.y:13935) — null-safe, never null
    ("RETURN null IS DISTINCT FROM 1", True),
    ("RETURN null IS DISTINCT FROM null", False),
    ("RETURN null IS NOT DISTINCT FROM null", True),
    ("RETURN 1 IS DISTINCT FROM 1.0", False),  # numeric cross-type eq
    ("RETURN 1 IS DISTINCT FROM 2", True),
    ("RETURN 'a' IS NOT DISTINCT FROM 'a'", True),
    ("RETURN [1] IS DISTINCT FROM [1.0]", False),  # element-wise eq
    # BooleanTest (g.y:13887-13931) — never null
    ("RETURN true IS TRUE", True),
    ("RETURN false IS TRUE", False),
    ("RETURN null IS TRUE", False),
    ("RETURN true IS NOT TRUE", False),
    ("RETURN null IS NOT TRUE", True),
    ("RETURN false IS FALSE", True),
    ("RETURN null IS FALSE", False),
    ("RETURN null IS UNKNOWN", True),
    ("RETURN true IS UNKNOWN", False),
    ("RETURN true IS NOT UNKNOWN", True),
    ("RETURN (1 = null) IS UNKNOWN", True),  # 3VL comparison feeds test
    # ISNULL / NOTNULL postfix (g.y:13871-13885)
    ("RETURN null ISNULL", True),
    ("RETURN 2 ISNULL", False),
    ("RETURN 2 NOTNULL", True),
    ("RETURN null NOTNULL", False),
    # SIMILAR TO (g.y:13804-13823): SQL regex — % -> .*, _ -> .,
    # ()| alternation kept, dot is LITERAL
    ("RETURN 'Hello' SIMILAR TO 'Hello'", True),
    ("RETURN 'Hello' SIMILAR TO 'H%o'", True),
    ("RETURN 'Hello' SIMILAR TO 'H_llo'", True),
    ("RETURN 'Hello' SIMILAR TO 'H_o'", False),  # _ is exactly one char
    ("RETURN 'Hello' SIMILAR TO '%ell%'", True),
    ("RETURN 'Hello' NOT SIMILAR TO 'x%'", True),
    ("RETURN 'abc' SIMILAR TO '(abc|def)'", True),
    ("RETURN 'def' SIMILAR TO '(abc|def)'", True),
    ("RETURN 'xyz' SIMILAR TO '(abc|def)'", False),
    ("RETURN 'a.b' SIMILAR TO 'a.b'", True),  # literal dot
    ("RETURN 'axb' SIMILAR TO 'a.b'", False),  # dot does NOT match any
    ("RETURN 'aaa' SIMILAR TO 'a+'", True),  # SQL-regex quantifier
    ("RETURN '10%' SIMILAR TO '10\\\\%'", True),  # escaped % literal
    ("RETURN null SIMILAR TO 'a'", None),  # 3VL
    # NOT IN (g.y:14006)
    ("RETURN 2 NOT IN [1, 3]", True),
    ("RETURN 2 NOT IN [1, 2]", False),
    ("RETURN 4 NOT IN [1, null]", None),  # 3VL: NOT(unknown)
]


@pytest.mark.parametrize("query,expected", CASES)
def test_pg_form(engine, query, expected):
    vals = engine.fetch_values(query)
    assert len(vals) == 1
    assert vals[0] == expected, f"{query} -> {vals[0]!r}, want {expected!r}"


def test_return_star(engine):
    engine.execute("CREATE (:star_v {name: 'a', k: 1})")
    engine.execute("CREATE (:star_v {name: 'b', k: 2})")
    df = engine.execute("MATCH (n:star_v) RETURN *")
    assert df.columns == ["n"]
    assert df.count() == 2
    # star + extra items
    df2 = engine.execute("MATCH (n:star_v) RETURN *, n.k + 10 AS kk")
    assert df2.columns == ["n", "kk"]
    vals = sorted(r["kk"]["i"] for r in df2.collect())
    assert vals == [11, 12]


def test_return_star_multi_binding(engine):
    engine.execute("CREATE (:star_a {i: 1})-[:star_e]->(:star_b {i: 2})")
    df = engine.execute("MATCH (x:star_a)-[r:star_e]->(y:star_b) RETURN *")
    assert sorted(df.columns) == ["r", "x", "y"]
    assert df.count() == 1


def test_not_in_subquery(engine):
    # NOT IN (subquery) = <> ALL sublink (g.y:14006-14014)
    vals = engine.fetch_values(
        "UNWIND [1, 2, 3] AS x WITH x "
        "WHERE x NOT IN (UNWIND [2, 3] AS y RETURN y) RETURN x"
    )
    assert vals == [1]


def test_order_by_using_and_cypher_prefix(engine):
    # ORDER BY ... USING < / > (regress/sql/order_by.sql:49) and the
    # leading CYPHER statement prefix (regress/sql/lists.sql)
    vals = engine.fetch_values(
        "CYPHER UNWIND [3, 1, 2] AS x RETURN x ORDER BY x USING <"
    )
    assert vals == [1, 2, 3]
    vals = engine.fetch_values("UNWIND [3, 1, 2] AS x RETURN x ORDER BY x USING >")
    assert vals == [3, 2, 1]


def test_explain_statement(engine):
    # EXPLAIN [ANALYZE] <query> -> one row per plan line, like PG's
    # QUERY PLAN result shape
    df = engine.execute("EXPLAIN UNWIND [1, 2] AS x RETURN x + 1 AS y")
    assert df.columns == ["plan"]
    txt = "\n".join(r.plan for r in df.collect())
    assert "Project" in txt
    df2 = engine.execute("EXPLAIN ANALYZE UNWIND [1, 2] AS x RETURN x + 1 AS y")
    assert df2.count() > 0


def test_similar_column_pattern_agrees_with_literal(spark):
    # the JVM regexp_replace conversion chain (column patterns) and the
    # compile-time Python conversion (literal patterns) must make the
    # same decisions
    import re as _re

    from pyspark.sql import functions as F

    from postgraph_spark.functions import gtype as G
    from postgraph_spark.functions.gtype import _similar_to_regex

    pats = ["H%o", "H_llo", "(abc|def)", "a.b", "a+", "%ell%", "x%",
            "a(b|c)_d%", "[Hh]ello", "he{2}llo",
            # escaped metachars: the sentinel pass must keep every \X a
            # literal X and \\ a literal backslash (round-6 ADVICE —
            # previously only \% and \_ agreed between the two paths)
            r"a\.b", r"a\%b", r"a\_b", r"\(abc\)", r"a\\%", r"a\\.b",
            r"a\+b", r"\[x\]"]
    strs = ["Hello", "hello", "axb", "a.b", "abc", "def", "abXdzz",
            "heello", "", "aaa", "a.b", "a%b", "a_b", "(abc)",
            "a\\", "a\\zzz", "a\\xb", "a+b", "[x]"]
    rows = [(s, p) for s in strs for p in pats]
    df = spark.createDataFrame(rows, ["s", "p"])
    got = df.select(
        "s", "p",
        G.op_similar(G.gv_str(F.col("s")), G.gv_str(F.col("p")))["b"].alias("jvm"),
    ).collect()
    for r in got:
        want = bool(_re.fullmatch(_similar_to_regex(r.p), r.s))
        assert r.jvm == want, (r.s, r.p, r.jvm, want)
